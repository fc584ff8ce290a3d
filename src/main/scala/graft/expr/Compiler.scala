package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import scala.collection.mutable
import graft.Env
import graft.schema.{ColType, TableDef}

/** Parameter values for `{}` / `{0}` / `{name}` / `{obj.attr}` binding
  * (tanker/expression.py:353-399). Named lookup falls back to
  * env.aliases then env.cfg (tanker/context.py:762-768). */
final class Args(
    positional: IndexedSeq[Any],
    named: Map[String, Any],
    env: Env) {
  private var cursor = 0

  def pop(): Any = {
    if (cursor >= positional.length)
      throw new IllegalArgumentException("Not enough positional args for {} params")
    val v = positional(cursor); cursor += 1; v
  }
  def at(i: Int): Any = positional(i)
  def get(key: String): Any =
    named.getOrElse(key, env.aliases.getOrElse(key, env.cfg.getOrElse(key,
      throw new NoSuchElementException(s"No value for parameter {$key}"))))

  def resolve(p: Ast.Param): Any = {
    var v: Any =
      if (p.key.isEmpty) pop()
      else p.key.toIntOption match {
        case Some(i) => at(i)
        case None => get(p.key)
      }
    // Dotted tail: map access / bean getter (tanker getattr equivalent)
    for (attr <- p.tail) {
      v = v match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]](attr)
        case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]].get(attr)
        case other =>
          val f = other.getClass.getMethods.find(m =>
            m.getName == attr && m.getParameterCount == 0)
          f.map(_.invoke(other)).getOrElse(
            throw new NoSuchElementException(s"No attribute '$attr' on $other"))
      }
    }
    if (p.fmtSpec.isDefined) v = PyFormat.format(v, p.fmtSpec.get)
    if (p.conversion.isDefined) v = PyFormat.convert(v, p.conversion.get)
    v
  }
}

object Args {
  def apply(env: Env, positional: Seq[Any] = Nil, named: Map[String, Any] = Map()): Args =
    new Args(positional.toIndexedSeq, named, env)
}

/** Minimal Python format-spec emulation for `{x:>5}` / `{x!r}` params
  * (tests/chunk_test.py). Supports [[fill]align][0][width][.prec][dfs]. */
object PyFormat {
  private val SpecRe = """(?:(.)?([<>^=]))?([+\- ])?(0)?(\d+)?(?:\.(\d+))?([dfsx]?)""".r

  def convert(v: Any, conversion: String): Any = conversion match {
    case "r" => v match {
      case s: String => "'" + s + "'"
      case other => String.valueOf(other)
    }
    case "s" => String.valueOf(v)
    case c => throw new IllegalArgumentException(s"Unsupported conversion !$c")
  }

  def format(v: Any, spec: String): Any = spec match {
    case SpecRe(fill, align, _, zero, width, prec, typ) =>
      var s = (typ, v) match {
        case ("f", n: Number) =>
          val p = Option(prec).map(_.toInt).getOrElse(6)
          String.format(java.util.Locale.ROOT, s"%.${p}f", Double.box(n.doubleValue()))
        case ("d", n: Number) => n.longValue().toString
        case _ =>
          val base = String.valueOf(v)
          Option(prec).filter(_ => v.isInstanceOf[String])
            .map(p => base.take(p.toInt)).getOrElse(base)
      }
      val w = Option(width).map(_.toInt).getOrElse(0)
      if (s.length < w) {
        val f = Option(fill).map(_.head).getOrElse(if (zero != null) '0' else ' ')
        val pad = f.toString * (w - s.length)
        Option(align).getOrElse(if (v.isInstanceOf[Number]) ">" else "<") match {
          case "<" => s = s + pad
          case ">" => s = pad + s
          case "^" =>
            val l = (w - s.length) / 2
            s = f.toString * l + s + f.toString * (w - s.length - l)
          case "=" => s = pad + s
        }
      } else if (v.isInstanceOf[String] && align == null && fill == null &&
                 zero == null && typ == "" && prec == null && width != null) {
        // Python default for str is left-align; handled above.
      }
      s
    case _ => String.valueOf(v)
  }
}

/** Compiled value — the result of compiling one AST node. */
sealed trait CV
/** A general column expression. */
final case class CCol(c: Column) extends CV
/** A literal with its driver-side value (enables `isin` fast paths). */
final case class CLit(c: Column, raw: Any) extends CV
/** An auto-expanded list parameter (tanker/expression.py:447-453). */
final case class CList(items: Seq[CV]) extends CV
/** `(any arr)` / `(all arr)` quantifier awaiting a comparison
  * (tanker/expression.py:154-155). */
final case class CQuant(all: Boolean, c: Column) extends CV
/** A `(from tbl (select ...) (where ...))` sub-select; clauses stay
  * un-compiled so EXISTS/IN can decompose the correlation
  * (tanker/expression.py:213-220). */
final case class CSub(qb: QueryBuilder, selectAsts: Seq[Ast],
    whereAsts: Seq[Ast], distinct: Boolean) extends CV

/** One EXISTS/IN-subquery occurrence, decorrelated at compile time:
  * `pairs` are (parent-side, sub-side) equi-correlation columns,
  * `residual` the non-correlated part of the sub's WHERE. Materialized
  * in [[QueryBuilder.wideFrame]] as `LEFT JOIN (SELECT DISTINCT subCols,
  * true AS flag FROM sub WHERE residual)` — deterministic (no row-id
  * round-trip) and only the small sub side is aggregated.
  *
  * `carried` holds extra (name, column) keys a DEEPER scope correlates
  * on (`_parent._parent.` and beyond): they ride in the flag frame's
  * distinct key set and stay visible in the joined frame (not join
  * conditions at this level), so the NEXT scope up can join on them —
  * the hoisting that makes multi-level correlation one flag join per
  * scope instead of an unsupported shape. */
final case class ExistsSpec(sub: QueryBuilder, pairs: Seq[(Column, Column)],
    residual: Option[Column], flag: String,
    carried: Seq[(String, Column)] = Nil,
    /** One non-equi correlation conjunct, decorrelated as a min/max
      * reduction per equi-group: `∃s: p > s.col ⟺ p > min(col)` (and
      * dually for < / >= / <= / !=). The sub column whose extremes the
      * flag frame aggregates as `<flag>_mn` / `<flag>_mx`. */
    reduceCol: Option[Column] = None,
    /** Two-plus non-equi correlation conjuncts, each (op, sub column):
      * joint satisfaction by a single sub row can't decompose into
      * independent extremes, so the flag frame carries the DISTINCT
      * compared-value tuples per equi-group as an array of structs
      * `<flag>_ts` (fields `t0..tn`), tested by an `exists` HOF at the
      * predicate site. When both ops are monotone (< <= > >=) and
      * there are exactly two dims, the tuple set is pruned to its
      * skyline (Pareto frontier) — a dominated tuple can never be the
      * only witness — bounding the array by the frontier size, not the
      * group size. */
    tupleSpecs: Seq[(String, Column)] = Nil,
    /** Hoisted NEGATED nested subqueries referencing BOTH this spec's
      * sub and an outer scope (round 12 — the last expression gap):
      * each entry names an inner tuple-carrying spec registered on the
      * sub's own builder (its `<inner>_ts` distinct-tuple array rides
      * the sub frame, one per sub row) plus the tests that must find
      * NO satisfying tuple. The flag frame collects one struct of
      * those arrays per sub row into `<flag>_nts` per equi-group
      * (never fans out the outer join; byte-equal structs dedup via
      * collect_set — interchangeable witnesses), and the predicate
      * asks, at the OUTER scope where the compared columns live, for a
      * sub row whose every negated sub is witness-free: ∃ r: ∀ hoisted
      * subs: ¬∃ tuple satisfying. Array sizes are bounded like
      * [[tupleSpecs]]: distinct compared-value tuples per inner group
      * × distinct carried structs per outer key. */
    negTests: Seq[NegTest] = Nil)

/** One hoisted negated dual-scope subquery riding
  * [[ExistsSpec.negTests]]: `flag` names the inner spec whose
  * `<flag>_ts` distinct-tuple array is carried per enclosing-sub row.
  * Each test compares tuple dim `t<idx>` against either an outer-scope
  * column (Left — resolvable where the enclosing predicate lands) or a
  * named field of the carried `__nrow` struct (Right — an
  * enclosing-sub column materialized per sub row by [[rowCols]]; the
  * NON-equi own-parent correlation the inner equi-group keys cannot
  * absorb rides the struct this way). */
final case class NegTest(flag: String,
    tests: Seq[(String, Either[Column, String], Int)],
    rowCols: Seq[(String, Column)] = Nil,
    /** Descent chain for correlation DEEPER than the grandparent
      * (round 14): names of nested `<flag>_nts` struct fields to step
      * through, outermost first, before the row holding this test's
      * `<flag>_ts` leaf array. Empty = the test evaluates against the
      * rows of the spec it rides directly (the depth-2 case). Each
      * scope a test defers through prepends the field under which the
      * lower spec's collected array rides its row struct; the
      * predicate at the landing scope walks the chain with one nested
      * `exists` HOF per element. */
    path: Seq[String] = Nil)

/** Compiles s-expression ASTs to Spark [[Column]]s over a "wide frame":
  * the base table left-joined with every table reached by a dotted
  * path (tanker ReferenceSet, expression.py:24-118).
  *
  * Joins are deduplicated per (leftAlias, rightTable, leftCol,
  * rightCol) with aliases `rtable_N`, N counting joins globally across
  * parent/child scopes — Catalyst does not merge duplicate joins, so
  * this mirrors the reference's OrderedDict trick exactly
  * (expression.py:103-105).
  */
final class QueryBuilder(
    val env: Env,
    val table: TableDef,
    val baseDf: () => DataFrame,
    val aliasForCol: String => String, // column name -> base alias
    val parent: Option[QueryBuilder],
    val fieldEnv: Map[String, String]) {

  import Ast._

  /** Set true by the View layer while compiling top-level select
    * fields — the only position where a Generator (unnest) is legal. */
  var allowGenerators: Boolean = false

  // (leftAlias, rightTable, leftCol, rightCol) -> join alias
  val joins = mutable.LinkedHashMap[(String, String, String, String), String]()
  val children = mutable.ArrayBuffer[QueryBuilder]()
  val existsSpecs = mutable.ArrayBuffer[ExistsSpec]()
  /** Multi-level correlation pairs a nested sub registered on THIS
    * scope, awaiting consumption when this scope's own ExistsSpec is
    * built: (outer column `levels` scopes above this one, name of the
    * key column the nested flag join leaves in this scope's frame,
    * remaining levels). */
  private val pendingCarries = mutable.ArrayBuffer[(Column, String, Int)]()
  /** Negated dual-scope tests whose outer columns live ABOVE the scope
    * that built them (correlation deeper than the grandparent): each
    * waits here with the number of scopes still to climb; the
    * enclosing exists consumes them, nesting the collected `_nts`
    * array through its own flag frame until the count reaches zero at
    * the scope that owns the compared columns. */
  private val pendingNegTests = mutable.ArrayBuffer[(NegTest, Int)]()
  parent.foreach(_.children += this)

  private def nbJoins(up: Boolean = true): Int =
    if (up && parent.isDefined) parent.get.nbJoins()
    else joins.size + children.map(_.nbJoins(up = false)).sum

  // ---------------------------------------------------------------- refs

  /** Resolve a plain column or dotted path to a qualified column,
    * registering joins along the way (tanker get_ref,
    * expression.py:75-110). */
  def ref(desc: String): Column = { val (a, _, c) = refInfo(desc); col(s"$a.$c") }

  /** (alias, remote table, remote column) for a path. */
  def refInfo(desc: String): (String, TableDef, String) =
    refInfo(desc, table, None)

  private def refInfo(desc: String, tbl: TableDef, forceAlias: Option[String])
      : (String, TableDef, String) = {
    if (tbl.has(desc)) {
      val a = forceAlias.getOrElse(
        if (tbl eq table) aliasForCol(desc) else tbl.name)
      return (a, tbl, desc)
    }
    if (!desc.contains("."))
      throw new NoSuchElementException(
        s"Column '$desc' not found in table '${tbl.name}'")
    val Array(head, tail) = desc.split("\\.", 2)
    val hop = env.registry.hop(tbl.name, head) // throws if head unknown
    val leftAlias = forceAlias.getOrElse(
      if (tbl eq table) aliasForCol(head) else tbl.name)
    val key = (leftAlias, hop.toTable, hop.leftCol, hop.rightCol)
    val alias = joins.getOrElseUpdate(key, s"${hop.toTable}_${rootNbJoins()}")
    refInfo(tail, env.registry(hop.toTable), Some(alias))
  }

  private def rootNbJoins(): Int = nbJoins(up = true)

  private def root: QueryBuilder = parent.map(_.root).getOrElse(this)

  // ------------------------------------------------------------- compile

  def compileString(s: String, args: Args): Column =
    one(compile(Parser.parse(s), args))

  def one(cv: CV): Column = cv match {
    case CCol(c) => c
    case CLit(c, _) => c
    case CQuant(_, c) => c
    case CList(items) if items.size == 1 => one(items.head)
    case CList(_) =>
      throw new IllegalArgumentException("List parameter used outside (in ...)")
    case _: CSub =>
      throw new IllegalArgumentException("Sub-select used outside exists/in")
  }

  private def flat(cvs: Seq[CV]): Seq[CV] = cvs.flatMap {
    case CList(items) => items
    case other => Seq(other)
  }

  def compile(ast: Ast, args: Args): CV = ast match {
    case Str(s) => CLit(lit(s), s)
    case Num(v) => CLit(lit(v), v)
    case p: Param => literal(args.resolve(p))
    case Word(t) => symbol(t, args)
    case Node(items) => node(items, args)
  }

  private def literal(v: Any): CV = v match {
    case null => CLit(lit(null), null)
    case s: Iterable[_] => CList(s.toSeq.map(literal))
    case a: Array[_] => CList(a.toSeq.map(literal))
    case other => CLit(Lit.of(other), other)
  }

  /** Non-head symbol resolution (tanker ExpressionSymbol,
    * expression.py:312-341): `_parent.` climbing, then field-env
    * macro expansion, then column/dotted path; `null`/`true`/`false`
    * as literal fallbacks. */
  private def symbol(token: String, args: Args): CV = {
    if (token.startsWith("_parent.")) {
      var tail = token
      var qb: QueryBuilder = this
      while (tail.startsWith("_parent.")) {
        tail = tail.substring("_parent.".length)
        qb = qb.parent.getOrElse(
          throw new IllegalArgumentException(s"No parent scope for '$token'"))
      }
      return CCol(qb.ref(tail))
    }
    fieldEnv.get(token) match {
      case Some(desc) if !table.has(token) =>
        if (desc.startsWith("(")) compile(Parser.parse(desc), args)
        else if (desc.startsWith("{"))
          literal(args.resolve(Ast.param(desc.substring(1, desc.length - 1))))
        else CCol(ref(desc))
      case _ =>
        try CCol(ref(token))
        catch {
          case _: NoSuchElementException => token.toLowerCase match {
            case "null" => CLit(lit(null), null)
            case "true" => CLit(lit(true), true)
            case "false" => CLit(lit(false), false)
            case _ => throw new IllegalArgumentException(
              s"Unknown symbol '$token' (table '${table.name}')")
          }
        }
    }
  }

  private def node(items: Seq[Ast], args: Args): CV = {
    if (items.isEmpty) throw new IllegalArgumentException("empty () expression")
    items.head match {
      case Word(h) => form(h.toLowerCase, items.tail, args)
      case _ =>
        // e.g. filter '(1)' / '(true)' — single-value truthiness
        if (items.size == 1) compile(items.head, args)
        else throw new IllegalArgumentException(s"Cannot compile $items")
    }
  }

  private def cmp(op: String, l: CV, r: CV): Column = {
    // pg array quantifiers: (= 1 (any arr)) (tests/read_test.py:294-300)
    (l, r) match {
      case (CQuant(all, arr), v) => quantCmp(flip(op), one(v), arr, all)
      case (v, CQuant(all, arr)) => quantCmp(op, one(v), arr, all)
      case _ =>
        val (a, b) = (one(l), one(r))
        op match {
          case "=" => a === b
          case "!=" => a =!= b
          case ">" => a > b
          case "<" => a < b
          case ">=" => a >= b
          case "<=" => a <= b
        }
    }
  }

  private def flip(op: String): String = op match {
    case ">" => "<"; case "<" => ">"; case ">=" => "<="; case "<=" => ">="
    case other => other
  }

  /** value <op> ANY/ALL(array) as a higher-order function over the
    * array column — codegen-friendly, no explode. */
  private def quantCmp(op: String, v: Column, arr: Column, all: Boolean): Column = {
    val pred: Column => Column = op match {
      case "=" => _ === v
      case "!=" => _ =!= v
      case ">" => v > _
      case "<" => v < _
      case ">=" => v >= _
      case "<=" => v <= _
    }
    if (all) forall(arr, pred) else exists(arr, pred)
  }

  private def form(op: String, rawArgs: Seq[Ast], args: Args): CV = op match {
    case "and" =>
      CCol(rawArgs.map(a => one(compile(a, args))).reduce(_ && _))
    case "or" =>
      CCol(rawArgs.map(a => one(compile(a, args))).reduce(_ || _))
    case "not" => CCol(!one(compile(rawArgs.head, args)))
    case "=" | "!=" | ">" | "<" | ">=" | "<=" =>
      val Seq(l, r) = rawArgs.map(compile(_, args))
      CCol(cmp(op, l, r))
    case "is" | "isnot" =>
      val l = one(compile(rawArgs.head, args))
      val r = compile(rawArgs(1), args)
      val isNull = r match { case CLit(_, null) => true; case _ => false }
      CCol((op == "is", isNull) match {
        case (true, true) => l.isNull
        case (false, true) => l.isNotNull
        case (true, false) => l <=> one(r)
        case (false, false) => !(l <=> one(r))
      })
    case "like" | "ilike" =>
      val Seq(l, r) = rawArgs.map(a => one(compile(a, args)))
      CCol(if (op == "like") like(l, r) else ilike(l, r))
    case "in" | "notin" =>
      val lhs = compile(rawArgs.head, args)
      val rhs = flat(rawArgs.tail.map(compile(_, args)))
      rhs match {
        case Seq(sub: CSub) => inSubquery(one(lhs), sub, negate = op == "notin", args)
        case _ =>
          val l = one(lhs)
          val c =
            if (rhs.forall(_.isInstanceOf[CLit]))
              l.isin(rhs.map(_.asInstanceOf[CLit].raw): _*)
            else rhs.map(r => l === one(r)).reduce(_ || _)
          CCol(if (op == "notin") !c else c)
      }
    case "any" => CQuant(all = false, one(compile(rawArgs.head, args)))
    case "all" => CQuant(all = true, one(compile(rawArgs.head, args)))
    case "unnest" =>
      // Generator: only legal as a top-level select field
      // (tests/read_test.py:302-303); anywhere else Spark would throw
      // an opaque AnalysisException at run time.
      if (!allowGenerators) throw new IllegalArgumentException(
        "(unnest ...) is only allowed as a select field, not in filters or nested expressions")
      CCol(explode(one(compile(rawArgs.head, args))))
    case "->>" =>
      val l = one(compile(rawArgs.head, args))
      val key = rawArgs(1) match {
        case Str(s) => s
        case other => throw new IllegalArgumentException(s"->> needs a string key, got $other")
      }
      CCol(get_json_object(l, "$." + key))
    case "exists" =>
      compile(rawArgs.head, args) match {
        case sub: CSub => existsSubquery(sub, None, negate = false, args)
        case other => CCol(one(other).isNotNull) // EXISTS over a scalar
      }
    case "from" => subSelect(rawArgs, args)
    case "cast" =>
      val c = one(compile(rawArgs.head, args))
      CCol(c.cast(castType(rawArgs(1))))
    case "extract" =>
      val part = wordOf(rawArgs.head, "extract part")
      val ts = one(compile(rawArgs(1), args))
      CCol(part.toLowerCase match {
        case "epoch" => unix_timestamp(ts)
        case "dow" => dayofweek(ts) - lit(1) // pg: Sunday=0
        case "doy" => dayofyear(ts)
        case "week" => weekofyear(ts)
        case p => call_function("date_part", lit(p.toUpperCase), ts)
      })
    case "date_trunc" =>
      val part = rawArgs.head match {
        case Str(s) => s
        case w => wordOf(w, "date_trunc part")
      }
      CCol(date_trunc(part, one(compile(rawArgs(1), args))))
    case "strftime" =>
      val fmt = rawArgs.head match {
        case Str(s) => s
        case other => throw new IllegalArgumentException(s"strftime needs a format, got $other")
      }
      CCol(date_format(one(compile(rawArgs(1), args)), Strftime.toJava(fmt)))
    case "floor" => CCol(floor(one(compile(rawArgs.head, args))))
    case "true" => CLit(lit(true), true)
    case "false" => CLit(lit(false), false)
    case "+" =>
      val xs = rawArgs.map(a => one(compile(a, args)))
      CCol(xs.reduce(_ + _))
    case "-" =>
      val xs = rawArgs.map(a => one(compile(a, args)))
      CCol(if (xs.size == 1) negate(xs.head) else xs.reduce(_ - _))
    case "*" => CCol(rawArgs.map(a => one(compile(a, args))).reduce(_ * _))
    case "/" => CCol(rawArgs.map(a => one(compile(a, args))).reduce(_ / _))
    // aggregates (tanker/expression.py:173-182)
    case "count" =>
      if (rawArgs.isEmpty) CCol(count(lit(1)))
      else CCol(count(one(compile(rawArgs.head, args))))
    case "avg" => CCol(avg(one(compile(rawArgs.head, args))))
    case "sum" => CCol(sum(one(compile(rawArgs.head, args))))
    case "min" => CCol(min(one(compile(rawArgs.head, args))))
    case "max" => CCol(max(one(compile(rawArgs.head, args))))
    case "bool_and" | "every" => CCol(bool_and(one(compile(rawArgs.head, args))))
    case "bool_or" => CCol(bool_or(one(compile(rawArgs.head, args))))
    case other =>
      env.builtins.get(other) match {
        case Some(fn) => CCol(fn(rawArgs.map(a => one(compile(a, args)))))
        case None => throw new IllegalArgumentException(s"Unknown function '$other'")
      }
  }

  private def wordOf(a: Ast, what: String): String = a match {
    case Word(w) => w
    case Ast.Node(Seq(Word(w))) => w
    case other => throw new IllegalArgumentException(s"Expected $what, got $other")
  }

  private def castType(a: Ast): DataType = {
    val name = wordOf(a, "cast type")
    ColType.parse(name).spark.getOrElse(
      throw new IllegalArgumentException(s"Cannot cast to $name"))
  }

  // --------------------------------------------------------- sub-selects

  /** `(from tbl (select ...) (where ...))` — builds a child scope whose
    * joins/aliases share the global counter (tanker
    * expression.py:213-220, 236-240). */
  private def subSelect(rawArgs: Seq[Ast], args: Args): CV = {
    val tblName = wordOf(rawArgs.head, "sub-select table")
    val subAlias = s"${tblName}__sq${root.subCounter.getAndIncrement()}"
    val sub = new QueryBuilder(
      env, env.registry(tblName),
      () => env.warehouse.read(tblName).as(subAlias),
      _ => subAlias, Some(this), Map())
    var selects: Seq[Ast] = Nil
    var distinct = false
    var where: Seq[Ast] = Nil
    rawArgs.tail.foreach {
      case Ast.Node(Word(h) +: rest) if h.equalsIgnoreCase("select") ||
          h.equalsIgnoreCase("select-distinct") =>
        distinct = h.equalsIgnoreCase("select-distinct")
        selects = rest
      case Ast.Node(Word(h) +: rest) if h.equalsIgnoreCase("where") =>
        where = rest
      case other =>
        throw new IllegalArgumentException(s"Unexpected sub-select clause: $other")
    }
    CSub(sub, selects, where, distinct)
  }

  private val subCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private val existsCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** `_parent.` levels of a token: `_parent._parent.x` → 2. */
  private def parentLevels(t: String): Int = {
    var n = 0; var s = t
    while (s.startsWith("_parent.")) { n += 1; s = s.substring("_parent.".length) }
    n
  }

  /** Max `_parent.` depth referenced by an AST AT the current scope.
    * Refs inside a nested `(from ...)` belong to that deeper scope —
    * its own exists/in handling hoists them (via pendingCarries), so
    * they don't count here. */
  private def topDepth(ast: Ast): Int = ast match {
    case Word(t) => parentLevels(t)
    case Ast.Node(Word(h) +: _) if h.equalsIgnoreCase("from") => 0
    case Ast.Node(items) => items.map(topDepth).maxOption.getOrElse(0)
    case _ => 0
  }

  /** Does `ast` hold a `_parent…` reference that ESCAPES the current
    * exists scope — a direct ref at this level, or one inside a nested
    * `(from …)` whose depth exceeds the nesting? Such a ref under a
    * non-conjunctive operator can't ride the carry hoisting, so the
    * enclosing exists must distribute over the operator first. */
  private def escapesScope(ast: Ast, fromDepth: Int): Boolean = ast match {
    case Word(t) => parentLevels(t) > fromDepth
    case Ast.Node(Word(h) +: rest) if h.equalsIgnoreCase("from") =>
      rest.exists(escapesScope(_, fromDepth + 1))
    case Ast.Node(items) => items.exists(escapesScope(_, fromDepth))
    case _ => false
  }

  /** Does `ast` reference a column of the scope sitting `d` `from`
    * levels up — i.e. resolve a `_parent^l` ref with l equal to its
    * nesting depth? Node heads are operators, never refs. */
  private def referencesScope(ast: Ast, d: Int): Boolean = ast match {
    case Word(t) => parentLevels(t) == d
    case Ast.Node(Word(h) +: rest) if h.equalsIgnoreCase("from") =>
      rest.exists(referencesScope(_, d + 1))
    case Ast.Node(_ +: rest) => rest.exists(referencesScope(_, d))
    case _ => false
  }

  /** Rewrite `ast` for evaluation one scope up: every ref that reaches
    * ABOVE its own nesting depth loses one `_parent.`. */
  private def dropOneParent(ast: Ast, d: Int): Ast = ast match {
    case Word(t) if parentLevels(t) > d =>
      Word(t.substring("_parent.".length))
    case Ast.Node(Word(h) +: rest) if h.equalsIgnoreCase("from") =>
      Ast.Node(Word(h) +: rest.map(dropOneParent(_, d + 1)))
    case Ast.Node(head +: rest) =>
      Ast.Node(head +: rest.map(dropOneParent(_, d)))
    case other => other
  }

  /** Is this a bare `(exists ...)` / `(in ...)` / `(notin ...)` node?
    * Only these may register multi-level carries from their sub — a
    * carry reaching the outer scope through `or`/`not` would need the
    * nested flag to be non-conjunctive, which the hoisting can't
    * express. */
  private def isSubqueryNode(ast: Ast): Boolean = ast match {
    case Ast.Node(Word(h) +: _) =>
      Set("exists", "in", "notin")(h.toLowerCase)
    case _ => false
  }

  /** Flatten a WHERE clause into top-level conjuncts. */
  private def conjuncts(asts: Seq[Ast]): Seq[Ast] = asts.flatMap {
    case Ast.Node(Word(h) +: rest) if h.equalsIgnoreCase("and") => conjuncts(rest)
    case other => Seq(other)
  }

  /** EXISTS, decorrelated at compile time: equi-correlation conjuncts
    * `(= sub_col _parent.col)` become join pairs; the rest filters the
    * sub. The predicate compiles to `flag IS NOT NULL` over a LEFT
    * JOIN against `SELECT DISTINCT keys FROM sub WHERE residual` built
    * in [[wideFrame]] — deterministic under task retry and no extra
    * shuffle of the outer side (VERDICT r1 #4: replaces the
    * monotonically_increasing_id flag join).
    *
    * Multi-level correlation (`_parent._parent.col`, any depth —
    * tanker expression.py:320-329, tests/expression_static_test.py:
    * 112-127): the sub-side key is carried in this spec's flag frame
    * and a pending pair is registered on the enclosing scope; each
    * intermediate scope passes it one level up until the scope that
    * owns the outer column joins on it. Non-equi correlation: one
    * conjunct decorrelates as a per-group min/max reduction; two or
    * more carry the distinct compared-value tuples (skyline-pruned
    * when monotone) and test them with an `exists` HOF. */
  private def existsSubquery(sub: CSub, extraPair: Option[(Column, Column)],
      negate: Boolean, args: Args): CV = {
    val qb = sub.qb
    // ∃ distributes over ∨: an OR conjunct whose disjuncts correlate
    // against the parent (directly, or through a nested sub deeply
    // enough to need a carry) splits the EXISTS into one variant per
    // disjunct, OR-combined. Each variant re-enters this method, so
    // stacked ORs keep splitting; the sub scans once per variant —
    // the price of a non-conjunctive correlated filter.
    val cs0 = conjuncts(sub.whereAsts)
    val splitIdx = cs0.indexWhere {
      case n @ Ast.Node(Word(h) +: _) if h.equalsIgnoreCase("or") =>
        escapesScope(n, 0)
      case _ => false
    }
    if (splitIdx >= 0) {
      val disjuncts = cs0(splitIdx) match {
        case Ast.Node(_ +: rest) => rest
        case _ => Nil // unreachable: matched Node above
      }
      val combined = disjuncts.map { d =>
        one(existsSubquery(sub.copy(whereAsts = cs0.updated(splitIdx, d)),
          extraPair, negate = false, args))
      }.reduce(_ || _)
      return CCol(if (negate) !combined else combined)
    }
    val flag = s"__exists_${root.existsCounter.getAndIncrement()}"
    val pairs = mutable.Buffer[(Column, Column)]()
    val carried = mutable.Buffer[(String, Column)]()
    val residual = mutable.Buffer[Column]()
    val pulledUp = mutable.Buffer[Column]()
    val nonEquis = mutable.Buffer[(String, Column, Column)]() // (op, parent, sub)
    val negTests = mutable.Buffer[NegTest]()
    val negDefer = mutable.Buffer[(NegTest, Int)]() // tests landing higher
    extraPair.foreach(pairs += _)
    conjuncts(sub.whereAsts).foreach { c =>
      val d = topDepth(c)
      val pullable = c match {
        // a negated subquery conjunct that references every scope
        // EXCEPT this sub is r-independent: ∃r (C(r) ∧ K) = ∃r C(r) ∧ K,
        // so K evaluates one scope up (each outer ref drops a
        // `_parent.`) — the complement-set carry the hoisting can't
        // express is never needed
        case Ast.Node(Seq(Word(n), inner)) => n.equalsIgnoreCase("not") &&
          isSubqueryNode(inner) && !referencesScope(c, 0) && escapesScope(c, 0)
        case _ => false
      }
      // a negated nested subquery referencing BOTH this sub and an
      // outer scope (the formerly-raising shape): hoistable as a
      // carried distinct-tuple list — (from-node, optional `in` lhs)
      val negDual: Option[(Ast, Option[Ast])] = c match {
        case Ast.Node(Seq(Word(n), Ast.Node(Seq(Word(e), f @ Ast.Node(_)))))
            if n.equalsIgnoreCase("not") && e.equalsIgnoreCase("exists") =>
          Some((f, None))
        case Ast.Node(Seq(Word(n), Ast.Node(Seq(Word(i), lhs, f @ Ast.Node(_)))))
            if n.equalsIgnoreCase("not") && i.equalsIgnoreCase("in") =>
          Some((f, Some(lhs)))
        case Ast.Node(Seq(Word(ni), lhs, f @ Ast.Node(_)))
            if ni.equalsIgnoreCase("notin") =>
          Some((f, Some(lhs)))
        case _ => None
      }
      if (pullable) {
        pulledUp += one(compile(dropOneParent(c, 0), args))
      } else if (negDual.isDefined && referencesScope(c, 0) &&
          escapesScope(c, 0)) {
        val (fromAst, lhsAst) = negDual.get
        val (nt, hops) = hoistNegatedSub(qb, fromAst, lhsAst, args)
        // hops = 0: the witness-free test completes at THIS scope
        // (grandparent comparisons); hops > 0: the outer columns live
        // higher still — the test defers, nesting through flag frames
        if (hops == 0) negTests += nt else negDefer += ((nt, hops))
      } else if (d == 0) {
        // May contain nested exists/in whose subs register carries on
        // qb; only a bare subquery conjunct keeps the nested flag
        // conjunctive, which the hoisting depends on.
        val before = qb.pendingCarries.size
        val beforeNeg = qb.pendingNegTests.size
        residual += qb.one(qb.compile(c, args))
        if ((qb.pendingCarries.size > before ||
            qb.pendingNegTests.size > beforeNeg) && !isSubqueryNode(c))
          throw new UnsupportedOperationException(
            "Multi-level _parent correlation must sit in a bare (exists ...)" +
            s" / (in ...) conjunct, not under or/not: $c")
      } else c match {
        case Ast.Node(Seq(Word(op), a, b)) if op == "=" &&
            (topDepth(a) >= 1) != (topDepth(b) >= 1) =>
          val (parentSide, subSide) = if (topDepth(a) >= 1) (a, b) else (b, a)
          // both compiled in the sub scope: _parent refs climb to the
          // right enclosing builder's frame automatically
          val pc = qb.one(qb.compile(parentSide, args))
          val sc = qb.one(qb.compile(subSide, args))
          val pd = topDepth(parentSide)
          if (pd == 1) pairs += ((pc, sc))
          else { // grand(+)-parent: carry the sub key, register upward
            val kn = s"${flag}_c${carried.size}"
            carried += kn -> sc
            pendingCarries += ((pc, kn, pd - 1))
          }
        case Ast.Node(Seq(Word(op), a, b))
            if Set(">", "<", ">=", "<=", "!=")(op) &&
            (topDepth(a) >= 1) != (topDepth(b) >= 1) &&
            topDepth(if (topDepth(a) >= 1) a else b) == 1 =>
          // non-equi correlation `p OP s.col`: ONE such conjunct
          // depends only on the extreme of s.col within the equi-group
          // (min/max reduction); TWO OR MORE need joint satisfaction
          // by a single sub row, so the distinct compared-value tuples
          // ride the flag frame and an `exists` HOF tests them
          val (parentSide, subSide) = if (topDepth(a) >= 1) (a, b) else (b, a)
          val normOp = if (topDepth(a) >= 1) op else flip(op)
          nonEquis += ((normOp,
            qb.one(qb.compile(parentSide, args)),
            qb.one(qb.compile(subSide, args))))
        case _ => throw new UnsupportedOperationException(
          s"Only equi or single-comparison correlation against _parent is supported in exists/in, got: $c")
      }
    }
    // Consume carries nested subs registered on the sub's own scope:
    // level 1 joins here; deeper levels keep riding up.
    qb.pendingCarries.foreach { case (pc, kn, lvl) =>
      if (lvl == 1) pairs += ((pc, col(kn)))
      else { carried += kn -> col(kn); pendingCarries += ((pc, kn, lvl - 1)) }
    }
    qb.pendingCarries.clear()
    // Consume deferred negated-dual-scope tests nested subs registered
    // on the sub: hop 0 evaluates here (its descent path already walks
    // the nested _nts fields); deeper hops keep riding up.
    qb.pendingNegTests.foreach { case (nt, hops) =>
      if (hops == 0) negTests += nt else negDefer += ((nt, hops))
    }
    qb.pendingNegTests.clear()
    if (negate && carried.nonEmpty) throw new UnsupportedOperationException(
      "NOT EXISTS / notin cannot carry multi-level _parent correlation " +
      "through an intermediate scope")
    if (negate && negDefer.nonEmpty) throw new UnsupportedOperationException(
      "NOT EXISTS / notin cannot defer a negated dual-scope test past an " +
        "intermediate scope")
    if (nonEquis.nonEmpty && carried.nonEmpty)
      throw new UnsupportedOperationException(
        "Non-equi correlation cannot combine with multi-level carries")
    if (negTests.nonEmpty && (carried.nonEmpty || nonEquis.nonEmpty))
      throw new UnsupportedOperationException(
        "A negated dual-scope subquery cannot combine with other carried " +
        "or non-equi correlation in the same exists")
    if (negDefer.nonEmpty && (negTests.nonEmpty || carried.nonEmpty ||
        nonEquis.nonEmpty))
      throw new UnsupportedOperationException(
        "A deferred dual-scope test cannot combine with tests, carries or " +
          "non-equi correlation landing at this scope in the same exists")
    existsSpecs += ExistsSpec(qb, pairs.toSeq, residual.reduceOption(_ && _),
      flag, carried.toSeq,
      reduceCol = if (nonEquis.size == 1) Some(nonEquis.head._3) else None,
      tupleSpecs = if (nonEquis.size >= 2)
        nonEquis.toSeq.map { case (op, _, sc) => (op, sc) } else Nil,
      // deferred tests ride along so the flag frame collects their
      // descent-path heads (nested _nts / leaf _ts arrays) per sub
      // row; only hop-0 tests contribute to THIS scope's predicate
      negTests = negTests.toSeq ++ negDefer.map(_._1))
    // re-register deferred tests one scope up: descending from the
    // NEXT frame's rows, the first step is this spec's collected array
    negDefer.foreach { case (nt, hops) =>
      pendingNegTests += ((nt.copy(path = s"${flag}_nts" +: nt.path),
        hops - 1))
    }
    // ∃ sub row whose every hoisted negated sub is witness-free,
    // recursively: a test with a descent path first walks the nested
    // `_nts` arrays (one exists HOF per level — correlation deeper
    // than the grandparent), then runs the leaf witness-free test.
    // Inner: a null tuple array (no inner rows for that sub row)
    // or an all-null HOF result (null outer column — SQL unknown)
    // coalesces to "no witness" = the ¬∃ is TRUE; outer: a missing
    // equi-group (null _nts, or a null nested array: no rows one
    // level down) coalesces to EXISTS = false, like SQL
    def negPredicate(tests: Seq[NegTest], row: Column): Column = {
      val (leaves, deeper) = tests.partition(_.path.isEmpty)
      val leafConds = leaves.map { nt =>
        !coalesce(exists(row.getField(s"${nt.flag}_ts"), t =>
          nt.tests.map { case (op, side, i) =>
            val tv = t.getField(s"t$i")
            // Left: outer-scope column, resolvable here; Right: an
            // enclosing-sub value riding the carried struct
            val pc = side.fold(identity, f => row.getField(f))
            op match {
              case "=" => pc === tv
              case "!=" => pc =!= tv
              case ">" => pc > tv
              case ">=" => pc >= tv
              case "<" => pc < tv
              case "<=" => pc <= tv
            }
          }.reduce(_ && _)), lit(false))
      }
      val deepConds = deeper.groupBy(_.path.head).toSeq.sortBy(_._1)
        .map { case (h, ts) =>
          coalesce(exists(row.getField(h), r2 =>
            negPredicate(ts.map(t => t.copy(path = t.path.tail)), r2)),
            lit(false))
        }
      (leafConds ++ deepConds).reduce(_ && _)
    }
    val c =
      if (negDefer.nonEmpty) {
        // every test of this exists lands higher: undecidable here —
        // contribute no filter; the landing scope walks the chain
        // (a sub row group missing at ANY level reads false there)
        lit(true)
      } else if (negTests.nonEmpty) {
        coalesce(exists(col(s"${flag}_nts"), row =>
          negPredicate(negTests.toSeq, row)), lit(false))
      }
      else if (nonEquis.isEmpty) col(flag).isNotNull
      else if (nonEquis.size == 1) {
        val (op, pc, _) = nonEquis.head
        val (mn, mx) = (col(s"${flag}_mn"), col(s"${flag}_mx"))
        val cmp = op match {
          case ">" => pc > mn
          case ">=" => pc >= mn
          case "<" => pc < mx
          case "<=" => pc <= mx
          case "!=" => (mn =!= pc) || (mx =!= pc)
        }
        // two-valued: an outer row with no equi-group (null extremes)
        // must read EXISTS=false, and NOT EXISTS of it true
        coalesce(cmp, lit(false))
      } else {
        // joint satisfaction: some carried tuple passes ALL conjuncts
        val cmp = exists(col(s"${flag}_ts"), t =>
          nonEquis.zipWithIndex.map { case ((op, pc, _), i) =>
            val tv = t.getField(s"t$i")
            op match {
              case ">" => pc > tv
              case ">=" => pc >= tv
              case "<" => pc < tv
              case "<=" => pc <= tv
              case "!=" => pc =!= tv
            }
          }.reduce(_ && _))
        // null-dim tuples are dropped frame-side; a null parent value
        // or empty/missing group reads EXISTS=false, like SQL
        coalesce(cmp, lit(false))
      }
    // pulled-up r-independent conjuncts AND with the exists result at
    // THIS scope (inside the negation: ¬∃r(C∧K) = ¬(∃rC ∧ K))
    val full = (c +: pulledUp.toSeq).reduce(_ && _)
    CCol(if (negate) !full else full)
  }

  /** Hoist a `(not (exists …))` / `(not (in …))` / `(notin …)`
    * conjunct of an enclosing sub that references BOTH that sub
    * (equi-correlation, scope 1 from the inner sub) and the outer
    * scope above it (comparisons at scope 2) — the complement-set
    * shape the carry machinery cannot express as equality pairs.
    *
    * The inner sub reduces, per enclosing-scope equi-group, to the
    * DISTINCT tuples of its outer-compared columns — the existing
    * [[ExistsSpec.tupleSpecs]] flag-frame machinery, registered on the
    * enclosing sub's own builder so `<flag>_ts` rides its frame (one
    * bounded array per sub row, null when the group is empty). The
    * "no tuple satisfies" test runs at the OUTER scope through the
    * enclosing spec's [[ExistsSpec.negTests]]. Returns that spec
    * entry: (inner flag, (op, outer column) tests).
    *
    * NON-equi correlation to the own parent (round 12b) cannot become
    * a group key; instead the compared sub column rides the tuple as
    * an extra dim and the enclosing-sub value rides the carried
    * `__nrow` struct ([[NegTest.rowCols]]), tested together in the
    * nested HOF. With no equi pair at all the inner flag frame
    * degrades to ONE global tuple set (broadcast single-row join) —
    * fine when the distinct compared tuples are bounded, documented
    * here because nothing prunes it.
    *
    * Outer refs DEEPER than the grandparent (round 14): the tests
    * cannot evaluate at the scope compiling the enclosing exists —
    * the compared columns live higher. The returned hop count tells
    * [[existsSubquery]] how many scopes to defer: each deferral nests
    * the collected `_nts` array through the next flag frame (the test
    * rides [[QueryBuilder.pendingNegTests]] with its descent path
    * growing one field per level) until the landing scope runs the
    * witness-free test through one nested `exists` HOF per level.
    *
    * Scale shape: same contract as tupleSpecs — array sizes bounded by
    * distinct compared-value tuples per group, all joins equi, no
    * row-explosion (the outer flag frame groups before joining).
    * Restrictions (loud): every outer comparison in one negated sub
    * must target the SAME outer scope (a mixed-depth test would need
    * intermediate-frame columns inside the landing scope's HOF), and
    * the negated sub may not itself nest further subqueries. */
  private def hoistNegatedSub(qb: QueryBuilder, fromAst: Ast,
      lhsAst: Option[Ast], args: Args): (NegTest, Int) = {
    val isub = qb.compile(fromAst, args) match {
      case s: CSub => s
      case other => throw new IllegalArgumentException(
        s"Expected sub-select, got $other")
    }
    val iqb = isub.qb
    val flag = s"__nexists_${root.existsCounter.getAndIncrement()}"
    val pairs = mutable.Buffer[(Column, Column)]()
    val residual = mutable.Buffer[Column]()
    val outerTests = mutable.Buffer[(String, Column, Column, Int)]()
    val innerTests = mutable.Buffer[(String, Column, Column)]()
    lhsAst.foreach { l =>
      if (topDepth(l) != 0) throw new UnsupportedOperationException(
        "notin with a _parent-referencing left side cannot combine with " +
          "outer-scope correlation inside the sub")
      require(isub.selectAsts.size == 1,
        "(in x (from ...)) requires exactly one selected column")
      pairs += ((qb.one(qb.compile(l, args)),
        iqb.one(iqb.compile(isub.selectAsts.head, args))))
    }
    conjuncts(isub.whereAsts).foreach { c =>
      if (topDepth(c) == 0) {
        if (escapesScope(c, 0)) throw new UnsupportedOperationException(
          "a subquery nested inside a negated dual-scope subquery cannot " +
            s"reference outer scopes: $c")
        residual += iqb.one(iqb.compile(c, args))
      } else c match {
        case Ast.Node(Seq(Word(op), a, b))
            if Set("=", "!=", ">", ">=", "<", "<=")(op) &&
              (topDepth(a) >= 1) != (topDepth(b) >= 1) =>
          val (pSide, sSide) = if (topDepth(a) >= 1) (a, b) else (b, a)
          val normOp = if (topDepth(a) >= 1) op else flip(op)
          val pc = iqb.one(iqb.compile(pSide, args))
          val sc = iqb.one(iqb.compile(sSide, args))
          topDepth(pSide) match {
            case 1 if op == "=" => pairs += ((pc, sc))
            case 1 =>
              // non-equi to the own parent: the sub column becomes a
              // tuple dim, the parent value a carried-struct field
              innerTests += ((normOp, pc, sc))
            case d => outerTests += ((normOp, pc, sc, d))
          }
        case _ => throw new UnsupportedOperationException(
          "Only equi or single-comparison correlation against _parent is " +
            s"supported in exists/in, got: $c")
      }
    }
    if (iqb.pendingCarries.nonEmpty || iqb.pendingNegTests.nonEmpty) {
      iqb.pendingCarries.clear()
      iqb.pendingNegTests.clear()
      throw new UnsupportedOperationException(
        "NOT EXISTS / notin cannot carry correlation deeper than the " +
          "grandparent scope")
    }
    if (outerTests.isEmpty) throw new UnsupportedOperationException(
      "negated dual-scope subquery found no supported outer-scope comparison")
    val depths = outerTests.map(_._4).distinct
    if (depths.size > 1) throw new UnsupportedOperationException(
      "outer comparisons in one negated subquery must target a single " +
        s"outer scope, got depths ${depths.sorted.mkString(", ")}")
    // tuple dims: outer-compared columns first, then own-parent
    // non-equi-compared columns — both reduced to their distinct
    // tuples per equi-group by the tupleSpecs machinery
    val dims = outerTests.toSeq.map { case (op, _, sc, _) => (op, sc) } ++
      innerTests.toSeq.map { case (op, _, sc) => (op, sc) }
    qb.existsSpecs += ExistsSpec(iqb, pairs.toSeq,
      residual.reduceOption(_ && _), flag,
      tupleSpecs = dims)
    (NegTest(flag,
      outerTests.toSeq.zipWithIndex.map { case ((op, pc, _, _), i) =>
        (op, Left(pc): Either[Column, String], i) } ++
      innerTests.toSeq.zipWithIndex.map { case ((op, _, _), j) =>
        (op, Right(s"${flag}_p$j"): Either[Column, String],
          outerTests.size + j) },
      rowCols = innerTests.toSeq.zipWithIndex.map { case ((_, pc, _), j) =>
        (s"${flag}_p$j", pc) }),
      depths.head - 2)
  }

  private def inSubquery(lhs: Column, sub: CSub, negate: Boolean, args: Args): CV = {
    require(sub.selectAsts.size == 1,
      "(in x (from ...)) requires exactly one selected column")
    val subCol = sub.qb.one(sub.qb.compile(sub.selectAsts.head, args))
    existsSubquery(sub, Some((lhs, subCol)), negate, args)
  }

  // ----------------------------------------------------------- the frame

  /** Base aliases referenced by this builder's base columns. For the
    * single-alias case this is just the base frame aliased once; the
    * per-column map case (write-filter 'new' pass) is handled by the
    * caller supplying an already-joined frame. */
  def wideFrame(): DataFrame = {
    var df = baseDf()
    for (((lAlias, rTable, lCol, rCol), alias) <- joins) {
      val dim = env.warehouse.read(rTable).as(alias)
      df = df.join(dim, col(s"$lAlias.$lCol") === col(s"$alias.$rCol"), "left")
    }
    for (spec <- existsSpecs) {
      val sf = spec.sub.subFrame()
      val filtered = spec.residual.map(sf.filter).getOrElse(sf)
      if (spec.negTests.nonEmpty) {
        // hoisted negated dual-scope subqueries: the sub frame already
        // carries one `<inner>_ts` tuple array per sub row (the inner
        // specs joined during subFrame()); collect one struct of those
        // arrays per sub row into `<flag>_nts` per equi-group. The
        // groupBy keeps the flag join 1:1 with the outer keys — no
        // fan-out — and the predicate's nested HOFs run the
        // witness-free tests at the outer scope.
        val keyNames = spec.pairs.indices.map(i => s"${spec.flag}_k$i")
        // a leaf test (empty path) carries its tuple array + captured
        // parent values; a deferred test carries the nested `_nts`
        // array its descent path enters next — deduped by field name
        // (several tests may defer through the same nested spec)
        val rowFields: Seq[(String, Column)] = spec.negTests.flatMap { nt =>
          if (nt.path.isEmpty)
            (s"${nt.flag}_ts" -> col(s"${nt.flag}_ts")) +: nt.rowCols
          else Seq(nt.path.head -> col(nt.path.head))
        }.distinctBy(_._1)
        val rowStruct = struct(rowFields.map { case (n, c) => c.as(n) }: _*)
        val sel = spec.pairs.zip(keyNames).map { case ((_, s), n) =>
          s.as(n) } :+ rowStruct.as("__nrow")
        val tf = filtered.select(sel: _*)
        // collect_SET: sub rows carrying byte-equal structs are
        // interchangeable witnesses, so the per-group array is bounded
        // by distinct carried shapes, not sub-row count (a hot outer
        // key with millions of sub rows equi-joined to the same inner
        // group would otherwise collect one entry per sub row)
        val nts = collect_set(col("__nrow")).as(s"${spec.flag}_nts")
        val flagDf =
          if (spec.pairs.isEmpty) tf.agg(nts)
          else tf.groupBy(keyNames.map(col): _*).agg(nts)
        val cond =
          if (spec.pairs.isEmpty) lit(true)
          else spec.pairs.zip(keyNames)
            .map { case ((p, _), n) => p === col(n) }.reduce(_ && _)
        df = df.join(flagDf, cond, "left").drop(keyNames: _*)
      } else if (spec.tupleSpecs.nonEmpty) {
        // 2+ non-equi conjuncts: carry the DISTINCT compared-value
        // tuples per equi-group; the predicate runs an `exists` HOF
        // over them. Array size is bounded by distinct tuples per
        // group — and by the skyline when the ops allow pruning.
        val keyNames = spec.pairs.indices.map(i => s"${spec.flag}_k$i")
        val dimNames = spec.tupleSpecs.indices.map(i => s"t$i")
        val sel = spec.pairs.zip(keyNames).map { case ((_, s), n) => s.as(n) } ++
          spec.tupleSpecs.zip(dimNames).map { case ((_, c), n) => c.as(n) }
        // a null dim satisfies no comparison -> drop before distinct
        var tf = filtered.select(sel: _*).na.drop("any", dimNames).distinct()
        val monotone = Set(">", ">=", "<", "<=")
        if (dimNames.size == 2 && spec.tupleSpecs.forall(t => monotone(t._1))) {
          // skyline prune: tuple u dominates v when u is at least as
          // good in both dims (strictly better in one) — "good" being
          // the direction that satisfies the op (`p < s.c` is easier
          // the bigger s.c). A dominated tuple can never be the only
          // witness, so only the Pareto frontier is collected. Sorted
          // best-first on t0, a tuple survives iff its t1 strictly
          // beats the best t1 of every earlier (t0-better-or-equal)
          // tuple. The window sorts within the same keys the groupBy
          // below shuffles on — one extra in-partition pass, no new
          // shuffle (global sort when uncorrelated: pairs is empty).
          def bigBetter(op: String) = op == "<" || op == "<="
          val Seq(op0, op1) = spec.tupleSpecs.map(_._1)
          val ord0 = if (bigBetter(op0)) col("t0").desc else col("t0").asc
          val ord1 = if (bigBetter(op1)) col("t1").desc else col("t1").asc
          val w = Window.partitionBy(keyNames.map(col): _*).orderBy(ord0, ord1)
            .rowsBetween(Window.unboundedPreceding, -1)
          val (bestPrev, keep) =
            if (bigBetter(op1))
              (max(col("t1")).over(w), (b: Column) => b.isNull || col("t1") > b)
            else
              (min(col("t1")).over(w), (b: Column) => b.isNull || col("t1") < b)
          tf = tf.withColumn("__sky", keep(bestPrev))
            .filter(col("__sky")).drop("__sky")
        }
        val tuplesCol = collect_list(struct(dimNames.map(col): _*))
          .as(s"${spec.flag}_ts")
        val flagDf =
          if (spec.pairs.isEmpty) tf.agg(tuplesCol)
          else tf.groupBy(keyNames.map(col): _*).agg(tuplesCol)
        val cond =
          if (spec.pairs.isEmpty) lit(true)
          else spec.pairs.zip(keyNames)
            .map { case ((p, _), n) => p === col(n) }.reduce(_ && _)
        df = df.join(flagDf, cond, "left").drop(keyNames: _*)
      } else if (spec.reduceCol.isDefined) {
        // non-equi reduction: per-equi-group min/max of the compared
        // sub column; the compile-time predicate reads <flag>_mn/_mx
        val keyNames = spec.pairs.indices.map(i => s"${spec.flag}_k$i")
        val aggs = Seq(min(spec.reduceCol.get).as(s"${spec.flag}_mn"),
          max(spec.reduceCol.get).as(s"${spec.flag}_mx"))
        val flagDf =
          if (spec.pairs.isEmpty) filtered.agg(aggs.head, aggs(1))
          else filtered.groupBy(spec.pairs.zip(keyNames)
              .map { case ((_, s), n) => s.as(n) }: _*)
            .agg(aggs.head, aggs(1))
        val cond =
          if (spec.pairs.isEmpty) lit(true)
          else spec.pairs.zip(keyNames)
            .map { case ((p, _), n) => p === col(n) }.reduce(_ && _)
        df = df.join(flagDf, cond, "left").drop(keyNames: _*)
      } else if (spec.pairs.isEmpty && spec.carried.isEmpty) {
        // uncorrelated EXISTS: one-row flag frame, trivially broadcast
        val flagDf = filtered.limit(1).select(lit(true).as(spec.flag))
        df = df.join(flagDf, lit(true), "left")
      } else {
        val keyNames = spec.pairs.indices.map(i => s"${spec.flag}_k$i")
        val sel = spec.pairs.zip(keyNames).map { case ((_, s), n) => s.as(n) } ++
          spec.carried.map { case (n, c) => c.as(n) }
        val flagDf = filtered.select(sel: _*).distinct()
          .withColumn(spec.flag, lit(true))
        val cond =
          if (spec.pairs.isEmpty) lit(true)
          else spec.pairs.zip(keyNames)
            .map { case ((p, _), n) => p === col(n) }.reduce(_ && _)
        // carried keys stay in the frame: the enclosing scope's flag
        // frame selects them (multi-level hoisting); pair keys are done
        df = df.join(flagDf, cond, "left").drop(keyNames: _*)
      }
    }
    df
  }

  /** The frame for a sub-select scope: its base table + its own joins
    * (+ any nested exists flags). */
  private def subFrame(): DataFrame = wideFrame()

  // --------------------------------------------------------- aggregates

  /** Does this AST contain an aggregate call (tanker
    * expression.py:458-465), after field-env macro expansion? */
  def isAggregate(ast: Ast): Boolean = ast match {
    case Ast.Node(items) =>
      items.headOption.exists {
        case Word(h) => QueryBuilder.aggregateNames(h.toLowerCase)
        case _ => false
      } || items.exists(isAggregate)
    case Word(t) if fieldEnv.contains(t) && !table.has(t) =>
      val desc = fieldEnv(t)
      desc.startsWith("(") && isAggregate(Parser.parse(desc))
    case _ => false
  }
}

object QueryBuilder {
  val aggregateNames: Set[String] =
    Set("avg", "count", "max", "min", "sum", "bool_and", "bool_or", "every")

  def apply(env: Env, table: TableDef, fieldEnv: Map[String, String] = Map(),
      baseAlias: String = null,
      baseRead: Option[() => DataFrame] = None): QueryBuilder = {
    val t = env.registry(table.name)
    val alias = Option(baseAlias).getOrElse(t.name)
    new QueryBuilder(env, t,
      () => baseRead.map(_()).getOrElse(env.warehouse.read(t.name)).as(alias),
      _ => alias, None, fieldEnv)
  }
}

/** Spark literal creation covering the type surface of §1.2. */
object Lit {
  def of(v: Any): Column = v match {
    case d: java.util.Date => lit(new java.sql.Timestamp(d.getTime))
    case other => lit(other)
  }
}

/** sqlite strftime → java.time format pattern translation
  * (tanker/expression.py:170). */
object Strftime {
  private val map = Map(
    'Y' -> "yyyy", 'm' -> "MM", 'd' -> "dd", 'H' -> "HH", 'M' -> "mm",
    'S' -> "ss", 'j' -> "DDD", 'f' -> "SSSSSS", 'e' -> "d",
    'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss")

  def toJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val code = fmt.charAt(i + 1)
        sb.append(map.getOrElse(code,
          throw new IllegalArgumentException(s"Unsupported strftime code %$code")))
        i += 2
      } else if (c.isLetter) { sb.append('\'').append(c).append('\''); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
