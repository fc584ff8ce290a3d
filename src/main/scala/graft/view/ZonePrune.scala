package graft.view

import graft.expr.{Args, Ast, Parser}
import graft.schema.TableDef
import graft.store.Brin

/** Extracts conservative per-column key bounds from read filters so
  * brin-table reads can prune zone directories
  * ([[graft.store.Warehouse.readZones]]). Bounds are collected for
  * every zone-tracked column — the full table key plus the surrogate
  * `id` — and a zone must overlap ALL of them to be read.
  *
  * Only shapes that PROVABLY bound a tracked column contribute:
  * top-level conjuncts of the form `(op col literal)` (either operand
  * order) for op in `= < <= > >=`, plus `(in col v1 v2 ...)`,
  * equality-map filters, and NAMED `{param}` values (positional `{}`
  * params are skipped: their cursor position depends on the whole
  * query's compile order, and a mis-resolved bound would prune
  * wrong). Everything else is ignored, which only widens the read —
  * pruning is an IO optimization, the compiled filter still applies
  * in full.
  */
object ZonePrune {

  /** Encoded closed bounds per tracked column; empty map = no usable
    * conjunct (read everything). */
  def bounds(td: TableDef, filters: Seq[Filter], argv: Args)
      : Map[String, Brin.Bounds] = {
    val tracked: Map[String, org.apache.spark.sql.types.DataType] =
      (td.key ++ (if (td.columnMap.contains("id") && !td.key.contains("id"))
        Seq("id") else Nil))
        .flatMap(c => td.columnMap.get(c).flatMap(_.ctype.spark).map(c -> _))
        .toMap
    if (tracked.isEmpty) return Map()
    var acc = Map[String, Brin.Bounds]()

    def tighten(c: String, lo: Option[Any], hi: Option[Any]): Unit =
      acc = acc.updated(c, acc.getOrElse(c, Brin.Bounds.all).tighten(lo, hi))

    def enc(c: String, v: Any): Option[Any] =
      try Option(Coerce.to(v, tracked(c))).map(Brin.encode)
      catch { case _: Exception => None }

    def eq(c: String, v: Any): Unit = v match {
      case null => () // isNull: outside any value range, but not provably empty
      case vs: Iterable[_] =>
        val es = vs.toSeq.map(enc(c, _))
        if (es.nonEmpty && es.forall(_.isDefined)) {
          val sorted = es.flatten.sortWith(Brin.cmp(_, _) < 0)
          tighten(c, Some(sorted.head), Some(sorted.last))
        }
      case other => enc(c, other).foreach(e => tighten(c, Some(e), Some(e)))
    }

    // literal or NAMED param value of an AST operand
    def valueOf(a: Ast): Option[Any] = a match {
      case Ast.Str(s) => Some(s)
      case Ast.Num(n) => Some(n)
      case p: Ast.Param if p.key.nonEmpty && p.key.toIntOption.isEmpty &&
          p.conversion.isEmpty && p.fmtSpec.isEmpty =>
        try Some(argv.resolve(p)) catch { case _: Exception => None }
      case _ => None
    }
    def trackedCol(a: Ast): Option[String] = a match {
      case Ast.Word(w) if tracked.contains(w) => Some(w)
      case _ => None
    }

    def conjuncts(a: Ast): Seq[Ast] = a match {
      case Ast.Node(Ast.Word("and") +: cs) => cs.flatMap(conjuncts)
      case other => Seq(other)
    }

    def visit(a: Ast): Unit = a match {
      case Ast.Node(Seq(Ast.Word(op), l, r))
          if Set("=", "<", "<=", ">", ">=").contains(op) =>
        val hit = trackedCol(l).map(c => (c, valueOf(r), op))
          .orElse(trackedCol(r).map(c => (c, valueOf(l), flip(op))))
        hit.foreach { case (c, v, effOp) =>
          v match {
            case Some(raw) if !raw.isInstanceOf[Iterable[_]] =>
              enc(c, raw).foreach { e =>
                effOp match {
                  case "=" => tighten(c, Some(e), Some(e))
                  // strict ops widen to closed bounds: conservative
                  case ">" | ">=" => tighten(c, Some(e), None)
                  case "<" | "<=" => tighten(c, None, Some(e))
                }
              }
            case _ => ()
          }
        }
      case Ast.Node(Ast.Word("in") +: k +: vs) if vs.nonEmpty =>
        trackedCol(k).foreach { c =>
          // (in col v1 v2 ...) — a named list param expands driver-side
          val raws = vs.map(valueOf)
          if (raws.forall(_.isDefined)) {
            val flat = raws.flatten.flatMap {
              case it: Iterable[_] => it.toSeq
              case one => Seq(one)
            }
            eq(c, flat)
          }
        }
      case _ => ()
    }

    filters.foreach {
      case FilterEq(m) => m.foreach { case (k, v) =>
        if (tracked.contains(k)) eq(k, v)
      }
      case FilterExpr(s) =>
        val ast = try Parser.parse(s) catch { case _: Exception => return Map() }
        conjuncts(ast).foreach(visit)
    }
    acc
  }

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other // "=" symmetric
  }
}
