package graft.view

import graft.expr.{Args, Ast, Parser}
import graft.schema.TableDef
import graft.store.Brin

/** Extracts conservative key bounds from read filters so brin-table
  * reads can prune zone directories ([[graft.store.Warehouse.readZones]]).
  *
  * Only shapes that PROVABLY bound the leading key column contribute:
  * top-level conjuncts of the form `(op key literal)` (either operand
  * order) for op in `= != < <= > >=` — `!=` contributes nothing but is
  * recognized — plus `(in key v1 v2 ...)`, equality-map filters, and
  * NAMED `{param}` values (positional `{}` params are skipped: their
  * cursor position depends on the whole query's compile order, and a
  * mis-resolved bound would prune wrong). Everything else is ignored,
  * which only widens the read — pruning is an IO optimization, the
  * compiled filter still applies in full.
  */
object ZonePrune {

  /** Closed encoded bounds for `td.key.head`, or None when no usable
    * conjunct exists (read everything). */
  def bounds(td: TableDef, filters: Seq[Filter], argv: Args): Option[Brin.Bounds] = {
    val zkey = td.key.head
    val dt = td.columnMap.get(zkey).flatMap(_.ctype.spark).getOrElse(return None)
    var acc = Brin.Bounds.all
    var any = false

    def enc(v: Any): Option[Any] =
      try Option(Coerce.to(v, dt)).map(Brin.encode)
      catch { case _: Exception => None }

    def eq(v: Any): Unit = v match {
      case null => () // isNull: outside any value range, but not provably empty
      case vs: Iterable[_] =>
        val es = vs.toSeq.map(enc)
        if (es.nonEmpty && es.forall(_.isDefined)) {
          val sorted = es.flatten.sortWith(Brin.cmp(_, _) < 0)
          acc = acc.tighten(Some(sorted.head), Some(sorted.last)); any = true
        }
      case other => enc(other).foreach { e =>
        acc = acc.tighten(Some(e), Some(e)); any = true
      }
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
    def isKey(a: Ast): Boolean = a == Ast.Word(zkey)

    def conjuncts(a: Ast): Seq[Ast] = a match {
      case Ast.Node(Ast.Word("and") +: cs) => cs.flatMap(conjuncts)
      case other => Seq(other)
    }

    def visit(a: Ast): Unit = a match {
      case Ast.Node(Seq(Ast.Word(op), l, r))
          if Set("=", "<", "<=", ">", ">=").contains(op) =>
        val (key, v, effOp) =
          if (isKey(l)) (true, valueOf(r), op)
          else if (isKey(r)) (true, valueOf(l), flip(op))
          else (false, None, op)
        if (key) v.foreach { raw =>
          raw match {
            case vs: Iterable[_] => () // list in a comparison: not a bound
            case _ => enc(raw).foreach { e =>
              effOp match {
                case "=" => acc = acc.tighten(Some(e), Some(e)); any = true
                // strict ops widen to closed bounds: conservative
                case ">" | ">=" => acc = acc.tighten(Some(e), None); any = true
                case "<" | "<=" => acc = acc.tighten(None, Some(e)); any = true
              }
            }
          }
        }
      case Ast.Node(Ast.Word("in") +: k +: vs) if isKey(k) && vs.nonEmpty =>
        // (in key v1 v2 ...) — a named list param expands driver-side
        val raws = vs.map(valueOf)
        if (raws.forall(_.isDefined)) {
          val flat = raws.flatten.flatMap {
            case it: Iterable[_] => it.toSeq
            case one => Seq(one)
          }
          eq(flat)
        }
      case _ => ()
    }

    filters.foreach {
      case FilterEq(m) => m.get(zkey).foreach(eq)
      case FilterExpr(s) =>
        val ast = try Parser.parse(s) catch { case _: Exception => return None }
        conjuncts(ast).foreach(visit)
    }
    if (any) Some(acc) else None
  }

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other // "=" symmetric
  }
}
