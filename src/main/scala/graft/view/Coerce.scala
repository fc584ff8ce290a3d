package graft.view

import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Driver-side value sanitization for the write path: converts user
  * inputs (JVM scalars, java.time values, strings in the reference's
  * accepted formats, nested Seqs for arrays) into the exact JVM shapes
  * Spark's row encoder expects for each DataType.
  *
  * Mirrors the reference's `Column.format` (tanker/table.py:100-178)
  * and its string time formats (tanker/utils.py:94-111):
  * `%Y-%m-%d %H:%M:%S` / `%Y-%m-%dT%H:%M:%S` (+`%z` for tz-aware),
  * `%Y-%m-%d` for dates. Fractional seconds are additionally accepted
  * (ISO), a superset that loses nothing.
  */
object Coerce {

  private val tsFmts = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS]"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]"))

  private def parseLocal(s: String): LocalDateTime = {
    tsFmts.foreach { f =>
      try return LocalDateTime.parse(s, f) catch { case _: Exception => }
    }
    try return LocalDate.parse(s).atStartOfDay()
    catch { case _: Exception => }
    throw new IllegalArgumentException(s"""Unable to parse "$s" as timestamp""")
  }

  // offset forms: +01:00 (ISO), +0100 / +01 (python %z)
  private val tzFmts = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]XXX"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]X"))

  private def parseInstant(s: String): Instant = {
    // accept the reference's space-separated form by normalizing to 'T'
    val isoish = if (s.length > 10 && s.charAt(10) == ' ') s.updated(10, 'T') else s
    try return OffsetDateTime.parse(isoish).toInstant catch { case _: Exception => }
    tzFmts.foreach { f =>
      try return OffsetDateTime.parse(isoish, f).toInstant
      catch { case _: Exception => }
    }
    try return Instant.parse(isoish) catch { case _: Exception => }
    // naive string: interpret in UTC (session TZ is pinned UTC)
    parseLocal(s).toInstant(ZoneOffset.UTC)
  }

  /** Coerce one value to the JVM shape expected for `dt` in a Spark Row. */
  def to(value: Any, dt: DataType): Any = value match {
    case null => null
    case None => null
    case Some(v) => to(v, dt)
    case _ => dt match {
      case LongType => value match {
        case n: Number => n.longValue()
        case s: String => s.trim.toLong
        case b: Boolean => if (b) 1L else 0L
        case other => fail(other, dt)
      }
      case IntegerType => value match {
        case n: Number => n.intValue()
        case s: String => s.trim.toInt
        case b: Boolean => if (b) 1 else 0
        case other => fail(other, dt)
      }
      case DoubleType => value match {
        case n: Number => n.doubleValue()
        case s: String => s.trim.toDouble
        case other => fail(other, dt)
      }
      case FloatType => value match {
        case n: Number => n.floatValue()
        case s: String => s.trim.toFloat
        case other => fail(other, dt)
      }
      case BooleanType => value match {
        case b: Boolean => b
        case n: Number => n.doubleValue() != 0.0
        case s: String => s.trim.toLowerCase match {
          case "true" | "t" | "1" => true
          case "false" | "f" | "0" => false
          case other => fail(other, dt)
        }
        case other => fail(other, dt)
      }
      case StringType => value match {
        case s: String => s
        // JSONB columns surface as StringType: serialize maps/seqs
        case m: Map[_, _] => Json.write(m)
        case m: java.util.Map[_, _] => Json.write(m.asScala.toMap)
        case s: Seq[_] => Json.write(s)
        case other => String.valueOf(other)
      }
      case DateType => value match {
        case d: java.sql.Date => d.toLocalDate
        case d: LocalDate => d
        case d: java.util.Date => d.toInstant.atZone(ZoneOffset.UTC).toLocalDate
        case s: String => LocalDate.parse(s.trim)
        case other => fail(other, dt)
      }
      case TimestampNTZType => value match {
        case t: LocalDateTime => t
        case t: java.sql.Timestamp => t.toLocalDateTime
        case d: LocalDate => d.atStartOfDay()
        case d: java.util.Date => LocalDateTime.ofInstant(d.toInstant, ZoneOffset.UTC)
        case i: Instant => LocalDateTime.ofInstant(i, ZoneOffset.UTC)
        case s: String => parseLocal(s.trim)
        case other => fail(other, dt)
      }
      case TimestampType => value match {
        case i: Instant => i
        case t: java.sql.Timestamp => t.toInstant
        case t: LocalDateTime => t.toInstant(ZoneOffset.UTC)
        case d: java.util.Date => d.toInstant
        case o: OffsetDateTime => o.toInstant
        case s: String => parseInstant(s.trim)
        case other => fail(other, dt)
      }
      case BinaryType => value match {
        case b: Array[Byte] => b
        case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case other => fail(other, dt)
      }
      case ArrayType(elem, _) => value match {
        case s: Seq[_] => s.map(to(_, elem))
        case a: Array[_] => a.toSeq.map(to(_, elem))
        case l: java.util.List[_] => l.asScala.toSeq.map(to(_, elem))
        case other => fail(other, dt)
      }
      case _ => value
    }
  }

  private def fail(v: Any, dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"""Unexpected value "$v" (${v.getClass.getSimpleName}) for type $dt""")
}

/** Tiny JSON writer for JSONB coercion (tanker/table.py:166-173 uses
  * json.dumps; we only need to emit, never parse — reads go through
  * get_json_object). */
object Json {
  def write(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => write(x)
    case s: String => quote(s)
    case b: Boolean => b.toString
    case n: Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => quote(String.valueOf(k)) + ": " + write(x) }
        .mkString("{", ", ", "}")
    // scala.collection.Seq, not Seq: in 2.13 the default alias is the
    // immutable variant and would stringify Spark's mutable.ArraySeq
    case s: scala.collection.Seq[_] => s.map(write).mkString("[", ", ", "]")
    case a: Array[_] => write(a.toSeq)
    case other => quote(String.valueOf(other))
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
