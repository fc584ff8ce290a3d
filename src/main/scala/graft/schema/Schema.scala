package graft.schema

import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Column-type surface of the engine.
  *
  * Mirrors the reference's closed COLUMN_TYPE set
  * (tanker/utils.py:19-32) plus arrays-of-scalars with arbitrary
  * dimension (tanker/table.py:30-41). M2O/O2M are relation types:
  * M2O is a physical FK column, O2M is virtual (join-path only,
  * tanker/table.py:60-61).
  */
sealed trait ColType {
  /** Physical Spark type; None for virtual columns (O2M). */
  def spark: Option[DataType]
  def isRelation: Boolean = false
  /** Declaration string — inverse of [[ColType.parse]]. */
  def decl: String = this match {
    case ColType.BigIntT => "bigint"
    case ColType.IntegerT => "integer"
    case ColType.FloatT => "float"
    case ColType.BoolT => "bool"
    case ColType.VarcharT => "varchar"
    case ColType.DateT => "date"
    case ColType.TimestampT => "timestamp"
    case ColType.TimestampTzT => "timestamptz"
    case ColType.JsonbT => "jsonb"
    case ColType.ByteaT => "bytea"
    case ColType.M2O(t, c, _) => s"m2o $t.$c"
    case ColType.O2M(t, c) => s"o2m $t.$c"
    case ColType.Arr(e, d) => e.decl + ("[]" * d)
  }
}

object ColType {
  case object BigIntT extends ColType { val spark = Some(LongType) }
  case object IntegerT extends ColType { val spark = Some(IntegerType) }
  case object FloatT extends ColType { val spark = Some(DoubleType) }
  case object BoolT extends ColType { val spark = Some(BooleanType) }
  case object VarcharT extends ColType { val spark = Some(StringType) }
  case object DateT extends ColType { val spark = Some(DateType) }
  /** Naive timestamp — session-TZ-free (tanker TIMESTAMP). */
  case object TimestampT extends ColType { val spark = Some(TimestampNTZType) }
  /** TZ-aware timestamp, session pinned UTC (tanker TIMESTAMPTZ). */
  case object TimestampTzT extends ColType { val spark = Some(TimestampType) }
  /** JSON stored as string, accessed via get_json_object. */
  case object JsonbT extends ColType { val spark = Some(StringType) }
  case object ByteaT extends ColType { val spark = Some(BinaryType) }
  /** Many-to-one FK column; physical type = referenced column type. */
  final case class M2O(table: String, col: String, physical: DataType = LongType)
      extends ColType {
    val spark = Some(physical)
    override def isRelation = true
  }
  /** One-to-many virtual column: `o2m other.fkCol` — no storage. */
  final case class O2M(table: String, fkCol: String) extends ColType {
    val spark = None
    override def isRelation = true
  }
  final case class Arr(elem: ColType, dim: Int) extends ColType {
    require(dim >= 1 && !elem.isRelation, "array of relation not supported")
    val spark = Some((1 to dim).foldLeft(elem.spark.get: DataType)((t, _) => ArrayType(t)))
  }

  private val scalars: Map[String, ColType] = Map(
    "bigint" -> BigIntT, "integer" -> IntegerT, "float" -> FloatT,
    "bool" -> BoolT, "varchar" -> VarcharT, "date" -> DateT,
    "timestamp" -> TimestampT, "timestamptz" -> TimestampTzT,
    "jsonb" -> JsonbT, "bytea" -> ByteaT)

  /** Parse a declaration like `varchar`, `integer[][]`, `m2o country.id`,
    * `o2m member.team` (tanker/table.py:17-41). */
  def parse(decl: String): ColType = {
    val s = decl.trim
    val parts = s.split("\\s+", 2)
    parts(0).toLowerCase match {
      case "m2o" =>
        val Array(t, c) = ref(parts, s)
        M2O(t, c)
      case "o2m" =>
        val Array(t, c) = ref(parts, s)
        O2M(t, c)
      case base0 =>
        var base = base0
        var dim = 0
        while (base.endsWith("[]")) { base = base.dropRight(2); dim += 1 }
        val elem = scalars.getOrElse(base,
          throw new IllegalArgumentException(s"Unexpected column type '$decl'"))
        if (dim == 0) elem else Arr(elem, dim)
    }
  }

  private def ref(parts: Array[String], s: String): Array[String] = {
    require(parts.length == 2 && parts(1).contains("."),
      s"Malformed relation column definition '$s'")
    parts(1).split("\\.", 2)
  }
}

/** A single column of a table. `default` is a SQL expression string
  * evaluated at insert time when the column is unmapped
  * (tanker/table.py:56-57, e.g. `current_timestamp`). */
final case class ColumnDef(
    name: String,
    ctype: ColType,
    default: Option[String] = None) {
  def isPhysical: Boolean = ctype.spark.isDefined
  def sparkField: Option[StructField] =
    ctype.spark.map(t => StructField(name, t, nullable = true))
  def fk: Option[(String, String)] = ctype match {
    case ColType.M2O(t, c, _) => Some((t, c))
    case _ => None
  }
}

/** Table metadata: typed columns, mandatory natural key, optional
  * unique constraints / seed values / index kind
  * (tanker/table.py:184-227).
  *
  * `external` marks a read-only table whose data lives at the given
  * parquet path (driver test tables) rather than in the warehouse;
  * such tables get no implicit id.
  */
final case class TableDef(
    name: String,
    columns: Seq[ColumnDef],
    key: Seq[String],
    unique: Seq[Seq[String]] = Nil,
    values: Seq[Map[String, Any]] = Nil,
    useIndex: String = "btree",
    external: Option[String] = None,
    /** >0 = key-hash-bucketed storage: merges rewrite only the buckets
      * their batch keys hash into (the 100-TB write path, SURVEY §4). */
    buckets: Int = 0,
    /** Parquet codec for this table's snapshot files (None = Spark's
      * session default, snappy). `zstd` shrinks a text corpus ~25-35%
      * over snappy for a few % more write CPU — at 100 TB that is the
      * difference between 100 and ~70 TB on disk and on the wire. */
    compression: Option[String] = None,
    /** Write parquet BLOOM FILTERS on the key columns: a point read
      * skips row groups INSIDE the files that dir-level bucket/zone
      * pruning already selected — the sub-file pruning layer for
      * billion-row buckets. */
    bloom: Boolean = false) {
  require(Set("btree", "brin").contains(useIndex.toLowerCase),
    s"Value '$useIndex' not supported for use-index")
  compression.foreach { c =>
    require(Set("none", "uncompressed", "snappy", "gzip", "lzo", "lz4",
      "brotli", "zstd").contains(c.toLowerCase),
      s"Value '$c' not supported for compression")
  }
  key.foreach { k =>
    require(columns.exists(_.name == k), s"Key column '$k' does not exist in '$name'")
  }

  val columnMap: Map[String, ColumnDef] = columns.map(c => c.name -> c).toMap
  def column(n: String): ColumnDef = columnMap.getOrElse(n,
    throw new NoSuchElementException(s"Column '$n' not found in table '$name'"))
  def has(n: String): Boolean = columnMap.contains(n)

  /** Physical columns (everything but O2M virtuals). */
  def physical: Seq[ColumnDef] = columns.filter(_.isPhysical)
  /** Non-id physical columns (tanker `own_columns`, table.py:200-202). */
  def own: Seq[ColumnDef] = physical.filterNot(_.name == "id")

  def sparkSchema: StructType = StructType(physical.flatMap(_.sparkField))

  /** Default view fields: own columns with M2O expanded to the foreign
    * table's key columns (tanker/table.py:247-254). */
  def defaultFields(reg: Registry): Seq[String] = own.flatMap { c =>
    c.ctype match {
      case ColType.M2O(t, _, _) => reg(t).key.map(k => s"${c.name}.$k")
      case _ => Seq(c.name)
    }
  }
}

object TableDef {
  /** Normalize per tanker rules: prepend implicit `id` when absent
    * (table.py:197-199); single-non-id-column tables default their key
    * to that column (table.py:208-215). */
  def normalized(
      name: String,
      columns: Seq[ColumnDef],
      key: Seq[String],
      unique: Seq[Seq[String]] = Nil,
      values: Seq[Map[String, Any]] = Nil,
      useIndex: String = "btree",
      buckets: Int = 0,
      compression: Option[String] = None,
      bloom: Boolean = false): TableDef = {
    val withId =
      if (columns.exists(_.name == "id")) columns
      else ColumnDef("id", ColType.BigIntT) +: columns
    val finalKey =
      if (key.nonEmpty) key
      else {
        val nonId = withId.filter(c => c.name != "id" && c.isPhysical)
        if (nonId.size == 1) Seq(nonId.head.name)
        else throw new IllegalArgumentException(s"No key defined on $name")
      }
    TableDef(name, withId, finalKey, unique, values, useIndex,
      buckets = buckets, compression = compression, bloom = bloom)
  }
}

/** Join hop between two tables, derived from an M2O or O2M column. */
final case class Hop(fromTable: String, viaColumn: String, toTable: String,
    leftCol: String, rightCol: String, m2o: Boolean)

/** Set of table definitions + the relation graph over them.
  * Loaded from YAML (tanker README.md:28-41) or assembled in code.
  */
final class Registry(defs: Seq[TableDef]) extends Serializable {
  val tables: Map[String, TableDef] = defs.map(t => t.name -> t).toMap
  def apply(name: String): TableDef = tables.getOrElse(name,
    throw new NoSuchElementException(s"Table '$name' not in registry"))
  def has(name: String): Boolean = tables.contains(name)
  def names: Seq[String] = defs.map(_.name)

  /** A registry with one more table (runtime registration — reference
    * ctx.register, tanker/context.py). Re-registering a name replaces
    * the old definition. */
  def extended(td: TableDef): Registry =
    new Registry(defs.filterNot(_.name == td.name) :+ td)

  /** Resolve the hop for a relation column (M2O or O2M) of `table`. */
  def hop(table: String, colName: String): Hop = {
    val col = apply(table).column(colName)
    col.ctype match {
      case ColType.M2O(ft, fc, _) =>
        Hop(table, colName, ft, colName, fc, m2o = true)
      case ColType.O2M(ft, fkCol) =>
        // o2m other.fk: the remote fk column points back at one of our
        // columns (tanker/expression.py:96-101).
        val leftCol = apply(ft).column(fkCol).fk match {
          case Some((_, c)) => c
          case None => "id"
        }
        Hop(table, colName, ft, leftCol, fkCol, m2o = false)
      case _ =>
        throw new IllegalArgumentException(
          s"Column '$colName' of '$table' is not a relation")
    }
  }

  /** All join paths between two tables, BFS over the relation graph,
    * shortest first (tanker/table.py:256-286). */
  def link(src: String, dst: String): Seq[Seq[Hop]] = {
    val paths = scala.collection.mutable.Map[String, Seq[Seq[Hop]]]()
    var wave = Seq(src)
    var continue = true
    while (continue) {
      val newWave = scala.collection.mutable.ArrayBuffer[String]()
      for (tbl <- wave) {
        val existing = paths.getOrElse(tbl, Nil)
        val visited: Set[(String, String)] =
          existing.flatten.map(h => (h.fromTable, h.viaColumn)).toSet
        for (col <- apply(tbl).columns if col.ctype.isRelation) {
          if (!visited.contains((tbl, col.name))) {
            val h = hop(tbl, col.name)
            val extended =
              if (existing.nonEmpty) existing.map(_ :+ h) else Seq(Seq(h))
            paths(h.toTable) = paths.getOrElse(h.toTable, Nil) ++ extended
            newWave += h.toTable
          }
        }
      }
      if (newWave.isEmpty) continue = false else wave = newWave.toSeq
    }
    paths.getOrElse(dst, Nil).sortBy(_.length)
  }
}

object Registry {
  def apply(defs: TableDef*): Registry = new Registry(defs)

  /** Serialize managed table definitions in the reference's YAML
    * schema format (round-trips through [[fromYaml]]) — the warehouse
    * metadata that makes introspection (tanker/context.py:388-569)
    * possible without a database catalog. Seed `values` are omitted:
    * they are data, already written at create time (introspection in
    * the reference does not recover them either). */
  def toYaml(reg: Registry): String = {
    val sb = new StringBuilder
    for (name <- reg.names; td = reg(name) if td.external.isEmpty) {
      sb.append(s"- table: $name\n  columns:\n")
      td.columns.filterNot(_.name == "id").foreach { c =>
        sb.append(s"    ${c.name}: ${c.ctype.decl}\n")
      }
      sb.append(s"  key: [${td.key.mkString(", ")}]\n")
      if (td.unique.nonEmpty)
        sb.append("  unique:\n" + td.unique.map(u =>
          s"    - [${u.mkString(", ")}]\n").mkString)
      val defaults = td.columns.collect {
        case c if c.default.isDefined => s"    ${c.name}: ${c.default.get}\n" }
      if (defaults.nonEmpty) sb.append("  defaults:\n" + defaults.mkString)
      if (td.useIndex != "btree") sb.append(s"  use-index: ${td.useIndex}\n")
      if (td.buckets > 0) sb.append(s"  buckets: ${td.buckets}\n")
      td.compression.foreach(c => sb.append(s"  compression: $c\n"))
      if (td.bloom) sb.append("  bloom: true\n")
    }
    sb.toString
  }

  /** Load a registry from the reference's YAML schema format
    * (tanker/utils.py:44-57, context.py:364-386). `index:` is accepted
    * as an alias for `key:` (context.py:380). */
  def fromYaml(text: String): Registry = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val docs = yaml.load[java.util.List[java.util.Map[String, Object]]](text)
    val defs = docs.asScala.toSeq.map { m =>
      val tm = m.asScala
      val name = tm("table").toString
      val cols = tm("columns").asInstanceOf[java.util.Map[String, Object]]
        .asScala.toSeq.map { case (cn, decl) =>
          ColumnDef(cn, ColType.parse(decl.toString))
        }
      val defaults = tm.get("defaults").map(
        _.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      ).getOrElse(Map())
      val colsWithDefaults = cols.map { c =>
        defaults.get(c.name) match {
          case Some(d) => c.copy(default = Some(d.toString))
          case None => c
        }
      }
      val key = tm.get("key").orElse(tm.get("index")) match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
        case Some(s) => Seq(s.toString)
        case None => Nil
      }
      val unique = tm.get("unique") match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map {
          case u: java.util.List[_] => u.asScala.toSeq.map(_.toString)
          case u => Seq(u.toString)
        }
        case _ => Nil
      }
      val values = tm.get("values") match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map {
          case r: java.util.Map[_, _] =>
            r.asScala.toMap.map { case (k, v) => k.toString -> (v: Any) }
        }
        case _ => Nil
      }
      val useIndex = tm.get("use-index").map(_.toString).getOrElse("btree")
      val buckets = tm.get("buckets").map(_.toString.toInt).getOrElse(0)
      val compression = tm.get("compression").map(_.toString)
      val bloom = tm.get("bloom").exists(_.toString.toBoolean)
      TableDef.normalized(name, colsWithDefaults, key, unique, values, useIndex,
        buckets, compression, bloom)
    }
    // Resolve M2O physical types from the referenced column.
    val byName = defs.map(t => t.name -> t).toMap
    val resolved = defs.map { t =>
      t.copy(columns = t.columns.map { c =>
        c.ctype match {
          case ColType.M2O(ft, fc, _) =>
            val physical = byName.get(ft).flatMap(_.columnMap.get(fc))
              .flatMap(_.ctype.spark).getOrElse(LongType)
            c.copy(ctype = ColType.M2O(ft, fc, physical))
          case _ => c
        }
      })
    }
    new Registry(resolved)
  }
}
