package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.schema._
import graft.schema.ColType._

/** Registry over the driver's TPC-H-ish parquet test tables
  * (TESTDATA.md), declared as `external` TableDefs so every
  * SparkEntry query exercises the engine's View/QueryBuilder path —
  * dotted M2O paths follow the star-schema FKs, O2M virtuals give the
  * reverse joins.
  */
object Testbed {

  private def cd(name: String, t: ColType): ColumnDef = ColumnDef(name, t)

  def registry(dir: String): Registry = {
    def ext(name: String) = Some(s"$dir/$name.parquet")
    Registry(
      TableDef("region", Seq(
        cd("r_regionkey", IntegerT), cd("r_name", VarcharT),
        cd("nations", O2M("nation", "n_regionkey"))),
        key = Seq("r_regionkey"), external = ext("region")),
      TableDef("nation", Seq(
        cd("n_nationkey", IntegerT), cd("n_name", VarcharT),
        cd("n_regionkey", M2O("region", "r_regionkey", IntegerType)),
        cd("customers", O2M("customer", "c_nationkey")),
        cd("suppliers", O2M("supplier", "s_nationkey"))),
        key = Seq("n_nationkey"), external = ext("nation")),
      TableDef("customer", Seq(
        cd("c_custkey", BigIntT), cd("c_name", VarcharT),
        cd("c_nationkey", M2O("nation", "n_nationkey", IntegerType)),
        cd("c_acctbal", FloatT), cd("c_mktsegment", VarcharT),
        cd("orders", O2M("orders", "o_custkey"))),
        key = Seq("c_custkey"), external = ext("customer")),
      TableDef("supplier", Seq(
        cd("s_suppkey", BigIntT), cd("s_name", VarcharT),
        cd("s_nationkey", M2O("nation", "n_nationkey", IntegerType)),
        cd("s_acctbal", FloatT)),
        key = Seq("s_suppkey"), external = ext("supplier")),
      TableDef("part", Seq(
        cd("p_partkey", BigIntT), cd("p_name", VarcharT),
        cd("p_brand", VarcharT), cd("p_type", VarcharT),
        cd("p_size", IntegerT), cd("p_retailprice", FloatT)),
        key = Seq("p_partkey"), external = ext("part")),
      TableDef("orders", Seq(
        cd("o_orderkey", BigIntT),
        cd("o_custkey", M2O("customer", "c_custkey", LongType)),
        cd("o_orderstatus", VarcharT), cd("o_totalprice", FloatT),
        cd("o_orderdate", TimestampT), cd("o_orderpriority", VarcharT),
        cd("lines", O2M("lineitem", "l_orderkey"))),
        key = Seq("o_orderkey"), external = ext("orders")),
      TableDef("lineitem", Seq(
        cd("l_orderkey", M2O("orders", "o_orderkey", LongType)),
        cd("l_partkey", M2O("part", "p_partkey", LongType)),
        cd("l_suppkey", M2O("supplier", "s_suppkey", LongType)),
        cd("l_linenumber", IntegerT), cd("l_quantity", FloatT),
        cd("l_extendedprice", FloatT), cd("l_discount", FloatT),
        cd("l_tax", FloatT), cd("l_returnflag", VarcharT),
        cd("l_linestatus", VarcharT), cd("l_shipdate", TimestampT)),
        key = Seq("l_orderkey", "l_linenumber"), external = ext("lineitem")),
      TableDef("events", Seq(
        cd("event_id", BigIntT), cd("ts", TimestampT),
        cd("user_id", M2O("customer", "c_custkey", LongType)),
        cd("event_type", VarcharT), cd("value", FloatT),
        cd("props", JsonbT)),
        key = Seq("event_id"), external = ext("events")),
      TableDef("documents", Seq(
        cd("doc_id", BigIntT), cd("text", VarcharT), cd("lang", VarcharT),
        cd("source", VarcharT), cd("n_chars", BigIntT)),
        key = Seq("doc_id"), external = ext("documents")),
      TableDef("embeddings", Seq(
        cd("vec_id", BigIntT), cd("embedding", Arr(FloatT, 1)),
        cd("label", IntegerT)),
        key = Seq("vec_id"), external = ext("embeddings")),
      // Managed scratch tables used by the write/delete round-trip
      // queries and the bench write probe (the only non-external
      // tables in the testbed).
      TableDef.normalized("nation_total", Seq(
        cd("name", VarcharT), cd("total", FloatT), cd("regionkey", IntegerT)),
        key = Seq("name")),
      TableDef.normalized("bench_scratch", Seq(
        cd("code", VarcharT), cd("ts", TimestampT), cd("n", IntegerT),
        cd("x", FloatT)),
        key = Seq("code")),
      // FK-resolution round-trip target: custkey is an M2O into the
      // external customer table, written via dotted fields.
      TableDef.normalized("cust_note", Seq(
        cd("custkey", M2O("customer", "c_custkey", LongType)),
        cd("note", VarcharT)),
        key = Seq("custkey")),
      // Bench probe for the pruned-merge path (key-hash bucketed).
      TableDef.normalized("bench_bucketed", Seq(
        cd("code", VarcharT), cd("x", FloatT)),
        key = Seq("code"), buckets = 64),
      // Bench probe at synthesized sf1 scale (10x row count through
      // the full merge); bucketed like a real big table would be.
      TableDef.normalized("bench_sf1", Seq(
        cd("code", VarcharT), cd("x", FloatT)),
        key = Seq("code"), buckets = 64),
      // BRIN round-trip target: range-clustered zoned snapshots, reads
      // with event_id bounds prune zone dirs driver-side (q36).
      TableDef.normalized("event_archive", Seq(
        cd("event_id", BigIntT), cd("ts", TimestampT),
        cd("event_type", VarcharT), cd("value", FloatT)),
        key = Seq("event_id"), useIndex = "brin"),
      // Compaction round-trip target (warehouse_compact query): three
      // partial merges fragment the manifest across snapshots, then
      // compact() collapses it.
      // Z-order round-trip target (warehouse_zorder query): a
      // composite-key brin table re-clustered on the interleaved key;
      // reads bounded on the SECOND key column go through zone
      // pruning and must stay exact.
      TableDef.normalized("zorder_scratch", Seq(
        cd("event_id", BigIntT), cd("user_id", BigIntT),
        cd("value", FloatT)),
        key = Seq("event_id", "user_id"), useIndex = "brin"),
      TableDef.normalized("compact_scratch", Seq(
        cd("doc_id", BigIntT), cd("text", VarcharT), cd("lang", VarcharT),
        cd("source", VarcharT), cd("n_chars", BigIntT)),
        key = Seq("doc_id"), buckets = 16))
  }

  /** Temp warehouse roots awaiting exit cleanup: ONE shutdown hook
    * over a shared list (a hook per env() call would accumulate one
    * thread per query for the JVM's life). */
  private val scratchRoots =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.io.File]())
  locally {
    sys.addShutdownHook {
      scratchRoots.forEach { f =>
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: Exception => }
      }
    }
  }

  /** Env over the test tables; managed tables live in a fresh temp
    * warehouse so runs are independent (deleted on JVM exit — a
    * Verify/Bench run creates one per query). */
  def env(spark: SparkSession, dir: String): Env = {
    val root = Files.createTempDirectory("graft-testbed-")
    scratchRoots.add(root.toFile)
    Env(spark, registry(dir), root.toString)
  }
}
