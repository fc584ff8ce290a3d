package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway stage-level profiler for the slow bench queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $r")
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    val raw = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    raw.count()
    val banded = Dedup.bandedSignatures(raw, "doc_id", "text", 128, 32, 3)
    val plan = banded.queryExecution.executedPlan.toString
    // show operator tree heads only
    plan.linesIterator.filter(l => l.contains("WholeStageCodegen") ||
      l.contains("HashAggregate") || l.contains("Generate") ||
      l.contains("Exchange") || l.contains("Scan") || l.contains("Project"))
      .take(40).foreach(l => println("[plan] " + l.take(150)))
    t("banded count")(banded.count())
    t("banded count again")(banded.count())
    spark.stop()
  }
}
