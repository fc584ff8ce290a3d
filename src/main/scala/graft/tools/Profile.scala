package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.Testbed

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

    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val e = Testbed.env(spark, dir)
    val corpus = e.view("documents", Seq("doc_id", "text")).read()
    t("corpus.count")(corpus.count())

    t("jaccardPairs cold")(
      Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.2)
        .orderBy(col("idA"), col("idB"))
        .write.format("noop").mode("overwrite").save())
    t("jaccardPairs warm")(
      Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.2)
        .orderBy(col("idA"), col("idB"))
        .write.format("noop").mode("overwrite").save())

    t("minhashDedup cold")(
      Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.2)
        .select(col("doc_id"))
        .write.format("noop").mode("overwrite").save())
    t("minhashDedup warm")(
      Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.2)
        .select(col("doc_id"))
        .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
