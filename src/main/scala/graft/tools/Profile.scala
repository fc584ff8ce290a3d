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
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("PROF_MAXFIELDS", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val raw = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    t("raw.count")(raw.count())
    t("raw.count2")(raw.count())
    val rawHashed = raw.select(col("doc_id").as("__id"),
      explode(Dedup.shingleHashes(col("text"), 3)).as("__h"))
    t("raw explode count")(println("  rows=" + rawHashed.count()))
    t("raw explode count2")(println("  rows=" + rawHashed.count()))

    val e = Testbed.env(spark, dir)
    val corpus = e.view("documents", Seq("doc_id", "text")).read()
    t("corpus.count")(corpus.count())

    // data shape
    val hashed = corpus.select(col("doc_id").as("__id"),
      explode(Dedup.shingleHashes(col("text"), 3)).as("__h"))
    t("explode count")(println("  rows=" + hashed.count()))
    t("explode count2")(println("  rows=" + hashed.count()))
    // agg-count scaling
    for (nh <- Seq(8, 32, 128)) {
      val b = graft.ops.Dedup.bandedSignatures(corpus, "doc_id", "text", nh, math.min(nh, 32), 3)
      t(s"banded nh=$nh cold")(b.write.format("noop").mode("overwrite").save())
      t(s"banded nh=$nh warm")(b.write.format("noop").mode("overwrite").save())
    }

    // sub-stage: signature compute alone (noop), then the partitioned write
    val banded0 = graft.ops.Dedup.bandedSignatures(corpus, "doc_id", "text", 128, 32, 3)
    t("bandedSignatures(noop)")(banded0.write.format("noop").mode("overwrite").save())
    t("bandedSignatures(noop2)")(banded0.write.format("noop").mode("overwrite").save())
    val bp = banded0.withColumn("__bp", pmod(col("__bsig"), lit(256L))).repartition(col("__bp"))
    val wdir = java.nio.file.Files.createTempDirectory("prof-bw").toString
    t("bands write 256 dirs")(bp.write.mode("overwrite").partitionBy("__bp")
      .parquet(new org.apache.hadoop.fs.Path(wdir, "bands").toString))
    val ddir = new org.apache.hadoop.fs.Path(wdir, "docs").toString
    t("docs write")(corpus.select(col("doc_id").as("__id"),
      Dedup.shingleHashes(col("text"), 3).as("__hs"))
      .write.mode("overwrite").parquet(ddir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wdir))

    val idxDir = java.nio.file.Files.createTempDirectory("prof-mhidx").toString
    t("buildMinhashIndex")(
      Dedup.buildMinhashIndex(corpus, "doc_id", "text", idxDir))

    val near = corpus.filter(col("doc_id") < 5).select(
      (col("doc_id") + 5000L).as("doc_id"),
      concat(col("text"), lit(" zzz")).as("text"))
    val fresh = corpus.filter(col("doc_id") >= 5 && col("doc_id") < 10).select(
      (col("doc_id") + 6000L).as("doc_id"),
      concat_ws(" ", reverse(split(col("text"), "\\s+"))).as("text"))
    val batch = near.unionByName(fresh)

    t("dedupAgainstIndex")(
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", idxDir, threshold = 0.5)
        .write.format("noop").mode("overwrite").save())

    // second run: warm codegen
    val idxDir2 = java.nio.file.Files.createTempDirectory("prof-mhidx2").toString
    t("buildMinhashIndex(warm)")(
      Dedup.buildMinhashIndex(corpus, "doc_id", "text", idxDir2))
    t("dedupAgainstIndex(warm)")(
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", idxDir2, threshold = 0.5)
        .write.format("noop").mode("overwrite").save())

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir2))
    spark.stop()
  }
}
