package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Par}
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

    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $r")
    }

    val e = Testbed.env(spark, dir)
    val corpus = e.view("documents", Seq("doc_id", "text")).read()
    t("corpus.count")(corpus.count())

    // --- jaccardPairs internals, stage by stage (threshold 0.2) ---
    val threshold = 0.2
    val maxDf = 1000
    val docsH = Par.spread(corpus).select(col("doc_id").as("__id"),
      Dedup.shingleHashes(col("text"), 3).as("__hs")).cache()
    t("docsH materialize")(docsH.count())
    val posting = docsH.select(col("__id"), explode(col("__hs")).as("__h"),
      size(col("__hs")).as("__sz"))
    t("posting count")(posting.count())
    val dfs = posting.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    val rk = row_number().over(
      Window.partitionBy(col("__id")).orderBy(col("__df"), col("__h")))
    val prefix = posting.join(dfs, Seq("__h"))
      .withColumn("__rk", rk)
      .filter(col("__rk") <=
        col("__sz") - ceil(col("__sz") * threshold - lit(1e-9)) + 1)
      .select(col("__h"), struct(col("__id"), col("__rk"), col("__sz")).as("__m"))
      .cache()
    t("prefix count")(prefix.count())
    val stats = prefix.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"), min(col("__m.__id")).as("__minId")).cache()
    t("stats count")(stats.count())
    val collideRaw = prefix
      .join(stats.filter(col("__n").between(2, maxDf)), Seq("__h"))
      .groupBy(col("__h"))
      .agg(sort_array(collect_list(col("__m"))).as("__ms"))
      .select(explode(expr(
        """flatten(transform(__ms, (x, i) ->
             transform(slice(__ms, i + 2, size(__ms) - i - 1), y ->
               struct(x AS a, y AS b))))""")).as("__p"))
    t("collideRaw count")(collideRaw.count())
    val agg = collideRaw
      .groupBy(col("__p.a.__id").as("idA"), col("__p.b.__id").as("idB"),
        col("__p.a.__sz").as("__szA"), col("__p.b.__sz").as("__szB"))
      .agg(count(lit(1)).as("__c"),
        max(col("__p.a.__rk")).as("__iLast"), max(col("__p.b.__rk")).as("__jLast"))
      .withColumn("__oub", col("__c") +
        least(col("__szA") - col("__iLast"), col("__szB") - col("__jLast")))
      .filter(col("__oub").cast("double") /
        (col("__szA") + col("__szB") - col("__oub")) >= threshold)
      .select(col("idA"), col("idB")).cache()
    t("agg+posfilter count")(agg.count())
    val candIds = agg.select(col("idA").as("__vid"))
      .unionByName(agg.select(col("idB").as("__vid"))).distinct()
    val verify = docsH.withColumnRenamed("__id", "__vid")
      .join(candIds, Seq("__vid"), "left_semi")
    val out = agg
      .join(verify.withColumnRenamed("__vid", "idA")
        .withColumnRenamed("__hs", "__ha"), Seq("idA"))
      .join(verify.withColumnRenamed("__vid", "idB")
        .withColumnRenamed("__hs", "__hb"), Seq("idB"))
      .withColumn("jaccard",
        size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
          size(array_union(col("__ha"), col("__hb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
    t("verify+output count")(out.count())
    t("full query again")(
      out.orderBy(col("idA"), col("idB"))
        .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
