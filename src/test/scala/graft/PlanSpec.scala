package graft

import org.apache.spark.sql.functions.{col, when}

/** Physical-plan audits: the properties that keep the engine fast at
  * 100 TB — filter pushdown to the parquet scan, column pruning,
  * broadcast joins for small dims, top-k for order+limit, no
  * generator/row-id hazards. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.view("lineitem", Seq("l_orderkey", "l_quantity"))
      .read(Seq("(< l_quantity 5)"))
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,"), p)
  }

  test("column pruning reaches the scan (ReadSchema has only used columns)") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.view("lineitem", Seq("l_orderkey", "l_quantity")).read()
    val p = plan(df)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity") &&
      !read.contains("l_extendedprice"), read)
  }

  test("dotted M2O join broadcasts the small dim side") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.viewNamed("lineitem", Seq(
      "l_orderkey" -> "l_orderkey",
      "priority" -> "l_orderkey.o_orderpriority")).read()
    assert(plan(df).contains("BroadcastHashJoin"), plan(df))
  }

  test("order+limit compiles to TakeOrderedAndProject (top-k, no global sort)") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.view("orders", Seq("o_orderkey", "o_totalprice"))
      .read(order = Seq(view.Order("o_totalprice", "DESC")), limit = Some(10))
    assert(plan(df).contains("TakeOrderedAndProject"), plan(df))
  }

  test("exists plan: single extra join, no row-id, sub side aggregated") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.view("customer", Seq("c_custkey")).read(Seq(
      "(exists (from orders (select 1) (where (= o_custkey _parent.c_custkey))))"))
    val p = plan(df)
    assert(!p.contains("monotonically_increasing_id"), p)
    // the distinct-keys side is hash-aggregated before the join
    assert(p.contains("HashAggregate"), p)
  }

  test("nested + non-equi exists plans: no cartesian or nested-loop joins") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val nested = env.view("customer", Seq("c_custkey")).read(Seq(
      """(exists (from orders (select 1) (where
        |  (and (= o_custkey _parent.c_custkey)
        |       (exists (from lineitem (select 1) (where
        |         (and (= l_orderkey _parent.o_orderkey)
        |              (= l_linenumber _parent._parent.c_nationkey)))))))))""".stripMargin))
    val p1 = plan(nested)
    assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoop"), p1)

    val nonEqui = env.view("customer", Seq("c_custkey")).read(Seq(
      "(exists (from orders (select 1) (where (and (= o_custkey _parent.c_custkey) (> o_totalprice _parent.c_acctbal)))))"))
    val p2 = plan(nonEqui)
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoop"), p2)
    // the reduction side is a per-key aggregate, not the raw sub table
    assert(p2.contains("HashAggregate"), p2)

    // negated dual-scope subquery (round 12): the hoisted tuple carry
    // must keep every join equi — the inner tuple list aggregates per
    // order, the outer flag frame aggregates per customer key, and the
    // witness-free test is HOF-evaluated, never a join condition
    val negDual = env.view("customer", Seq("c_custkey")).read(Seq(
      """(exists (from orders (select 1) (where
        |  (and (= o_custkey _parent.c_custkey)
        |       (not (exists (from lineitem (select 1) (where
        |         (and (= l_orderkey _parent.o_orderkey)
        |              (> l_extendedprice _parent._parent.c_acctbal))))))))))""".stripMargin))
    val p3 = plan(negDual)
    assert(!p3.contains("CartesianProduct") && !p3.contains("BroadcastNestedLoop"), p3)
    assert(p3.contains("collect_list") && p3.contains("HashAggregate") ||
      p3.contains("ObjectHashAggregate"), p3)
    // the outer flag frame dedups interchangeable carried structs
    // (collect_SET), bounding hot keys by distinct shapes
    assert(p3.contains("collect_set"), p3)

    // round 12b: the non-equi own-parent correlation rides tuple +
    // carried struct — still zero non-equi JOINS anywhere in the plan
    val negDualNe = env.view("customer", Seq("c_custkey")).read(Seq(
      """(exists (from orders (select 1) (where
        |  (and (= o_custkey _parent.c_custkey)
        |       (not (exists (from lineitem (select 1) (where
        |         (and (= l_orderkey _parent.o_orderkey)
        |              (> (* l_quantity 2000) _parent.o_totalprice)
        |              (> l_extendedprice _parent._parent.c_acctbal))))))))))""".stripMargin))
    val p4 = plan(negDualNe)
    assert(!p4.contains("CartesianProduct") && !p4.contains("BroadcastNestedLoop"), p4)
    assert(p4.contains("collect_set"), p4)
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.viewNamed("lineitem", Seq(
      "l_returnflag" -> "l_returnflag", "s" -> "(sum l_quantity)"))
      .read(groupby = Seq("l_returnflag"))
    df.collect() // finalize the AQE plan
    val p = plan(df)
    // whole-stage codegen spans render as "*(n) " prefixes; both the
    // partial and final aggregate must be inside one
    assert(p.contains("*(1) HashAggregate") && p.contains("*(2) HashAggregate"), p)
  }

  test("decontaminate plan: benchmark gram set broadcasts, no corpus shuffle join") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text")).read()
    val bench = docs.filter(col("doc_id") < 10).select(col("text"))
    val p = plan(graft.ops.Text.decontaminate(
      docs, "doc_id", "text", bench, "text", n = 8))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mixture plan: no single-partition window over the corpus") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text", "source")).read()
    val w = docs.select(col("doc_id"), col("source"),
      graft.ops.Text.tokenCount(col("text")).cast("bigint").as("n_tokens"))
    val out = graft.ops.Sample.mixture(w, "doc_id", "n_tokens", "source",
      Map("src0" -> 500L))
    // the two-phase prefix sum's running-sum window is partitioned by
    // (spark_partition_id, source) — groups bounded by one input
    // partition, never the whole corpus through one task. mixture
    // localCheckpoints its result, so audit the plan of an equivalent
    // un-checkpointed build: no SinglePartition exchange anywhere.
    import org.apache.spark.sql.functions.{md5, spark_partition_id, sum}
    val probe = w.repartitionByRange(col("source"), md5(col("doc_id").cast("string")))
      .withColumn("__p", spark_partition_id())
      .withColumn("__cum", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__p"), col("source"))
          .orderBy(md5(col("doc_id").cast("string")))))
    assert(!plan(probe).contains("SinglePartition"), plan(probe))
    assert(rows(out).nonEmpty)
  }

  test("multi-non-equi exists plan: skyline window shares the flag-frame shuffle") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val df = env.view("customer", Seq("c_custkey")).read(Seq(
      """(exists (from orders (select 1) (where
        |  (and (= o_custkey _parent.c_custkey)
        |       (> o_totalprice _parent.c_acctbal)
        |       (< o_orderkey (* _parent.c_custkey 40))))))""".stripMargin))
    val p = plan(df)
    // the skyline prune runs as a Window over the equi-key — sorted
    // WITHIN the partitioning the tuple-collect groupBy needs anyway
    assert(p.contains("Window"), p)
    // exactly two shuffles on the sub side: the distinct's and the
    // regroup-by-key the window+collect share; skyline adds none
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    // outer side joins the tiny flag frame by broadcast, left outer
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("native cosine kernel stays inside whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = org.apache.spark.sql.functions.array(
      (0 until 64).map(i => org.apache.spark.sql.functions.lit(i * 0.01)): _*)
    val p = plan(emb.select(col("vec_id"),
      graft.ops.Similarity.cosine(col("embedding").cast("array<double>"), q).as("c")))
    // "*(n) Project [... vec_cosine(...)]" = the kernel is evaluated
    // inside a whole-stage-codegen span, not via CodegenFallback
    assert("""\*\(\d+\) Project \[[^\n]*vec_cosine""".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("zip_with"), p)
  }

  test("duplicate-span plans: only longs shuffle, no token-level explode") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text")).read()
    val p = plan(graft.ops.Dedup.duplicateSpans(docs, "doc_id", "text", n = 8))
    // every exchange carries (id, gram-hash, pos/span ints) — never the
    // document text; coverage comes from the per-row interval fold, so
    // no second Generate after the gram posexplode and no distinct of
    // exploded token indices
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("text")), p)
    // both Generates are the gram-level posexplode (the gram frame
    // feeds the dup-detection aggregate AND the join back); the old
    // token-level `explode(sequence(pos…))` shape must not return
    assert("Generate explode".r.findAllIn(p).size == 2, p)
    assert(!p.contains("explode(sequence("), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)

    val pt = plan(graft.ops.Dedup.trimDuplicateSpans(docs, "doc_id", "text", n = 8))
    // the apply path adds only the final join of removed-position
    // arrays back to the corpus — still no token-level explode
    assert("Generate explode".r.findAllIn(pt).size == 2, pt)
    assert(!pt.contains("explode(sequence("), pt)
    assert(!pt.contains("CartesianProduct") && !pt.contains("BroadcastNestedLoop"), pt)
  }

  test("lmScore plan: model joined not broadcast-collected, constants broadcast") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text")).read()
    val ref = docs.filter(col("doc_id") < 100).select(col("text"))
    val p = plan(graft.ops.Text.lmScore(docs, "doc_id", "text", ref, "text"))
    // the one-row (T, V) constants frame rides a broadcast nested-loop
    // (a 1-row cross join is the cheap correct shape); the token-count
    // model joins on token — no driver collect anywhere
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("write merge plan: no cartesian products") {
    val env = freshEnv()
    // capture the merge result plan by running a write and checking it
    // executed through joins (the write itself succeeding is the main
    // assertion; a cartesian would throw with crossJoin disabled)
    val before = spark.conf.getOption("spark.sql.crossJoin.enabled")
    env.view("team", Seq("name", "country.name"))
      .write(Seq(Seq("Green", "Holland")), purge = false)
    assert(rows(env.view("team").read()).size == 4)
  }

  test("profile plan: no Expand-node row replication, combinable aggs") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents",
      Seq("doc_id", "lang", "source", "n_chars")).read()
    val p = plan(graft.ops.Profile.columns(docs,
      Seq("lang", "source", "n_chars")))
    // the naive agg(countDistinct(a), countDistinct(b), ...) plans an
    // Expand that replicates every row once per distinct aggregate —
    // the profiler's melt + two-stage groupBy must never produce one
    assert(!p.contains("Expand"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    // histogram: one partial-aggregated count per bin, no sort
    val h = plan(graft.ops.Profile.histogram(docs, "n_chars", 0, 2000, 20))
    assert(!h.contains("Expand") && !h.contains("Sort "), h)
    // top-k: TakeOrdered over per-value counts, not a global sort
    val t = plan(graft.ops.Profile.topValues(docs, "source", 5))
    assert(t.contains("TakeOrderedAndProject"), t)
  }

  test("corpus diff plan: payloads melt to hashes before the join, no text shuffle") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents",
      Seq("doc_id", "text", "lang", "source", "n_chars")).read()
    val after = docs.filter(col("doc_id") >= 5)
    val p = plan(graft.ops.Diff.diff(docs, after, Seq("doc_id")))
    // every exchange carries (doc_id, xxhash64) — never document text
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("text#")), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("semanticPairs plan: cluster stage shuffles (id, cluster) longs, not vectors") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val emb = env.view("embeddings", Seq("vec_id", "embedding", "label")).read()
    // the candidate-generation stage (what the slot cache
    // materializes) shuffles on the cluster key and must not carry
    // embeddings; vectors only join in for the exact verify of
    // candidate ids
    val keyed = emb.select(col("vec_id").as("__id"), col("label").as("__k"))
    val pc = plan(graft.ops.Dedup.bucketPairs(keyed, Seq("__k"), 100000))
    val clusterExchanges = pc.linesIterator
      .filter(l => l.contains("Exchange") && l.contains("__k")).toSeq
    assert(clusterExchanges.nonEmpty, pc)
    assert(!pc.contains("embedding#"), pc)
    val p = plan(graft.ops.Similarity.semanticPairs(emb, "embedding", "vec_id",
      "label", threshold = 0.95, maxCluster = 100000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("semanticDedupAgainstIndex plan: batch broadcasts, index never shuffles") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val emb = env.view("embeddings", Seq("vec_id", "embedding")).read()
    val dir = java.nio.file.Files.createTempDirectory("semplan").toString
    try {
      graft.ops.Similarity.buildSemanticIndex(emb, "embedding", "vec_id",
        dir, k = 8)
      val batch = emb.filter(col("vec_id") < 4).select(
        (col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      val p = plan(graft.ops.Similarity.semanticDedupAgainstIndex(batch,
        "embedding", "vec_id", dir, 0.95))
      // `__c` has at most k distinct values: a shuffle join on it
      // funnels each cluster's whole membership into one reducer. The
      // small batch side must broadcast so the index side streams
      // through its pruned cluster partitions with no exchange
      assert(p.contains("BroadcastHashJoin"), p)
      val idxExchanges = p.linesIterator
        .filter(l => l.contains("Exchange") && l.contains("__cv")).toSeq
      assert(idxExchanges.isEmpty, p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), p)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("per-stratum selection never windows a full stratum (boundary plan)") {
    // planted skew: 90% of rows in one stratum. The old plan
    // (row_number over Window.partitionBy(strata)) sorts the mega
    // stratum in ONE task; the boundary plan's only windows are
    // grouped by the layout partition stamp, so every window group is
    // bounded by one partition regardless of stratum skew.
    val df = spark.range(0, 2000).select(col("id"),
      when(col("id") % 10 < 9, "mega").otherwise("rest").as("src"),
      (col("id") % 97).cast("double").as("score"))
    val top = graft.ops.Sample.topFractionPerStratum(
      df, Seq("src"), "score", "id", 0.25)
    val p1 = plan(top)
    val win1 = p1.linesIterator.filter(_.contains("Window ")).toSeq
    assert(win1.nonEmpty, p1)
    win1.foreach(l => assert(l.contains("__p#"),
      s"window not partition-stamp-bounded: $l"))
    // and the selection itself is right: exact per-stratum ceil(f*n)
    val kept = top.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("mega" -> 450L, "rest" -> 50L), kept.toString)
    // capPerStratum takes the same boundary path
    val p2 = plan(graft.ops.Sample.capPerStratum(df, Seq("src"), Seq("id"), 5))
    val win2 = p2.linesIterator.filter(_.contains("Window ")).toSeq
    assert(win2.nonEmpty && win2.forall(_.contains("__p#")), p2)
    // scoreBuckets shares the layout machinery: B cuts, one layout
    // pass, still no full-stratum window anywhere
    val p3 = plan(graft.ops.Sample.scoreBuckets(
      df, Seq("src"), "score", "id", Seq(0.25, 0.75)))
    val win3 = p3.linesIterator.filter(_.contains("Window ")).toSeq
    assert(win3.nonEmpty && win3.forall(_.contains("__p#")), p3)
    graft.ops.Sample.releaseLayouts()
  }

  test("decontaminateBloom plan: hinted shuffle-hash verify, no nested loops") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text")).read()
    val bench = docs.filter(col("doc_id") < 10).select(col("text"))
    val p = plan(graft.ops.Text.decontaminateBloom(
      docs, "doc_id", "text", bench, "text", n = 8))
    // the verify join is the hinted shuffle-hash (the bench gram side
    // is by-assumption too big to broadcast — the hint must stick)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("hashEmbed plan: zero shuffles — embedding a corpus is a scan") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text")).read()
    val p = plan(graft.ops.Text.hashEmbed(docs, "text", dims = 64))
    assert(!p.contains("Exchange"), p)
    // and the kernel projection runs inside whole-stage codegen
    assert(p.contains("*(1)"), p)
  }

  test("crawl kernels plan: extract+decode+entropy fuse into one scan stage") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "text")).read()
    // the whole WET chain — charset decode, visible-text extraction,
    // entropy scoring — is one codegen'd projection over the scan:
    // no exchange, no extra stages, scan filter still pushed
    val out = docs.filter(col("doc_id") > 10).select(col("doc_id"),
      graft.ops.Text.charEntropy(graft.ops.Text.htmlToText(
        graft.functions.TextKernels.decodeText(
          org.apache.spark.sql.functions.encode(col("text"), "UTF-8"),
          org.apache.spark.sql.functions.lit("text/html; charset=utf-8"))))
        .as("h"))
    val p = plan(out)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("*(1)"), p)
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id"), p)
  }

  test("filterDomains plan: blocklist broadcasts, no URL strings shuffle") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "source")).read()
      .withColumn("url", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("https://x."),
        col("source"), org.apache.spark.sql.functions.lit(".com/p")))
    val bl = docs.select(org.apache.spark.sql.functions.concat(col("source"),
      org.apache.spark.sql.functions.lit(".com")).as("domain")).distinct()
    val out = graft.ops.Text.filterDomains(docs, "url", "doc_id", bl)
    val p = plan(out)
    // the small normalized blocklist side broadcasts into the
    // suffix equi-join; no cartesian/nested-loop shapes
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // no exchange may carry the url column itself — only the short
    // suffix strings and ids move (the payload never shuffles)
    val exec = out.queryExecution.executedPlan
    val leaky = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.filter(_.name == "url")
    }.flatten
    assert(leaky.isEmpty, s"url payload shuffles: $leaky")
  }

  test("curriculumShards plan: no global window, narrow layout ranks") {
    val env = Testbed.env(spark, "/root/testdata/sf0.001")
    val docs = env.view("documents", Seq("doc_id", "n_chars")).read()
    val out = graft.ops.Sample.curriculumShards(docs, "n_chars", "doc_id", 8)
    // every Window line is grouped by the layout-partition stamp —
    // never an empty partition spec (= one global single-task sort).
    // String audit like the per-stratum test: AQE wrappers hide
    // WindowExec from executedPlan.collect.
    val p = plan(out)
    val wins = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(wins.nonEmpty, p)
    wins.foreach(l => assert(l.contains("__p#"),
      s"window not partition-stamp-bounded: $l"))
    graft.ops.Sample.releaseLayouts()
  }
}
