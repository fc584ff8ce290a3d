package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * content-hash, MinHash+LSH, SimHash — all bucketed (candidate pairs
  * come from hash-bucket joins, never an all-pairs product), so each
  * stage is one shuffle keyed on something that stays small at 100 TB.
  */
object Dedup {

  /** One-slot materialization registry for expensive mining
    * intermediates. Returns an EAGER `localCheckpoint` of `df` —
    * computed now, lineage SEVERED — reusing the slot's existing
    * checkpoint when the incoming plan is `sameResult` with the one
    * that produced it (so a session mining the same corpus twice pays
    * once).
    *
    * Why checkpoint instead of `persist`: these frames fan out into
    * many downstream branches (posting/taint/fallback joins), and a
    * cached-but-unmaterialized plan segment gets recomputed by every
    * concurrently-scheduled consumer stage; worse, each consumer
    * carries the full nested lineage (the 128-aggregate signature
    * subplan, several joins deep), which AQE re-optimizes and the SQL
    * CacheManager re-canonicalizes per stage per lookup — measured
    * 15+ seconds of pure DRIVER time on the minhash miner at sf0.1.
    * After the checkpoint, downstream plans see one leaf.
    *
    * Replaced checkpoints are reclaimed by the ContextCleaner once
    * unreferenced (RDD persists are weakly tracked, unlike SQL cache
    * entries). At cluster scale a long pipeline would land these in a
    * real intermediate table instead; the reuse window here is one
    * driver session.
    *
    * INVARIANT: slot plans must read IMMUTABLE paths. Reuse keys on
    * plan `sameResult`, and a materialized slot can never refresh — if
    * the files under a canonically-equal plan mutated, the slot would
    * serve stale data. Current call sites honor this: snapshot paths
    * change on every write, and index probes construct a fresh
    * FileIndex (distinct plan) per `spark.read`.
    *
    * CLUSTER MODE — `spark.graft.scratchDir`: when set, slots
    * materialize as parquet under that directory (write + read-back)
    * instead of `localCheckpoint`. A localCheckpoint lives in
    * executor-local block storage with NO lineage to recompute from —
    * one lost executor kills the whole mining job; the scratch table
    * survives executor loss, spills to durable storage, and is exactly
    * the "land intermediates in a real table" shape a 100-TB pipeline
    * wants. Scratch dirs are reclaimed by [[clearMaterializedSlots]]. */
  private[ops] def cacheSwap(
      slot: java.util.concurrent.atomic.AtomicReference[
        (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)],
      df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val prev = slot.get()
    if ((prev ne null) && prev._1.sameResult(plan)) prev._2
    else {
      val spark = df.sparkSession
      val cp = spark.conf.getOption("spark.graft.scratchDir") match {
        case Some(dir) =>
          val path = dir.stripSuffix("/") +
            s"/slot-${java.util.UUID.randomUUID().toString.take(12)}"
          df.write.mode("overwrite").parquet(path)
          scratchPaths.synchronized { scratchPaths += path }
          // explicit schema: a zero-row intermediate writes no part
          // files, and downstream still needs the columns
          spark.read.schema(df.schema).parquet(path)
        case None => df.localCheckpoint()
      }
      // CAS so concurrent callers can't interleave get-then-set; if
      // another thread won the race, its entry stays (both
      // materializations are valid — ours is still returned for this
      // caller's use)
      slot.compareAndSet(prev, (plan, cp))
      cp
    }
  }

  /** Scratch dirs written by [[cacheSwap]] in scratchDir mode, pending
    * reclamation. */
  private val scratchPaths = scala.collection.mutable.ArrayBuffer[String]()
  private[ops] type Slot = java.util.concurrent.atomic.AtomicReference[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]
  private val allSlots = scala.collection.mutable.ArrayBuffer[Slot]()
  private[ops] def newSlot(): Slot = {
    val s = new java.util.concurrent.atomic.AtomicReference[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)](null)
    allSlots.synchronized { allSlots += s }
    s
  }
  /** Drop every materialized mining intermediate (all [[cacheSwap]]
    * slots, across ops). The checkpoint blocks themselves are then
    * reclaimable — by the GC-driven ContextCleaner, or eagerly by a
    * caller sweeping `sparkContext.getPersistentRDDs`. Harness hygiene
    * for multi-query drivers (Verify/Bench): NEVER sweep persistent
    * RDDs without calling this first — a slot still referencing a
    * swept checkpoint serves a frame whose blocks are gone
    * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), because a localCheckpoint
    * has no lineage to recompute from. */
  def clearMaterializedSlots(): Unit = {
    allSlots.synchronized { allSlots.foreach(_.set(null)) }
    // reclaim scratch-mode spill dirs (same safe-point contract as the
    // checkpoint sweep: no un-materialized frame may still reference
    // them). Needs an active session for the Hadoop conf; without one
    // the dirs stay until the next call from a live session.
    val session = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    scratchPaths.synchronized {
      session.foreach { s =>
        val conf = s.sparkContext.hadoopConfiguration
        scratchPaths.foreach { p =>
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(conf).delete(hp, true): Unit
          } catch { case _: Exception => () }
        }
        scratchPaths.clear()
      }
    }
  }
  private val minhashPairsSlot = newSlot()
  private val simhashSlot = newSlot()
  private val crossDedupSlot = newSlot()
  private val jaccardPairsSlot = newSlot()
  private val jaccardDocsSlot = newSlot()
  private val minhashDocsSlot = newSlot()
  private val minhashVerifySlot = newSlot()
  private val crossVerifySlot = newSlot()
  private val crossCandsSlot = newSlot()
  private val verifyLeftSlot = newSlot()
  private val verifyRightSlot = newSlot()

  /** Exact dedup on a set of columns: keeps the row with the smallest
    * `idCol` per group. One hash-partition shuffle. */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(cols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Content-hash dedup: like [[exact]] but shuffles a 64-bit
    * fingerprint instead of the full text — at 100 TB the shuffle
    * payload is the winner. (Hash collisions: 64-bit, ~1e-9 at 1e9
    * docs; acceptable for training-data dedup.) */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    Par.spread(df).withColumn("__fp", Text.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__fp")
  }

  /** Word n-gram shingle set (distinct) of a text column. The token
    * array is let-bound ([[Hof.bind]]) so the per-gram lambda reads a
    * variable instead of re-running `split` per gram (O(L²) per doc
    * interpreted otherwise). */
  def shingles(text: Column, n: Int = 3): Column =
    Hof.bind(split(lower(trim(text)), "\\s+"), toks => {
      val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      array_distinct(grams)
    })

  /** 64-bit hashes of the word n-gram shingle set — one xxhash64 per
    * gram (single concat argument: measured 2.3x faster than hashing
    * the n token columns separately). Downstream signature/verify work
    * only needs set identity, so longs replace gram strings. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    Hof.bind(split(lower(trim(text)), "\\s+"), toks => {
      val grams = when(size(toks) < n, array(xxhash64(concat_ws(" ", toks))))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      array_distinct(grams)
    })

  /** One row per positional word n-gram: (idCol, __nt tokens in doc,
    * __pos 0-based start, __span covered tokens, __h gram hash); short
    * docs collapse to one whole-doc gram. Shared by the duplicate-span
    * miner and its apply step. */
  private[ops] def spanGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = Hof.bind(toks, t =>
      when(size(t) < n, array(struct(lit(0).as("p"), size(t).as("s"),
          xxhash64(concat_ws(" ", t)).as("h"))))
        .otherwise(transform(sequence(lit(0), size(t) - n), i =>
          struct(i.as("p"), lit(n).as("s"),
            xxhash64(concat_ws(" ", slice(t, i + 1, lit(n)))).as("h")))))
    Par.spread(df)
      .select(col(idCol), size(toks).as("__nt"), explode(grams).as("__g"))
      .select(col(idCol), col("__nt"), col("__g.p").as("__pos"),
        col("__g.s").as("__span"), col("__g.h").as("__h"))
  }

  /** Cross-document duplicate-SPAN coverage — the exact-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better": for each document, how much of it is
    * covered by a word `n`-gram that also occurs in at least one
    * OTHER document of the corpus (within-doc repeats alone do not
    * count — [[Text.repetition]] measures those). Returns one row per
    * document containing ≥1 duplicated gram:
    * (idCol, n_tokens, dup_tokens, dup_frac) where dup_tokens counts
    * distinct token positions covered by any duplicated gram and
    * dup_frac = dup_tokens / n_tokens rounded to 6 places — the
    * "remove or trim docs that are mostly boilerplate" input.
    * Documents shorter than `n` tokens collapse to one whole-text
    * gram spanning the document.
    *
    * Scale shape: the corpus text never shuffles — one posexplode
    * emits (id, pos, gramHash) longs; a gram is duplicated iff
    * `min(id) ≠ max(id)` for its hash (map-side-combinable min/max,
    * NO countDistinct); a doc's duplicated (pos, span) intervals
    * collect per doc (bounded by its own gram count) and the covered
    * token total comes from a per-row sorted interval-merge fold —
    * no token-level explode, no corpus-wide distinct. Two shuffles of
    * longs total (hash groupBy, hash join back). */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    // `g` feeds the dup-gram aggregate AND the join back — the same
    // two-reference shape as [[bucketPairs]]: an explicit repartition
    // on the join key plants ONE exchange that both references share
    // via AQE's ReusedExchange, so the tokenize+hash+explode subplan
    // runs ONCE (it re-ran in full for the join side before — measured
    // ~2x on the 10x-corpus span probe; guide §2.4)
    val g = spanGrams(df, idCol, textCol, n).repartition(col("__h"))
    val dup = g.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .filter(col("__mn") =!= col("__mx")).select(col("__h"))
    g.join(dup, Seq("__h"))
      .groupBy(col(idCol), col("__nt"))
      .agg(collect_list(struct(col("__pos").as("p"), col("__span").as("s")))
        .as("__iv"))
      .select(col(idCol), col("__nt").cast("bigint").as("n_tokens"),
        mergedIntervalLength(col("__iv")).as("dup_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** Total length of the union of half-open (p, s) intervals
    * [p, p+s): sort (struct order = lexicographic, p first), then one
    * sequential fold tracking the merged frontier. */
  private def mergedIntervalLength(ivs: Column): Column =
    Hof.bind(array_sort(ivs), sorted => {
      val acc0 = struct(lit(0).as("end"), lit(0L).as("tot"))
      aggregate(sorted, acc0, (acc, iv) => {
        val e = iv.getField("p") + iv.getField("s")
        val add = when(e > acc.getField("end"),
          e - greatest(iv.getField("p"), acc.getField("end")))
          .otherwise(lit(0))
        struct(greatest(acc.getField("end"), e).as("end"),
          (acc.getField("tot") + add).as("tot"))
      }, acc => acc.getField("tot"))
    })

  /** APPLY the duplicate-span signal: rewrite each document with its
    * cross-document duplicated spans removed, keeping the copy in the
    * LOWEST-id document containing each duplicated gram (Lee et al.
    * keep-one semantics, ownership at document granularity). Trimmed
    * documents come back whitespace-normalized (surviving original-case
    * tokens joined by single spaces; a fully-covered doc becomes the
    * empty string); untouched documents keep their text verbatim.
    * Returns (idCol, textCol) for every input row.
    *
    * Scale shape: same long-only shuffles as [[duplicateSpans]] plus
    * one join of per-doc removed-position arrays (bounded by the doc's
    * own token count, expanded from collected intervals in-row — no
    * token-level explode/distinct shuffle) back to the corpus; the
    * rewrite is a per-row indexed-lambda filter over the token array —
    * no window, no driver-side text. */
  def trimDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    // shared exchange, same reasoning as [[duplicateSpans]]
    val g = spanGrams(df, idCol, textCol, n).repartition(col("__h"))
    // duplicated gram → owning (minimum) doc id; owner keeps its copy
    val dup = g.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__own"), max(col(idCol)).as("__mx"))
      .filter(col("__own") =!= col("__mx"))
      .select(col("__h"), col("__own"))
    val removed = g.join(dup, Seq("__h"))
      .filter(col(idCol) =!= col("__own"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__pos").as("p"), col("__span").as("s")))
        .as("__iv"))
      .select(col(idCol), array_distinct(flatten(transform(col("__iv"),
        iv => sequence(iv.getField("p"),
          iv.getField("p") + iv.getField("s") - 1)))).as("__rm"))
    // reconstruct from ORIGINAL-case tokens (positions align: same \s+
    // split); gram identity above is case-folded, the output is not
    val keep = filter(split(trim(col(textCol)), "\\s+"),
      (_, i) => !array_contains(col("__rm"), i))
    df.join(removed, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__rm").isNull, col(textCol))
          .otherwise(concat_ws(" ", keep)).as(textCol))
  }

  /** Jaccard similarity of the (hashed) shingle sets of two text
    * columns — exact up to 64-bit hash collisions. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    // bind both shingle sets: each is referenced twice (∩ and ∪)
    Hof.bind(shingleHashes(a, n), sa =>
      Hof.bind(shingleHashes(b, n), sb =>
        size(array_intersect(sa, sb)).cast("double") /
          size(array_union(sa, sb))))
  }

  /** Affine permutation coefficients for the MinHash family
    * (seed-fixed, so signatures are deterministic across runs). */
  private def minhashCoefs(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  /** MinHash signature (`numHashes` 64-bit mins) over the shingle set,
    * as a single array column — the same
    * [[graft.functions.MiningKernels.minhashMins]] codegen kernel the
    * bulk mining path uses (r14: previously 128 per-row array lambdas,
    * which overflowed codegen and ran interpreted). */
  def minhashSignature(text: Column, numHashes: Int = 128, shingleSize: Int = 3): Column =
    graft.functions.MiningKernels.minhashMins(
      shingleHashes(text, shingleSize), minhashCoefs(numHashes))

  /** Candidate pairs from LSH buckets, shared by [[minhashPairs]] and
    * [[Similarity.cosinePairs]]. `banded` holds one `__id` per bucket
    * row; `bucketCols` name the bucket key.
    *
    * Normal buckets (2..maxBucket members) emit all in-bucket pairs
    * (sorted ids, so idA < idB). Oversized buckets — a dense cluster
    * of near-identical items collides in EVERY band, so a drop-it
    * policy would silently lose exactly the densest duplicates —
    * degrade to star pairs against the bucket's min id: linear output
    * that still links every member to a canonical representative for
    * dedup. The per-bucket stats aggregate keeps `collect_list`
    * bounded at maxBucket (no unbounded in-memory bucket arrays). */
  private[graft] def bucketPairs(banded0: DataFrame, bucketCols: Seq[String],
      maxBucket: Int): DataFrame = {
    // `banded` is referenced three times below (stats + two joins) but
    // needs no persist: an explicit repartition on the bucket key
    // plants ONE exchange that every reference shares via AQE's
    // ReusedExchange — the signature subplan computes once — and the
    // stats groupBy plus both bucket-key joins then need NO further
    // shuffle (guide §2.4: operations keyed the same way share one
    // exchange). Before r14 the signature pipelines ended in their own
    // aggregation exchange which played this role implicitly; the
    // map-only kernel signatures (see [[bandedSignatures]]) removed
    // it, and without this repartition each reference re-ran the
    // whole scan+signature subplan (measured 3× recompute).
    val keys = bucketCols.map(col)
    val banded = banded0.repartition(keys: _*)
    val stats = banded.groupBy(keys: _*)
      .agg(count(lit(1)).as("__n"), min(col("__id")).as("__min"))
    val small = banded
      .join(stats.filter(col("__n").between(2, maxBucket)), bucketCols)
      .groupBy(keys: _*).agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
             transform(slice(__ids, i + 2, size(__ids) - i - 1), y ->
               struct(x AS a, y AS b))))""")).as("__p"))
      .select(col("__p.a").as("idA"), col("__p.b").as("idB"))
    val big = banded.join(stats.filter(col("__n") > maxBucket), bucketCols)
      .filter(col("__id") =!= col("__min"))
      .select(col("__min").as("idA"), col("__id").as("idB"))
    // defense-in-depth: callers are documented to feed at most one
    // (__id, bucket) row per id, but a duplicate would make sort_array
    // neighbours of the copies and emit a self-pair that then passes
    // any verify stage at similarity 1.0 — drop them here.
    small.unionByName(big).filter(col("idA") =!= col("idB")).distinct()
  }

  /** Exact Jaccard for CANDIDATE pairs via collision counting: the
    * hashes in `__ha`/`__hb` are per-doc distinct, so |A ∩ B| equals
    * the number of hash buckets where the pair collides — one narrow
    * join of the exploded postings plus a combinable `count` per
    * pair, no per-pair `array_intersect`/`array_union` (measured
    * ~2.5x on the minhash verify at sf0.1; the array kernels were
    * the dominant cost of every near-dup verify stage).
    *
    * `pairs` is (idA, idB); `left`/`right` are (idA, __ha) /
    * (idB, __hb) FULL hash-set frames, already restricted to
    * candidate docs by the caller. Hashes hotter than `maxDf` across
    * the candidate postings are excluded from the counting join (a
    * bucket that hot only happens inside a dense near-identical
    * cluster); pairs where BOTH ends carry an excluded hash re-verify
    * on the full arrays, so every emitted value is exact. `ordered`
    * = true when callers guarantee idA < idB (symmetric same-corpus
    * pairs), halving the counting-join volume; bipartite id spaces
    * (cross-corpus dedup) pass false. Requires threshold > 0 (zero-
    * intersection pairs are dropped, not scored). */
  private def verifyPairsByCount(pairs: DataFrame, left: DataFrame,
      right: DataFrame, threshold: Double, maxDf: Int,
      ordered: Boolean, slot: Slot): DataFrame = {
    // Adaptive: for a SMALL checkpointed candidate set the direct
    // array verify is one broadcast join + a per-pair intersect —
    // cheaper than the ~10-stage counting pipeline whose fixed AQE
    // latency dominates at this size. The counting join takes over
    // when candidates are too many to ship arrays for (its volume is
    // bounded by the df cap, not the pair count).
    val nPairs = pairs.count()
    if (nPairs <= 100000)
      return pairs.join(left, Seq("idA")).join(right, Seq("idB"))
        .withColumn("jaccard",
          size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
            size(array_union(col("__ha"), col("__hb"))))
        .filter(col("jaccard") >= threshold)
        .select(col("idA"), col("idB"), col("jaccard"))
    // big-candidate path only: materialize the hash-set frames, which
    // fan out into the posting, taint and fallback branches below
    // (the array path above reads each exactly once)
    val leftCp = cacheSwap(verifyLeftSlot, left)
    val rightCp = cacheSwap(verifyRightSlot, right)
    val pa = leftCp.select(col("idA"), explode(col("__ha")).as("__h"),
      size(col("__ha")).as("__szA"))
    val pb = rightCp.select(col("idB"), explode(col("__hb")).as("__h"),
      size(col("__hb")).as("__szB"))
    // symmetric mode: pa and pb are the same corpus, so counting the
    // union would double every hash's df and silently halve the
    // effective maxDf — count one side only; bipartite mode needs both
    val hot = (if (ordered) pa.select(col("__h"))
               else pa.select(col("__h")).unionAll(pb.select(col("__h"))))
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
    val joined = pa.join(hot, Seq("__h"), "left_anti")
      .join(pb.join(hot, Seq("__h"), "left_anti"), Seq("__h"))
    val cnt = (if (ordered) joined.filter(col("idA") < col("idB")) else joined)
      .groupBy(col("idA"), col("idB"), col("__szA"), col("__szB"))
      .agg(count(lit(1)).as("__i"))
    val taintA = pa.join(hot, Seq("__h"), "left_semi")
      .select(col("idA")).distinct().withColumn("__tA", lit(true))
    val taintB = pb.join(hot, Seq("__h"), "left_semi")
      .select(col("idB")).distinct().withColumn("__tB", lit(true))
    // cached: the clean and dirty branches below both filter this
    // frame — without the cache the counting join runs once per branch
    val marked = cacheSwap(slot, pairs.join(cnt, Seq("idA", "idB"), "left")
      .join(taintA, Seq("idA"), "left").join(taintB, Seq("idB"), "left"))
    val bothTainted = col("__tA").isNotNull && col("__tB").isNotNull
    val clean = marked.filter(!bothTainted).filter(col("__i").isNotNull)
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__szA") + col("__szB") - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
    val dirty = marked.filter(bothTainted).select(col("idA"), col("idB"))
      .join(leftCp, Seq("idA")).join(rightCp, Seq("idB"))
      .withColumn("jaccard",
        size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
          size(array_union(col("__ha"), col("__hb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
    clean.unionByName(dirty)
  }

  /** Candidate near-duplicate pairs via MinHash LSH banding, verified
    * with true n-gram Jaccard. Returns (idA, idB, jaccard) with
    * idA < idB and jaccard >= threshold.
    *
    * Scale shape: explode shingles → one groupBy(id) with 128 simple
    * `min` aggregates (map-side partial combine, codegen-friendly) →
    * explode to numBands rows/doc → shuffle on (band, bandHash) →
    * pairs only within buckets ([[bucketPairs]]: skew-guarded, dense
    * overflow buckets degrade to star pairs) → verify joins on
    * candidate ids only. Never an all-pairs product.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128, numBands: Int = 32,
      shingleSize: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val banded = bandedSignatures(df, idCol, textCol, numHashes, numBands,
      shingleSize)
    // persisted: referenced by the verify join AND by the candidate-id
    // semi-join below — without the cache each reference re-executes
    // the whole mining subplan (Spark plans share no common subtrees)
    val pairs = cacheSwap(minhashPairsSlot,
      bucketPairs(banded, Seq("__band", "__bsig"), maxBucket))
    // verify with true jaccard over per-doc precomputed hash sets,
    // hashed only for docs that appear in a candidate pair (semi-join
    // first): verify cost scales with the candidate set, not the
    // corpus — at 100 TB candidates are a vanishing fraction
    val candIds = pairs.select(col("idA").as(idCol))
      .unionByName(pairs.select(col("idB").as(idCol))).distinct()
    // cached: the count verify references the candidate hash sets from
    // its posting, taint and array-fallback branches
    val docsH = cacheSwap(minhashDocsSlot,
      df.join(candIds, Seq(idCol), "left_semi")
        .select(col(idCol).as("__vid"),
          shingleHashes(col(textCol), shingleSize).as("__hs")))
    verifyPairsByCount(pairs,
      docsH.select(col("__vid").as("idA"), col("__hs").as("__ha")),
      docsH.select(col("__vid").as("idB"), col("__hs").as("__hb")),
      threshold, maxDf = maxBucket, ordered = true, minhashVerifySlot)
  }

  /** Near-dedup: drop every document that is the larger id of a
    * verified near-duplicate pair (greedy canonical-smallest — one
    * anti-join, no connected components needed for dedup purposes). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val doomed = minhashPairs(df, idCol, textCol, threshold)
      .select(col("idB").as(idCol)).distinct()
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** EXACT n-gram Jaccard near-dup pairs — the deterministic
    * complement to [[minhashPairs]] (which trades a ~1e-14 LSH miss
    * probability for corpus-size-independent banding).
    *
    * The Jaccard numerator IS the collision count: shingle hashes are
    * distinct within a doc, so |A ∩ B| equals the number of inverted-
    * index buckets where the pair co-occurs, and
    * `J = i / (szA + szB - i)` is exact with NO array comparison at
    * all. The whole computation is one narrow self-join of the
    * posting list on the shingle hash plus a map-side-combinable
    * `count` per pair — this replaced a PPJoin-style mine-then-
    * array-verify pipeline that spent its time in per-pair
    * `array_intersect`/`array_union` (measured 31.7s → see bench;
    * the positional filter pruned under 2× at low thresholds while
    * the array verify cost ~9μs/row·core).
    *
    * At `threshold >= 0.5` the self-join is first restricted to
    * CANDIDATE DOCS via prefix filtering (SSJoin/AllPairs): order
    * each doc's shingles by global document frequency ascending and
    * index only the first `sz - ceil(t*sz) + 1`; any pair with
    * J >= t must collide inside those prefixes, so docs alone in
    * every prefix bucket can be dropped before the join. The
    * corpus-wide stop-shingles (the df² noise generators) sit in
    * every doc's suffix where they generate no candidates.
    *
    * `maxDf` is a skew guard: shingles with df above it are excluded
    * from the counting join (a bucket that hot only happens inside a
    * dense cluster of near-identical docs, where the TRUE output is
    * itself quadratic). Pairs that may share such a shingle — both
    * ends carry one — fall back to an exact array verify, and
    * oversized buckets additionally contribute star pairs against
    * the canonical member so dense clusters stay linked for dedup.
    *
    * Scale shape: one df join + one hash-partitioned self-join of
    * df-capped postings + one combinable aggregation; the array
    * fallback touches only docs containing >maxDf shingles (none, on
    * healthy corpora). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      maxDf: Int = 1000): DataFrame = {
    // cached: referenced by the posting/df chain and the array verify
    val docsH = cacheSwap(jaccardDocsSlot,
      Par.spread(df).select(col(idCol).as("__id"),
        shingleHashes(col(textCol), shingleSize).as("__hs")))
    val posting = docsH.select(col("__id"), explode(col("__hs")).as("__h"),
      size(col("__hs")).as("__sz"))
    val dfs = posting.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    val withDf = posting.join(dfs, Seq("__h"))
    val normal = withDf.filter(col("__df") <= maxDf)
    // high-threshold regime: drop docs that share no prefix bucket
    // before paying for the self-join. The 1e-9 nudge keeps ceil()
    // exact when t*sz is an integer that float noise pushes up.
    val joinBase = if (threshold >= 0.5) {
      val rk = row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__h")))
      val prefix = normal.withColumn("__rk", rk)
        .filter(col("__rk") <=
          col("__sz") - ceil(col("__sz") * threshold - lit(1e-9)) + 1)
        .select(col("__h"), col("__id"))
      val bs = prefix.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
      val candIds = prefix.join(bs.filter(col("__n") >= 2), Seq("__h"))
        .select(col("__id")).distinct()
      normal.join(candIds, Seq("__id"), "left_semi")
    } else normal
    val cnt = joinBase
      .select(col("__h"), col("__id").as("idA"), col("__sz").as("__szA"))
      .join(joinBase.select(col("__h"), col("__id").as("idB"),
        col("__sz").as("__szB")), Seq("__h"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"), col("__szA"), col("__szB"))
      .agg(count(lit(1)).as("__i"))
    // docs carrying an over-cap shingle: a shared one is invisible to
    // the count above, so pairs with BOTH ends tainted re-verify on
    // the full hash arrays (rare path; empty on healthy corpora)
    val overPost = withDf.filter(col("__df") > maxDf)
    val tainted = overPost.select(col("__id")).distinct()
      .withColumn("__t", lit(true))
    val om = overPost.groupBy(col("__h")).agg(min(col("__id")).as("__minId"))
    val star = overPost.join(om, Seq("__h"))
      .filter(col("__id") =!= col("__minId"))
      .select(col("__minId").as("idA"), col("__id").as("idB")).distinct()
    // cached: clean + dirty branches both filter this frame
    val marked = cacheSwap(jaccardPairsSlot, cnt
      .join(tainted.withColumnRenamed("__id", "idA")
        .withColumnRenamed("__t", "__tA"), Seq("idA"), "left")
      .join(tainted.withColumnRenamed("__id", "idB")
        .withColumnRenamed("__t", "__tB"), Seq("idB"), "left"))
    val bothTainted = col("__tA").isNotNull && col("__tB").isNotNull
    val clean = marked.filter(!bothTainted)
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__szA") + col("__szB") - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
    val dirtyCand = marked.filter(bothTainted)
      .select(col("idA"), col("idB")).unionByName(star).distinct()
    val dirty = dirtyCand
      .join(docsH.withColumnRenamed("__id", "idA")
        .withColumnRenamed("__hs", "__ha"), Seq("idA"))
      .join(docsH.withColumnRenamed("__id", "idB")
        .withColumnRenamed("__hs", "__hb"), Seq("idB"))
      .withColumn("jaccard",
        size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
          size(array_union(col("__ha"), col("__hb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
    clean.unionByName(dirty)
  }

  // --------------------------------------------- cross-corpus dedup

  /** Persist a MinHash-LSH index of a corpus for INCREMENTAL dedup:
    * new batches are deduped against it without re-mining the corpus
    * (the 100-TB pipeline shape — per-batch cost scales with the
    * batch, never the corpus). Layout under `path`:
    *
    *  - `bands/` — one (id, band, bandHash) row per (doc, band),
    *    parquet-partitioned by `__bp = bandHash mod buckets`, so a
    *    probe reads only the partitions the batch's band hashes land
    *    in;
    *  - `docs/`  — (id, shingle-hash set) for the verify stage, read
    *    column-pruned and semi-joined to candidates only;
    *  - `_graft_index_meta.json` — the LSH parameters, so probes can
    *    never silently mismatch the stored signatures.
    */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 128, numBands: Int = 32,
      shingleSize: Int = 3, buckets: Int = 256): Unit = {
    // Shingle-hash each doc ONCE: the hash sets feed both the docs/
    // store (written verbatim) and the banded signatures (derived by
    // exploding them) — without the persist the corpus is parsed and
    // hashed twice, the single most expensive map stage of the build.
    val docsH = Par.spread(df).select(col(idCol).as("__id"),
        shingleHashes(col(textCol), shingleSize).as("__hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      docsH.write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(path, "docs").toString)
      val banded = bandedFromHashSets(docsH, numHashes, numBands)
        .withColumn("__bp", pmod(col("__bsig"), lit(buckets.toLong)))
        .repartition(col("__bp"))
      banded.write.mode("overwrite").partitionBy("__bp")
        .parquet(new org.apache.hadoop.fs.Path(path, "bands").toString)
      Similarity.writeIndexMeta(df.sparkSession, path,
        Map("kind" -> "minhash", "numHashes" -> numHashes,
          "numBands" -> numBands, "shingleSize" -> shingleSize,
          "buckets" -> buckets))
    } finally docsH.unpersist(false): Unit
  }

  /** Incrementally add documents to a [[buildMinhashIndex]] corpus
    * index: signatures are computed with the INDEX's stored
    * parameters, appended into the same bucket-partition layout —
    * no rebuild, cost scales with the batch. The caller owns
    * id-uniqueness across batches; appends are at-least-once safe
    * (a replayed append duplicates signature rows, which costs bytes
    * but never changes a dedup decision — candidates dedupe on id). */
  def appendToMinhashIndex(df: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val meta = Similarity.readIndexMeta(spark, path)
    require(meta.get("kind").map(_.toString).contains("minhash"),
      s"$path is not a minhash corpus index")
    val (numHashes, numBands, shingleSize, buckets) =
      (meta("numHashes").toString.toInt, meta("numBands").toString.toInt,
        meta("shingleSize").toString.toInt, meta("buckets").toString.toInt)
    val docsH = Par.spread(df).select(col(idCol).as("__id"),
        shingleHashes(col(textCol), shingleSize).as("__hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      docsH.write.mode("append")
        .parquet(new org.apache.hadoop.fs.Path(path, "docs").toString)
      bandedFromHashSets(docsH, numHashes, numBands)
        .withColumn("__bp", pmod(col("__bsig"), lit(buckets.toLong)))
        .repartition(col("__bp"))
        .write.mode("append").partitionBy("__bp")
        .parquet(new org.apache.hadoop.fs.Path(path, "bands").toString)
    } finally docsH.unpersist(false): Unit
  }

  /** The banded-signature frame `(__id, __band, __bsig)` shared by
    * [[minhashPairs]] and the corpus index. */
  private[graft] def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, numBands: Int, shingleSize: Int): DataFrame =
    bandedFromHashSets(
      Par.spread(df).select(col(idCol).as("__id"),
        shingleHashes(col(textCol), shingleSize).as("__hs")),
      numHashes, numBands)

  /** Banding from a per-doc shingle-hash-SET frame `(__id, __hs)`
    * (lets [[buildMinhashIndex]] reuse its persisted doc hash sets
    * instead of re-parsing the corpus).
    *
    * Scale shape (r14 optimization, guide §2.4/§4): the previous
    * formulation exploded `__hs` and computed the 128 permutation
    * mins as two ≤64-aggregate groupBys joined on id — correct and
    * codegen'd, but it paid a FULL SHUFFLE of one (id, hash) row per
    * shingle (the corpus's token count × 16 bytes) on every mining
    * pass. The [[graft.functions.MiningKernels.minhashMins]] kernel
    * computes all 128 mins in one in-row pass inside whole-stage
    * codegen: the signature stage is now map-only, and the first
    * exchange of every minhash path carries one narrow row per
    * (doc, band). Band packing (xxhash64 over the comma-joined mins)
    * is unchanged and stays in codegen, so `__bsig` values — and
    * every downstream bucket/pair/verify result — are bit-identical. */
  private def bandedFromHashSets(docsH: DataFrame,
      numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val coefs = minhashCoefs(numHashes)
    val sig = docsH.select(col("__id"),
        graft.functions.MiningKernels.minhashMins(col("__hs"), coefs)
          .as("__mins"))
      .filter(col("__mins").isNotNull)
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            element_at(col("__mins"), b * rowsPerBand + r + 1)
              .cast("string")): _*)).as("sig"))
    }
    sig.select(col("__id"), explode(array(bandStructs: _*)).as("__b"))
      .select(col("__id"), col("__b.band").as("__band"), col("__b.sig").as("__bsig"))
  }

  /** Dedup a new batch AGAINST a [[buildMinhashIndex]] corpus index:
    * drops batch docs whose n-gram Jaccard with some indexed doc is >=
    * `threshold`; batch-internal duplicates are untouched (compose
    * with [[minhashDedup]] for those). Reads only the band partitions
    * the batch's band hashes bucket into, joins candidates on
    * (band, bandHash), and verifies against the corpus hash sets
    * semi-joined to candidate ids — batch-proportional cost.
    */
  def dedupAgainstIndex(newDf: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.8): DataFrame = {
    val spark = newDf.sparkSession
    val meta = Similarity.readIndexMeta(spark, path)
    require(meta.get("kind").map(_.toString).contains("minhash"),
      s"$path is not a minhash corpus index")
    val (numHashes, numBands, shingleSize, buckets) =
      (meta("numHashes").toString.toInt, meta("numBands").toString.toInt,
        meta("shingleSize").toString.toInt, meta("buckets").toString.toInt)
    val newBanded = cacheSwap(crossDedupSlot,
      bandedSignatures(newDf, idCol, textCol, numHashes, numBands, shingleSize)
        .withColumn("__bp", pmod(col("__bsig"), lit(buckets.toLong))))
    // driver-side bucket pruning: ≤`buckets` longs
    val probed = newBanded.select("__bp").distinct()
      .collect().map(_.getLong(0)).toSet
    val bandsRoot = new org.apache.hadoop.fs.Path(path, "bands")
    val fs = bandsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = probed.toSeq.sorted
      .map(b => new org.apache.hadoop.fs.Path(bandsRoot, s"__bp=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (dirs.isEmpty) return newDf
    val idx = spark.read.parquet(dirs: _*)
    // the candidate frame is referenced by the verify's pair set and
    // both hash-set semi-joins (and counted for the adaptive verify) —
    // materialize it; the hash-set frames are left lazy, the verify
    // materializes them itself only on the big-candidate path
    val cands = cacheSwap(crossCandsSlot, newBanded
      .join(idx.select(col("__id").as("__cid"), col("__band"), col("__bsig")),
        Seq("__band", "__bsig"))
      .select(col("__id"), col("__cid")).distinct())
    val newH = newDf.join(cands.select(col("__id").as(idCol)).distinct(),
        Seq(idCol), "left_semi")
      .select(col(idCol).as("idA"),
        shingleHashes(col(textCol), shingleSize).as("__ha"))
    val corpusH = spark.read.parquet(
        new org.apache.hadoop.fs.Path(path, "docs").toString)
      .withColumnRenamed("__id", "idB").withColumnRenamed("__hs", "__hb")
      .join(cands.select(col("__cid").as("idB")).distinct(),
        Seq("idB"), "left_semi")
    // bipartite count verify: batch ids vs corpus ids are separate
    // spaces, so ordered = false (equal values are distinct docs)
    val doomed = verifyPairsByCount(
      cands.select(col("__id").as("idA"), col("__cid").as("idB")),
      newH, corpusH, threshold, maxDf = 1000, ordered = false,
      crossVerifySlot)
      .select(col("idA").as(idCol)).distinct()
    newDf.join(doomed, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes, through the
    * [[graft.functions.MiningKernels.simhashBits]] codegen kernel
    * (r14: previously 64 per-row array-aggregate lambdas, interpreted;
    * the vote rule — bit set iff strictly more ones than zeros — is
    * unchanged). */
  def simhash(text: Column): Column =
    graft.functions.MiningKernels.simhashBits(
      transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t)), 64)

  /** SimHash near-dup candidate pairs: band the `numBits`-bit hash
    * into 4 chunks (pigeonhole: hamming distance <= 3 implies one
    * identical chunk), bucket-join, verify true hamming distance.
    *
    * The signature is one map-only kernel projection per doc
    * ([[graft.functions.MiningKernels.simhashBits]] — see the inline
    * note below). Majority vote: bit set iff 2*ones > tokens.
    *
    * `tokenHash` defaults to xxhash64 (the cheap choice at corpus
    * scale); pass an engine-portable hash (e.g. an md5-derived 60-bit
    * value) when the output must be reproducible outside Spark —
    * that is exactly what the DuckDB-oracled verification query does.
    *
    * Candidate generation routes through [[bucketPairs]]: buckets of
    * 2..maxBucket members emit all in-bucket pairs; denser buckets —
    * a cluster of near-identical docs collides in every chunk, the
    * exact input dedup corpora contain — degrade to LINEAR star pairs
    * against the bucket's min id instead of an O(n²) self-join, same
    * as the minhash and cosine miners. Inside the degrade the output
    * is no longer the full pair set, but every cluster member stays
    * linked to a canonical representative, which is what dedup needs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, numBits: Int = 64,
      tokenHash: Column => Column = xxhash64(_),
      maxBucket: Int = 1000): DataFrame = {
    require(numBits % 4 == 0 && numBits <= 64,
      s"numBits must be a multiple of 4 up to 64, got $numBits")
    val chunkBits = numBits / 4
    val chunkMask = (1L << chunkBits) - 1
    // Per-doc signature in ONE map-only projection (r14 optimization,
    // guide §2.4/§4): token hashes stay an in-row array (`transform`
    // over the split — tokenHash is a caller-supplied Column function,
    // so this spot keeps HOF generality) and the per-bit majority vote
    // runs in the [[graft.functions.MiningKernels.simhashBits]] codegen
    // kernel. The previous shape exploded one row per token and paid a
    // 65-aggregate groupBy — a full shuffle of the corpus's token
    // count × 16 bytes per mining pass. Vote rule unchanged (bit set
    // iff 2×ones > tokens), so signatures are bit-identical.
    val hashed = Par.spread(df).select(col(idCol).as("__id"),
      transform(split(lower(trim(col(textCol))), "\\s+"),
        t => tokenHash(t)).as("__th"))
    // persisted (one-slot swap): the banded self-join below references
    // this frame on both sides; the cache is 16 bytes/doc
    val sh = cacheSwap(simhashSlot, hashed.select(col("__id"),
      graft.functions.MiningKernels.simhashBits(col("__th"), numBits)
        .as("__sh")))
    val banded = sh.select(col("__id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("__sh"), b * chunkBits).bitwiseAND(chunkMask)
            .as("chunk"))): _*)).as("__b"))
      .select(col("__id"), col("__b.band").as("__band"),
        col("__b.chunk").as("__chunk"))
    // skew-guarded pair mining (star-pair degrade above maxBucket),
    // then join the 16-byte signatures back and verify true hamming
    bucketPairs(banded, Seq("__band", "__chunk"), maxBucket)
      .join(sh.select(col("__id").as("idA"), col("__sh").as("__shA")), Seq("idA"))
      .join(sh.select(col("__id").as("idB"), col("__sh").as("__shB")), Seq("idB"))
      .withColumn("hamming", bit_count(col("__shA").bitwiseXOR(col("__shB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idA"), col("idB"), col("hamming"))
  }
}
