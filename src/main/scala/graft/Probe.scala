package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, VectorOps}

/** Scale probe (dev tool, like [[Explain]]): multiplies the sf corpus
  * ×1/×2/×4/×8 and times the dedup/ANN family at each scale, so a
  * quadratic regression shows up as a super-linear wall-time ratio long
  * before a real cluster would hit it.
  *
  * The corpus is grown with DISTINCT content — every copy prefixes each
  * token with a copy tag, and embedding copies rotate dimensions — because
  * a plain self-union makes all copies exact duplicates of each other: the
  * dup-pair OUTPUT itself is then Θ(copies²) and no implementation could
  * look linear. With distinct copies the planted dup structure (and so the
  * output size) stays ∝ corpus size, which is what dedup sees at 100 TB.
  *
  * Also reports the largest LSH bucket and the number of over-cap buckets
  * per scale (computed directly from the public kernels), verifying the
  * skew cap is NOT silently truncating results as the corpus grows.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val scales = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALES", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    // comma-separated family filter (minhash,simhash,embdup,ann,cc,ccstar,
    // pagerank,pagerankdecomp,jaccardwidth,frontwidth,kernelwidth,asof,
    // range,rangedensity,kmeans,
    // pq,jaccard,bloomjoin,decon,
    // deconfix,sdecon,diff,diffbucketed,linkage,spanclean,curation,
    // curationfix,curationstages,curationiso,ivfpq,ivfregime,buckets) —
    // unset runs everything; a full ×128 sweep exceeds a single dev
    // timebox, so focused re-probes select just the families under study
    val families = sys.env.get("SPARK_GRAFT_PROBE_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(f: String): Boolean = families.forall(_.contains(f))
    // shuffle-partition override, independent of core count: a real
    // cluster sizes partitions to the data (each stays in executor
    // memory), while local[N] defaults to N — which makes ×128 exploded
    // streams sort-spill. Scaling this to the exploded-row count
    // emulates the cluster posture on one box (cores bound parallelism,
    // partitions bound per-sort memory).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", cpus)
    val spark = LocalDirs.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = ShuffleMeter.attach(spark)

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    val embs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    docs.count(); embs.count() // warm the cache outside the timings

    /** m distinct-content copies: copy k prefixes every token with `ck`,
      * so shingle sets across copies are disjoint (dup pairs stay within
      * each copy) while total volume grows ×m. */
    def docsTimes(m: Int): DataFrame =
      (0 until m).map { k =>
        docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c$k$$1").as("text"))
      }.reduce(_ union _)

    /** m copies with dimensions rotated by k — random-ish vectors rotate to
      * background cosine, so copies are not near-dups of each other. */
    def embsTimes(m: Int): DataFrame =
      (0 until m).map { k =>
        val d = 64
        val rot = k % d
        val v =
          if (rot == 0) col("embedding")
          else concat(slice(col("embedding"), rot + 1, d - rot),
            slice(col("embedding"), 1, rot))
        embs.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          v.as("embedding"))
      }.reduce(_ union _)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    /** Largest bucket and over-cap bucket count of a (band, bucket, …)
      * candidate frame — the skew-cap health check. */
    def bucketStats(banded: DataFrame, cap: Int): (Long, Long) = {
      val sizes = banded.groupBy("band", "bucket").count()
      val r = sizes.agg(max("count"), sum(when(col("count") > cap, 1L).otherwise(0L)))
        .collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    /** Largest bucket and over-cap bucket count for the minhash banding. */
    def minhashBucketStats(df: DataFrame, cap: Int): (Long, Long) =
      bucketStats(df.select(posexplode(Dedup.minhashBandBuckets(
          Dedup.shingleHashes64(col("text"), 3), 64, 4)).as(Seq("band", "bucket"))),
        cap)

    /** Same health check for the PPJoin df-ordered prefix buckets — the
      * distribution that could silently go quadratic on a boilerplate-
      * heavy corpus, measured from the production code path. */
    def jaccardPrefixBucketStats(df: DataFrame, cap: Int): (Long, Long) =
      bucketStats(Dedup.jaccardPrefixBuckets(
          df.select(col("doc_id").cast("long").as("doc_id"),
            Dedup.shingleHashes64(col("text"), 3).as("sh")),
          threshold = 0.7),
        cap)

    /** m copies of the events table with shifted ids/users and a per-copy
      * time offset of one day — event density per unit time stays constant
      * per user, total volume grows ×m (the honest temporal-scale shape:
      * more history, same instantaneous rate). One explode, not an m-way
      * union: a 128-branch union plan is exactly the shape
      * plantedAnnCorpus replaced with explode(sequence). */
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s")).cache()
    events.count()
    def eventsTimes(m: Int): DataFrame =
      events
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_s"),
          explode(sequence(lit(0L), lit(m - 1L))).as("k"))
        .select((col("event_id") + lit(10000000L) * col("k")).as("event_id"),
          (col("user_id") + lit(1000L) * col("k")).as("user_id"),
          col("event_type"),
          (col("ts_s") + lit(86400L) * col("k")).as("ts_s"))

    scales.foreach { m =>
      val d = docsTimes(m).cache()
      val e = embsTimes(m).cache()
      val ev = eventsTimes(m).cache()
      val nDocs = d.count()
      val nVecs = e.count()
      val nEv = ev.count()
      val fields = scala.collection.mutable.ListBuffer[String]()
      def run(fam: String, sKey: String, nKey: String)(body: => Long): Unit =
        if (want(fam)) {
          meter.reset()
          val (t, n) = timed(body)
          // shuffle WRITE records inside the timed window: the cross-tier
          // attribution signal (r12 verdict #4) — unlike wall time these
          // move only when plan or data move, so a probe row now shows
          // whether a family's records track the ×m data ratio directly
          val (_, rec) = meter.snapshot()
          fields += s""""$sKey":$t"""
          fields += s""""$nKey":$n"""
          fields += s""""${sKey.stripSuffix("_s")}_shufrec":$rec"""
        }
      run("minhash", "minhash_s", "minhash_pairs")(
        Dedup.minhashDupPairs(d, col("doc_id"), col("text")).count())
      run("simhash", "simhash_s", "simhash_pairs")(
        Dedup.simhashDupPairs(d, col("doc_id"), col("text")).count())
      run("embdup", "embdup_s", "embdup_pairs")(Dedup.embeddingNearDupLsh(
        e, col("vec_id"), col("embedding"), planes = 16, bands = 2,
        cosineThreshold = 0.99).count())
      run("ann", "ann_s", "ann_rows")(VectorOps.annLshTopK(
        e, e.filter(col("vec_id") < 5), 10).count())
      run("cc", "cc_s", "cc_nodes")(graft.ops.Graph.dedupClusters(
        Dedup.minhashDupPairs(d, col("doc_id"), col("text")),
        col("id_a"), col("id_b")).count())
      run("ccstar", "ccstar_s", "ccstar_nodes") {
        // star contraction on the similarity graph — must match the cc
        // family's wall-time band (near-clique components, few rounds)
        val (labels, rounds) = graft.ops.Graph.starContraction(
          Dedup.minhashDupPairs(d, col("doc_id"), col("text")),
          col("id_a"), col("id_b"), maxIter = 50)
        fields += s""""ccstar_simgraph_rounds":$rounds"""
        labels.count()
      }
      run("ccstar", "ccstar_chain_s", "ccstar_chain_nodes") {
        // the adversarial-diameter case star contraction exists for: ONE
        // chain of 5000·m nodes (label propagation would need 5000·m
        // rounds — structurally impossible); round count must grow
        // logarithmically with the chain, wall time near-linearly
        val n = 5000L * m
        val chain = spark.range(n - 1)
          .select(col("id").as("a"), (col("id") + 1L).as("b"))
        val (labels, rounds) = graft.ops.Graph.starContraction(
          chain, col("a"), col("b"), maxIter = 50)
        fields += s""""ccstar_chain_rounds":$rounds"""
        labels.count()
      }
      run("pagerank", "pagerank_s", "pagerank_nodes") {
        // pair list checkpointed before the two-branch symmetrization
        // (same as the doc_pagerank query) — this timing covers one
        // minhash run plus the graph iterations
        val pairs = Dedup.minhashDupPairs(d, col("doc_id"), col("text"))
          .localCheckpoint()
        val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .union(pairs.select(col("id_b"), col("id_a")))
        graft.ops.Graph.pageRank(sym, col("src"), col("dst"),
          iterations = 5).count()
      }
      // ---- doc_pagerank wall DECOMPOSITION (r14 verdict #2): the sf3
      // tier read 10.2x wall for 3x data with LINEAR shuffle records;
      // this family splits the real query's wall into (a) the minhash
      // front end on the query's own 2x-dup'd corpus, (b) the components
      // clustering that shares it, and (c) pageRank at 1..5 iterations
      // from the SAME checkpointed pair list — marginal per-iteration
      // cost is the diff between consecutive rows. m == 1 only: the
      // cross-tier signal comes from running this on different sf dirs.
      if (want("pagerankdecomp") && m == 1) {
        // Measure the PRODUCTION plan: unpersist the probe's shared
        // corpus cache first. A "fresh" parquet read is NOT enough —
        // Spark's CacheManager substitutes any logical plan EQUAL to a
        // cached fragment, so Tables.documents(...).select(doc_id, text)
        // silently becomes the InMemoryRelation, whose larger in-memory
        // stats flip the downstream verify joins from broadcast to
        // sort-merge (measured at sf1.0: 184M shuffle records + 53 GB
        // spill + ~10x wall vs the production query's 122M records).
        // These two families therefore want a DEDICATED probe run; other
        // families in the same invocation lose the docs cache.
        docs.unpersist(blocking = true)
        val freshDocs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val dupped = freshDocs.union(freshDocs.select(
          (col("doc_id") + 100000000L).as("doc_id"), col("text")))
        var pairs: DataFrame = null
        meter.reset()
        val (tFront, nPairs) = timed {
          pairs = Dedup.minhashDupPairs(dupped, col("doc_id"), col("text"))
            .localCheckpoint()
          pairs.count()
        }
        val (_, frontRec) = meter.snapshot()
        fields += s""""prdc_front_s":$tFront"""
        fields += s""""prdc_front_pairs":$nPairs"""
        fields += s""""prdc_front_shufrec":$frontRec"""
        fields += s""""prdc_front_spill":${meter.spilledBytes}"""
        val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .union(pairs.select(col("id_b"), col("id_a")))
        meter.reset()
        val (tCc, nCc) = timed(graft.ops.Graph.dedupClusters(
          pairs, col("id_a"), col("id_b")).count())
        val (_, ccRec) = meter.snapshot()
        fields += s""""prdc_cc_s":$tCc"""
        fields += s""""prdc_cc_nodes":$nCc"""
        fields += s""""prdc_cc_shufrec":$ccRec"""
        fields += s""""prdc_cc_spill":${meter.spilledBytes}"""
        for (k <- 1 to 5) {
          meter.reset()
          val (tK, _) = timed(graft.ops.Graph.pageRank(sym, col("src"),
            col("dst"), iterations = k).count())
          val (_, kRec) = meter.snapshot()
          fields += s""""prdc_pr${k}_s":$tK"""
          fields += s""""prdc_pr${k}_shufrec":$kRec"""
          fields += s""""prdc_pr${k}_spill":${meter.spilledBytes}"""
        }
      }

      // ---- minhash FRONT-END width experiment (r15 verdict #1): the
      // pagerankdecomp front row is near-CONSTANT across tiers (sf0.1
      // 6.9 s / sf1.0 17 s / sf3 16.5 s for 30x the docs) — the CPU-dense
      // shingle+minhash kernel runs inside the parquet SCAN stage, whose
      // task count is the file-split count (a sub-128MB documents.parquet
      // is 1-9 splits regardless of core count). This family times the
      // production front end against one with the kernel stage widened by
      // an explicit pre-kernel repartition, reps interleaved, same JVM.
      // Arms are the `spark.graft.widenKernel` conf lever (ADVICE r16:
      // minhashDupPairs now widens INTERNALLY, so a source-side
      // repartition A/B would measure widened-vs-double-widened):
      // fw_off = widening DISABLED (the pre-r16 scan-width plan),
      // fw_on = the shipped production widening. (ADVICE r17: these were
      // briefly named fw_prod/fw_wide with INVERTED meaning vs the r16
      // output — fw_prod was the shipped plan in r16 JSON, widening-off
      // after; renamed so old and new probe JSON cannot be conflated.)
      if (want("frontwidth") && m == 1) {
        docs.unpersist(blocking = true) // production plan, not the cache
        val freshDocs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val dupped = freshDocs.union(freshDocs.select(
          (col("doc_id") + 100000000L).as("doc_id"), col("text")))
        // ADVICE r17: restore the caller's session values (not hardcoded
        // defaults), and restore even when an arm throws — a failing arm
        // must not leave widening disabled for every later probe family.
        val savedWiden = spark.conf.getOption("spark.graft.widenKernel")
        try {
          for (r <- 1 to 3; (tag, widen) <- Seq("off" -> false,
                                                "on" -> true)) {
            spark.conf.set("spark.graft.widenKernel", widen.toString)
            meter.reset()
            val (t, nP) = timed {
              Dedup.minhashDupPairs(dupped, col("doc_id"), col("text"))
                .localCheckpoint().count()
            }
            val (_, rec) = meter.snapshot()
            fields += s""""fw_${tag}${r}_s":$t"""
            fields += s""""fw_${tag}${r}_pairs":$nP"""
            fields += s""""fw_${tag}${r}_shufrec":$rec"""
          }
        } finally {
          savedWiden.fold(spark.conf.unset("spark.graft.widenKernel"))(
            spark.conf.set("spark.graft.widenKernel", _))
        }
      }

      // ---- kernel-stage width A/B over PRODUCTION queries (r16 verdict
      // #1): runs each named SparkEntry query under three widenKernel
      // settings — off = widening disabled (the pre-r16 scan-width
      // plan), jmp = legacy jump-to-session-width (bytesPerTask=0),
      // prp = shipped bytes-proportional width — reps interleaved, same
      // JVM, bench-style full materialization (xxhash over all output
      // columns) so column pruning can't change the audited plan.
      // SPARK_GRAFT_PROBE_KW_QUERIES / _KW_ARMS / _KW_REPS override the
      // defaults for focused re-probes.
      if (want("kernelwidth") && m == 1) {
        docs.unpersist(blocking = true) // production plan, not the cache
        val kwQueries = sys.env.get("SPARK_GRAFT_PROBE_KW_QUERIES")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq("span_clean_docs", "doc_repetition",
            "bigram_logprob", "dup_ngram_fraction", "doc_quality_filter",
            "tfidf_top_terms", "unigram_logprob", "pii_redaction",
            "column_correlations", "customer_fuzzy_pairs",
            "doc_pagerank", "simhash_md5_pairs"))
        val kwArms = sys.env.get("SPARK_GRAFT_PROBE_KW_ARMS")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq("off", "jmp", "prp"))
        val kwReps = sys.env.getOrElse("SPARK_GRAFT_PROBE_KW_REPS", "2").toInt
        // ADVICE r17: restore the caller's session values (not hardcoded
        // defaults), and restore even when an arm throws — a failing arm
        // must not leave widening disabled/mis-sized for later families.
        val savedWiden = spark.conf.getOption("spark.graft.widenKernel")
        val savedBpt =
          spark.conf.getOption("spark.graft.widenKernel.bytesPerTask")
        try {
          for (r <- 1 to kwReps; arm <- kwArms; q <- kwQueries) {
            arm match {
              case "off" =>
                spark.conf.set("spark.graft.widenKernel", "false")
              case "jmp" =>
                spark.conf.set("spark.graft.widenKernel", "true")
                spark.conf.set("spark.graft.widenKernel.bytesPerTask", "0")
              case _ =>
                spark.conf.set("spark.graft.widenKernel", "true")
                spark.conf.set("spark.graft.widenKernel.bytesPerTask",
                  "262144")
            }
            meter.reset()
            val (t, nR) = timed {
              val out = SparkEntry.queries(q)(spark, sfDir)
              // Bench's exact materialization: bit_xor CONSUMES the hash
              // column, forcing every output column. (A bare count(lit(1))
              // lets Catalyst prune the hash and with it the whole per-row
              // kernel — measured span_clean_docs at 0.25 s vs its real
              // 20 s before this was caught.)
              out.select(xxhash64(struct(
                  out.columns.toIndexedSeq.map(col): _*)).as("h"))
                .agg(count(lit(1)), bit_xor(col("h")))
                .collect().head.getLong(0)
            }
            val (_, rec) = meter.snapshot()
            fields += s""""kw_${q}_${arm}${r}_s":$t"""
            fields += s""""kw_${q}_${arm}${r}_rows":$nR"""
            fields += s""""kw_${q}_${arm}${r}_shufrec":$rec"""
            // Bench-level GC hygiene (r16): let ContextCleaner release the
            // dead localCheckpoint/shuffle blocks between arms so later
            // arms don't pay earlier arms' block-manager pressure
            System.gc()
          }
        } finally {
          savedWiden.fold(spark.conf.unset("spark.graft.widenKernel"))(
            spark.conf.set("spark.graft.widenKernel", _))
          savedBpt.fold(
            spark.conf.unset("spark.graft.widenKernel.bytesPerTask"))(
            spark.conf.set("spark.graft.widenKernel.bytesPerTask", _))
        }
      }

      // ---- jaccard sf3 WIDTH AUDIT (r14 verdict #3): the in-file
      // adjudication attributed ~4x of the 38x single-run sf3 wall to
      // spill at 9.2x candidate volume. explodedShuffleParts sizes the
      // pinned stages from LEAF bytes / rowsPerPartition — this family
      // sweeps rowsPerPartition around the production default so the
      // probe shows wall + spill bytes at narrower AND wider widths than
      // production picks. If production's row already has ~zero spill
      // (or wider is no faster), the width is right; if spill collapses
      // only at a wider setting, bytesPerRow under-estimates this
      // caller's expansion. m == 1 only, real query shape (2x dup'd).
      if (want("jaccardwidth") && m == 1) {
        // same cache-substitution escape as pagerankdecomp: the audit is
        // about the width PRODUCTION picks from parquet leaf stats
        docs.unpersist(blocking = true)
        val freshDocs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val dupped = freshDocs.union(freshDocs.select(
          (col("doc_id") + 100000000L).as("doc_id"), col("text")))
        val rppKey = "spark.graft.shuffle.rowsPerPartition"
        val rpp0 = spark.conf.get(rppKey, "1000000")
        try {
          // sweep override (comma-separated rowsPerPartition values):
          // now that production sizes the pair stages from measured
          // candidate volume, the narrow settings of the full default
          // sweep produce 32768-part stages whose shuffle files can
          // exhaust local disk at sf3 — confirmation runs want just the
          // production point (SPARK_GRAFT_PROBE_JW_RPP=1000000)
          val sweep = sys.env.get("SPARK_GRAFT_PROBE_JW_RPP")
            .map(_.split(",").map(_.trim.toLong).toSeq)
            .getOrElse(Seq(1000000L, 125000L, 31250L, 8000L))
          for (rpp <- sweep) {
            spark.conf.set(rppKey, rpp.toString)
            val parts = Dedup.explodedShuffleParts(dupped)
            meter.reset()
            // bench-style FULL materialization, not count(): count()'s
            // column pruning changes the verify tail's join plan (an
            // extra candidate-stream exchange — measured 184M vs the
            // production 122M records at sf1.0), and this family exists
            // to audit the PRODUCTION plan's width
            val (tJ, nJ) = timed {
              val out = Dedup.jaccardPrefixPairs(
                dupped, col("doc_id"), col("text"))
              out.select(xxhash64(struct(
                  out.columns.toIndexedSeq.map(col): _*)).as("h"))
                .agg(count(lit(1))).collect().head.getLong(0)
            }
            val (_, jRec) = meter.snapshot()
            val tag = s"jw_rpp${rpp / 1000}k"
            fields += s""""${tag}_parts":$parts"""
            fields += s""""${tag}_s":$tJ"""
            fields += s""""${tag}_pairs":$nJ"""
            fields += s""""${tag}_shufrec":$jRec"""
            fields += s""""${tag}_spill":${meter.spilledBytes}"""
          }
        } finally spark.conf.set(rppKey, rpp0)
      }

      run("asof", "asof_s", "asof_rows") {
        val p = ev.filter(col("event_type") === "purchase")
        val c = ev.filter(col("event_type") === "click")
        graft.ops.AsOf.backward(p, c,
          col("user_id"), col("user_id"), col("ts_s"), col("ts_s"),
          col("event_id"),
          leftCols = Seq("p_event_id" -> col("event_id")),
          rightCols = Seq("c_event_id" -> col("event_id"))).count()
      }
      run("range", "range_s", "range_rows") {
        val errs = ev.filter(col("event_type") === "error")
        graft.ops.RangeJoin.countWithin(errs, ev, col("event_id"),
          col("ts_s"), col("event_id"), col("ts_s"), 300L).count()
      }
      run("rangedensity", "rangedens_s", "rangedens_rows") {
        // DENSITY scaling (r12 verdict #1): same 30-day span, ×m the
        // events — the sf-tier shape that made the pair-materializing
        // countWithin quadratic (45.6× wall for 10× data at sf1.0).
        // evDense multiplies rows WITHOUT the per-copy day shift, so
        // per-bin density grows ×m; the sub-bin prefix plan must stay
        // near-linear. Aggregate over cnt so the count column cannot be
        // pruned into a row-count shortcut.
        val evDense = events
          .select(col("event_id"), col("event_type"), col("ts_s"),
            explode(sequence(lit(0L), lit(m - 1L))).as("k"))
          .select((col("event_id") + lit(10000000L) * col("k")).as("event_id"),
            col("event_type"),
            (col("ts_s") + col("k")).as("ts_s")) // ≤ m−1 s jitter: span fixed
        val errs = evDense.filter(col("event_type") === "error")
        val r = graft.ops.RangeJoin.countWithin(errs, evDense,
            col("event_id"), col("ts_s"), col("event_id"), col("ts_s"), 300L)
          .agg(count(lit(1)).as("n"), sum(col("cnt")).as("c")).collect()(0)
        fields += s""""rangedens_pairs":${r.getLong(1)}"""
        r.getLong(0)
      }
      run("kmeans", "kmeans_s", "kmeans_rows")(graft.ops.Clustering.kmeansExact(
        e, col("vec_id"), col("embedding"), k = 5, iters = 4).count())
      // PQ: fit (m bounded integer-exact Lloyd loops, driver state k·d
      // longs) + shuffle-free encode must track corpus size linearly;
      // ADC search is one scan of the code table against broadcast
      // queries. Codes are checkpointed between the two timings so the
      // ADC number measures search, not a re-fit.
      var pqCodes: DataFrame = null
      var pqCb: graft.ops.Pq.Codebooks = null
      run("pq", "pq_s", "pq_rows") {
        pqCb = graft.ops.Pq.fit(e, col("vec_id"), col("embedding"),
          dims = 64, m = 2, k = 4, iters = 2)
        pqCodes = graft.ops.Pq
          .encode(e, col("vec_id"), col("embedding"), pqCb)
          .localCheckpoint()
        pqCodes.count()
      }
      run("pq", "pqadc_s", "pqadc_rows") {
        graft.ops.Pq.adcTopK(pqCodes, e.filter(col("vec_id") < 5),
          col("vec_id"), col("embedding"), pqCb, k = 10).count()
      }
      run("ivfpq", "ivfpq_s", "ivfpq_rows") {
        // IVFADC (r13): coarse integer-Lloyd cells + PQ ADC on survivors.
        // Corpus ×m, queries fixed — wall must stay linear in the corpus
        // with slope ~nProbe/nCells of the full-scan ADC (pq family above
        // is the unpruned baseline at the same scales).
        val cb = graft.ops.Pq.fit(e, col("vec_id"), col("embedding"),
          dims = 64, m = 2, k = 4, iters = 2)
        graft.ops.Ivf.ivfAdcTopK(e, e.filter(col("vec_id") < 5),
          col("vec_id"), col("embedding"), cb, k = 10,
          nCells = 4, nProbe = 2, coarseIters = 2).count()
      }
      run("jaccard", "jaccard_s", "jaccard_pairs")(Dedup.jaccardPrefixPairs(
        d, col("doc_id"), col("text")).count())
      run("bloomjoin", "bloomjoin_s", "bloomjoin_rows") {
        // ~1% of users as the dimension — the selective-dim shape the
        // bloom prefilter exists for
        val dim = ev.select(col("user_id").as("uid")).distinct()
          .filter(col("uid") % 97 === 0)
        graft.ops.Relational.bloomPrefilterJoin(ev, dim, "user_id", "uid")
          .count()
      }
      run("decon", "decon_s", "decon_rows") {
        // eval set FIXED at the base-corpus size (the benchmark doesn't
        // grow with the crawl) — wall time must track the corpus side
        // only. Drawn from the ×m corpus's copy-0 rows (ids < 10⁷), whose
        // text carries the copy prefix: eval shingles must actually occur
        // in the corpus for the flag path to exercise end to end.
        val evalSet = d.filter(col("doc_id") % 20 === 0
            && col("doc_id") < 10000000L)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            substring(col("text"), 1, 120).as("text"))
        Dedup.decontaminate(d, evalSet, col("doc_id"), col("text"),
          threshold = 0.5).count()
      }
      run("deconfix", "deconfix_s", "deconfix_rows") {
        // FIXED-eval cross-TIER shape (r12 verdict #4): eval capped at
        // the sf0.1 tier's doc-id range regardless of the corpus dir, so
        // running this at ×1 against two sf dirs measures fixed-eval
        // record growth on a NATURALLY grown corpus — the ×m copy growth
        // above is content-disjoint and cannot create new eval matches
        // by construction, which makes the in-run decon rows flat no
        // matter what the operator does
        val evalSet = d.filter(col("doc_id") % 20 === 0
            && col("doc_id") < 5000L)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            substring(col("text"), 1, 120).as("text"))
        Dedup.decontaminate(d, evalSet, col("doc_id"), col("text"),
          threshold = 0.5).count()
      }
      run("sdecon", "sdeconx_s", "sdeconx_hits") {
        // semantic decontamination, exact broadcast-NL path: eval FIXED
        // at the base tier's copy-0 vectors (benchmark-sized), corpus ×m —
        // the |corpus|·|eval| cosine product grows ×m here (both-sides
        // growth was the r12 sf1.0 16.6× mover). Aggregate over
        // n_eval_hits so the cosine fold cannot be pruned by count().
        val evalSet = e.filter(col("vec_id") < 10000000L)
        val r = Dedup.semanticDecontaminate(e, evalSet, col("vec_id"),
            col("embedding"), cosThreshold = 0.95)
          .agg(count(lit(1)).as("n"), sum(col("n_eval_hits")).as("h"))
          .collect()(0)
        fields += s""""sdeconx_rows":${r.getLong(0)}"""
        r.getLong(1)
      }
      run("sdecon", "sdeconlsh_s", "sdeconlsh_hits") {
        // the r12 verdict #5 prefilter path: hyperplane-bucket collisions
        // only (p=12, b=24 → miss 4e-4 at 0.95, ~0.6% background), same
        // audit verdict — wall must stay near-flat in |eval| and linear
        // in the corpus
        val evalSet = e.filter(col("vec_id") < 10000000L)
        val r = Dedup.semanticDecontaminate(e, evalSet, col("vec_id"),
            col("embedding"), cosThreshold = 0.95, lsh = Some((12, 24)))
          .agg(count(lit(1)).as("n"), sum(col("n_eval_hits")).as("h"))
          .collect()(0)
        fields += s""""sdeconlsh_rows":${r.getLong(0)}"""
        r.getLong(1)
      }
      run("diff", "diff_s", "diff_rows") {
        val base = d.filter(col("doc_id") % 13 =!= 0)
        val cur = d.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
        graft.ops.Relational.snapshotDiff(base, cur, Seq("doc_id")).count()
      }
      if (want("diffbucketed")) {
        // warehouse posture: both snapshots bucketed on the key at ingest
        // (write untimed), then the diff join runs with ZERO hash
        // exchanges — the timed body is the diff alone, and the row
        // records the exchange count so the claim is measured, not argued
        val base = d.filter(col("doc_id") % 13 =!= 0)
        val cur = d.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
        graft.ops.Relational.writeBucketed(base, "probe_diff_base", "doc_id", 64)
        graft.ops.Relational.writeBucketed(cur, "probe_diff_cur", "doc_id", 64)
        run("diffbucketed", "diffb_s", "diffb_rows") {
          val diff = graft.ops.Relational.snapshotDiff(
            spark.table("probe_diff_base"), spark.table("probe_diff_cur"),
            Seq("doc_id"))
          val nHashEx = diff.queryExecution.executedPlan.toString
            .linesIterator.count(_.contains("Exchange hashpartitioning"))
          fields += s""""diffb_hash_exchanges":$nHashEx"""
          diff.count()
        }
        spark.sql("DROP TABLE IF EXISTS probe_diff_base")
        spark.sql("DROP TABLE IF EXISTS probe_diff_cur")
      }
      run("linkage", "snm_s", "snm_pairs") {
        // sorted-neighborhood ER: candidates are n·window by construction
        // — the LINEAR-in-corpus pass (16-char keys bound the per-pair
        // Levenshtein DP)
        graft.ops.Linkage.sortedNeighborPairs(
          d.withColumn("text", substring(col("text"), 1, 16)),
          col("doc_id"), col("text"), window = 3, maxDist = 12).count()
      }
      run("linkage", "blocked_s", "blocked_pairs") {
        // blocked ER with blocking-key CARDINALITY scaling with the
        // corpus (hash mod 500·m — hashed so the ×10⁷ copy-id stride
        // can't alias into one residue class): block size stays ~10, so
        // Σ blockSize² stays linear — the discipline that keeps
        // blocking scale-safe
        graft.ops.Linkage.blockedFuzzyPairs(
          d.withColumn("text", substring(col("text"), 1, 16)),
          col("doc_id"), pmod(xxhash64(col("doc_id")), lit(500L * m)),
          col("text"), maxDist = 12).count()
      }
      run("spanclean", "span_s", "span_docs") {
        // duplicated-span removal is the linear dedup transform: gram
        // explode → df aggregate → join back → per-doc cover union.
        // Wall time must track corpus token count; the ×m planted
        // copies guarantee cross-doc duplicated grams exist at every m.
        // Aggregate over the OUTPUT columns — a bare count() would let
        // column pruning skip the position-filter text rebuild entirely
        val r = Dedup.removeDuplicatedSpans(d, col("doc_id"), col("text"),
          n = 3)
          .agg(count(lit(1)).as("n"), sum(length(col("clean_text"))).as("c"))
          .collect()(0)
        r.getLong(0)
      }
      run("curation", "curation_s", "curation_docs") {
        // the capstone composition (exact dedup → quality filter →
        // near-dup components → split): every input doc appears exactly
        // once in the output, so rows == corpus size and wall time must
        // track it near-linearly — r11 verdict #3: the one heavy
        // pipeline whose scaling was inferred from its parts, measured
        // directly here. Aggregate over status+split so the audit-trail
        // union and final projection cannot be pruned away.
        val r = graft.pipelines.CorpusCuration
          .curate(d, col("doc_id"), col("text"))
          .agg(count(lit(1)).as("n"),
            sum(length(concat(col("status"), col("split")))).as("c"))
          .collect()(0)
        r.getLong(0)
      }
      if (want("curationfix")) {
        // LEG ATTRIBUTION on the corpus_curation BENCH fixture (every doc
        // gets a near-dup twin via a trailing marker token) — the ×m
        // distinct-content growth can't reproduce its density, so the
        // bench wall is decomposed here: pairs leg, pairs+components leg,
        // full capstone. Run at ×1 against an sf dir.
        def dupped = docs.union(docs.select(
          (col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" dupmarker")).as("text")))
        run("curationfix", "cf_minhash_s", "cf_pairs") {
          Dedup.minhashDupPairs(dupped, col("doc_id"), col("text")).count()
        }
        run("curationfix", "cf_cc_s", "cf_cc_nodes") {
          graft.ops.Graph.dedupClusters(
            Dedup.minhashDupPairs(dupped, col("doc_id"), col("text")),
            col("id_a"), col("id_b")).count()
        }
        run("curationfix", "cf_curate_s", "cf_docs") {
          val r = graft.pipelines.CorpusCuration
            .curate(dupped, col("doc_id"), col("text"))
            .agg(count(lit(1)).as("n"),
              sum(length(concat(col("status"), col("split")))).as("c"))
            .collect()(0)
          r.getLong(0)
        }
      }
      if (want("curationstages")) {
        // stage-level decomposition of the capstone on the bench fixture:
        // each stage ends in an EAGER localCheckpoint, so its run() wall
        // is that stage's cost alone (inputs come pre-cut from the prior
        // stage). Mirrors CorpusCuration.curate stage for stage.
        import graft.ops.{Relational, Sampling, TextAnalytics}
        import graft.ops.Checkpoints
        val base = docs.union(docs.select(
            (col("doc_id") + 100000000L).as("doc_id"),
            concat(col("text"), lit(" dupmarker")).as("text")))
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        var ranked: DataFrame = null
        run("curationstages", "cs_exact_s", "cs_exact_rows") {
          val keyed = base.withColumn("ck",
            md5(TextAnalytics.canonicalize(col("text"))))
          ranked = Checkpoints.cut(keyed.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("ck")).orderBy(col("doc_id")))))
          ranked.count()
        }
        var s1v: DataFrame = null
        run("curationstages", "cs_quality_s", "cs_quality_rows") {
          val s1 = ranked.filter(col("rn") === 1)
            .select(col("doc_id"), col("text"))
          val verdicts = TextAnalytics
            .qualityFilter(s1, col("doc_id"), col("text"))
            .select(col("doc_id"), col("keep"))
          s1v = Checkpoints.cut(s1.join(verdicts, "doc_id"))
          s1v.count()
        }
        var s2: DataFrame = null
        var cutPairs: DataFrame = null
        var nearDropped: DataFrame = null
        run("curationstages", "cs_pairs_s", "cs_pairs_rows") {
          s2 = s1v.filter(col("keep")).select(col("doc_id"), col("text"))
          // both widths ride in the row: the NAIVE estimate read through
          // the lineage cuts (the join-product pathology — 32768 here)
          // vs the source-scan hint the pipeline now passes (r13 fix)
          fields += s""""cs_naive_parts":${Dedup.explodedShuffleParts(s2, 75L)}"""
          val hint = Dedup.explodedShuffleParts(base, 75L)
          fields += s""""cs_hint_parts":$hint"""
          cutPairs = Checkpoints.cut(
            Dedup.minhashDupPairs(s2, col("doc_id"), col("text"),
              partsHint = Some(hint), gateSrc = Some(base)))
          cutPairs.count()
        }
        run("curationstages", "cs_cc_s", "cs_cc_rows") {
          nearDropped = Checkpoints.cut(
            graft.ops.Graph.dedupClusters(cutPairs, col("id_a"), col("id_b"))
              .filter(!col("keep")).select(col("id").as("doc_id")))
          nearDropped.count()
        }
        run("curationstages", "cs_split_s", "cs_split_rows") {
          val keeps = Relational.antiJoin(s2,
              nearDropped.select(col("doc_id").as("dropped_id")),
              col("doc_id"), col("dropped_id"))
            .select(col("doc_id"), Sampling.assignSplit(col("text"),
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
          val r = keeps.agg(count(lit(1)).as("n"),
            sum(length(col("split"))).as("c")).collect()(0)
          r.getLong(0)
        }
      }
      if (want("curationiso")) {
        // ISOLATE the lineage effect: same corpus, same operator — one
        // input read straight from the cached union, one behind a
        // localCheckpoint (the capstone's stage-boundary shape). Records
        // the width estimate each input produces, since pinnedParts is
        // the only thing lineage can change inside minhashDupPairs.
        def duppedI = docs.union(docs.select(
          (col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" dupmarker")).as("text")))
        run("curationiso", "ci_direct_s", "ci_direct_pairs") {
          val in = duppedI
          fields += s""""ci_direct_parts":${Dedup.explodedShuffleParts(in, 75L)}"""
          Dedup.minhashDupPairs(in, col("doc_id"), col("text")).count()
        }
        run("curationiso", "ci_ckpt_s", "ci_ckpt_pairs") {
          val in = graft.ops.Checkpoints.cut(duppedI)
          fields += s""""ci_ckpt_parts":${Dedup.explodedShuffleParts(in, 75L)}"""
          Dedup.minhashDupPairs(in, col("doc_id"), col("text")).count()
        }
      }
      run("curation", "curation_route_s", "curation_route_nodes") {
        // the LP-vs-star auto-switch must take the lp route on the REAL
        // duplicate graph (near-clique components, tiny diameter): the
        // ~1.7× star premium is reserved for adversarial diameters. The
        // route rides in the row so the assertion is measured per scale.
        val pairs = Dedup.minhashDupPairs(d, col("doc_id"), col("text"))
        val (labels, route) = graft.ops.Graph.dedupClustersRouted(
          pairs, col("id_a"), col("id_b"))
        fields += s""""curation_route":"$route""""
        labels.count()
      }
      if (want("buckets")) {
        val (maxB, overCap) = minhashBucketStats(d, 1000)
        val (maxP, overCapP) = jaccardPrefixBucketStats(d, 1000)
        fields += s""""max_minhash_bucket":$maxB,"buckets_over_cap":$overCap"""
        fields += s""""max_prefix_bucket":$maxP,"prefix_over_cap":$overCapP"""
      }
      println(s"""{"scale":$m,"docs":$nDocs,"vecs":$nVecs,"events":$nEv""" +
        fields.map("," + _).mkString + "}")
      d.unpersist(); e.unpersist(); ev.unpersist()
    }
    if (want("ivfregime")) {
      // IVFADC in the regime it exists for (r13 verdict #3): the in-loop
      // ivfpq family is fit-dominated at ≤32k vectors, so the nProbe
      // pruning lever — the operator's entire point — had no measured
      // win. Here: ~1M vectors (SPARK_GRAFT_PROBE_IVF_M × base, default
      // 512), codebooks pre-fit on the base corpus, index built ONCE and
      // persisted, then SEARCH-ONLY wall across nProbe ∈ {1,4,16,64} vs
      // the full-scan ADC baseline over the same persisted code table,
      // plus recall@10 against that full scan — the pruning lever's
      // cost/quality curve. Runs OUTSIDE the scales loop: its corpus is
      // one explode (not the loop's m-branch unions), jittered ±0.35
      // per dim (hash-deterministic) so copies spread across cells
      // instead of collapsing onto 64 duplicate directions.
      import graft.ops.{Ivf, Pq}
      val bigM = sys.env.getOrElse("SPARK_GRAFT_PROBE_IVF_M", "512").toInt
      val nCells = 64
      val jitter = transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("base_id"), col("k"), i), lit(4001L))
          - 2000L).cast("double") / 2000.0 * 0.35)
      // the cached base table is 1–2 partitions; the explode inherits
      // that and would run the whole 1M-vector build single-threaded —
      // widen FIRST so the ×bigM expansion lands distributed (the same
      // partitioning a real corpus scan would already have)
      val corpus = embs.repartition(cpus.toInt * 2)
        .select(col("vec_id").as("base_id"),
          col("embedding"),
          explode(sequence(lit(0L), lit(bigM - 1L))).as("k"))
        .select((col("base_id") + lit(10000000L) * col("k")).as("vec_id"),
          when(col("k") === 0, col("embedding"))
            .otherwise(zip_with(col("embedding"), jitter,
              (x, j) => (x.cast("double") + j).cast("float")))
            .as("embedding"))
      val fieldsR = scala.collection.mutable.ListBuffer[String]()
      val cb = Pq.fit(embs, col("vec_id"), col("embedding"),
        dims = 64, m = 8, k = 16, iters = 2)
      var indexed: DataFrame = null
      var coarse: IndexedSeq[Seq[Long]] = null
      val (buildS, nVec) = timed {
        val (ix, co) = Ivf.ivfAdcIndex(corpus, col("vec_id"),
          col("embedding"), cb, nCells, coarseIters = 2)
        indexed = ix.persist(); coarse = co
        indexed.count()
      }
      fieldsR += s""""ivfreg_vecs":$nVec,"ivfreg_build_s":$buildS"""
      // two query batches: `mem` — corpus members (their true neighbors
      // share their cell: the favorable case); `out` — out-of-corpus
      // perturbations (0.5× jitter off a base vector: neighbors can
      // straddle cells, so recall vs nProbe shows the honest tradeoff)
      val qmem = embs.filter(col("vec_id") < 8)
      val qout = embs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("base_id"), col("embedding"),
          lit(777L).as("k"))
        .select(col("base_id").as("vec_id"),
          zip_with(col("embedding"), jitter,
            (x, j) => (x.cast("double") + j * 0.5).cast("float"))
            .as("embedding"))
      Seq("mem" -> qmem, "out" -> qout).foreach { case (qm, qdf) =>
        // all result sets are 80 rows — collect once, compare on the
        // driver (a recall JOIN would re-run the search per comparison)
        val (fullS, fullRows) = {
          val t0 = System.nanoTime()
          val r = Pq.adcTopK(indexed, qdf, col("vec_id"),
              col("embedding"), cb, k = 10)
            .select(col("query_id"), col("item_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          ((System.nanoTime() - t0) / 1e9, r)
        }
        fieldsR += s""""ivfreg_${qm}_fullscan_s":$fullS"""
        Seq(1, 4, 16, nCells).distinct.foreach { np =>
          val t0 = System.nanoTime()
          val rows = Ivf.ivfAdcSearch(indexed, coarse, qdf,
              col("vec_id"), col("embedding"), cb, k = 10, nProbe = np)
            .select(col("query_id"), col("item_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          val sS = (System.nanoTime() - t0) / 1e9
          val recall = rows.count(fullRows).toDouble / fullRows.size
          fieldsR += s""""ivfreg_${qm}_np${np}_s":$sS,""" +
            s""""ivfreg_${qm}_np${np}_recall":$recall"""
        }
      }
      indexed.unpersist()
      println(s"""{"ivfreg_m":$bigM,""" + fieldsR.mkString(",") + "}")
    }
    docs.unpersist(); embs.unpersist(); events.unpersist()
    spark.stop()
  }
}
