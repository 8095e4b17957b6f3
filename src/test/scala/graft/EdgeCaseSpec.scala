package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalytics, VectorOps}

/** Degenerate inputs a 100 TB corpus will contain: empty documents,
  * punctuation-only text, nulls. Operators must degrade gracefully, not
  * throw (Spark 4 runs ANSI mode: even double division by zero errors). */
class EdgeCaseSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("text operators survive empty / punctuation-only / single-char docs") {
    val df = docs((1, ""), (2, "!!! ???"), (3, "x"), (4, "normal text here"))
    val stats = TextAnalytics.docStats(df, col("doc_id"), col("text"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats(1) == 0L && stats(2) == 0L && stats(3) == 1L && stats(4) == 3L)
    assert(TextAnalytics.languageId(df, col("doc_id"), col("text")).count() == 4)
    assert(TextAnalytics.fingerprint(df, col("doc_id"), col("text")).count() == 4)
    assert(TextAnalytics.tokenBudget(df, col("doc_id"), col("text")).count() == 4)
    assert(TextAnalytics.langIdNgram(df, col("doc_id"), col("text")).count() == 4)
    assert(TextAnalytics.wordCount(df, col("text")).count() == 4) // x, normal, text, here
  }

  test("dedup operators survive empty and near-empty docs") {
    val df = docs((1, ""), (2, ""), (3, "a"), (4, "a"), (5, "real content words"))
    // empty docs are exact dups of each other (shingle of "")
    val mh = Dedup.minhashDupPairs(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(mh.toSet == Set((1, 2), (3, 4)))
    val sh = Dedup.simhashDupPairs(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(sh.toSet.contains((1, 2)) && sh.toSet.contains((3, 4)))
    assert(Dedup.exact(df, col("doc_id"), col("text")).count() == 3)
  }

  test("null text flows to null/absent rows, not exceptions") {
    val df = spark.createDataFrame(Seq(
      (1, "some text"), (2, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    // kernels are null-intolerant expressions -> null propagates; explode
    // of null produces no rows
    val mh = Dedup.minhashDupPairs(df, col("doc_id"), col("text")).count()
    assert(mh == 0)
    val wc = TextAnalytics.wordCount(df.filter(col("text").isNotNull), col("text"))
    assert(wc.count() == 2)
  }

  test("vector ops survive zero vectors (cosine guarded by caller contract)") {
    val df = spark.createDataFrame(Seq(
      (1, Array(0f, 0f, 0f)), (2, Array(1f, 2f, 3f))))
      .toDF("vec_id", "embedding")
    // norms fine for zero vectors
    val n = VectorOps.norms(df, col("vec_id"), col("embedding"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(n(1) == 0.0 && math.abs(n(2) - math.sqrt(14.0)) < 1e-9)
    // dimStats over a constant-zero dim: var 0, no error
    val ds = VectorOps.dimStats(df, col("embedding")).collect()
    assert(ds.length == 3)
  }

  test("qualityFilter: zero-token docs surface with keep=false, not vanish") {
    val df = docs(0 -> "", 1 -> "...!!!...",
      2 -> ((1 to 40).map(i => s"w$i").mkString(" ") + " the a of it is"))
    val out = TextAnalytics.qualityFilter(df, col("doc_id"), col("text"))
      .collect().map(r => r.getInt(0) -> r.getBoolean(4)).toMap
    assert(out == Map(0 -> false, 1 -> false, 2 -> true))
  }

  test("dimStats survives large magnitudes: exact decimal sum of squares") {
    // |value| = 3000 → scaled vu = 3e9, vu² = 9e18 ≈ Long.MaxValue: TWO
    // rows overflow a BIGINT sum of squares; the decimal path stays exact
    val df = spark.createDataFrame(
      Seq.fill(3)(Tuple1(Array(3000f))).zipWithIndex.map { case (v, i) => (i, v._1) })
      .toDF("vec_id", "embedding")
    val r = VectorOps.dimStats(df, col("embedding")).collect().head
    assert(r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 3000.0) < 1e-6) // mean
    assert(math.abs(r.getDouble(3)) < 1e-6)          // var_pop of constants = 0
  }

  test("langIdNgram: null text yields a null row, not an NPE") {
    val df = spark.createDataFrame(Seq(
      (0, "the quick brown fox and the lazy dog"), (1, null: String)))
      .toDF("doc_id", "text")
    val out = TextAnalytics.langIdNgram(df, col("doc_id"), col("text"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out == Map(0 -> false, 1 -> true))
  }

  test("Lsh.buckets: empty signature yields zero bands, not an exception") {
    assert(graft.ops.Lsh.buckets("", 13).isEmpty)
    assert(graft.ops.Lsh.buckets(null, 13).isEmpty)
  }

  test("temporal/graph operators survive empty inputs") {
    val empty = spark.createDataFrame(Seq.empty[(Long, Long, Long)])
      .toDF("event_id", "user_id", "ts_s")
    val some = spark.createDataFrame(Seq((1L, 1L, 100L)))
      .toDF("event_id", "user_id", "ts_s")
    assert(graft.ops.AsOf.backward(some, empty,
      col("user_id"), col("user_id"), col("ts_s"), col("ts_s"),
      col("event_id"),
      leftCols = Seq("l" -> col("event_id")),
      rightCols = Seq("r" -> col("event_id"))).isEmpty)
    assert(graft.ops.RangeJoin.within(empty, some, col("event_id"),
      col("ts_s"), col("event_id"), col("ts_s"), 60L).isEmpty)
    assert(graft.ops.Graph.connectedComponents(
      empty.select(col("event_id").as("a"), col("user_id").as("b")),
      col("a"), col("b")).isEmpty)
    // tf-idf on an empty corpus: no rows, no division-by-zero on N
    assert(TextAnalytics.tfidfTopTerms(docs(), col("doc_id"), col("text"))
      .isEmpty)
  }

  test("round-8 operators survive empty and degenerate inputs") {
    import spark.implicits._
    // psiDrift: every row in ONE period — the other side is all add-one
    // smoothing mass, finite and exact; empty input yields zero rows
    val onePeriod = Seq((1.0, true), (2.0, true)).toDF("value", "is_base")
    val psi = graft.ops.Profiler.psiDrift(onePeriod, col("value"),
      col("is_base"), bins = 4, binWidth = 1.0).collect()
    assert(psi.length == 2 && psi.forall(r => !r.getDouble(3).isNaN
      && !r.getDouble(3).isInfinite))
    val noRows = spark.createDataFrame(Seq.empty[(Double, Boolean)])
      .toDF("value", "is_base")
    assert(graft.ops.Profiler.psiDrift(noRows, col("value"),
      col("is_base"), bins = 4, binWidth = 1.0).isEmpty)
    // personalized PageRank: seed set disjoint from the graph — every
    // node scores exactly 0 (no teleport mass anywhere)
    val e = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val ppr = graft.ops.Graph.personalizedPageRank(e, col("a"), col("b"),
        Seq(99L).toDF("doc_id"), col("doc_id"), iterations = 2)
      .collect().map(r => r.getLong(1))
    assert(ppr.length == 2 && ppr.forall(_ == 0L))
    // retrievalEval: empty truth — all ranks emitted with zero metrics
    val sys = Seq((1L, 10L)).toDF("rank", "doc_id")
    val noRel = spark.createDataFrame(Seq.empty[(Long, Long)])
      .toDF("doc_id", "rel")
    val ev = graft.ops.Relational.retrievalEval(sys, noRel).collect()
    assert(ev.length == 1 && ev(0).getLong(2) == 0L
      && ev(0).getDouble(3) == 0.0 && ev(0).getDouble(4) == 0.0)
    // star contraction on a two-node graph: one round, both labeled min
    val star = graft.ops.Graph.connectedComponentsStar(
        Seq((7L, 3L)).toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(3L -> 3L, 7L -> 3L))
  }

  test("round-6 operators survive empty and degenerate inputs") {
    import graft.ops.{Graph, Profiler, Relational}
    val empty = spark.createDataFrame(Seq.empty[(Long, Long, Double)])
      .toDF("k", "id", "v")
    val one = spark.createDataFrame(Seq((1L, 1L, 5.0))).toDF("k", "id", "v")
    // pagerank over no edges: no nodes, no rows, no failure
    assert(Graph.pageRank(
      empty.select(col("k").as("a"), col("id").as("b")),
      col("a"), col("b")).isEmpty)
    // profiler on zero rows: one row per column, zero counts, null min/max
    val p = Profiler.profile(empty, Seq("k" -> col("k"), "v" -> col("v")))
      .orderBy("column").collect()
    assert(p.length == 2 && p.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L
        && r.isNullAt(4) && r.isNullAt(5)))
    // z-score: singleton groups have zero variance -> no rows, no ANSI
    // division error
    assert(Profiler.zscoreOutliers(one, col("k"), col("id"), col("v"), 2.0)
      .isEmpty)
    // transition matrix: one event per key -> no bigrams
    assert(Relational.transitionMatrix(one, col("k"), Seq(col("id")),
      col("v").cast("string")).isEmpty)
    // bloom prefilter join with an EMPTY dimension: empty result
    assert(Relational.bloomPrefilterJoin(
      one.select(col("id").as("fk")),
      empty.select(col("id").as("dk")), "fk", "dk").isEmpty)
    // state merge where one side is empty == the other side
    val base = one.groupBy("k").agg(count(lit(1)).as("n"))
    val merged = Relational.mergePartialStates(
      base, base.filter(lit(false)), Seq("k"), Seq("n")).collect()
    assert(merged.length == 1 && merged.head.getLong(1) == 1L)
  }

  test("round-7 operators survive empty and degenerate inputs") {
    import graft.ops.{Clustering, Relational}
    val emptyDocs = docs()
    // chunking: stride == window (no overlap) still covers every token
    val ch = TextAnalytics.chunkTokens(docs(1 -> "a b c d e"),
      col("doc_id"), col("text"), window = 2, stride = 2)
      .collect().map(r => (r.getLong(1), r.getString(3)))
    assert(ch.toSeq == Seq((0L, "a b"), (1L, "c d"), (2L, "e")))
    // chunking and packing over an empty corpus: no rows, no failure
    assert(TextAnalytics.chunkTokens(emptyDocs, col("doc_id"), col("text"),
      window = 4, stride = 2).isEmpty)
    assert(TextAnalytics.packSequences(emptyDocs, col("doc_id"), col("text"),
      budget = 8L).isEmpty)
    // packing at budget 1: every doc starts its own offset run
    val pk = TextAnalytics.packSequences(
      docs(1 -> "a b", 2 -> "c"), col("doc_id"), col("text"), budget = 1L)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(pk.toSeq == Seq((1, 0L, 0L), (2, 2L, 0L)))
    // prefix sum over an empty frame: no rows, no driver failure
    assert(Relational.prefixSumByRange(
      emptyDocs.select(col("doc_id"), lit(1L).as("v")),
      Seq(col("doc_id")), col("v"), "cum").isEmpty)
    // k-means wants k rows: fail fast with the contract message
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansExact(
        spark.createDataFrame(Seq((1L, Seq(0.0)))).toDF("id", "v"),
        col("id"), col("v"), k = 3, iters = 1)
    }
    assert(e.getMessage.contains("k-means needs"))
    // simhash md5 twin: empty corpus yields no pairs, not a failure
    assert(Dedup.simhashMd5DupPairs(emptyDocs, col("doc_id"), col("text"))
      .isEmpty)
  }

  test("round-7 batch-2+ operators survive empty and degenerate inputs") {
    import graft.ops.{Profiler, Relational, Sampling, Sketches}
    val emptyDocs = docs()
    // PII scan: empty corpus and null text both flow through
    assert(TextAnalytics.piiScan(emptyDocs, col("doc_id"), col("text"))
      .isEmpty)
    // HTML extraction: unclosed tags and bare text degrade gracefully
    val h = docs((1, "<p>unclosed"), (2, "no markup"), (3, ""))
    val bodies = TextAnalytics.htmlToText(col("text"))
    assert(h.select(bodies).collect().map(_.getString(0)).toSeq
      == Seq("unclosed", "no markup", ""))
    // heavy hitters / top terms over an empty corpus: no rows, and no
    // div-by-zero from the zero total (ANSI mode)
    assert(TextAnalytics.heavyHitters(emptyDocs, col("text"), k = 10).isEmpty)
    assert(TextAnalytics.topTerms(emptyDocs, col("text"), k = 10).isEmpty)
    // decontaminate with an empty eval set: nothing flags
    assert(Dedup.decontaminate(docs(1 -> "some train doc text here"),
      emptyDocs, col("doc_id"), col("text")).isEmpty)
    // snapshotDiff: both sides empty → empty; one side empty → all rows
    val empty2 = spark.createDataFrame(Seq.empty[(Long, Double)])
      .toDF("k", "v")
    val one = spark.createDataFrame(Seq((1L, 2.0))).toDF("k", "v")
    assert(Relational.snapshotDiff(empty2, empty2, Seq("k")).isEmpty)
    assert(Relational.snapshotDiff(empty2, one, Seq("k"))
      .head().getAs[String]("change") == "added")
    // key skew over empty input: no rows, no driver failure
    assert(Profiler.keySkew(emptyDocs, col("doc_id"), topN = 5).isEmpty)
    // rolling outliers: constant series (variance 0) and short series
    // (cold start) both emit nothing
    val flat = spark.createDataFrame(
      (1 to 10).map(i => (1L, i.toLong, i.toLong, 7.0)))
      .toDF("k", "eid", "ord", "v")
    assert(Profiler.rollingOutliers(flat, col("k"), Seq(col("ord")),
      col("eid"), col("v"), lookback = 5, threshold = 1.0, minPrev = 3)
      .isEmpty)
    // count-min over empty input: empty sketch, estimates come back 0
    val sk = Sketches.cmBuild(emptyDocs.select(col("text").as("item")),
      col("item"))
    assert(Sketches.cmEstimate(sk,
      spark.createDataFrame(Seq(Tuple1("q"))).toDF("item"), "item")
      .head().getAs[Long]("est") == 0L)
    // token budget sample: empty input and zero-token docs flow through
    assert(Sampling.tokenBudgetSample(
      emptyDocs.select(col("doc_id"), lit("s").as("src"), col("text"),
        lit(0L).as("n")),
      col("src"), col("text"), col("doc_id"), col("n"), budget = 10)
      .isEmpty)
  }

  test("round-7 batch-3 operators survive empty and degenerate inputs") {
    import graft.ops.{Linkage, Profiler, Relational, Sampling}
    val emptyDocs = docs()
    // LM scorers: empty corpus (total = 0 never divides — no rows reach
    // the ratio), and a corpus of only null text
    assert(TextAnalytics.unigramLogProb(emptyDocs, col("doc_id"),
      col("text")).isEmpty)
    assert(TextAnalytics.bigramLogProb(emptyDocs, col("doc_id"),
      col("text")).isEmpty)
    val nulls = spark.createDataFrame(
      Seq((1, null.asInstanceOf[String]))).toDF("doc_id", "text")
    assert(TextAnalytics.unigramLogProb(nulls, col("doc_id"), col("text"))
      .head().getLong(1) == 0L)
    // linkage: empty input, and a block of one record (no pairs)
    val emptyRecs = spark.createDataFrame(Seq.empty[(Long, String, String)])
      .toDF("id", "blk", "name")
    assert(Linkage.blockedFuzzyPairs(emptyRecs, col("id"), col("blk"),
      col("name"), maxDist = 2).isEmpty)
    assert(Linkage.sortedNeighborPairs(emptyRecs, col("id"), col("name"),
      window = 3, maxDist = 2).isEmpty)
    assert(Linkage.blockedFuzzyPairs(
      spark.createDataFrame(Seq((1L, "b", "x"))).toDF("id", "blk", "name"),
      col("id"), col("blk"), col("name"), maxDist = 2).isEmpty)
    // histogram: empty input and all-null column emit no bins
    val noVals = spark.createDataFrame(Seq.empty[Tuple1[Option[Double]]])
      .toDF("v")
    assert(Profiler.histogram(noVals, col("v"), bins = 4).isEmpty)
    assert(Profiler.histogram(
      spark.createDataFrame(Seq(Tuple1(Option.empty[Double]))).toDF("v"),
      col("v"), bins = 4).isEmpty)
    // applyChanges: empty change batch returns the base unchanged
    import spark.implicits._
    val base = Seq((1L, 10L)).toDF("key", "val")
    val noChanges = spark.createDataFrame(
      Seq.empty[(Long, Long, Boolean, Long, Long)])
      .toDF("key", "val", "del", "v", "tie")
    assert(Relational.applyChanges(base, noChanges, "key", col("del"),
      col("v"), col("tie")).collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((1L, 10L)))
    // clusterSafeSplits with no similarity pairs: everyone is a singleton
    val noPairs = spark.createDataFrame(Seq.empty[(Long, Long)])
      .toDF("id_a", "id_b")
    val css = Sampling.clusterSafeSplits(
      spark.range(3).toDF("doc_id"), col("doc_id"), noPairs,
      col("id_a"), col("id_b"), Seq("train" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(css.toSeq.sorted == Seq((0L, 0L), (1L, 1L), (2L, 2L)))
    // weightedSample: null weight drops the row (three-valued filter)
    assert(Sampling.weightedSample(docs(1 -> "abc"), col("text"),
      lit(null).cast("double")).isEmpty)
    // labelCentroidDists: single label -> no pairs
    val oneLabel = Seq((0, Seq(1.0f)), (0, Seq(2.0f))).toDF("label", "v")
    assert(graft.ops.VectorOps.labelCentroidDists(oneLabel, col("label"),
      col("v")).isEmpty)
    // removeDuplicatedSpans: empty corpus -> no rows; null text rides
    // through whole as zero tokens (the coalesce-to-empty tokenization)
    assert(Dedup.removeDuplicatedSpans(
      spark.createDataFrame(Seq.empty[(Long, String)])
        .toDF("doc_id", "text"),
      col("doc_id"), col("text")).isEmpty)
    val nullDoc = spark.createDataFrame(
      Seq((7L, null.asInstanceOf[String]), (8L, "x y z"),
        (9L, "x y z q"))).toDF("doc_id", "text")
    val spanOut = Dedup.removeDuplicatedSpans(nullDoc, col("doc_id"),
      col("text")).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(spanOut(7L) == ((0L, 0L, "")))
    assert(spanOut(8L) == ((0L, 3L, ""))) // "x y z" duplicated in doc 9
    assert(spanOut(9L) == ((1L, 3L, "q")))
    // semanticDecontaminate: an EMPTY eval set yields no audit rows (the
    // cross join is inner-shaped) — callers gate on eval-set emptiness,
    // same contract as the lexical decontaminate's flagged-only output
    val vecs = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(Dedup.semanticDecontaminate(vecs,
      spark.createDataFrame(Seq.empty[(Long, Array[Float])])
        .toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding")).isEmpty)
  }
}
