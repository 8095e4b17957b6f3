package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalytics

/** Repetition / duplicated-n-gram quality signals + BM25 retrieval. */
class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-counted ratios, incl. short-doc fallback") {
    val df = Seq(
      1L -> "a b a b a",   // 2-grams: ab ba ab ba (4 occ, 2 distinct)
      2L -> "x y z",       // all grams unique
      3L -> "w",           // < n: whole-doc fallback, 1 gram, ratio 0
      4L -> "").toDF("doc_id", "text")
    val out = TextAnalytics.repetitionStats(df, col("doc_id"), col("text"),
        ns = Seq(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 4L, 2L, 0.5),
      (2L, 2L, 2L, 2L, 0.0),
      (3L, 2L, 1L, 1L, 0.0)))
  }

  test("repetitionStats: one row per requested n") {
    val df = Seq(1L -> "a b c a b c a").toDF("doc_id", "text")
    val out = TextAnalytics.repetitionStats(df, col("doc_id"), col("text"),
        ns = Seq(2, 3))
      .collect().map(r => (r.getLong(1), r.getDouble(4))).toMap
    // 2-grams: ab bc ca ab bc ca → 6 occ 3 distinct; 3-grams: abc bca cab
    // abc bca → 5 occ 3 distinct
    assert(out(2L) == 0.5)
    assert(out(3L) == 0.4)
  }

  test("duplicatedNgramFraction: cross-doc grams flagged, within-doc not") {
    val df = Seq(
      1L -> "p q r s",     // grams: pqr qrs — pqr shared with doc 2
      2L -> "p q r t",     // grams: pqr qrt
      3L -> "u v w u v w u v",  // repeats only within itself: uvw vwu wuv uvw vwu wuv
      4L -> "z z").toDF("doc_id", "text") // short: whole-doc gram "z z", unshared
    val out = TextAnalytics.duplicatedNgramFraction(
        df, col("doc_id"), col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.5),   // pqr duplicated, qrs not
      (2L, 2L, 1L, 0.5),
      (3L, 6L, 0L, 0.0),   // intra-doc repeats are NOT cross-doc dups
      (4L, 1L, 0L, 0.0)))
  }

  test("bm25TopK: exact scores vs a reference implementation") {
    val docs = Seq(
      1L -> "spark spark spark noise words here",
      2L -> "spark window",
      3L -> "window window window window vector",
      4L -> "noise only document").toDF("doc_id", "text")
    val out = TextAnalytics.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "vector", "window"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // reference BM25 (k1=1.2, b=0.75) computed the same way
    val lens = Map(1L -> 6.0, 2L -> 2.0, 3L -> 5.0, 4L -> 3.0)
    val avgdl = 16.0 / 4.0
    val tfs = Map(
      (1L, "spark") -> 3.0, (2L, "spark") -> 1.0, (2L, "window") -> 1.0,
      (3L, "window") -> 4.0, (3L, "vector") -> 1.0)
    val dfs = Map("spark" -> 2.0, "vector" -> 1.0, "window" -> 2.0)
    def score(doc: Long): Double = {
      val s = Seq("spark", "vector", "window").map { t =>
        tfs.get((doc, t)).fold(0.0) { tf =>
          val idf = math.log(1.0 + (4.0 - dfs(t) + 0.5) / (dfs(t) + 0.5))
          idf * tf * (1.2 + 1.0) /
            (tf + 1.2 * (0.25 + 0.75 * lens(doc) / avgdl))
        }
      }
      BigDecimal(s.reduce(_ + _)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    // doc 4 matches no term — absent; others ranked by rounded score desc
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L))
    val expected = Seq(1L, 2L, 3L).map(d => d -> score(d)).toMap
    out.foreach { case (_, doc, _, s) => assert(s == expected(doc), s"doc $doc") }
    // ranks are 1..3 ordered by score desc, doc_id ties
    val byRank = out.sortBy(_._1).map(_._2)
    val want = Seq(1L, 2L, 3L).sortBy(d => (-expected(d), d))
    assert(byRank.toSeq == want)
    // n_terms column counts matched terms
    assert(out.find(_._2 == 2L).get._3 == 2L)
  }

  test("bm25TopK: k truncates and repeated query terms don't double-count") {
    val docs = (1L to 30L).map(i => i -> s"spark ${"pad " * i.toInt}")
      .toDF("doc_id", "text")
    val once = TextAnalytics.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("spark"), k = 5).collect()
    val twice = TextAnalytics.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("spark", "SPARK"), k = 5).collect()
    assert(once.length == 5 && twice.length == 5)
    assert(once.map(_.toSeq).toSeq == twice.map(_.toSeq).toSeq)
  }

  test("unigramLogProb: hand-computed micro-nat sums; null text -> zeros") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a a b"), (2L, "b"), (3L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    // freq: a=2, b=2, total=4 -> ln(0.5)*1e6 = -693147.18 -> floor -693148
    val lp = math.floor(math.log(0.5) * 1e6).toLong
    assert(lp == -693148L)
    val out = TextAnalytics.unigramLogProb(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 3 * lp), (2L, 1L, lp), (3L, 0L, 0L)))
    // partition-order independence: integer sums cannot drift
    val again = TextAnalytics.unigramLogProb(
        docs.repartition(5), col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("bigramLogProb: hand-computed add-one-smoothed sums; short doc " +
    "-> zeros") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b a"), (2L, "b a"), (3L, "a")))
      .toDF("doc_id", "text")
    // bigrams: doc1 {"a b","b a"}, doc2 {"b a"}; c12: "a b"=1, "b a"=2
    // c1: a=1, b=2; V=2 ("a","b" — doc3 adds no new token)
    // lp("a b") = floor(ln(2/3)*1e6); lp("b a") = floor(ln(3/4)*1e6)
    val lpAb = math.floor(math.log(2.0 / 3.0) * 1e6).toLong
    val lpBa = math.floor(math.log(3.0 / 4.0) * 1e6).toLong
    assert(lpAb == -405466L && lpBa == -287683L)
    val out = TextAnalytics.bigramLogProb(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 2L, lpAb + lpBa), (2L, 1L, lpBa), (3L, 0L, 0L)))
    val again = TextAnalytics.bigramLogProb(
        docs.repartition(5), col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("oovRate: vocab tie-break by (count desc, term), zero-token docs " +
    "excluded, hand-counted rates") {
    // counts: a=4, b=3, c=2, d=2, e=1 → vocabSize=3 keeps a,b,c
    // (c beats d on the term tie-break)
    val docs = Seq(
      1L -> "a a b c d",    // oov: d → 1/5
      2L -> "a b c d e",    // oov: d,e → 2/5
      3L -> "a a b",        // oov: none → 0/3
      4L -> "").toDF("doc_id", "text")
    val out = TextAnalytics.oovRate(docs, col("doc_id"), col("text"),
        vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, 1L, 0.2), (2L, 5L, 2L, 0.4), (3L, 3L, 0L, 0.0)))
  }
}
