package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, TextAnalytics}

/** TF-IDF keyword extraction and grouped exact percentiles. */
class TfidfSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("tfidf: corpus-wide terms score 0, rare terms rank first") {
    val df = docs(Seq(
      (0L, "common apple apple"),
      (1L, "common banana"),
      (2L, "common cherry cherry cherry")))
    val out = TextAnalytics.tfidfTopTerms(df, col("doc_id"), col("text"), k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
    // "common" appears in all 3 docs: ln(3/3) = 0 — never outranks a
    // doc-specific term
    val first = out.filter(_._2 == 1L)
    assert(first.map(t => t._1 -> t._3).toSet ==
      Set(0L -> "apple", 1L -> "banana", 2L -> "cherry"))
    // tf=2 × ln(3/1): apple
    val apple = first.find(_._1 == 0L).get
    assert(math.abs(apple._4 - math.round(2 * math.log(3.0) * 1e6) / 1e6) < 1e-9)
    out.filter(t => t._3 == "common").foreach(t => assert(t._4 == 0.0))
  }

  test("tfidf ranks deterministically on rounded score then term") {
    // two terms with mathematically equal scores: tf=2 @ df=2 vs tf=1 @
    // df=1 over N=4 → 2·ln(2) vs ln(4); round-6 must tie them and the
    // lexicographic tie-break decide
    val df = docs(Seq(
      (0L, "aaa aaa zzz"),
      (1L, "aaa aaa"),
      (2L, "filler"),
      (3L, "filler2")))
    val out = TextAnalytics.tfidfTopTerms(df, col("doc_id"), col("text"), k = 2)
      .filter(col("doc_id") === 0)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(1L -> "aaa", 2L -> "zzz"))
  }

  test("qualityFilter: each rule independently drops its violators") {
    // 40 distinct words + a few stopwords: no rule trips
    val longText = (1 to 40).map(i => s"word$i").mkString(" ") +
      " the a of it is and"
    val df = docs(Seq(
      (0L, longText),                       // passes everything
      (1L, "too short but the a of"),       // < 20 tokens
      (2L, ("spam " * 100) + "the a of it is and normal filler here now ok"), // repetition
      (3L, (1 to 40).map(i => s"w$i").mkString(" ")))) // no stopwords
    val out = TextAnalytics.qualityFilter(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> false, 3L -> false))
  }

  test("containment: a fully-quoted passage scores 1.0 where Jaccard is small") {
    val passage = "the quick brown fox jumps over the lazy dog"
    // DISTINCT filler words: repeated filler would dedupe to ~3 shingles
    // and leave the union passage-dominated
    val long = (1 to 60).map(i => s"pad$i").mkString(" ") +
      s" $passage " + (61 to 120).map(i => s"pad$i").mkString(" ")
    val df = docs(Seq((0L, passage), (1L, long), (2L, "unrelated text here")))
    val out = graft.ops.Dedup.containmentPairs(df, df.filter(col("doc_id") === 0),
      col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == 1.0, s"quoted passage must be fully contained: $out")
    assert(!out.contains(2L))
    val jac = graft.ops.Dedup.ngramJaccardPairs(df, df.filter(col("doc_id") === 0),
      col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(jac(1L) < 0.2, s"symmetric jaccard should be small: $jac")
  }

  test("canonicalize: case, NFC form and whitespace runs collapse to one key") {
    val df = docs(Seq(
      (0L, "Café  du   Monde"),          // composed é, multi-space
      (1L, "cafe\u0301 du monde"),  // decomposed e + combining acute
      (2L, "  CAFÉ DU MONDE "),          // case + padding
      (3L, "different text")))
    val keys = TextAnalytics.canonicalKey(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(0L) == keys(1L) && keys(1L) == keys(2L))
    assert(keys(3L) != keys(0L))
  }

  test("groupedPercentiles: linear interpolation on a known sequence") {
    val df = spark.createDataFrame((1 to 5).map(i => ("g", i.toDouble)))
      .toDF("k", "v")
    val out = Relational.groupedPercentiles(df, col("k"), col("v"),
      Seq(0.25, 0.5, 0.9)).collect().head
    assert(out.getDouble(1) == 2.0) // (5-1)*0.25 = index 1 exactly
    assert(out.getDouble(2) == 3.0)
    assert(math.abs(out.getDouble(3) - 4.6) < 1e-12) // index 3.6 → 4 + 0.6
  }
}
