package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, TextAnalytics}

/** Word-boundary, WordCount and set-difference contracts (SURVEY.md
  * §5.2.2; fixtures mirror the reference's inline smoke tests,
  * a1p1_ahuja.py:249–258,266). */
class TextRelationalSpec extends SparkSpec {

  test("P6 word boundary: 'Marketing.' matches, 'supermarketing' does not") {
    // Assignment-1 spec p.2 (ii)(2): token = maximal [a-z0-9] run
    val df = spark.createDataFrame(Seq(
      (1, "Now Marketing. is not supermarketing"))).toDF("id", "text")
    val toks = TextAnalytics.tokenize(df, col("id"), col("text"))
      .select("token").collect().map(_.getString(0)).toSeq
    assert(toks.count(_ == "marketing") == 1)
    assert(toks.count(_ == "supermarketing") == 1)
    assert(!toks.contains("marketing.")) // punctuation stripped
  }

  test("A1 word count on the reference corpus") {
    val data = Seq(
      (1, "The horse raced past the barn fell"),
      (2, "The complex houses married and single soldiers and their families"),
      (4, "I burn, I pine, I perish"),
      (6, "Be a yardstick of quality."))
    val df = spark.createDataFrame(data).toDF("id", "text")
    val wc = TextAnalytics.wordCount(df, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("the") == 3)    // The, the, The
    assert(wc("i") == 3)
    assert(wc("and") == 2)
    assert(wc("quality") == 1) // "quality." tokenizes clean
    assert(wc("horse") == 1)
  }

  test("J1 set difference: fruits fixture (R - S)") {
    import spark.implicits._
    val r = Seq("apple", "orange", "pear", "blueberry").toDF("x")
    val s = Seq("pear", "orange", "strawberry", "fig", "tangerine").toDF("x")
    val out = Relational.setDifference(r, s)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("apple", "blueberry"))
  }

  test("J1 set difference works for any comparable element type (ints)") {
    import spark.implicits._
    val r = Seq(1, 2, 3, 4, 5).toDF("x")
    val s = Seq(4, 5, 6).toDF("x")
    assert(Relational.setDifference(r, s)
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("J1 anti join keeps full row width") {
    val r = spark.createDataFrame(Seq((1, "a"), (2, "b"), (3, "c"))).toDF("k", "v")
    val s = spark.createDataFrame(Seq((2, "x"))).toDF("k2", "w")
    val out = Relational.antiJoin(r, s, col("k"), col("k2"))
      .collect().map(x => (x.getInt(0), x.getString(1))).sorted.toSeq
    assert(out == Seq((1, "a"), (3, "c")))
  }

  test("O1 top-k per group with deterministic tie-break") {
    val df = spark.createDataFrame(Seq(
      ("g1", 10, 1), ("g1", 10, 2), ("g1", 5, 3), ("g2", 7, 4)))
      .toDF("g", "score", "id")
    val out = Relational.topKPerGroup(df, Seq(col("g")),
      Seq(col("score").desc, col("id")), 2)
      .select("g", "id").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSet == Set(("g1", 1), ("g1", 2), ("g2", 4)))
  }

  test("A10 year-month rollup nests a deterministic series") {
    import java.sql.Timestamp
    val df = spark.createDataFrame(Seq(
      ("click", Timestamp.valueOf("2024-01-05 00:00:00")),
      ("click", Timestamp.valueOf("2024-01-20 00:00:00")),
      ("click", Timestamp.valueOf("2024-03-01 00:00:00")),
      ("view", Timestamp.valueOf("2024-02-01 00:00:00"))))
      .toDF("event_type", "ts")
    val out = Relational.yearMonthRollup(df, col("event_type"), col("ts"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("click") == "2024-01:2,2024-03:1")
    assert(out("view") == "2024-02:1")
  }

  test("n-gram language ID separates English / Spanish / French / German") {
    val df = spark.createDataFrame(Seq(
      (1, "the cat is in the house and the dog is in the garden of the king"),
      (2, "el gato esta en la casa y el perro esta en el jardin de los reyes que"),
      (3, "le chat est dans la maison et le chien est dans le jardin du roi que"),
      (4, "der hund und die katze sind in dem haus und in dem garten des konigs")))
      .toDF("doc_id", "text")
    val out = TextAnalytics.langIdNgram(df, col("doc_id"), col("text"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "en", s"got ${out(1)}")
    assert(out(2) == "es", s"got ${out(2)}")
    assert(out(3) == "fr", s"got ${out(3)}")
    assert(out(4) == "de", s"got ${out(4)}")
  }

  test("salted two-phase sum equals plain groupBy sum (skew tool)") {
    import spark.implicits._
    // heavy skew: one hot key
    val df = (Seq.fill(500)("hot") ++ Seq("a", "b", "b")).map((_, 1L))
      .toDF("k", "v")
    val salted = Relational.saltedSum(df, Seq("k"), col("v"), "total", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 500L, "a" -> 1L, "b" -> 2L))
  }

  test("P4/P5 HAVING-shaped filter after aggregation") {
    val df = spark.createDataFrame(Seq(
      (1, "a a a b"), (2, "b c"))).toDF("id", "text")
    val out = TextAnalytics.wordCount(df, col("text"))
      .filter(col("cnt") >= 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b"))
  }
}
