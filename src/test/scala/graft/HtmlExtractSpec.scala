package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalytics

/** HTML → text: block stripping, tag stripping, entity decode order. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(s: String): String =
    Seq(s).toDF("h").select(TextAnalytics.htmlToText(col("h")).as("r"))
      .head().getString(0)

  test("script and style blocks vanish WITH their contents") {
    assert(extract("<p>keep</p><script>var a = 1 && b<2;</script><p>this</p>")
      == "keep this")
    assert(extract("<style>p{color:red}</style>body") == "body")
  }

  test("tags strip to spaces; entities decode; whitespace collapses") {
    assert(extract("<h1>a</h1>\n\n<p>b &amp; c &lt;d&gt; &quot;e&quot; &#39;f</p>")
      == "a b & c <d> \"e\" 'f")
  }

  test("&amp; decodes LAST — no double decoding") {
    // '&amp;lt;' is the TEXT '&lt;', not a '<'
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
  }

  test("htmlTitle pulls the first title, empty when absent") {
    val out = Seq(
      "<html><title>T1</title><title>T2</title></html>",
      "<html>no title</html>")
      .toDF("h").select(TextAnalytics.htmlTitle(col("h")).as("t"))
      .as[String].collect()
    assert(out.toSeq == Seq("T1", ""))
  }

  test("heavyHitters is exact and integer-thresholded") {
    // 10 'a', 5 'b', 1 'c' → total 16; k=3 keeps cnt*3 >= 16 → a(30),b(15?)
    // 5*3=15 < 16 → only 'a'
    val df = Seq(("a " * 10) + ("b " * 5) + "c").toDF("text")
    val hh = TextAnalytics.heavyHitters(df, col("text"), k = 3)
      .select("token").as[String].collect().toSeq
    assert(hh == Seq("a"))
  }

  test("topTerms ranks by count desc then term, exactly k rows") {
    val df = Seq("b b b a a c d").toDF("text")
    val tt = TextAnalytics.topTerms(df, col("text"), k = 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(tt == Seq((1L, "b", 3L), (2L, "a", 2L), (3L, "c", 1L)))
  }
}
