package graft

import graft.sources.BlogCorpus

/** P7 malformed-XML scanner contract (a1p2b_ahuja.py:20–61). */
class BlogCorpusSpec extends SparkSpec {

  test("P7 parses (date, post) pairs and reorders date to year-month") {
    val text =
      """<Blog>
        |<date>05,June,2004</date>
        |<post> hello world </post>
        |<date>10,July,2003</date>
        |<post>second post</post>
        |</Blog>""".stripMargin
    val out = BlogCorpus.parseBlog(text).toSeq
    assert(out == Seq(("2004-June", " hello world "),
      ("2003-July", "second post")))
  }

  test("P7 tolerates junk between tags and stray markup (not well-formed XML)") {
    val text = "garbage <b>here</b> <date>1,May,2001</date> noise " +
      "<post>p1</post> trailing <date>2,May,2001</date><post>p2</post> tail"
    val out = BlogCorpus.parseBlog(text).toSeq
    assert(out == Seq(("2001-May", "p1"), ("2001-May", "p2")))
  }

  test("P7 stops at unterminated tags instead of crashing") {
    assert(BlogCorpus.parseBlog("<date>1,May,2001</date><post>never ends").isEmpty)
    assert(BlogCorpus.parseBlog("<date>1,May,2001").isEmpty)
    assert(BlogCorpus.parseBlog("no tags at all").isEmpty)
  }

  test("P7 skips a date without three comma fields") {
    val out = BlogCorpus.parseBlog(
      "<date>baddate</date><post>x</post><date>3,June,2002</date><post>y</post>")
    assert(out.toSeq == Seq(("2002-June", "y")))
  }

  test("reference tokenizer splits on hyphen (zero-count industry quirk)") {
    val toks = "lawenforcement-security works".split(BlogCorpus.PostDelimiters).toSeq
    assert(toks.contains("lawenforcement") && toks.contains("security"))
    assert(!toks.contains("lawenforcement-security"))
  }

  test("end-to-end industry mentions over generated fixture files") {
    val dir = BlogCorpus.ensureFixtures(spark, "/root/testdata/sf0.001", maxFiles = 24)
    val out = BlogCorpus.industryMentions(spark, dir).collect()
    assert(out.nonEmpty)
    val words = out.map(_.getString(0)).toSet
    // hyphenated industry can never match (split on '-')
    assert(!words.contains("lawenforcement-security"))
    // all result words are industries
    assert(words.subsetOf(BlogCorpus.Industries.map(_.toLowerCase).toSet))
    // series strings are "ym:cnt" comma-joined
    assert(out.forall(_.getString(1).split(",").forall(_.matches("\\d{4}-[A-Za-z]+:\\d+"))))
  }
}
