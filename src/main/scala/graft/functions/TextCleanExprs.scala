package graft.functions

import org.apache.spark.sql.catalyst.expressions._

/** The text-cleaning chains as raw Catalyst expression trees — the ONE
  * definition behind both surfaces: [[graft.ops.TextAnalytics]] wraps
  * them into Columns for the DataFrame API, [[GraftExtensions]] injects
  * them as SQL functions (`graft_redact_pii`, `graft_html_to_text`,
  * `graft_html_title`). Built from Spark's own codegen'd expressions
  * (RegExpReplace/StringReplace/StringTrim/RegExpExtract), so both
  * surfaces stay inside whole-stage codegen.
  *
  * Regex patterns are deliberately in the Java-regex/RE2 shared subset so
  * an independent SQL engine replays the chains verbatim (the
  * `pii_redaction` / `html_extract` oracles do exactly that). */
object TextCleanExprs {

  /** PII patterns — the phone class deliberately excludes '.' and ' ':
    * dots keep IPv4 addresses out of the phone matcher, spaces keep runs
    * of small numbers in prose from being swallowed as one "phone". */
  val UrlRe   = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "[+(]?\\d[\\d()\\-]{6,}\\d"

  private def rr(e: Expression, pat: String, rep: String): Expression =
    RegExpReplace(e, Literal(pat), Literal(rep))

  /** Redaction order is part of the contract: URLs first (an email-shaped
    * userinfo inside a URL must vanish with the URL), then emails, then
    * IPv4 (before phones — both are digit runs, but dots are only in the
    * IP class), then phones. */
  def redactPii(text: Expression): Expression =
    rr(rr(rr(rr(text, UrlRe, "<URL>"), EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")

  /** Drop script/style blocks WITH contents, strip tags, decode the five
    * predefined entities (`&amp;` LAST — decoding it first would
    * double-decode `&amp;lt;`), collapse whitespace. */
  def htmlToText(html: Expression): Expression = {
    val noBlocks = rr(rr(html, "(?s)<script.*?</script>", " "),
      "(?s)<style.*?</style>", " ")
    val noTags = rr(noBlocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (ent, ch)) =>
        StringReplace(e, Literal(ent), Literal(ch))
      }
    StringTrim(rr(decoded, "\\s+", " "))
  }

  /** First `<title>` contents ("" when absent). */
  def htmlTitle(html: Expression): Expression =
    RegExpExtract(html, Literal("(?s)<title>(.*?)</title>"), Literal(1))
}
