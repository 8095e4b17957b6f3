package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalytics

/** PII redaction: golden strings per category, ordering contract, counts. */
class PiiRedactionSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text")
      .select(TextAnalytics.redactPii(col("text")).as("r"))
      .head().getString(0)

  test("each category redacts to its typed placeholder") {
    assert(redact("mail me at jo.doe+spam@sub.example.co.uk thanks")
      == "mail me at <EMAIL> thanks")
    assert(redact("see https://example.com/a?b=1&c=2 for details")
      == "see <URL> for details")
    assert(redact("host 192.168.001.042 down") == "host <IP> down")
    assert(redact("call +1-555-0142 now") == "call <PHONE> now")
    assert(redact("call (555)123-4567 now") == "call <PHONE> now")
  }

  test("URL wins over the email-shaped userinfo inside it") {
    // without URL-first ordering this would leave 'https://<EMAIL>/x'
    assert(redact("https://user@example.com/x rest")
      == "<URL> rest")
  }

  test("IPv4 is not swallowed by the phone pattern") {
    assert(redact("10.0.3.7 then +1-555-0100")
      == "<IP> then <PHONE>")
  }

  test("prose number runs survive (phone class has no spaces or dots)") {
    assert(redact("values 10 20 30 40 50 and pi 3.14159")
      == "values 10 20 30 40 50 and pi 3.14159")
  }

  test("piiScan counts match the raw text and nulls pass through") {
    val df = Seq(
      (1L, "a@b.com and c@d.org via https://e.f 1.2.3.4"),
      (2L, "clean text"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalytics.piiScan(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(out(0).fieldIndex("n_email")) == 2)
    assert(out(0).getLong(out(0).fieldIndex("n_url")) == 1)
    assert(out(0).getLong(out(0).fieldIndex("n_ip")) == 1)
    assert(out(1).getString(1) == "clean text")
    assert(out(2).isNullAt(1))
  }
}
