package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's blog-corpus pipeline surface (SURVEY.md §2.2 P7/P9/P10,
  * §2.1 S3/S4): malformed-XML blog files named
  * `user.gender.age.industry.sign.xml`, each holding `<date>`/`<post>` pairs
  * that are NOT well-formed XML (`Assignment 1/CSE545 spec` p.2 Notes — so
  * no `from_xml`; a hand scanner is required, a1p2b_ahuja.py:20–61).
  *
  * - S3 whole-file read with encoding repair (a1p2b:8–17): Spark's text
  *   source with `wholetext` reads UTF-8 with replacement characters —
  *   the same `errors='replace'` posture as the reference.
  * - S4/P10: the industry vocabulary comes from FILENAMES
  *   (`input_file_name()`, split('.')[-3], a1p2b:94) — not from content.
  * - P7 [[parseBlog]]: linear scan for `<date>…</date>` then the next
  *   `<post>…</post>`; date "day,month,year" → "year-month" (a1p2b:44–46).
  *
  * [[ensureFixtures]] materializes a deterministic blog corpus on local
  * disk, derived from the harness `documents` table, so the query reads
  * REAL files through the real source path (and the DuckDB oracle reads the
  * same files via `read_text`). Fixture generation is driver-side by design
  * — it is test scaffolding, not an operator; the pipeline itself is all
  * distributed scans.
  */
object BlogCorpus {

  /** Industries assigned round-robin to files. All but the last are words
    * that occur in the synthetic corpus; `lawenforcement-security` mirrors
    * the reference's zero-count quirk — the tokenizer splits on '-', so a
    * hyphenated industry can never match (a1p2b tail comment). */
  val Industries: Seq[String] = Seq(
    "data", "spark", "query", "vector", "stream", "window",
    "hash", "batch", "filter", "merge", "customer",
    "lawenforcement-security")

  val Months: Seq[String] = Seq("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")

  /** P7: scan text into (date, post) pairs. Faithful to the reference's
    * tag scanner (a1p2b:20–61): find `<date>`, its `</date>`, then the next
    * `<post>` and its `</post>`; anything between/around tags is skipped.
    * Unterminated tags end the scan; a date without 3 comma-fields is
    * skipped (the reference would crash — we drop the pair). */
  def parseBlog(text: String): Array[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var idx = 0
    var done = false
    while (!done) {
      val ds = text.indexOf("<date>", idx)
      if (ds < 0) done = true
      else {
        val de = text.indexOf("</date>", ds + 6)
        if (de < 0) done = true
        else {
          val date = text.substring(ds + 6, de)
          val ps = text.indexOf("<post>", de + 7)
          if (ps < 0) done = true
          else {
            val pe = text.indexOf("</post>", ps + 6)
            if (pe < 0) done = true
            else {
              val post = text.substring(ps + 6, pe)
              val parts = date.split(",")
              if (parts.length >= 3) out += ((parts(2) + "-" + parts(1), post))
              idx = pe + 7
            }
          }
        }
      }
    }
    out.toArray
  }

  val parseBlogUdf = udf((text: String) => parseBlog(text))

  /** Reference post tokenizer (a1p2b:68): split on the exact delimiter set
    * `' '  ,  .  :  ;  \n  \r  "  -  '  ?` — note '-' IS a delimiter. */
  val PostDelimiters = "[ ,\\.:;\n\r\"'?-]"

  // bump when the fixture file format below changes, so stale corpora
  // written by older code are regenerated
  private val FixtureVersion = "v1"

  /** Write (idempotently, per content) one blog file per `documents` row
    * with doc_id < `maxFiles`: `u<id>.<gender>.<age>.<industry>.<sign>.xml`
    * containing two dated posts of the document text. Returns the dir.
    *
    * Idempotence is by content marker: the corpus is a pure function of
    * (sfDir, maxFiles, generator version) — the `documents` table under
    * `sfDir` is immutable harness testdata — so when the marker matches,
    * the call returns without the driver-side collect or any file I/O.
    * That keeps repeated invocations (every Bench rep, every Verify run)
    * out of the timed path. */
  def ensureFixtures(spark: SparkSession, sfDir: String,
                     maxFiles: Int = 200): String = synchronized {
    val outDir = Paths.get("/tmp/graft_fixtures/blogs")
    val markerFile = outDir.resolve(".marker")
    val marker = s"$FixtureVersion|$sfDir|$maxFiles"
    if (Files.exists(markerFile)
        && new String(Files.readAllBytes(markerFile), StandardCharsets.UTF_8) == marker)
      return outDir.toString
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < maxFiles)
      .select(col("doc_id").cast("int"), col("text"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    if (Files.exists(outDir)) {
      val it = Files.list(outDir).iterator()
      while (it.hasNext) Files.delete(it.next())
    }
    Files.createDirectories(outDir)
    docs.foreach { case (id, text) =>
      val industry = Industries(id % Industries.size)
      val gender = if (id % 2 == 0) "male" else "female"
      val name = s"u$id.$gender.${20 + id % 40}.$industry.Aries.xml"
      val y1 = 2000 + id % 5
      val m1 = Months(id % 12)
      val m2 = Months((id + 5) % 12)
      val day = f"${id % 28 + 1}%02d"
      val content =
        s"""<Blog>
           |<date>$day,$m1,$y1</date>
           |<post>
           |$text
           |</post>
           |<date>$day,$m2,$y1</date>
           |<post>
           |$text
           |</post>
           |</Blog>
           |""".stripMargin
      Files.write(outDir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    Files.write(markerFile, marker.getBytes(StandardCharsets.UTF_8))
    outDir.toString
  }

  /** The full reference pipeline (§3.2): S3 wholetext scan + P9/P10
    * filename parsing + A6 distinct industry vocabulary + P7 parse +
    * explode + reference tokenizer + J2 broadcast semi join + A10 two-level
    * rollup. One declarative plan: the JOB-1/collect/broadcast round-trip
    * of the reference becomes a broadcast semi join Catalyst plans itself.
    */
  def industryMentions(spark: SparkSession, blogDir: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(blogDir)
      .select(input_file_name().as("fname"), col("value").as("content"))
    // P9 basename + P10 field-from-filename + A6 distinct
    val industries = files.select(
      lower(element_at(split(element_at(split(col("fname"), "/"), -1), "\\."), -3))
        .as("industry")).distinct()
    val words = files
      .select(explode(parseBlogUdf(col("content"))).as("dp"))
      .select(col("dp._1").as("ym"),
        explode(split(col("dp._2"), PostDelimiters)).as("w"))
      .select(col("ym"), lower(col("w")).as("word"))
    val mentions = words.join(broadcast(industries),
      words("word") === industries("industry"), "left_semi")
    mentions.groupBy("word", "ym").agg(count(lit(1)).as("cnt"))
      .groupBy("word")
      .agg(concat_ws(",",
        sort_array(collect_list(concat_ws(":", col("ym"), col("cnt")))))
        .as("series"))
      .orderBy("word")
  }
}
