package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** CSV ingestion path (source-format breadth beside parquet, binaryFile,
  * wholetext and zip members).
  *
  * The engine-side contract for text formats at scale: an EXPLICIT schema
  * (schema inference is a second full scan of 100 TB), header skipping,
  * and `columnNameOfCorruptRecord`-style permissive parsing left to the
  * caller. The CSV fixture itself is a deterministic projection of the
  * harness `events` table, written once behind a content marker (same
  * idempotence contract as [[BlogCorpus.ensureFixtures]]) — so the
  * oracle can recompute the same aggregate from the parquet table, which
  * transitively hash-checks the whole write→parse round trip (longs,
  * strings, and shortest-round-trip double rendering).
  */
object CsvTables {

  // bump when the fixture layout below changes
  private val FixtureVersion = "v1"

  val eventsCsvSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_s", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Write the events projection as ONE headered CSV file (idempotent by
    * content marker; a pure function of (sfDir, version)). Returns the
    * csv file path. `props` is intentionally excluded: embedded JSON
    * would exercise quoting dialects, which is a separate concern from
    * the typed round trip this source covers. */
  def ensureEventsCsv(spark: SparkSession, sfDir: String): String = synchronized {
    val outDir = Paths.get("/tmp/graft_fixtures/csv_events")
    val csvFile = outDir.resolve("events.csv")
    val markerFile = outDir.resolve(".marker")
    val marker = s"$FixtureVersion|$sfDir"
    if (Files.exists(markerFile)
        && new String(Files.readAllBytes(markerFile), StandardCharsets.UTF_8) == marker)
      return csvFile.toString
    val stage = outDir.resolve("_stage")
    Tables.events(spark, sfDir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(stage.toString)
    // close the directory stream (it holds an fd) and remove the staging
    // dir with its _SUCCESS/.crc leftovers once the part file is moved out
    val listing = Files.list(stage)
    val moved =
      try {
        val part = listing.iterator()
        var done = false
        while (part.hasNext && !done) {
          val p = part.next()
          if (p.getFileName.toString.startsWith("part-")) {
            Files.createDirectories(outDir)
            Files.move(p, csvFile,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            done = true
          }
        }
        done
      } finally listing.close()
    require(moved, s"no part file produced under $stage")
    val leftovers = Files.list(stage)
    try leftovers.iterator().forEachRemaining(Files.deleteIfExists(_))
    finally leftovers.close()
    Files.deleteIfExists(stage)
    Files.write(markerFile, marker.getBytes(StandardCharsets.UTF_8))
    csvFile.toString
  }

  /** Read the events CSV with the explicit schema (no inference pass). */
  def eventsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventsCsvSchema)
      .option("header", "true")
      .csv(path)
}
