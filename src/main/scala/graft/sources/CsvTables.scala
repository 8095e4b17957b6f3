package graft.sources

import java.nio.file.Paths

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
    * would exercise quoting dialects, which [[JsonTables]] covers — this
    * source checks the typed round trip. */
  def ensureEventsCsv(spark: SparkSession, sfDir: String): String = {
    val dest = Paths.get("/tmp/graft_fixtures/csv_events/events.csv")
    SingleFileFixture.ensure(dest, s"$FixtureVersion|$sfDir") { stage =>
      Tables.events(spark, sfDir)
        .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
        .coalesce(1)
        .write.mode("overwrite").option("header", "true")
        .csv(stage.toString)
    }
  }

  /** Read the events CSV with the explicit schema (no inference pass). */
  def eventsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventsCsvSchema)
      .option("header", "true")
      .csv(path)
}
