package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ORC ingestion path — the second columnar format beside parquet
  * (source-format breadth: parquet, ORC, CSV, JSONL, binaryFile,
  * wholetext, zip members).
  *
  * Unlike the text sources, ORC carries its schema in the file footer,
  * so no explicit read schema (and no inference scan) is needed — the
  * contract this source checks is TYPED round-trip fidelity through a
  * second columnar encoding: timestamps (micros), nullable strings,
  * doubles and longs must all survive write→read bit-for-bit. The
  * fixture is a deterministic projection of the harness `events` table
  * written once behind a content marker ([[SingleFileFixture]]); the
  * oracle recomputes the same aggregate from the original parquet,
  * transitively hash-checking the whole ORC round trip.
  */
object OrcTables {

  // bump when the fixture layout below changes
  private val FixtureVersion = "v1"

  /** Write the events projection (all typed columns, including the raw
    * TimestampType and the nullable `props` JSON string) as ONE ORC
    * file. Idempotent by content marker; a pure function of
    * (sfDir, version). Returns the orc file path. */
  def ensureEventsOrc(spark: SparkSession, sfDir: String): String = {
    val dest = Paths.get("/tmp/graft_fixtures/orc_events/events.orc")
    SingleFileFixture.ensure(dest, s"$FixtureVersion|$sfDir") { stage =>
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .orderBy("event_id")
        .coalesce(1)
        .write.mode("overwrite").orc(stage.toString)
    }
  }

  /** Read events back from ORC (schema from the file footer — footer
    * metadata, not a data scan). */
  def eventsFromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
