package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** JSONL (newline-delimited JSON) ingestion path — the interchange format
  * most raw training-data drops arrive in (one document/event object per
  * line, splittable, appendable).
  *
  * Same engine-side contract as [[CsvTables]]: an EXPLICIT schema (at
  * 100 TB, schema inference is a second full scan AND a correctness
  * hazard — a column that happens to be all-integers in the sampled
  * files widens later and breaks the plan), permissive-mode handling
  * left to the caller.
  *
  * The fixture is a deterministic projection of the harness `events`
  * table INCLUDING the raw `props` JSON string — written through Spark's
  * JSON writer it becomes a JSON-escaped string value, so the round trip
  * exercises the quoting dialect (JSON-in-JSON) on top of the typed
  * long/double/string columns. The oracle recomputes the same aggregate
  * from the parquet table, transitively hash-checking write → escape →
  * parse → unescape → `from_json` field extraction end to end. */
object JsonTables {

  // bump when the fixture layout below changes
  private val FixtureVersion = "v1"

  val eventsJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_s", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Write the events projection as ONE .jsonl file (idempotent by content
    * marker; a pure function of (sfDir, version)). Returns the file path. */
  def ensureEventsJsonl(spark: SparkSession, sfDir: String): String = {
    val dest = Paths.get("/tmp/graft_fixtures/jsonl_events/events.jsonl")
    SingleFileFixture.ensure(dest, s"$FixtureVersion|$sfDir") { stage =>
      Tables.events(spark, sfDir)
        .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy("event_id")
        .coalesce(1)
        .write.mode("overwrite")
        .json(stage.toString)
    }
  }

  /** Read an events JSONL with the explicit schema (no inference pass). */
  def eventsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventsJsonSchema)
      .json(path)

  /** Permissive JSON parse with an explicit quarantine verdict — the
    * ingest contract for dirty feeds: NEVER fail the job on a corrupt
    * record, NEVER silently drop it either. Adds `parsed` (the struct,
    * NULL on syntactically invalid JSON) and `json_ok`; downstream splits
    * on the flag (good rows continue, bad rows land in a quarantine sink
    * with full provenance). Per-row, codegen'd, no shuffle — the verdict
    * costs nothing beyond the parse the pipeline needed anyway.
    *
    * Semantics note: `json_ok = false` means NOT PARSEABLE (Spark's
    * `from_json` yields a NULL struct). Valid JSON missing the schema's
    * fields parses to a struct of NULLs with `json_ok = true` — schema
    * drift is [[graft.ops.Profiler.profile]]'s job (null rates), not the
    * quarantine's. Jackson stops at the first complete value, so TRAILING
    * garbage after a valid object is tolerated (`{"k":1}{` is ok=true) —
    * stricter whole-string validation would need a second parse; cross-
    * engine checks must corrupt prefixes, not suffixes. */
  def parseWithQuarantine(df: DataFrame, json: Column,
                          schemaDdl: String): DataFrame = {
    // PERMISSIVE mode never nulls the struct — corruption is detected the
    // documented way: a columnNameOfCorruptRecord field that captures the
    // raw record exactly when the parse failed
    val schema = StructType.fromDDL(schemaDdl)
      .add(StructField("_corrupt", StringType))
    df.withColumn("parsed", from_json(json, schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .withColumn("json_ok",
        json.isNotNull && col("parsed._corrupt").isNull)
  }
}
