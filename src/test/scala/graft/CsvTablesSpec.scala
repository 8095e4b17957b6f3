package graft

import org.apache.spark.sql.functions._

import graft.sources.CsvTables

/** CSV source: explicit-schema read, exact typed round trip. */
class CsvTablesSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  test("events CSV round-trips exactly (longs, strings, doubles)") {
    val path = CsvTables.ensureEventsCsv(spark, sf)
    val fromCsv = CsvTables.eventsFromCsv(spark, path)
    val expected = Tables.events(spark, sf)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
    assert(fromCsv.count() == expected.count())
    // exact equality including doubles: Spark writes shortest-round-trip
    // representations, so parse(write(x)) == x bit-for-bit
    assert(fromCsv.except(expected).isEmpty)
    assert(expected.except(fromCsv).isEmpty)
  }

  test("ensureEventsCsv is idempotent by content marker") {
    val p1 = CsvTables.ensureEventsCsv(spark, sf)
    val m1 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p1))
    val p2 = CsvTables.ensureEventsCsv(spark, sf)
    val m2 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p2))
    assert(p1 == p2 && m1 == m2)
  }
}
