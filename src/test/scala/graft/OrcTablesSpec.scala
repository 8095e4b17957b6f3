package graft

import org.apache.spark.sql.functions._

import graft.sources.OrcTables

/** ORC source: footer-schema read, exact typed round trip. */
class OrcTablesSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  test("events ORC round-trips exactly (timestamps, nullable strings, " +
    "doubles, longs)") {
    val path = OrcTables.ensureEventsOrc(spark, sf)
    val fromOrc = OrcTables.eventsFromOrc(spark, path)
    val expected = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    assert(fromOrc.schema == expected.schema)
    assert(fromOrc.count() == expected.count())
    assert(fromOrc.except(expected).isEmpty)
    assert(expected.except(fromOrc).isEmpty)
    // nullable props actually has nulls in the fixture (the round trip
    // must preserve them, not turn them into empty strings)
    assert(fromOrc.filter(col("props").isNull).count() ==
      expected.filter(col("props").isNull).count())
  }

  test("ensureEventsOrc is idempotent by content marker") {
    val p1 = OrcTables.ensureEventsOrc(spark, sf)
    val m1 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p1))
    val p2 = OrcTables.ensureEventsOrc(spark, sf)
    val m2 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p2))
    assert(p1 == p2 && m1 == m2)
  }
}
