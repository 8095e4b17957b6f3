package graft

import org.apache.spark.sql.functions._

import graft.sources.JsonTables

/** JSONL source: explicit-schema read, exact typed round trip including
  * the JSON-escaped `props` string. */
class JsonTablesSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  test("events JSONL round-trips exactly (longs, doubles, JSON-in-JSON)") {
    val path = JsonTables.ensureEventsJsonl(spark, sf)
    val fromJson = JsonTables.eventsFromJsonl(spark, path)
    val expected = Tables.events(spark, sf)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    assert(fromJson.count() == expected.count())
    // exact equality including doubles (shortest-round-trip JSON numbers)
    // and the props string (escape -> unescape must be the identity)
    assert(fromJson.except(expected).isEmpty)
    assert(expected.except(fromJson).isEmpty)
  }

  test("props stays parseable after the round trip") {
    val path = JsonTables.ensureEventsJsonl(spark, sf)
    val ks = JsonTables.eventsFromJsonl(spark, path)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
        .getField("k").as("k"))
    assert(ks.filter(col("k").isNull).count() == 0)
  }

  test("parseWithQuarantine: corrupt rows flag false, valid rows parse, " +
    "schema drift stays ok") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7}"""),      // valid
      (2L, """{{"k": 7}"""),     // corrupt prefix → quarantine
      (3L, """not json"""),      // → quarantine
      (4L, """{"other": 1}"""),  // valid JSON, missing field → ok, k null
      (5L, null.asInstanceOf[String]), // null input → quarantine
      (6L, """{"k": 7}{"""))     // trailing garbage: Jackson TOLERATES it
      .toDF("id", "js")
    val out = JsonTables.parseWithQuarantine(df, col("js"), "k LONG")
      .select(col("id"), col("json_ok"), col("parsed.k"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(1L) == (true, Some(7L)))
    assert(out(2L)._1 == false)
    assert(out(3L)._1 == false)
    assert(out(4L) == (true, None))
    assert(out(5L)._1 == false)
    assert(out(6L) == (true, Some(7L))) // documented Jackson semantics
  }

  test("ensureEventsJsonl is idempotent by content marker") {
    val p1 = JsonTables.ensureEventsJsonl(spark, sf)
    val m1 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p1))
    val p2 = JsonTables.ensureEventsJsonl(spark, sf)
    val m2 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p2))
    assert(p1 == p2 && m1 == m2)
  }
}
