package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Snapshot diff: change taxonomy, null-safety, output minimality. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")

  test("added / removed / changed / unchanged are classified exactly") {
    val cur = Seq(
      (1L, "a", 10.0),          // unchanged — must NOT appear
      (2L, "b", 21.0),          // changed (v)
      (4L, "d", 40.0),          // changed (null -> value)
      (5L, "e", 50.0))          // added; 3 removed
      .toDF("k", "s", "v")
    val out = Relational.snapshotDiff(base, cur, Seq("k"))
      .select(col("k"), col("change")).as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("identical snapshots diff to zero rows") {
    assert(Relational.snapshotDiff(base, base, Seq("k")).isEmpty)
  }

  test("old/new structs carry the audit values") {
    val cur = base.withColumn("v",
      when(col("k") === 2, lit(99.0)).otherwise(col("v")))
    val row = Relational.snapshotDiff(base, cur, Seq("k")).head()
    assert(row.getAs[Long]("k") == 2L)
    assert(row.getAs[org.apache.spark.sql.Row]("old").getAs[Double]("v") == 20.0)
    assert(row.getAs[org.apache.spark.sql.Row]("new").getAs[Double]("v") == 99.0)
  }

  test("both snapshots bucketed on the key: the diff join plans NO hash " +
    "exchange (the warehouse-scale posture — pay the shuffle at ingest)") {
    val cur = Seq((1L, "a", 10.0), (2L, "b", 21.0), (5L, "e", 50.0))
      .toDF("k", "s", "v")
    Relational.writeBucketed(base, "sd_base", "k", buckets = 4)
    Relational.writeBucketed(cur, "sd_cur", "k", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diff = Relational.snapshotDiff(
        spark.table("sd_base"), spark.table("sd_cur"), Seq("k"))
      val physical = diff.queryExecution.executedPlan.toString
      // the full-outer join itself must be exchange-free; the only
      // exchange allowed is the final presentation orderBy's range
      // partitioning (droppable at scale)
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed diff join must not shuffle:\n$physical")
      val out = diff.select(col("k"), col("change"))
        .as[(Long, String)].collect().toMap
      assert(out == Map(2L -> "changed", 3L -> "removed",
        4L -> "removed", 5L -> "added"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS sd_base")
      spark.sql("DROP TABLE IF EXISTS sd_cur")
    }
  }

  test("mismatched schemas are rejected loudly") {
    intercept[IllegalArgumentException] {
      Relational.snapshotDiff(base, base.drop("v"), Seq("k"))
    }
  }
}
