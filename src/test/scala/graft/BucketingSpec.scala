package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Bucketing = co-located joins: both sides pre-bucketed on the join key
  * join with ZERO exchanges (the pay-shuffle-at-ingest pattern). */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle") {
    import spark.implicits._
    val left = (0 until 1000).map(i => (i % 97, s"l$i")).toDF("k", "lv")
    val right = (0 until 500).map(i => (i % 97, s"r$i")).toDF("k", "rv")
    Relational.writeBucketed(left, "b_left", "k", buckets = 8)
    Relational.writeBucketed(right, "b_right", "k", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")
      // and it is still correct
      val expect = (0 until 1000).map(_ % 97).groupBy(identity)
        .map { case (k, ls) => k -> ls.size.toLong }
      val rightCounts = (0 until 500).map(_ % 97).groupBy(identity)
        .map { case (k, rs) => k -> rs.size.toLong }
      val got = joined.groupBy("k").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val model = expect.map { case (k, nl) =>
        k -> nl * rightCounts.getOrElse(k, 0L)
      }.filter(_._2 > 0)
      assert(got == model)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("aggregation on the bucket key also plans no shuffle") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i % 13, i.toLong)).toDF("k", "v")
    Relational.writeBucketed(df, "b_agg", "k", buckets = 4)
    try {
      val agg = spark.table("b_agg").groupBy("k").agg(sum("v").as("s"))
      val physical = agg.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$physical")
      val got = agg.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val model = (0 until 300).map(i => (i % 13, i.toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got == model)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
