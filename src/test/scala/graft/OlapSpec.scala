package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Pivot, rollup, and running-window aggregates. */
class OlapSpec extends SparkSpec {

  test("pivotCounts: explicit domain, absent combos are 0") {
    val df = spark.createDataFrame(Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"))).toDF("k", "t")
    val out = Relational.pivotCounts(df, "k", col("t"), Seq("a", "b", "c"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 0L), (2L, 0L, 1L, 0L)))
  }

  test("rollupCounts: every prefix level with ALL sentinels") {
    val df = spark.createDataFrame(Seq(
      ("x", "m1"), ("x", "m1"), ("x", "m2"), ("y", "m1"))).toDF("a", "b")
    val out = Relational.rollupCounts(df,
      Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("x", "m1", 2L), ("x", "m2", 1L), ("y", "m1", 1L),
      ("x", "ALL", 3L), ("y", "ALL", 1L), ("ALL", "ALL", 4L)))
  }

  test("runningAgg: cumulative and trailing-k sums per key") {
    val df = spark.createDataFrame(Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (1L, 4L, 40L),
      (2L, 5L, 7L))).toDF("k", "seq", "v")
    val out = Relational.runningAgg(df, col("k"), Seq(col("seq")),
      col("v"), k = 3)
      .select("k", "seq", "cum_v", "trail_v", "trail_n")
      .orderBy("k", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 10L, 10L, 1L), (1L, 2L, 30L, 30L, 2L),
      (1L, 3L, 60L, 60L, 3L), (1L, 4L, 100L, 90L, 3L),
      (2L, 5L, 7L, 7L, 1L)))
  }
}
