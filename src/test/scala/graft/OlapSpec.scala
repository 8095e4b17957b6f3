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

  test("rollupCounts: genuine NULL group values stay distinct from ALL subtotals") {
    val df = spark.createDataFrame(Seq(
      (Option("x"), "m1"), (Option.empty[String], "m1"),
      (Option.empty[String], "m2"))).toDF("a", "b")
    val out = Relational.rollupCounts(df,
      Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the NULL-keyed data rows are "NULL", the rolled-up level is "ALL" —
    // no collision even though the underlying rollup emits NULL for both
    assert(out == Set(
      ("x", "m1", 1L), ("NULL", "m1", 1L), ("NULL", "m2", 1L),
      ("x", "ALL", 1L), ("NULL", "ALL", 2L), ("ALL", "ALL", 3L)))
  }

  test("cubeCounts: all 2^n grouping sets, including the rollup-skipped one") {
    val df = spark.createDataFrame(Seq(
      ("x", "m1"), ("x", "m1"), ("x", "m2"), ("y", "m1"))).toDF("a", "b")
    val out = Relational.cubeCounts(df,
      Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // rollup emits 6 rows; cube adds the (ALL, b) slice
    assert(out == Set(
      ("x", "m1", 2L), ("x", "m2", 1L), ("y", "m1", 1L),
      ("x", "ALL", 3L), ("y", "ALL", 1L), ("ALL", "ALL", 4L),
      ("ALL", "m1", 3L), ("ALL", "m2", 1L)))
  }

  test("transitionMatrix: bigram counts and row-normalized probabilities") {
    // user 1: a→b→a→c ; user 2: a→b  ⇒ from a: b×2 c×1; from b: a×1
    val df = spark.createDataFrame(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"))).toDF("u", "seq", "s")
    val out = Relational.transitionMatrix(df, col("u"), Seq(col("seq")), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)))
  }

  test("ntileExact == window ntile for every (n, buckets) shape, ties included") {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
    for ((n, buckets) <- Seq((100, 10), (103, 10), (7, 10), (57, 4), (1, 3))) {
      // v = id % 13 produces heavy ties straddling bucket boundaries
      val df = spark.range(n.toLong)
        .select(col("id"), (col("id") % 13).as("v"))
      val want = df.withColumn("t", ntile(buckets).over(w).cast("long"))
        .select("id", "t")
      val got = Relational.ntileExact(df, Seq(col("v"), col("id")), buckets,
        alias = "t").select("id", "t")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"n=$n buckets=$buckets")
    }
  }

  test("ntileExact plans without a single-partition exchange " +
    "(the global-window scale-killer)") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
    val out = Relational.ntileExact(df, Seq(col("v"), col("id")), 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"ntileExact must not move all data to one partition:\n$plan")
  }

  test("globalRowNumber: dense 1..n ranks in total order") {
    val df = spark.range(500).select(col("id"),
      ((col("id") * 7919) % 500).as("v"))
    val got = Relational.globalRowNumber(df, Seq(col("v"), col("id")))
      .orderBy("rn").collect().map(r => r.getAs[Long]("rn"))
    assert(got.toSeq == (1L to 500L))
    val first = Relational.globalRowNumber(df, Seq(col("v"), col("id")))
      .filter(col("rn") === 1).select("v").head().getLong(0)
    assert(first == 0L)
  }

  test("groupedPercentiles rejects colliding integer-percent names") {
    val df = spark.createDataFrame(Seq(("g", 1.0))).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Relational.groupedPercentiles(df, col("k"), col("v"), Seq(0.055, 0.06))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("percentile_approx (the unbounded-domain scale path) stays within " +
    "its accuracy bound of the exact percentile") {
    val rng = new scala.util.Random(17)
    val df = spark.createDataFrame(
      (0 until 20000).map(i => ("g", rng.nextGaussian() * 100)))
      .toDF("k", "v")
    val exact = Relational.groupedPercentiles(df, col("k"), col("v"), Seq(0.5, 0.9))
      .collect().head
    val approx = df.groupBy("k")
      .agg(percentile_approx(col("v"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("v"), lit(0.9), lit(10000)).as("p90"))
      .collect().head
    // GK-sketch rank error <= n/accuracy = 2 ranks here; on a smooth
    // distribution that is a tiny value band — assert a loose envelope
    assert(math.abs(exact.getDouble(1) - approx.getDouble(1)) < 2.0)
    assert(math.abs(exact.getDouble(2) - approx.getDouble(2)) < 2.0)
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
