package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOf, RangeJoin, Relational}

/** As-of join, binned range join, latest-snapshot compaction — the
  * temporal operators (point-in-time lookup, non-equi time matching, CDC
  * compaction). */
class AsOfRangeSpec extends SparkSpec {

  private def events(rows: Seq[(Long, Long, Long, String)]) =
    spark.createDataFrame(rows).toDF("event_id", "user_id", "ts_s", "kind")

  test("as-of backward: latest right row at-or-before each left row") {
    val left = events(Seq((100L, 1L, 50L, "p"), (101L, 1L, 10L, "p"),
      (102L, 2L, 30L, "p")))
    val right = events(Seq((1L, 1L, 20L, "c"), (2L, 1L, 50L, "c"),
      (3L, 1L, 60L, "c"), (4L, 2L, 30L, "c")))
    val out = AsOf.backward(left, right,
      leftKey = col("user_id"), rightKey = col("user_id"),
      leftTs = col("ts_s"), rightTs = col("ts_s"),
      rightTieBreak = col("event_id"),
      leftCols = Seq("p_id" -> col("event_id"), "p_ts" -> col("ts_s")),
      rightCols = Seq("c_id" -> col("event_id"), "c_ts" -> col("ts_s")))
      .select("p_id", "c_id", "c_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // p100@50 matches c2@50 (at-or-before is INCLUSIVE, beats c1@20);
    // p101@10 has no prior click and drops; p102@30 matches c4@30 same-ts
    assert(out == Set((100L, 2L, 50L), (102L, 4L, 30L)))
  }

  test("as-of: right rows sharing (key, ts) dedupe to max tie-break") {
    val left = events(Seq((100L, 1L, 50L, "p")))
    val right = events(Seq((7L, 1L, 40L, "c"), (9L, 1L, 40L, "c"),
      (8L, 1L, 40L, "c")))
    val out = AsOf.backward(left, right,
      col("user_id"), col("user_id"), col("ts_s"), col("ts_s"),
      col("event_id"),
      leftCols = Seq("p_id" -> col("event_id")),
      rightCols = Seq("c_id" -> col("event_id")))
      .select("c_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(9L))
  }

  test("as-of forward: earliest right row at-or-after each left row") {
    val left = events(Seq((100L, 1L, 50L, "e"), (101L, 1L, 70L, "e"),
      (102L, 2L, 30L, "e")))
    val right = events(Seq((1L, 1L, 20L, "p"), (2L, 1L, 50L, "p"),
      (3L, 1L, 60L, "p"), (4L, 2L, 30L, "p")))
    val out = AsOf.forward(left, right,
      leftKey = col("user_id"), rightKey = col("user_id"),
      leftTs = col("ts_s"), rightTs = col("ts_s"),
      rightTieBreak = col("event_id"),
      leftCols = Seq("e_id" -> col("event_id"), "e_ts" -> col("ts_s")),
      rightCols = Seq("p_id" -> col("event_id"), "p_ts" -> col("ts_s")))
      .select("e_id", "p_id", "p_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // e100@50 matches p2@50 (at-or-after is INCLUSIVE, beats p3@60);
    // e101@70 has no later purchase and drops; e102@30 matches p4@30
    assert(out == Set((100L, 2L, 50L), (102L, 4L, 30L)))
  }

  test("as-of forward: right rows sharing (key, ts) dedupe to MIN tie-break") {
    val left = events(Seq((100L, 1L, 30L, "e")))
    val right = events(Seq((7L, 1L, 40L, "p"), (9L, 1L, 40L, "p"),
      (8L, 1L, 40L, "p")))
    val out = AsOf.forward(left, right,
      leftKey = col("user_id"), rightKey = col("user_id"),
      leftTs = col("ts_s"), rightTs = col("ts_s"),
      rightTieBreak = col("event_id"),
      leftCols = Seq("e_id" -> col("event_id")),
      rightCols = Seq("p_id" -> col("event_id")))
      .select("p_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(7L))
  }

  test("range join within ±w: exactly the true pairs, boundaries inclusive") {
    val l = events(Seq((1L, 0L, 1000L, "e")))
    val r = events(Seq((2L, 0L, 700L, "x"), (3L, 0L, 701L, "x"),
      (4L, 0L, 1299L, "x"), (5L, 0L, 1300L, "x"), (6L, 0L, 1301L, "x"),
      (1L, 0L, 1000L, "x")))
    val out = RangeJoin.within(l, r, col("event_id"), col("ts_s"),
      col("event_id"), col("ts_s"), 300L)
      .select("right_id").collect().map(_.getLong(0)).toSet
    // 700 is exactly -300 (inclusive), 1300 exactly +300; 1301/699 out;
    // identical id excluded even at distance 0
    assert(out == Set(2L, 3L, 4L, 5L))
  }

  test("range join counts match a brute-force cross join; isolated left " +
    "rows surface with cnt=0") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map(i =>
      (i.toLong, (i % 7).toLong, rng.nextInt(5000).toLong, "x")) :+
      (999L, 0L, 1000000L, "x") // far from everything: must appear as 0
    val df = events(rows)
    val errors = df.filter(col("user_id") === 0)
    val binned = RangeJoin.countWithin(errors, df, col("event_id"),
      col("ts_s"), col("event_id"), col("ts_s"), 250L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = errors.as("e").crossJoin(df.as("x"))
      .filter(abs(col("e.ts_s") - col("x.ts_s")) <= 250 &&
        col("e.event_id") =!= col("x.event_id"))
      .groupBy(col("e.event_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned(999L) == 0L)
    assert(binned.filter(_._2 > 0L) == brute)
    // EVERY left row has a verdict
    assert(binned.keySet == errors.collect().map(_.getLong(0)).toSet)
  }

  test("countWithin: every sub-bin width gives the same exact counts " +
    "(prefix+boundary at w>1, atomic bins at w=1)") {
    val rng = new scala.util.Random(17)
    // dense cluster + sparse tail + exact window-edge hits
    val rows = (0 until 400).map(i =>
      (i.toLong, 0L, rng.nextInt(800).toLong, "x")) ++
      Seq((500L, 0L, 1050L, "x"), (501L, 0L, 1300L, "x"),
        (502L, 0L, 1550L, "x"))
    val df = events(rows)
    val lft = df.filter(col("event_id") % 5 === 0)
    val brute = lft.as("e").crossJoin(df.as("x"))
      .filter(abs(col("e.ts_s") - col("x.ts_s")) <= 250 &&
        col("e.event_id") =!= col("x.event_id"))
      .groupBy(col("e.event_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
    for (w <- Seq(1L, 3L, 50L, 250L)) { // 1 = atomic path, 250 = W itself
      val got = RangeJoin.countWithin(lft, df, col("event_id"), col("ts_s"),
        col("event_id"), col("ts_s"), 250L, subBinS = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == lft.collect().map(_.getLong(0)).toSet)
      assert(got.forall { case (k, v) => v == brute(k) }, s"subBin=$w")
    }
  }

  test("countWithin: left rows far outside the right span clamp to 0; " +
    "repeated same-id right rows inside the window are all excluded") {
    val l = events(Seq((1L, 0L, 1000L, "e"), (2L, 0L, -900000L, "e"),
      (3L, 0L, 900000L, "e")))
    // id 1 appears THREE times on the right inside the window — all three
    // must be excluded from id 1's count; ids 2/3 sit far outside the
    // right span on both sides (prefix lookups clamp to the sentinel/max)
    val r = events(Seq((1L, 0L, 1000L, "x"), (1L, 0L, 1100L, "x"),
      (1L, 0L, 900L, "x"), (7L, 0L, 1200L, "x"), (8L, 0L, 690L, "x")))
    for (w <- Seq(0L, 1L, 10L)) { // 0 = adaptive
      val got = RangeJoin.countWithin(l, r, col("event_id"), col("ts_s"),
        col("event_id"), col("ts_s"), 300L, subBinS = w)
        .collect().map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L), s"subBin=$w")
    }
  }

  test("countWithin: empty right side yields cnt=0 for every left row") {
    val l = events(Seq((1L, 0L, 10L, "e"), (2L, 0L, 20L, "e")))
    val r = events(Seq.empty[(Long, Long, Long, String)])
    val got = RangeJoin.countWithin(l, r, col("event_id"), col("ts_s"),
      col("event_id"), col("ts_s"), 300L)
      .collect().map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("resampleInterpolate: interior gaps fill linearly, no extrapolation") {
    import org.apache.spark.sql.functions.col
    // key 1 observed at t=0 (v=10) and t=30 (v=40), step 10:
    // grid 0,10,20,30 → interpolated 20, 30 at the gaps
    val df = spark.createDataFrame(Seq(
      (1L, 0L, 10.0), (1L, 30L, 40.0),
      (2L, 5L, 7.0))) // single observation → one grid point, no gaps
      .toDF("k", "ts", "v")
    val out = Relational.resampleInterpolate(df,
      key = col("k"), tsSec = col("ts"), value = col("v"), stepSec = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(out == Seq(
      (1L, 0L, 10.0, true), (1L, 10L, 20.0, false),
      (1L, 20L, 30.0, false), (1L, 30L, 40.0, true),
      (2L, 0L, 7.0, true)))
  }

  test("latestPerKey keeps exactly the newest row, ties to max tie-break") {
    val df = events(Seq((1L, 1L, 10L, "a"), (2L, 1L, 30L, "b"),
      (5L, 1L, 30L, "c"), (3L, 2L, 5L, "d")))
    val out = Relational.latestPerKey(df, Seq(col("user_id")),
      version = col("ts_s"), tieBreak = col("event_id"))
      .select("user_id", "event_id", "kind")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 5L, "c"), (2L, 3L, "d")))
  }
}
