package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned temporal range join — match rows whose event times fall within
  * ±`window` seconds of each other, with NO equi-key (the hard case: an
  * equi-keyed range join is just a join plus a filter).
  *
  * A plain inequality join `abs(l.ts - r.ts) <= w` has no equi-condition,
  * so Spark plans a broadcast-nested-loop / cartesian product — O(|L|·|R|)
  * comparisons, dead at scale. Binning restores an equi-key: bucket both
  * sides into `window`-sized bins; any pair within ±window sits in the same
  * or an adjacent bin, so exploding each left row to its 3 candidate bins
  * and equi-joining on bin covers every true pair exactly once (the exact
  * |Δts| <= window predicate then prunes false candidates). Cost:
  * 3·|L| + |R| shuffled rows on the bin key and |pairs| ≈
  * density·window·|L| scored candidates — linear in both inputs for fixed
  * window, the interval-join strategy native range-join engines use.
  * Bin-boundary skew (many rows in one time bucket) is ordinary
  * aggregation skew: AQE skew handling or salting applies unchanged.
  */
object RangeJoin {

  /** Pairs (left row, right row) with |leftTs − rightTs| <= window seconds,
    * excluding identical ids. Timestamps are epoch seconds (long columns).
    *
    * @param leftId   unique id on the left (surfaced as `left_id`)
    * @param rightId  unique id on the right (surfaced as `right_id`)
    */
  def within(left: DataFrame, right: DataFrame,
             leftId: Column, leftTsS: Column,
             rightId: Column, rightTsS: Column,
             windowS: Long): DataFrame = {
    require(windowS > 0, s"window must be positive, got $windowS")
    val l = left.select(leftId.as("left_id"), leftTsS.as("left_ts_s"),
      explode(array(lit(-1L), lit(0L), lit(1L))).as("_dbin"))
      .select(col("left_id"), col("left_ts_s"),
        (floor(col("left_ts_s") / windowS) + col("_dbin")).as("_bin"))
    val r = right.select(rightId.as("right_id"), rightTsS.as("right_ts_s"),
      floor(col("right_ts_s") / windowS).as("_bin"))
    l.join(r, "_bin")
      .filter(abs(col("left_ts_s") - col("right_ts_s")) <= windowS &&
        col("left_id") =!= col("right_id"))
      .drop("_bin")
  }

  /** Per-left-row count of right rows within ±window seconds (excluding
    * the row itself when ids collide) — the "events near each error"
    * aggregation shape. EVERY left row appears, isolated ones with cnt=0
    * (an inner shape would silently drop exactly the interesting quiet
    * rows). */
  def countWithin(left: DataFrame, right: DataFrame,
                  leftId: Column, leftTsS: Column,
                  rightId: Column, rightTsS: Column,
                  windowS: Long): DataFrame = {
    val matched = within(left, right, leftId, leftTsS, rightId, rightTsS, windowS)
      .groupBy(col("left_id"))
      .agg(count(lit(1)).as("_c"))
    left.select(leftId.as("left_id"))
      .join(matched, Seq("left_id"), "left")
      .select(col("left_id"), coalesce(col("_c"), lit(0L)).as("cnt"))
  }
}
