package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row, the single right row with
  * the greatest timestamp at-or-before the left row's timestamp, per key.
  * The canonical point-in-time lookup (market data, CDC snapshots, feature
  * stores: "the last profile update before this training example").
  *
  * Spark has no native as-of join, and the naive formulations die at scale:
  * an inequality theta-join is a broadcast-nested-loop cross product, and a
  * per-left-row subquery is O(|L|·|R|). This is instead the union+window
  * formulation — the standard distributed as-of:
  *
  *   1. Tag left rows side=1, right rows side=0, align schemas (each side
  *      carries the other's payload as null).
  *   2. One shuffle: partition the union by key, order by (ts, side) —
  *      side 0 < 1 makes a right row at ts == left ts visible (the join is
  *      at-or-BEFORE inclusive).
  *   3. `last(right_payload, ignoreNulls)` over rows unboundedPreceding →
  *      currentRow carries the latest right payload forward to every left
  *      row; filter side=1 and matched.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the join key, a spillable
  * within-partition sort, zero joins — the 100 TB shape. Skewed keys can
  * reuse the salting pattern (Relational.saltedSum) by splitting a hot
  * key's left rows across salts and replicating its right rows per salt.
  *
  * Determinism: right rows are first reduced to one row per (key, ts) —
  * the payload of the max tie-break column — so the matched row is unique
  * and the result is independent of partition/merge order.
  */
object AsOf {

  /** Backward as-of join, inner form (unmatched left rows drop).
    *
    * @param left      left (probe) side
    * @param right     right (reference) side
    * @param leftKey   equi-key on the left
    * @param rightKey  equi-key on the right
    * @param leftTs    left event-time column (any orderable type)
    * @param rightTs   right event-time column (same type)
    * @param rightTieBreak  orders right rows sharing (key, ts); the max wins
    * @param leftCols  left payload columns to carry through
    * @param rightCols right payload columns to surface from the matched row
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               rightTieBreak: Column,
               leftCols: Seq[(String, Column)],
               rightCols: Seq[(String, Column)]): DataFrame =
    asof(left, right, leftKey, rightKey, leftTs, rightTs, rightTieBreak,
      leftCols, rightCols, forwardDir = false)

  /** Forward as-of join — for every left row, the single right row with
    * the SMALLEST timestamp at-or-after the left row's timestamp, per key
    * ("the next deploy after this error", "the next maintenance event
    * after this failure"). Identical machinery to [[backward]] with the
    * within-partition order reversed — still ONE shuffle, zero joins.
    * Right rows sharing (key, ts) reduce to the MIN tie-break row (the
    * first upcoming event). */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: Column, rightKey: Column,
              leftTs: Column, rightTs: Column,
              rightTieBreak: Column,
              leftCols: Seq[(String, Column)],
              rightCols: Seq[(String, Column)]): DataFrame =
    asof(left, right, leftKey, rightKey, leftTs, rightTs, rightTieBreak,
      leftCols, rightCols, forwardDir = true)

  private def asof(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTs: Column, rightTs: Column,
                   rightTieBreak: Column,
                   leftCols: Seq[(String, Column)],
                   rightCols: Seq[(String, Column)],
                   forwardDir: Boolean): DataFrame = {
    require(leftCols.nonEmpty, "leftCols must not be empty")
    require(rightCols.nonEmpty, "rightCols must not be empty")
    // unique right row per (key, ts): max tie-break wins looking backward
    // (the latest same-instant state), min wins looking forward (the first
    // upcoming event)
    val rPayload = struct(rightCols.map { case (n, c) => c.as(n) }: _*)
    val rDeduped = right
      .groupBy(rightKey.as("_k"), rightTs.as("_t"))
      .agg((if (forwardDir) min_by(rPayload, rightTieBreak)
            else max_by(rPayload, rightTieBreak)).as("_rpayload"))
    val lTagged = left.select(
      Seq(leftKey.as("_k"), leftTs.as("_t"), lit(1).as("_side"),
        struct(leftCols.map { case (n, c) => c.as(n) }: _*).as("_lpayload"),
        lit(null).cast(rDeduped.schema("_rpayload").dataType).as("_rpayload")): _*)
    val rTagged = rDeduped.select(
      col("_k"), col("_t"), lit(0).as("_side"),
      lit(null).cast(lTagged.schema("_lpayload").dataType).as("_lpayload"),
      col("_rpayload"))
    // walking time backward (desc) makes "last right seen" = nearest
    // at-or-after; side 0 sorts first either way, keeping same-instant
    // right rows visible (the join is inclusive in both directions)
    val ord =
      if (forwardDir) Seq(col("_t").desc, col("_side"))
      else Seq(col("_t"), col("_side"))
    val w = Window.partitionBy(col("_k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_rpayload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_m").isNotNull)
      .select(
        Seq(col("_k"), col("_t")) ++
          leftCols.map { case (n, _) => col(s"_lpayload.$n").as(n) } ++
          rightCols.map { case (n, _) => col(s"_m.$n").as(n) }: _*)
      .drop("_k", "_t")
  }
}
