package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for streaming/approximate profiling.
  *
  * Count-min here is DETERMINISTIC and cross-engine replayable: the d row
  * hashes are md5-derived (`h_j(x) = last 3 hex nibbles of md5(j ‖ ':' ‖
  * x)` → [0, 4096)), so an independent SQL engine rebuilds the identical
  * sketch cell for cell and the estimates hash-match — the property that
  * makes an *approximate* operator oracle-checkable exactly. (The usual
  * seeded-random pairwise hashes trade that away for nothing here; md5 is
  * as uniform as needed.)
  *
  * Scale shape: the build is one explode (×d) + one partial-aggregated
  * groupBy into at most d·w cells — a fixed-size state independent of
  * input rows, mergeable across batches/streams by cell-wise SUM
  * ([[Relational.mergePartialStates]] works verbatim). Estimation joins
  * the queried items against the tiny sketch (broadcast side) and takes
  * the min over the d rows. Estimates never undercount:
  * est(x) ≥ true(x), and P[est − true ≥ 2e/w · total] ≤ (1/2)^d per the
  * standard CM bound. */
object Sketches {

  /** Default geometry: 4 rows × 4096 cells. */
  val Depth = 4
  val Width = 4096

  /** h_j(item): the last 3 hex nibbles of md5(j ‖ ':' ‖ item), an integer
    * in [0, 4096). Mirrors to SQL as per-nibble `strpos` arithmetic. */
  private[ops] def cell(j: Column, item: Column): Column = {
    val hex = md5(concat(j.cast("string"), lit(":"), item))
    conv(substring(hex, 30, 3), 16, 10).cast("long")
  }

  /** Build the (j, cell, cnt) sketch table from an item column — at most
    * [[Depth]]·[[Width]] rows regardless of input size. */
  def cmBuild(df: DataFrame, item: Column): DataFrame =
    cmBuildWeighted(df, item, lit(1L))

  /** Weighted build: each row contributes `weight` to its cells. The
    * identity cmBuild(raw) == cmBuildWeighted(groupBy(item).count) means
    * a sketch downstream of an existing frequency aggregate hashes the
    * VOCABULARY (×d), not the corpus — at 100 TB that is the difference
    * between md5 over ~10⁶ distinct tokens and md5 over ~10¹² token
    * occurrences. Weights may be any non-negative integers. */
  def cmBuildWeighted(df: DataFrame, item: Column, weight: Column): DataFrame = {
    val rows = df.select(item.as("item"), weight.cast("long").as("w"),
      explode(sequence(lit(0), lit(Depth - 1))).as("j"))
    rows.select(col("j"), cell(col("j"), col("item")).as("cell"), col("w"))
      .groupBy("j", "cell").agg(sum(col("w")).as("cnt"))
  }

  /** Point estimates for `items` (a DataFrame with an item column named by
    * `itemCol`): min over the d row counters. Items whose cells were never
    * touched estimate 0 (possible only for items absent from the build).
    * The sketch side is broadcast — it is at most d·w rows by
    * construction. */
  def cmEstimate(sketch: DataFrame, items: DataFrame,
                 itemCol: String): DataFrame =
    items
      .select(col(itemCol).as("item"),
        explode(sequence(lit(0), lit(Depth - 1))).as("j"))
      .withColumn("cell", cell(col("j"), col("item")))
      .join(broadcast(sketch), Seq("j", "cell"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
