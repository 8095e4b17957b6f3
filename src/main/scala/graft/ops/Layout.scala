package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering keys for
  * multi-dimensional data skipping.
  *
  * Why this matters at 100 TB: a table sorted on ONE column prunes file
  * scans only for predicates on that leading column — parquet min/max
  * stats on the second sort key span nearly the full domain in every
  * file. Writing the table ordered by an interleaved-bit key over BOTH
  * columns makes every file cover a small hyper-rectangle of the key
  * space, so min/max pruning works for predicates on EITHER column (the
  * Delta/Iceberg `ZORDER BY` layout, expressed as a plain column any
  * `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)` write can
  * use).
  *
  * The per-column coordinate is an equi-depth bucket index
  * ([[Relational.ntileExact]] — range shuffle + parallel rank, no global
  * sort), NOT a linear quantization of the raw value: rank-based
  * coordinates keep the curve balanced under arbitrarily skewed value
  * distributions (a linear split of a log-normal column puts 99% of rows
  * in one cell), and they make the key integer-exact and replayable by
  * any engine with `ntile`.
  */
object Layout {

  /** Z-order key: interleave the bits of each column's equi-depth bucket
    * index. Column i of `cols` owns bit positions j·m + i (j = bucket bit,
    * m = number of columns) — cols.head gets the least-significant bit, so
    * with `bits` = 8 and two columns the key spans 16 bits.
    *
    * `rowKey` must be a unique column: it tie-breaks equal values inside
    * each ntile ranking, making every bucket index — and therefore the
    * z-key — a pure function of the data rather than of partitioning.
    * Plan: one range shuffle per column (the ntile machinery), then the
    * interleave is per-row bit math. All input columns are retained. */
  def zorderKey(df: DataFrame, cols: Seq[Column], rowKey: Column,
                bits: Int = 8, alias: String = "zkey"): DataFrame = {
    val m = cols.size
    require(m >= 2, s"zorder needs at least 2 columns, got $m")
    require(bits >= 1 && bits * m <= 62,
      s"bits * columns must fit a long, got $bits * $m")
    val bucketed = cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      Relational.ntileExact(acc, Seq(c, rowKey), 1 << bits, s"_zt$i")
    }
    val z = (0 until bits).flatMap { j =>
      (0 until m).map { i =>
        shiftleft(
          shiftrightunsigned(col(s"_zt$i") - 1, j).bitwiseAND(lit(1L)),
          j * m + i)
      }
    }.reduce(_.bitwiseOR(_))
    bucketed.withColumn(alias, z)
      .drop((0 until m).map(i => s"_zt$i"): _*)
  }

  /** Data-skipping readout for a z-ordered write: split the keyed rows
    * into `files` equal ranges of the z-key (exactly the files a
    * `repartitionByRange(files, zkey)` writer would produce, made
    * deterministic via ntile instead of sampled boundaries) and report
    * each file's row count plus min/max of every statistic column — the
    * per-file footer stats a scan planner would prune with. Narrow
    * min/max ranges on EVERY dimension is the property z-order buys. */
  def rangeFileStats(keyed: DataFrame, zkey: Column, rowKey: Column,
                     files: Int, stats: Seq[(String, Column)]): DataFrame = {
    require(stats.nonEmpty, "rangeFileStats needs at least one stat column")
    Relational.ntileExact(keyed, Seq(zkey, rowKey), files, "file")
      .groupBy("file")
      .agg(count(lit(1)).as("n"),
        stats.flatMap { case (name, c) =>
          Seq(min(c).as(s"${name}_min"), max(c).as(s"${name}_max")) }: _*)
      .orderBy("file")
  }
}
