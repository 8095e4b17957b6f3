package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the reproducibility-critical slice of a
  * training-data pipeline. `sample(fraction)`-style random sampling is
  * seed- and partitioning-dependent; these operators key selection off a
  * content hash instead, so the same row set is selected on any cluster,
  * any partitioning, any engine (md5 is bit-stable everywhere, and the
  * selection predicate is pure per-row — a narrow codegen'd filter that
  * pushes down past joins and survives re-runs byte-identically).
  */
object Sampling {

  /** Content-keyed Bernoulli sample: keep rows whose md5(keyText) first
    * byte < 256·fraction. Per-row, no shuffle, reproducible on any engine.
    * `fraction` granularity is 1/256 — training-corpus sampling does not
    * need finer — and the cutoff compares as a 2-char lowercase-hex string
    * (lexicographic == numeric there), so the predicate is the same single
    * string compare in any SQL dialect. */
  def hashSample(df: DataFrame, keyText: Column, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1,
      s"fraction must be in (0, 1], got $fraction")
    val cutoff = math.round(fraction * 256).toInt
    require(cutoff >= 1,
      s"fraction $fraction is below the 1/256 granularity — it would " +
        "silently select nothing; use a coarser fraction or a wider hash prefix")
    if (cutoff >= 256) df
    else df.filter(substring(md5(keyText), 1, 2) < f"$cutoff%02x")
  }

  /** Stratified deterministic top-k: `k` rows per stratum, ordered by
    * content hash (uniform within the stratum) with a unique tie-break.
    * One shuffle on the stratum key; rank prunes map-side. */
  def stratifiedTopK(df: DataFrame, stratum: Column, keyText: Column,
                     tieBreak: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(stratum).orderBy(md5(keyText), tieBreak)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
