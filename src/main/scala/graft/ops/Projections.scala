package graft.ops

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensionality reduction (SURVEY.md §2.6 M6 sparse random projection,
  * M7 standardize, M8 distributed PCA via A9 Gram + driver SVD).
  *
  * Mirrors the reference pipeline `a2_ahuja.py:254–291`:
  *  - M6 `findRandomProjectionMatrix` (a2:207–213): Achlioptas/Li sparse
  *    ±1 matrix, P(±1) = 1/(2√d) each, d×⌊√d⌋. The reference is unseeded
  *    ("multiple correct answers" per the spec); we seed for test
  *    determinism (SURVEY.md §7.4.3).
  *  - M7 standardize (a2:260–268) lives in [[VectorOps.standardize]] /
  *    [[VectorOps.dimStats]] (posexplode + groupBy(dim): the shuffle carries
  *    d rows, and the plan stays O(1) expressions regardless of d); [[pca]]
  *    folds μ/σ into its projection matrix instead of duplicating it.
  *  - M8 PCA (a2:271–291): Gram matrix via [[GramAggregator]] (map-side
  *    partial merge — shuffle is O(partitions·d²), not O(rows·d²)), SVD of
  *    the small d×d matrix on the driver (breeze), broadcast top-k
  *    eigenvectors, project distributed.
  *
  * The projection matrices are O(d·k) doubles — broadcast literals; the
  * data side is a single narrow map (no shuffle).
  */
object Projections {

  /** M6: seeded sparse random projection matrix, row-major d×k. */
  def sparseRandomProjection(d: Int, seed: Long = 42L): Array[Array[Double]] = {
    val k = math.floor(math.sqrt(d.toDouble)).toInt
    val th = 1.0 / (2.0 * math.sqrt(d.toDouble))
    val rng = new scala.util.Random(seed)
    Array.fill(d) {
      Array.fill(k) {
        val u = rng.nextDouble()
        if (u < th) -1.0 else if (u >= 1.0 - th) 1.0 else 0.0
      }
    }
  }

  private def matmulUdf(mat: Array[Array[Double]]) =
    udf((x: Seq[Double]) => {
      val d = mat.length
      val k = if (d == 0) 0 else mat(0).length
      val out = new Array[Double](k)
      var i = 0
      while (i < d) {
        val xi = x(i)
        if (xi != 0.0) {
          val row = mat(i)
          var j = 0
          while (j < k) { out(j) += xi * row(j); j += 1 }
        }
        i += 1
      }
      out
    })

  /** x → x·M for a broadcast matrix (row-vector convention, a2:257). */
  def project(df: DataFrame, id: Column, vec: Column,
              mat: Array[Array[Double]]): DataFrame =
    df.select(id.as("vec_id"), matmulUdf(mat)(vec).as("proj"))

  /** x → x·M − c: affine projection for a broadcast matrix + offset. */
  private def affineUdf(mat: Array[Array[Double]], offset: Array[Double]) =
    udf((x: Seq[Double]) => {
      val d = mat.length
      val k = offset.length
      val out = new Array[Double](k)
      var i = 0
      while (i < d) {
        val xi = x(i)
        if (xi != 0.0) {
          val row = mat(i)
          var j = 0
          while (j < k) { out(j) += xi * row(j); j += 1 }
        }
        i += 1
      }
      var j = 0
      while (j < k) { out(j) -= offset(j); j += 1 }
      out
    })

  /** A9: d×d Gram matrix Σ xᵀx of a double-vector column (flat, row-major). */
  def gram(df: DataFrame, vec: Column, d: Int): Array[Double] = {
    val agg = new GramAggregator(d).toColumn
    df.select(vec.cast("array<double>").as("value"))
      .as[Seq[Double]](org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
      .select(agg)
      .first().toArray
  }

  /** M8: top-k eigenvectors (d×k, row-major rows of length k) of the Gram/
    * covariance matrix via driver-side breeze SVD — the matrix is O(d²),
    * tiny by construction.
    *
    * Signs are CANONICALIZED: each eigenvector's first nonzero component
    * (tolerance 1e-9 against LAPACK noise on true zeros) is made
    * positive. An eigenvector's sign is arbitrary — different LAPACK
    * drivers/versions legally flip it — so without this, projections are
    * only deterministic per-build. With it they are a property of the
    * data, reproducible across linear-algebra backends (and replayable
    * by an independent oracle). */
  def topEigenvectors(gramFlat: Array[Double], d: Int, k: Int): Array[Array[Double]] = {
    val m = new DenseMatrix(d, d, gramFlat.clone(), 0, d, isTranspose = true)
    val svd.SVD(u, _, _) = svd(m)
    // column i of breeze DenseMatrix u = i-th left singular vector
    val flip = Array.tabulate(k) { c =>
      val lead = (0 until d).find(r => math.abs(u(r, c)) > 1e-9)
      if (lead.exists(r => u(r, c) < 0.0)) -1.0 else 1.0
    }
    Array.tabulate(d)(r => Array.tabulate(k)(c => u(r, c) * flip(c)))
  }

  /** A fitted PCA as one affine map x ↦ x·w − c (standardization folded
    * into the projection matrix: w_ij = U_ij/σ_i, c_j = Σ_i (μ_i/σ_i)U_ij).
    * O(d·k) driver/broadcast state. */
  final case class PcaModel(w: Array[Array[Double]], c: Array[Double]) {
    /** Project rows (a narrow map; no shuffle). */
    def transform(df: DataFrame, id: Column, vec: Column): DataFrame =
      df.select(id.as("vec_id"),
        affineUdf(w, c)(vec.cast("array<double>")).as("proj"))
  }

  /** Fit M7+M8: standardize → Gram → SVD → top-k eigenvectors.
    *
    * `d` is a caller-supplied parameter (no `.first()` dimension sniffing).
    * μ/σ are collected to the driver (O(d) values, one shuffle of d rows via
    * [[VectorOps.dimStats]]); the fit is two single passes (stats, Gram)
    * with O(d²) driver state. Fitting and projecting are separate so a
    * pipeline can fit on the full corpus but project only the rows it needs
    * (the reference projects query+candidate rows only, a2:289–291).
    */
  def pcaFit(df: DataFrame, vec: Column, k: Int, d: Int): PcaModel = {
    val src = df.select(vec.cast("array<double>").as("v"))
    val stats = VectorOps.dimStats(src, col("v"))
      .select(col("dim"), col("mean"), sqrt(col("var_pop")).as("sigma"))
      .collect().sortBy(_.getInt(0))
    require(stats.length == d, s"dimStats saw ${stats.length} dims, expected $d")
    val mu = stats.map(_.getDouble(1))
    // σ=0 (constant dimension) → use 1: the dim standardizes to 0 and
    // contributes nothing, instead of ANSI divide-by-zero (numpy yields
    // nan here; 0 is the useful answer for a degenerate dim)
    val sigma = stats.map { r =>
      val s = r.getDouble(2); if (s == 0.0) 1.0 else s
    }
    val zCol = zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
      (x, i) => (x - element_at(typedLit(mu), i + 1))
        / element_at(typedLit(sigma), i + 1))
    val g = gram(src.select(zCol.as("z")), col("z"), d)
    val ev = topEigenvectors(g, d, k)
    val w = Array.tabulate(d)(i => Array.tabulate(k)(j => ev(i)(j) / sigma(i)))
    val c = Array.tabulate(k)(j =>
      (0 until d).map(i => mu(i) / sigma(i) * ev(i)(j)).sum)
    PcaModel(w, c)
  }

  /** Full M8 pipeline: fit on `df`, project every row of `df`. */
  def pca(df: DataFrame, id: Column, vec: Column, k: Int, d: Int): DataFrame = {
    val src = df.select(id.as("vec_id"), vec.cast("array<double>").as("v"))
    pcaFit(src, col("v"), k, d).transform(src, col("vec_id"), col("v"))
  }
}
