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
  *  - M7 standardize (a2:260–268): distributed mean/variance then
  *    elementwise z-score.
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

  /** M7 over double vectors: z = (x − μ)/σ with distributed μ, σ² (the
    * reference's two reduceByKey passes collapse into one agg each). */
  def standardize(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val withV = df.select(id.as("vec_id"), vec.cast("array<double>").as("v"))
    val d = withV.select(size(col("v"))).first().getInt(0)
    // One flat agg with 2d accumulators (aggregates cannot nest inside
    // array HOF lambdas); a single pass computes all per-dim moments.
    val moments = (0 until d).flatMap { i =>
      Seq(sum(element_at(col("v"), i + 1)).as(s"s1_$i"),
        sum(pow(element_at(col("v"), i + 1), 2)).as(s"s2_$i"))
    }
    val sums = withV.agg(count(lit(1)).as("n"), moments: _*)
      .select(
        array((0 until d).map(i => col(s"s1_$i") / col("n")): _*).as("mu"),
        array((0 until d).map(i =>
          sqrt(col(s"s2_$i") / col("n")
            - (col(s"s1_$i") / col("n")) * (col(s"s1_$i") / col("n")))): _*)
          .as("sigma"))
    withV.crossJoin(broadcast(sums))
      .select(col("vec_id"),
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => (x - element_at(col("mu"), i + 1))
            / element_at(col("sigma"), i + 1)).as("z"))
  }

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
    * tiny by construction. */
  def topEigenvectors(gramFlat: Array[Double], d: Int, k: Int): Array[Array[Double]] = {
    val m = new DenseMatrix(d, d, gramFlat.clone(), 0, d, isTranspose = true)
    val svd.SVD(u, _, _) = svd(m)
    // column i of breeze DenseMatrix u = i-th left singular vector
    Array.tabulate(d)(r => Array.tabulate(k)(c => u(r, c)))
  }

  /** Full M8 pipeline: standardize → Gram → SVD → project to k dims. */
  def pca(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    val std = standardize(df, id, vec).persist()
    val d = std.select(size(col("z"))).first().getInt(0)
    val g = gram(std, col("z"), d)
    val ev = topEigenvectors(g, d, k)
    project(std, col("vec_id"), col("z"), ev)
  }
}
