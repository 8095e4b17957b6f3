package graft

import org.apache.spark.sql.functions._
import graft.ops.{Projections, VectorOps}

/** Vector stats, standardize, Gram and PCA (SURVEY.md §2.6 A7–A9, M7, M8). */
class VectorProjectionSpec extends SparkSpec {

  private def vecs(rows: Seq[Array[Float]]): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(rows.zipWithIndex.map { case (v, i) => (i, v) })
      .toDF("vec_id", "embedding")

  test("A7/A8 dimStats: mean and var_pop per dimension") {
    val df = vecs(Seq(Array(1f, 10f), Array(3f, 20f), Array(5f, 30f)))
    val out = VectorOps.dimStats(df, col("embedding"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0)._1 == 0 && out(0)._2 == 3L && out(0)._3 == 3.0)
    assert(math.abs(out(0)._4 - 8.0 / 3) < 1e-9)
    assert(out(1)._1 == 1 && out(1)._3 == 20.0)
    assert(math.abs(out(1)._4 - 200.0 / 3) < 1e-9)
  }

  test("M7 standardize (wide form): z-vectors match the long form") {
    val df = vecs(Seq(Array(1f, 10f), Array(3f, 20f), Array(5f, 30f)))
    val wide = VectorOps.standardize(df, col("vec_id"), col("embedding"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val long = VectorOps.standardizeLong(df, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until 3; d <- 0 until 2)
      assert(math.abs(wide(i)(d) - long((i, d.toLong))) < 1e-12)
  }

  test("M7 standardizeLong: z-scores match hand computation") {
    val df = vecs(Seq(Array(1f, 10f), Array(3f, 20f), Array(5f, 30f)))
    val out = VectorOps.standardizeLong(df, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val s0 = math.sqrt(8.0 / 3)
    assert(math.abs(out((0, 0L)) - (1 - 3) / s0) < 1e-9)
    assert(math.abs(out((2, 0L)) - (5 - 3) / s0) < 1e-9)
    // dim 1: mean 20, sigma sqrt(200/3)
    assert(math.abs(out((1, 1L)) - 0.0) < 1e-9)
  }

  test("A9 Gram matrix equals naive sum of outer products") {
    val rows = Seq(Array(1f, 2f, 3f), Array(-1f, 0f, 2f), Array(0.5f, 0.5f, -1f))
    val df = vecs(rows).select(col("embedding").cast("array<double>").as("v"))
    val g = Projections.gram(df, col("v"), 3)
    val expect = Array.ofDim[Double](9)
    rows.foreach { r =>
      for (i <- 0 until 3; j <- 0 until 3)
        expect(i * 3 + j) += r(i).toDouble * r(j).toDouble
    }
    g.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("A9 Gram aggregator merge path: many rows across many partitions") {
    val rng = new scala.util.Random(41)
    val rows = (0 until 2000).map(_ => Array.tabulate(5)(_ => rng.nextGaussian().toFloat))
    val df = vecs(rows)
      .repartition(16) // force partial buffers + merges
      .select(col("embedding").cast("array<double>").as("v"))
    val g = Projections.gram(df, col("v"), 5)
    val expect = Array.ofDim[Double](25)
    rows.foreach { r =>
      for (i <- 0 until 5; j <- 0 until 5)
        expect(i * 5 + j) += r(i).toDouble * r(j).toDouble
    }
    // cross-partition double sums: compare with a tolerance scaled to the
    // magnitude (merge order differs from the sequential model)
    g.zip(expect).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"$a vs $b")
    }
  }

  test("M8 PCA: projection has k dims and recovers a dominant direction") {
    // points along direction (1,1,0,...) with small noise in dim 2
    val rng = new scala.util.Random(7)
    val rows = (0 until 40).map { _ =>
      val t = rng.nextGaussian() * 10
      Array(t.toFloat, t.toFloat, (rng.nextGaussian() * 0.1).toFloat, 0f)
    }
    val df = vecs(rows).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Projections.pca(df, col("vec_id"), col("v"), k = 2, d = 4)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out.size == 40)
    assert(out.values.forall(_.length == 2))
    // the first PC of standardized data should separate rows by sign of t:
    // projections must not all collapse to a constant
    val pc1 = out.values.map(_.head).toSeq
    assert(pc1.max - pc1.min > 1.0)
  }

  test("M8 full-rank PCA is an isometry of standardized data (invariant)") {
    // k = d: proj = z·U with U orthogonal, so pairwise euclidean distances
    // of projections equal those of the z-scores — an independent
    // correctness invariant that does not depend on eigenvector signs.
    val rng = new scala.util.Random(23)
    val rows = (0 until 25).map(_ => Array.tabulate(4)(_ => rng.nextGaussian().toFloat))
    val df = vecs(rows).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val proj = Projections.pca(df, col("vec_id"), col("v"), k = 4, d = 4)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    // z-scores computed independently in the test
    val data = rows.map(_.map(_.toDouble))
    val mu = (0 until 4).map(d => data.map(_(d)).sum / data.length)
    val sg = (0 until 4).map(d =>
      math.sqrt(data.map(x => math.pow(x(d) - mu(d), 2)).sum / data.length))
    val z = data.zipWithIndex.map { case (x, i) =>
      i -> (0 until 4).map(d => (x(d) - mu(d)) / sg(d)).toArray
    }.toMap
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    for (i <- 0 until 10; j <- i + 1 until 10) {
      val dp = dist(proj(i), proj(j))
      val dz = dist(z(i), z(j))
      assert(math.abs(dp - dz) < 1e-6, s"pair ($i,$j): $dp vs $dz")
    }
  }

  test("M8 PCA works at d=1024 (plan stays O(1) expressions)") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 30).map { i =>
      Array.tabulate(1024)(j => (rng.nextGaussian() + (if (j == 0) i else 0)).toFloat)
    }
    val df = vecs(rows).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Projections.pca(df, col("vec_id"), col("v"), k = 5, d = 1024).collect()
    assert(out.length == 30)
    assert(out.forall(_.getSeq[Double](1).length == 5))
  }

  test("M9 euclidean + cosine scalar kernels") {
    import spark.implicits._
    val df = Seq((Array(3f, 4f), Array(0f, 0f))).toDF("a", "b")
    val d = df.select(VectorOps.euclidean(col("a"), col("b"))).first().getDouble(0)
    assert(math.abs(d - 5.0) < 1e-9)
    val c = Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).first().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("M6 sparse random projection: seeded, correct shape, Li sparsity") {
    val m = Projections.sparseRandomProjection(d = 100, seed = 42L)
    assert(m.length == 100 && m.head.length == 10) // k = floor(sqrt(d))
    val flat: Array[Double] = m.flatMap(_.toSeq)
    assert(flat.forall(x => x == 0.0 || x == 1.0 || x == -1.0))
    // P(nonzero) = 1/sqrt(d) = 0.1 -> ~100 of 1000 entries; loose bounds
    val nz = flat.count(_ != 0.0)
    assert(nz > 40 && nz < 200, s"nonzeros $nz")
    // determinism
    val m2 = Projections.sparseRandomProjection(d = 100, seed = 42L)
    assert(flat.sameElements(m2.flatMap(_.toSeq)))
  }
}
