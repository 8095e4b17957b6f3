package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ivf, VectorOps}

/** IVF-flat approximate nearest neighbour (the second ANN scale path,
  * complementing the LSH-bucketed one; SURVEY.md LLM-pipeline similarity). */
class IvfSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Array[Double])]): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(rows).toDF("vec_id", "embedding")

  // deterministic pseudo-random corpus: two well-separated direction
  // clusters plus a planted near-twin of each query
  private def corpus(n: Int, d: Int): Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(7)
    (0 until n).map { i =>
      val base = Array.tabulate(d)(_ => rng.nextGaussian())
      if (i % 2 == 0) base(0) += 8.0 else base(1) += 8.0
      (i.toLong, base)
    }
  }

  test("planted scaled twin lands at rank 1 with cosine ~1") {
    val base = corpus(60, 8)
    val twins = base.filter(_._1 < 3).map { case (id, v) =>
      (id + 1000L, v.map(_ * 1.5)) // positive scaling: same direction
    }
    val all = vecs(base ++ twins)
    val queries = all.filter(col("vec_id") < 3)
    val out = Ivf.ivfTopK(all, queries, k = 3, nCells = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    for (q <- 0L until 3L) {
      val top = out.filter(_._1 == q).minBy(_._4)
      assert(top._2 == q + 1000L, s"query $q: expected twin at rank 1, got $top")
      assert(top._3 == 1.0)
    }
  }

  test("recall 1 corpus: IVF output equals brute-force knnCosine") {
    // every query's true top-k shares its cell by construction (scaled
    // copies), so IVF must reproduce the exact brute-force ranking
    val base = corpus(40, 8)
    val copies = for {
      (id, v) <- base.filter(_._1 < 2)
      j <- 1 to 5
    } yield (id + 1000L * j, v.map(_ * (1.0 + j / 100.0)))
    val all = vecs(base ++ copies)
    val queries = all.filter(col("vec_id") < 2)
    val ivf = Ivf.ivfTopK(all, queries, k = 5, nCells = 4, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val brute = VectorOps.knnCosine(all, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(ivf.sorted.toSeq == brute.sorted.toSeq)
  }

  test("trainCentroids: deterministic, unit-norm, bounded sample") {
    val all = vecs(corpus(100, 6))
    val c1 = Ivf.trainCentroids(all, col("vec_id"), col("embedding"),
      nCells = 3, maxIter = 2, sampleCap = 50)
    val c2 = Ivf.trainCentroids(all, col("vec_id"), col("embedding"),
      nCells = 3, maxIter = 2, sampleCap = 50)
    assert(c1.length == 3)
    c1.foreach { ctr =>
      val norm = math.sqrt(ctr.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-12)
    }
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("ivfAdcTopK with nProbe = nCells equals adcTopK exactly (pruning " +
    "off => identical ranking, the spec-pinned equivalence)") {
    val all = vecs(corpus(60, 8))
    val queries = all.filter(col("vec_id") < 3)
    val cb = graft.ops.Pq.fit(all, col("vec_id"), col("embedding"),
      dims = 8, m = 2, k = 3, iters = 2, shift = 16.0)
    val ivfpq = Ivf.ivfAdcTopK(all, queries, col("vec_id"), col("embedding"),
        cb, k = 5, nCells = 4, nProbe = 4, coarseIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val adc = graft.ops.Pq.adcTopK(
        graft.ops.Pq.encode(all, col("vec_id"), col("embedding"), cb),
        queries, col("vec_id"), col("embedding"), cb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ivfpq.toSeq == adc.toSeq)
  }

  test("ivfAdcTopK with nProbe = 1 returns only items from each query's " +
    "own cell (pruning actually prunes)") {
    val all = vecs(corpus(60, 8))
    val queries = all.filter(col("vec_id") < 3)
    val cb = graft.ops.Pq.fit(all, col("vec_id"), col("embedding"),
      dims = 8, m = 2, k = 3, iters = 2, shift = 16.0)
    // recompute the index assignment independently for the assertion
    val cq = all.select(col("vec_id").as("item_id"),
      graft.ops.Clustering.quantize(col("embedding"), cb.shift, cb.scale).as("q"))
    val coarse = graft.ops.Clustering.lloyd(cq, 2, 2) // 2 well-separated cells
    val cellOf = graft.ops.Clustering.assignTo(cq, coarse)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val out = Ivf.ivfAdcTopK(all, queries, col("vec_id"), col("embedding"),
        cb, k = 10, nCells = 2, nProbe = 1, coarseIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (q, item) =>
      assert(cellOf(item) == cellOf(q),
        s"item $item (cell ${cellOf(item)}) returned for query $q " +
          s"(cell ${cellOf(q)}) under nProbe=1")
    }
  }

  test("inconsistent embedding dimensions fail fast with a clear error") {
    val bad = vecs(Seq((0L, Array(1.0, 2.0)), (1L, Array(1.0, 2.0, 3.0))))
    val e = intercept[IllegalArgumentException] {
      Ivf.trainCentroids(bad, col("vec_id"), col("embedding"),
        nCells = 2, maxIter = 1)
    }
    assert(e.getMessage.contains("inconsistent embedding dimensions"))
  }
}
