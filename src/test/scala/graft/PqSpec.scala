package graft

import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Product quantization: fit / encode / ADC search, integer-exact. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 2-dim vectors, m=2 → one dim per subspace. Two obvious value clusters
  // per dimension: {~0.0} and {~4.0}.
  private val vecs = Seq(
    (0L, Seq(0.0f, 4.0f)),
    (1L, Seq(4.0f, 0.0f)),
    (2L, Seq(0.1f, 4.1f)),
    (3L, Seq(4.1f, 0.1f)),
    (4L, Seq(0.2f, 4.2f)),
    (5L, Seq(3.9f, -0.1f)))

  test("fit + encode: codes separate the per-dimension clusters") {
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Pq.fit(df, col("vec_id"), col("embedding"), dims = 2,
      m = 2, k = 2, iters = 3)
    assert(cb.subDim == 1 && cb.centroids.length == 2
      && cb.centroids.forall(_.length == 2))
    val codes = Pq.encode(df, col("vec_id"), col("embedding"), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // low-x docs {0,2,4} share a subspace-0 code; high-x {1,3,5} the other
    val lowX = Set(0L, 2L, 4L).map(codes(_)(0))
    val highX = Set(1L, 3L, 5L).map(codes(_)(0))
    assert(lowX.size == 1 && highX.size == 1 && lowX != highX)
    val lowY = Set(1L, 3L, 5L).map(codes(_)(1))
    val highY = Set(0L, 2L, 4L).map(codes(_)(1))
    assert(lowY.size == 1 && highY.size == 1 && lowY != highY)
  }

  test("encode: recon_err is the exact distance to the assigned centroid") {
    // one vector per cluster value → after enough rounds centroids sit at
    // integer means; hand-check one reconstruction error
    val df = Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(3.0f, 3.0f))).toDF("vec_id", "embedding")
    val cb = Pq.fit(df, col("vec_id"), col("embedding"), dims = 2,
      m = 2, k = 2, iters = 2)
    val out = Pq.encode(df, col("vec_id"), col("embedding"), cb)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // vectors 0,1 coincide with a centroid exactly; 2 is its own cluster
    assert(out(0L) == 0L && out(1L) == 0L && out(2L) == 0L)
  }

  test("adcTopK: exact ADC ranking with ties broken by item_id") {
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Pq.fit(df, col("vec_id"), col("embedding"), dims = 2,
      m = 2, k = 2, iters = 3)
    val codes = Pq.encode(df, col("vec_id"), col("embedding"), cb)
    val out = Pq.adcTopK(codes, df.filter(col("vec_id") === 0L),
        col("vec_id"), col("embedding"), cb, k = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 6)
    // query 0 (low-x, high-y): same-cluster items {0,2,4} share one code →
    // identical ADC distance, ranked by id, all before cross-cluster items
    assert(out.take(3).map(_._2).toSeq == Seq(0L, 2L, 4L))
    assert(out.take(3).map(_._3).distinct.length == 1)
    assert(out(3)._3 > out(0)._3)
    // ADC distance is to the CODE (centroid), not the raw vector: the
    // self-match distance equals the query's own reconstruction error
    val reconErr0 = codes.filter(col("item_id") === 0L)
      .collect().head.getLong(2)
    assert(out.head._3 == reconErr0)
  }

  test("fit rejects a non-dividing subspace count") {
    val df = vecs.toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.fit(df, col("vec_id"), col("embedding"), dims = 2, m = 3, k = 2,
        iters = 1)
    }
  }
}
