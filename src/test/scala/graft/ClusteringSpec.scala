package graft

import org.apache.spark.sql.functions._
import graft.ops.Clustering

/** Integer-exact distributed k-means (Clustering.kmeansExact). */
class ClusteringSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("two well-separated blobs split into their own clusters") {
    val df = vecs(Seq(
      0L -> Seq(0.1, 0.0), 1L -> Seq(5.0, 5.1), 2L -> Seq(0.0, 0.2),
      3L -> Seq(-0.1, 0.1), 4L -> Seq(5.2, 4.9), 5L -> Seq(4.9, 5.0)))
    val out = Clustering.kmeansExact(df, col("id"), col("v"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // init = ids 0,1 → blob around origin lands with centroid 0, the
    // 5-ish blob with centroid 1, and Lloyd iterations keep them there
    assert(out == Map(0L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("deterministic: identical assignment and dist2 across two runs") {
    val df = vecs((0L until 40L).map(i =>
      i -> Seq(math.sin(i.toDouble), math.cos(i.toDouble * 0.7), (i % 7) * 0.3)))
    def run() = Clustering.kmeansExact(df, col("id"), col("v"), k = 4, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(run() == run())
  }

  test("duplicate init point: emptied cluster keeps its centroid, no crash") {
    // ids 0,1 are identical → init centroids 0 and 1 coincide; ties go to
    // the lowest index, but the retained cluster-1 centroid stays at the
    // exact origin while cluster 0's mean drifts toward id 3 — so the
    // origin points may legally re-acquire cluster 1 (Lloyd's semantics);
    // the invariants are: no crash, identical points cluster together,
    // and the far blob keeps its own cluster
    val df = vecs(Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(0.0, 0.0), 2L -> Seq(6.0, 6.0),
      3L -> Seq(0.1, 0.0), 4L -> Seq(6.1, 5.9)))
    val out = Clustering.kmeansExact(df, col("id"), col("v"), k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == out(1L) && out(0L) <= 1L)
    assert(out(2L) == 2L && out(4L) == 2L)
  }

  test("singleton centroid distance is zero and exact") {
    val df = vecs(Seq(0L -> Seq(1.25, -2.5), 1L -> Seq(1.25, -2.5)))
    val out = Clustering.kmeansExact(df, col("id"), col("v"), k = 1, iters = 2)
      .collect()
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("coordinate outside the quantization range raises, not clamps") {
    val df = vecs(Seq(0L -> Seq(0.0, 9.5)))
    val e = intercept[Exception] {
      Clustering.kmeansExact(df, col("id"), col("v"), k = 1, iters = 0)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("iters = 0 assigns against the raw init centroids") {
    val df = vecs(Seq(0L -> Seq(0.0), 1L -> Seq(1.0), 2L -> Seq(0.4)))
    val out = Clustering.kmeansExact(df, col("id"), col("v"), k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }

  test("diversitySample: perCluster hash-picked reps, every cluster " +
    "covered, deterministic under repartitioning") {
    // two tight blobs of 5 around 0.0 and around 4.0
    val rows = (0L to 4L).map(i => i -> Seq(0.0 + i * 0.01)) ++
      (10L to 14L).map(i => i -> Seq(4.0 + (i - 10) * 0.01))
    val df = vecs(rows)
    val out = Clustering.diversitySample(df, col("id"), col("v"),
        k = 2, iters = 3, perCluster = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 2 clusters × 2 reps, ranks 1..2 in each
    assert(out.length == 4)
    assert(out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap ==
      Map(0L -> Seq(1L, 2L), 1L -> Seq(1L, 2L)))
    // reps come from the right blob (cluster 0 holds ids 0-4 by init order)
    val byCluster = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byCluster(0L).subsetOf((0L to 4L).toSet))
    assert(byCluster(1L).subsetOf((10L to 14L).toSet))
    val again = Clustering.diversitySample(df.repartition(7), col("id"),
        col("v"), k = 2, iters = 3, perCluster = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
    // perCluster larger than the cluster keeps every member, ranked
    val all = Clustering.diversitySample(df, col("id"), col("v"),
        k = 2, iters = 3, perCluster = 100)
      .collect()
    assert(all.length == 10)
  }

  test("diversitySample plan keeps the WindowGroupLimit map-side prune") {
    // the rank filter must sit on the RAW row_number attribute (a Cast in
    // between defeats InferWindowGroupLimit and the shuffle would carry
    // the whole corpus instead of perCluster rows per task)
    val rows = (0L until 30L).map(i => i -> Seq(i.toDouble % 3))
    val plan = Clustering.diversitySample(vecs(rows), col("id"), col("v"),
        k = 3, iters = 2, perCluster = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan")
  }

  test("labelCentroidDists: hand-computed centroid separation") {
    import spark.implicits._
    // label 0: (0.0), (1.0) -> centroid micro (0+8e6 + 1e6+8e6)/2 = 8.5e6
    // label 1: (2.0)        -> centroid micro 1e7
    // label 2: (2.0), (3.0) -> (1e7 + 1.1e7)/2 = 1.05e7
    val df = Seq(
      (0, Seq(0.0f)), (0, Seq(1.0f)), (1, Seq(2.0f)),
      (2, Seq(2.0f)), (2, Seq(3.0f))).toDF("label", "v")
    val out = graft.ops.VectorOps.labelCentroidDists(df, col("label"), col("v"))
      .orderBy("label_a", "label_b")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val d01 = 1500000L * 1500000L   // 8.5e6 vs 1.0e7
    val d02 = 2000000L * 2000000L   // 8.5e6 vs 1.05e7
    val d12 = 500000L * 500000L     // 1.0e7 vs 1.05e7
    assert(out.toSeq == Seq((0, 1, d01), (0, 2, d02), (1, 2, d12)))
  }
}
