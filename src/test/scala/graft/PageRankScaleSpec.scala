package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** PageRank wall-clock on a synthetic graph the size the ×128 probe
  * produces — isolates iteration cost from the minhash edge derivation. */
class PageRankScaleSpec extends SparkSpec {

  test("pageRank: 5 iterations over a 64k-edge graph complete quickly") {
    // ring of 60k nodes plus chords: 120k directed edges, one component
    val n = 60000L
    val ring = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    val chords = spark.range(n).select(col("id").as("src"),
      ((col("id") + 17) % n).as("dst"))
    val edges = ring.union(chords)
    val t0 = System.nanoTime()
    val out = Graph.pageRank(edges, col("src"), col("dst"), iterations = 5)
    val cnt = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"pageRank 5 iters over 120k edges: $secs%.1f s, $cnt nodes")
    assert(cnt == n)
    assert(secs < 60.0, f"pageRank took $secs%.1f s on 120k edges")
  }
}
