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

  test("personalizedPageRank: same graph size, seed mass stays in the " +
    "seeded region of a segmented graph") {
    // 600 disjoint 100-node rings; seeds = ring 0's nodes. Rank must be
    // nonzero exactly on ring 0 — the seed-restricted teleport contract
    // at probe scale, plus the wall-clock bound.
    val n = 60000L
    val ring = spark.range(n).select(col("id").as("src"),
      ((col("id") % 100 + 1) % 100 + (col("id") - col("id") % 100)).as("dst"))
    val seeds = spark.range(100).select(col("id").as("doc_id"))
    val t0 = System.nanoTime()
    val out = Graph.personalizedPageRank(ring, col("src"), col("dst"),
      seeds, col("doc_id"), iterations = 5)
    val nonzero = out.filter(col("r") > 0).count()
    val total = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"personalized pageRank 5 iters over 60k edges: $secs%.1f s")
    assert(total == n)
    assert(nonzero == 100L, s"seed mass leaked: $nonzero nodes > 0")
    assert(secs < 60.0, f"personalizedPageRank took $secs%.1f s")
  }
}
