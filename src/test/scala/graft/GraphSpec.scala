package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Connected components / dedup clustering over similarity-pair edges. */
class GraphSpec extends SparkSpec {

  private def edges(pairs: Seq[(Long, Long)]) =
    spark.createDataFrame(pairs).toDF("a", "b")

  test("components: cliques, chains and a singleton edge") {
    // component {1,2,3} (clique), chain {10-11-12-13}, pair {20,21}
    val e = edges(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 10L), (11L, 12L), (12L, 13L), (20L, 21L)))
    val out = Graph.connectedComponents(e, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: long path needs multiple propagation rounds") {
    // path 0-1-2-...-9: min label must travel 9 hops
    val e = edges((0 until 9).map(i => (i.toLong, i + 1L)))
    val out = Graph.connectedComponents(e, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10 && out.values.forall(_ == 0L))
  }

  test("dedupClusters: keep flag marks exactly the min id per cluster") {
    val e = edges(Seq((5L, 9L), (9L, 7L), (100L, 101L)))
    val out = Graph.dedupClusters(e, col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((5L, 5L, true), (9L, 5L, false), (7L, 5L, false),
      (100L, 100L, true), (101L, 100L, false)))
  }

  test("pageRank: integer micro-units match the hand/reference computation") {
    // directed 1→2, 2→{1,3}, 3→1; 3 iterations; values independently
    // reproduced in DuckDB with the same integral recurrence
    val e = edges(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)))
    val out = Graph.pageRank(e, col("a"), col("b"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1217281L, 2L -> 1054187L, 3L -> 728531L))
  }

  test("pageRank: symmetric pair converges to equal ranks; isolated-in-" +
    "edge-list singleton keeps base-plus-self rank semantics") {
    // 1↔2 symmetric: each sends its whole rank to the other — ranks stay
    // equal every iteration; node 5→6 one-way: 5 has no inbound → after
    // one iteration its rank is the bare base 150000
    val e = edges(Seq((1L, 2L), (2L, 1L), (5L, 6L)))
    val out = Graph.pageRank(e, col("a"), col("b"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(5L) == 150000L)
    assert(out(6L) > out(5L))
  }
}
