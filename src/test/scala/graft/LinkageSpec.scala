package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

/** Entity resolution: blocked fuzzy pairs (Linkage.blockedFuzzyPairs). */
class LinkageSpec extends SparkSpec {

  private def recs(rows: (Long, String, String)*) =
    spark.createDataFrame(rows).toDF("id", "blk", "name")

  test("within-block pairs at edit distance <= maxDist, cross-block never") {
    val df = recs(
      (1L, "us", "john smith"), (2L, "us", "jon smith"),   // dist 1
      (3L, "us", "mary jones"),                            // far from both
      (4L, "uk", "john smith"))                            // same name, other block
    val out = Linkage.blockedFuzzyPairs(df, col("id"), col("blk"),
        col("name"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 2L, 1L)))
  }

  test("pairs are canonical (id_a < id_b, no self-pairs), dist exact") {
    val df = recs(
      (10L, "b", "abcde"), (11L, "b", "abXde"), (12L, "b", "abcde"))
    val out = Linkage.blockedFuzzyPairs(df, col("id"), col("blk"),
        col("name"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact duplicate at dist 0, substitution at dist 1, each pair once
    assert(out == Set((10L, 11L, 1L), (10L, 12L, 0L), (11L, 12L, 1L)))
  }

  test("sortedNeighborPairs: matches brute-force within-window pairs, " +
    "catches what a corrupted block key would split") {
    // sorted by name: aaa1 aaa2 aaa3 aab1 zzz9
    val df = recs(
      (5L, "x", "aaa2"), (1L, "x", "aaa1"), (9L, "x", "zzz9"),
      (3L, "x", "aab1"), (7L, "x", "aaa3"))
    val out = Linkage.sortedNeighborPairs(df, col("id"), col("name"),
        window = 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the name-sorted order with window 2
    val sorted = Seq((1L, "aaa1"), (5L, "aaa2"), (7L, "aaa3"),
      (3L, "aab1"), (9L, "zzz9"))
    val brute = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 3, sorted.length)
      d = {
        val (x, y) = (sorted(i)._2, sorted(j)._2)
        // all same length here: count substitutions
        x.zip(y).count { case (a, b) => a != b }.toLong
      }
      if d <= 2
    } yield (sorted(i)._1, sorted(j)._1, d)).toSet
    assert(out == brute && out.nonEmpty)
    // window 1 under repartitioning stays deterministic
    val again = Linkage.sortedNeighborPairs(df.repartition(5), col("id"),
        col("name"), window = 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out)
  }

  test("oversized blocks are dropped whole (skew guard)") {
    val big = (0L until 10L).map(i => (i, "hot", s"name$i"))
    val small = Seq((100L, "cold", "alpha"), (101L, "cold", "alphb"))
    val df = recs(big ++ small: _*)
    val out = Linkage.blockedFuzzyPairs(df, col("id"), col("blk"),
        col("name"), maxDist = 3, maxBlock = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((100L, 101L)))
  }
}
