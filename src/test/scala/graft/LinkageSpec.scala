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
