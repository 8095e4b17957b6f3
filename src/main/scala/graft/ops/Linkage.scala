package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: find records that refer to the
  * same real-world entity despite textual drift (typos, re-keyed ids,
  * format changes). The classic two-phase shape:
  *
  *   1. BLOCKING — candidate generation by an equi key (nation, zip
  *      prefix, phonetic code): only records sharing a block are ever
  *      compared, turning the O(n²) cross product into a keyed
  *      self-join whose cost is Σ blockSize².
  *   2. VERIFICATION — exact pairwise edit distance (codegen'd
  *      `levenshtein`) inside each block, thresholded.
  *
  * Scale posture: the join shuffles ids+strings once on the block key;
  * blocks bigger than `maxBlock` are dropped WHOLE (the skew guard —
  * same posture as the LSH bucket caps in [[Dedup.bucketPairs]]: a
  * degenerate block like "empty zip" would otherwise go quadratic).
  * Real deployments run several blocking passes with different keys and
  * union the pairs; one pass is the verified building block.
  */
object Linkage {

  /** All within-block record pairs at edit distance <= maxDist.
    * Output: (id_a, id_b, dist) with id_a < id_b — symmetric pairs
    * appear once, self-pairs never.
    *
    * The self-join is ADAPTIVELY SEGMENT-SALTED: the block count can be
    * tiny (25 nations, 50 states) no matter how big the data, so joining
    * on the block key alone caps parallelism at #blocks — one straggler
    * task per block doing the whole O(blockSize²) verify. Each block's
    * segment count is derived from its (already computed) size —
    * `min(segments, ceil(size/256))` — so small blocks pay ZERO
    * replication and only oversized blocks fan out: the b-side row gets
    * a deterministic segment `hash(id) mod k(block)`, the a-side
    * replicates across that block's k segments, and the join key is
    * (block, segment). Every pair still matches exactly once (on the
    * a-copy carrying the b-row's segment), and a block's pair work
    * splits into k independent join keys. The ×128 probe with
    * plentiful Poisson(10) blocks showed why adaptivity matters: a
    * FLAT ×16 salt more than doubled its wall time for nothing.
    *
    * Both sides use an EXPLICIT `repartition(n, keys)`: this is an
    * expanding join (tiny shuffle input, huge output), so AQE's
    * byte-based partition coalescing would collapse the small input
    * shuffle to one partition and serialize the verify regardless of
    * key count. REPARTITION_BY_NUM exchanges are exempt from AQE
    * coalescing, and the join reuses them (same keys, same count) with
    * no extra exchange. */
  def blockedFuzzyPairs(df: DataFrame, id: Column, block: Column,
                        text: Column, maxDist: Int,
                        maxBlock: Int = 10000,
                        segments: Int = 16): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    require(segments >= 1, s"segments must be >= 1, got $segments")
    val t = df.select(block.as("blk"), id.as("rid"), text.as("txt"))
    val sized = t.join(
      t.groupBy("blk").agg(count(lit(1)).as("_bn")), Seq("blk"))
      .filter(col("_bn") <= maxBlock)
    // per-block segment count: 1 for blocks under 256 rows, capped at
    // `segments`; both sides derive it from the same _bn so the keys agree
    val segOf = least(lit(segments.toLong),
      greatest(lit(1L), ceil(col("_bn").cast("double") / 256d).cast("long")))
    val a = sized.select(col("blk"), col("rid").as("id_a"),
      col("txt").as("txt_a"),
      explode(sequence(lit(0L), segOf - 1)).as("_seg"))
    val b = sized.select(col("blk"), col("rid").as("id_b"),
      col("txt").as("txt_b"),
      pmod(xxhash64(col("rid")), segOf).as("_seg"))
    // exploded-row-aware width (floors at the session default): the
    // segment-replicated verify join scales with the record count, and a
    // cluster-sized corpus must not funnel it through a core-count width
    val parts = Dedup.explodedShuffleParts(df, bytesPerRow = 30L)
    a.repartition(parts, col("blk"), col("_seg"))
      .join(b.repartition(parts, col("blk"), col("_seg")),
        Seq("blk", "_seg"))
      .filter(col("id_a") < col("id_b"))
      // 3-arg levenshtein runs the BANDED DP — O(len·maxDist) per pair
      // instead of O(len²), and returns -1 past the threshold
      .withColumn("dist",
        levenshtein(col("txt_a"), col("txt_b"), maxDist).cast("long"))
      .filter(col("dist").between(0, maxDist))
      .select("id_a", "id_b", "dist")
  }

  /** Sorted-neighborhood linkage — the complementary candidate generator
    * to [[blockedFuzzyPairs]]: globally sort records by the comparison
    * key itself and compare each record to its next `window` neighbors
    * in that order. Catches matches that equi-key blocking splits (a
    * typo IN the blocking key) at Σ n·window comparisons.
    *
    * Scale: the global order comes from
    * [[Relational.globalRowNumber]] (range shuffle + per-partition rank
    * + offset merge — NO single-partition window), and the neighbor
    * join is a bin equi-join: rows land in rank bins of width `window`,
    * the left side duplicates into its own and the next bin, and the
    * exact `0 < Δrank <= window` predicate filters after — the same
    * re-key-the-non-equi-join pattern as [[RangeJoin]].
    * Output: (id_a, id_b, dist), the pair ordered by rank. */
  def sortedNeighborPairs(df: DataFrame, id: Column, text: Column,
                          window: Int, maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val ranked = Relational.globalRowNumber(
      df.select(id.as("rid"), text.as("txt")),
      Seq(col("txt"), col("rid")), alias = "rn")
    val a = ranked
      .select(col("rn").as("rn_a"), col("rid").as("id_a"),
        col("txt").as("txt_a"),
        explode(array(lit(0L), lit(1L))).as("_d"))
      .withColumn("_bin", floor(col("rn_a") / window) + col("_d"))
      .drop("_d")
    val b = ranked.select(col("rn").as("rn_b"), col("rid").as("id_b"),
      col("txt").as("txt_b"), floor(col("rn_b") / window).as("_bin"))
    a.join(b, Seq("_bin"))
      .filter(col("rn_b") > col("rn_a") &&
        col("rn_b") <= col("rn_a") + window)
      .withColumn("dist",
        levenshtein(col("txt_a"), col("txt_b"), maxDist).cast("long"))
      .filter(col("dist").between(0, maxDist))
      // no dedup needed: for any pair bin_b - bin_a is one value in
      // {0, 1}, matched by exactly one of the two left-side copies
      .select("id_a", "id_b", "dist")
  }
}
