package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Design for 100 TB: per-document work (shingling, signatures) is pure
  * per-row higher-order-function math — codegen'd, zero shuffle. The only
  * shuffles are (a) the groupBy on content hash for exact dedup and (b) the
  * band-bucket equi self-join for candidate generation, which is the
  * standard LSH trick that avoids the O(n²) pair space. Candidate pairs are
  * then verified with exact Jaccard/cosine — only bucket collisions pay
  * that cost.
  *
  * MinHash/LSH shape follows the reference's signature→bands→bucket-join
  * pipeline (`a2_ahuja.py:99–149,164–170`) re-expressed as
  * posexplode + equi join (SURVEY.md §2.3 J3).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id as canonical.
    * (`a1p2b_ahuja.py:94` distinct, generalized to content identity.) */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(md5(text).as("h"), id.as("doc_id"))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dupes"))
      .orderBy("h")

  /** Token n-gram shingles of a text column (per-row, deterministic). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalytics.tokensCol(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Distinct 64-bit shingle hashes — native codegen kernel
    * ([[graft.functions.ShingleHash64]]); values equal
    * `xxhash64(concat_ws(" ", <n-token window>))` per window. */
  def shingleHashes64(text: Column, n: Int): Column =
    graft.functions.HashFunctions.shingleHash64(TextAnalytics.tokensCol(text), n)

  /** MinHash signature → LSH band buckets in one native kernel
    * ([[graft.functions.MinHashBuckets]]): sig[i] = min over shingle hashes
    * h of xxhash64(h, i); bucket[b] = xxhash64 of the b-th signature slice.
    * Returns array<long>, band index = position. */
  def minhashBandBuckets(sh64: Column, k: Int, rowsPerBand: Int): Column =
    graft.functions.HashFunctions.minhashBuckets(sh64, k, rowsPerBand)

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    *
    * documents → shingles → signature → band buckets → self equi-join on
    * (band, bucket) **carrying ids only** → `distinct` candidate pairs →
    * join the shingle sets back once per side → ONE exact Jaccard check per
    * unique pair. The band join shuffles (band, bucket, id) triples — a few
    * bytes per row — never the shingle arrays; a pair colliding in many
    * bands is verified once, not once per band. AQE splits hot buckets
    * (boilerplate/empty docs) via skew-join handling.
    */
  def minhashDupPairs(df: DataFrame, id: Column, text: Column,
                      n: Int = 3, k: Int = 64, rowsPerBand: Int = 8,
                      jaccardThreshold: Double = 0.7): DataFrame = {
    // Shingle sets are carried as 8-byte hashes (set semantics preserved up
    // to negligible 64-bit collisions): cheaper to minhash, cheaper to join,
    // cheaper to intersect at verify time than the raw strings.
    val base = df.select(id.as("doc_id"), shingleHashes64(text, n).as("sh"))
    val banded = base
      .select(col("doc_id"),
        posexplode(minhashBandBuckets(col("sh"), k, rowsPerBand))
          .as(Seq("band", "bucket")))
    val pairs = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(base.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash as a single long — native codegen kernel
    * ([[graft.functions.SimHash64]]): per token, xxhash64 contributes ±1 to
    * each bit position; final bit = sign of the sum. */
  def simhash64(text: Column): Column =
    graft.functions.HashFunctions.simhash64(TextAnalytics.tokensCol(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share one of `bands` 16-bit windows
    * of the simhash (pigeonhole: hamming ≤ bands−1 guarantees a shared
    * band), verified by full Hamming distance via `bit_count(xor)`.
    * Everything per-row is one long; the band self-join shuffles
    * (band, bucket, id, sim) — ~28 bytes/row. */
  def simhashDupPairs(df: DataFrame, id: Column, text: Column,
                      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val bandLen = 64 / bands
    val sh = df.select(id.as("doc_id"), simhash64(text).as("sim"))
    val banded = sh.select(col("doc_id"), col("sim"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sim"), b * bandLen)
            .bitwiseAND(lit((1L << bandLen) - 1)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sim"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Per-band random-hyperplane buckets: array of `bands` structs
    * (band, bucket), each band using a disjoint plane range — multi-band
    * recovers the recall a single bit-string bucket loses (a near-dup pair
    * only needs ALL planes of ONE band to agree, P(hit) = 1−(1−pᵖ)ᵇ). */
  def hyperplaneBands(vec: Column, planes: Int, bands: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        graft.functions.HashFunctions.hyperplaneBucket(
          vec.cast("array<double>"), planes, b * planes).as("bucket"))
    }: _*)

  /** Embedding near-dup, LSH-bucketed (the scale path): random-hyperplane
    * sign-bit buckets (planes derived from seeded hashes — deterministic,
    * no driver-side matrix), multi-band for recall, dedup-then-verify:
    * the band self-join carries ids only, pairs are `distinct`ed, vectors
    * are joined back once per side and cosine verified once per pair. */
  def embeddingNearDupLsh(df: DataFrame, id: Column, vec: Column,
                          planes: Int = 16, bands: Int = 1,
                          cosineThreshold: Double = 0.9): DataFrame = {
    val base = df.select(id.as("vec_id"), vec.as("v"),
      hyperplaneBands(vec, planes, bands).as("bb"))
    val banded = base.select(col("vec_id"), explode(col("bb")).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val pairs = banded.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("vec_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(base.select(col("vec_id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(base.select(col("vec_id").as("id_b"), col("v").as("v_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= cosineThreshold)
      .orderBy("id_a", "id_b")
  }
}
