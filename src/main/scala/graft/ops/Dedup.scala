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

  /** Hash each shingle string to a long exactly once. Downstream minhash
    * re-mixes these 8-byte values instead of re-hashing the full strings —
    * the k-pass inner loop touches 12 bytes per shingle, not the string. */
  def shingleHashes(sh: Column): Column = transform(sh, s => xxhash64(s))

  /** MinHash signature over pre-hashed shingles: sig[i] = min over h of
    * xxhash64(h, i). Entirely per-row, no shuffle, codegen'd. */
  def minhashSignature(sh64: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh64, h => xxhash64(h, i))))

  /** LSH banding: split a k-long signature into bands of `rowsPerBand`,
    * hash each band to a bucket. Returns array<struct<band:int,bucket:long>>. */
  def lshBands(sig: Column, k: Int, rowsPerBand: Int): Column = {
    val nBands = k / rowsPerBand
    transform(sequence(lit(0), lit(nBands - 1)),
      b => struct(
        b.cast("int").as("band"),
        // xxhash64 hashes the long-array band slice directly — no string
        // round-trip in the hot path
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))
  }

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
    val base = df.select(id.as("doc_id"),
      array_distinct(shingleHashes(shingles(text, n))).as("sh"))
    val banded = base
      .select(col("doc_id"),
        explode(lshBands(minhashSignature(col("sh"), k), k, rowsPerBand)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
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

  /** SimHash bit vector (64 bits as array<int> of 0/1): per token, xxhash64
    * contributes ±1 to each bit position; final bit = sign of the sum.
    * Tokens are hashed ONCE up front — the 64-bit unpack re-mixes the long,
    * it never re-hashes the token string. */
  def simhashBits(text: Column): Column = {
    val hs = transform(TextAnalytics.tokensCol(text), t => xxhash64(t))
    val sums = aggregate(hs, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => call_function("shiftright", h, b).bitwiseAND(1)),
        (a, bit) => a + when(bit === 1, 1L).otherwise(-1L)))
    transform(sums, s => when(s > 0, 1).otherwise(0))
  }

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x =!= y), d => d))

  /** Fold a bit-array slice into a bucket id (MSB-first). */
  def bitsToBucket(bits: Column, start: Int, len: Int): Column =
    aggregate(slice(bits, start + 1, len), lit(0L), (acc, bit) => acc * 2 + bit)

  /** SimHash near-dup pairs: candidates share one of `bands` prefix buckets
    * (pigeonhole: hamming ≤ bands−1 guarantees a shared band), verified by
    * full Hamming distance. */
  def simhashDupPairs(df: DataFrame, id: Column, text: Column,
                      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val bandLen = 64 / bands
    val sh = df.select(id.as("doc_id"), simhashBits(text).as("bits"))
    val banded = sh.select(col("doc_id"), col("bits"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.cast("int").as("band"),
          aggregate(slice(col("bits"), b * bandLen + 1, lit(bandLen)),
            lit(0L), (acc, bit) => acc * 2 + bit).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bits"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("bits").as("bits_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("bits").as("bits_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("bits_a"), col("bits_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Embedding near-dup, LSH-bucketed (the scale path): random-hyperplane
    * sign bits (planes derived from seeded hashes — deterministic, no
    * driver-side matrix), bucket on the full bit string, verify cosine
    * within buckets only. */
  def embeddingNearDupLsh(df: DataFrame, id: Column, vec: Column,
                          planes: Int = 16,
                          cosineThreshold: Double = 0.9): DataFrame = {
    // plane component r(p,j) ∈ {−1,+1} from xxhash64(p, j)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p =>
      when(
        aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") *
            when(call_function("shiftright", xxhash64(p, j), lit(13)).bitwiseAND(1) === 1, 1.0)
              .otherwise(-1.0)),
          lit(0.0), (acc, x) => acc + x) > 0, 1).otherwise(0))
    val hashed = df.select(id.as("vec_id"), vec.as("v"),
      aggregate(bits, lit(0L), (acc, bit) => acc * 2 + bit).as("bucket"))
    val a = hashed.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = hashed.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= cosineThreshold)
      .orderBy("id_a", "id_b")
  }
}
