package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-parity LSH stack (SURVEY.md §2.6 M4/M5, §2.3 J3).
  *
  * Semantics match `Assignment 2/a2_ahuja.py`:
  *  - M4 `computeSignature` (a2:99–120): the int32 feature vector is split
  *    into 128 nearly-equal chunks — the first `n mod 128` chunks get one
  *    extra element — each chunk md5'd over its little-endian int32 bytes
  *    (numpy buffer layout), and hex digit `idx` of each digest is taken,
  *    yielding a 128-hex-char signature.
  *  - M5 `computeBuckets2` (a2:140–149): signature → 512-bit binary string
  *    (zero-filled), split into ⌊512/bandwidth⌋ bands; each band's 0/1
  *    digit string is parsed **base-16** (the reference's quirk — digits
  *    are only 0/1 so it is well-defined) to form the bucket id.
  *  - J3 `computeSimilarCandidates` (a2:164–170): image b is a candidate
  *    for query q iff any band bucket matches. The reference broadcasts
  *    the collected query side and scans; here the theta join becomes an
  *    equi join — posexplode both sides to (band, bucket) rows and join on
  *    both, then distinct. Catalyst broadcast-hashes the small query side;
  *    at scale the corpus side never shuffles.
  */
object Lsh {

  /** M4: 128-hex-char chunked-md5 signature of an int32 vector. */
  def signature(v: Array[Int], idx: Int): String = {
    val n = v.length
    val pieces = 128
    val step = n / pieces
    val mod = n % pieces
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(pieces)
    var s = 0
    var i = 0
    while (i < pieces && s < n) {
      val len = if (i < mod) step + 1 else step
      val bb = java.nio.ByteBuffer.allocate(len * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var j = 0
      while (j < len) { bb.putInt(v(s + j)); j += 1 }
      md.reset()
      val digest = md.digest(bb.array())
      // hex digit `idx` of the 32-char digest: digit 2k is the high nibble
      // of byte k, digit 2k+1 the low nibble.
      val b = digest(idx / 2) & 0xff
      val nib = if (idx % 2 == 0) b >>> 4 else b & 0xf
      sb.append(java.lang.Integer.toHexString(nib))
      s += len
      i += 1
    }
    sb.toString
  }

  /** M5: signature → band buckets (reference's binary-parsed-as-hex).
    * An empty signature (zero-length feature vector) yields zero bands —
    * BigInteger("") would throw out of the UDF and fail the job. */
  def buckets(sig: String, bandwidth: Int): Array[Long] = {
    if (sig == null || sig.isEmpty) return Array.empty[Long]
    val bits = new java.math.BigInteger(sig, 16).toString(2)
    val full = "0" * (4 * sig.length - bits.length) + bits
    val bands = full.length / bandwidth
    Array.tabulate(bands) { i =>
      new java.math.BigInteger(
        full.substring(i * bandwidth, (i + 1) * bandwidth), 16).longValueExact()
    }
  }

  val bucketsUdf = udf((sig: String, bandwidth: Int) => buckets(sig, bandwidth))

  /** Attach signature + band buckets to a feature-vector DataFrame.
    * The signature is the native codegen kernel
    * ([[graft.functions.Md5ChunkSignature]] — no per-element boxing on the
    * 4900-int hot path, identical output to [[signature]]); banding is one
    * cheap per-row UDF over the 128-char string. */
  def withSignatureBuckets(df: DataFrame, id: Column, features: Column,
                           idx: Int = 1, bandwidth: Int = 13): DataFrame =
    df.select(id.as("item_id"), features.as("fv"))
      .withColumn("sig",
        graft.functions.HashFunctions.md5ChunkSignature(col("fv"), idx))
      .withColumn("buckets", bucketsUdf(col("sig"), lit(bandwidth)))

  /** J3: candidate pairs (query, item) that share any band bucket.
    * The query side is selected by a predicate evaluated INSIDE the plan
    * (no driver round-trip) and must be small — it is broadcast; the
    * corpus side never shuffles. */
  def candidatesWhere(banded: DataFrame, queryPred: Column): DataFrame = {
    val exploded = banded.select(col("item_id"),
      posexplode(col("buckets")).as(Seq("band", "bucket")))
    val q = banded.filter(queryPred)
      .select(col("item_id").as("query_id"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      .select(col("query_id"), col("band"), col("bucket"))
    exploded.join(broadcast(q), Seq("band", "bucket"))
      .select(col("query_id"), col("item_id").as("candidate_id"))
      .distinct()   // self-pairs retained: reference keeps dist-0 rows (J4)
  }

  /** J3 with an explicit small id set. */
  def candidates(banded: DataFrame, queryIds: Seq[Any]): DataFrame =
    candidatesWhere(banded, col("item_id").isin(queryIds: _*))

  /** Candidate lists per query with counts (reference's rdd10 shape,
    * a2:240–241) — deterministic ordering inside the list. */
  def candidateLists(banded: DataFrame, queryIds: Seq[Any]): DataFrame =
    candidates(banded, queryIds)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_candidates"),
        sort_array(collect_list(col("candidate_id"))).as("candidates"))
      .orderBy("query_id")
}
