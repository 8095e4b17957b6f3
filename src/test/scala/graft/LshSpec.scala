package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.ops.Lsh

/** M4 chunked-md5 signature, M5 banding and J3 candidate join
  * (SURVEY.md §5.2.3; semantics from a2_ahuja.py:99–149,164–170). */
class LshSpec extends SparkSpec {

  test("M4 signature matches an independent model (n < pieces)") {
    // golden from a reference-faithful Python model (md5 over little-endian
    // int32 bytes, hex digit idx=1), n=10 -> 10 single-element chunks
    assert(Lsh.signature((-5 until 5).toArray, idx = 1) == "b35b5132d0")
  }

  test("M4 signature matches an independent model (n > pieces, remainder)") {
    val v = Array.tabulate(300)(i => i % 7 - 3)
    val expect = "3f5e3fa3f5e3fa3f5e3fa3f5e3fa3f5e3fa3f5e3fa3f9ea734f9ea734f9ea73" +
      "4f9ea734f9ea734f9ea734f9ea734f9ea734f9ea734f9ea734f9ea734f9ea734f"
    assert(Lsh.signature(v, idx = 1) == expect)
  }

  test("M4 chunking partitions all n elements exactly once (property)") {
    // remainder distribution: first n%128 chunks get one extra element
    // (a2:107–110) — signature of a 128-piece vector has 128 hex chars and
    // changing ANY single element changes exactly one digest input chunk.
    val gen = Gen.chooseNum(128, 1500)
    checkProp(Prop.forAll(gen) { n =>
      val v = Array.tabulate(n)(i => i)
      val sig = Lsh.signature(v, idx = 1)
      val step = n / 128
      val mod = n % 128
      // chunk lengths reconstructed from the remainder rule cover n exactly
      val lens = Array.tabulate(128)(i => if (i < mod) step + 1 else step)
      sig.length == 128 && lens.sum == n
    }, minTests = 30)
  }

  test("M4 per-chunk locality: mutating element i changes only one sig digit") {
    val n = 300
    val v = Array.tabulate(n)(i => i)
    val base = Lsh.signature(v, idx = 1)
    val step = n / 128
    val mod = n % 128
    def chunkOf(i: Int): Int = {
      val boundary = mod * (step + 1)
      if (i < boundary) i / (step + 1) else mod + (i - boundary) / step
    }
    for (i <- Seq(0, 43, 44, 150, 299)) {
      val w = v.clone(); w(i) = w(i) + 1000
      val sig2 = Lsh.signature(w, idx = 1)
      val diffs = base.indices.filter(d => base(d) != sig2(d))
      assert(diffs.forall(_ == chunkOf(i)),
        s"element $i changed digits $diffs, expected only ${chunkOf(i)}")
    }
  }

  test("Md5ChunkSignature native kernel equals the reference-shaped model (property)") {
    import spark.implicits._
    val gen = Gen.chooseNum(5, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5, 5)))
    checkProp(Prop.forAll(gen) { xs =>
      val fromExpr = Seq(Tuple1(xs.toArray)).toDF("fv")
        .select(graft.functions.HashFunctions.md5ChunkSignature(col("fv"), 1))
        .first().getString(0)
      fromExpr == Lsh.signature(xs.toArray, idx = 1)
    }, minTests = 15)
  }

  test("O4 head/tail preview") {
    import spark.implicits._
    val p = Seq(Tuple1((1 to 10).toArray)).toDF("v")
      .select(graft.ops.VectorOps.headTailPreview(col("v"), 3))
      .first().getString(0)
    assert(p == "1 2 3 ... 8 9 10")
  }

  test("M5 buckets: binary-parsed-as-hex quirk, bandwidth 13 -> 39 bands") {
    val sig = "f" * 128 // 512 ones
    val b = Lsh.buckets(sig, 13)
    assert(b.length == 39) // 512/13, remainder dropped
    // 13 binary ones parsed base-16 = 0x1111111111111
    assert(b.forall(_ == java.lang.Long.parseLong("1111111111111", 16)))
    val sig0 = "0" * 128
    assert(Lsh.buckets(sig0, 13).forall(_ == 0L))
  }

  test("J3 identical vectors always become candidates (property)") {
    val gen = Gen.listOfN(200, Gen.chooseNum(-3, 3))
    checkProp(Prop.forAll(gen) { xs =>
      val sig = Lsh.signature(xs.toArray, idx = 1)
      // identical vectors -> identical signature -> identical band buckets
      Lsh.buckets(sig, 13).sameElements(Lsh.buckets(sig, 13))
    }, minTests = 20)
    // end-to-end through the DataFrame join: a duplicated item must appear
    // in its twin's candidate list (and its own: J4 self-match retention)
    val rows = Seq(
      (1, Array.tabulate(200)(i => i % 5)),
      (2, Array.tabulate(200)(i => i % 5)),        // dup of 1
      (3, Array.tabulate(200)(i => (i * 13) % 7)))
    val df = spark.createDataFrame(rows).toDF("item_id", "features")
    val banded = Lsh.withSignatureBuckets(df, col("item_id"), col("features"))
    val cands = Lsh.candidates(banded, Seq(1))
      .collect().map(_.getInt(1)).toSet
    assert(cands.contains(1)) // self (J4)
    assert(cands.contains(2)) // identical twin
  }
}
