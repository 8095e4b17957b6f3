package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Decontamination: quoted eval examples flag their host docs; clean docs
  * and sub-threshold overlaps stay unflagged. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely unrelated text about spark shuffles and partitions here"),
    (3L, "prefix words then the quick brown fox jumps over the lazy dog end"))
    .toDF("doc_id", "text")

  // eval example = a span quoted verbatim inside docs 1 and 3
  private val evalSet = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  test("docs containing the eval span are flagged, others are not") {
    val flagged = Dedup.decontaminate(corpus, evalSet,
      col("doc_id"), col("text"), n = 3, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
  }

  test("containment is |E intersect D| / |E| with hit counts") {
    val rows = Dedup.decontaminate(corpus, evalSet,
      col("doc_id"), col("text"), n = 3, threshold = 0.8)
      .collect()
    rows.foreach { r =>
      // all shingles of the quoted span appear in both hosts
      assert(r.getAs[Double]("max_containment_r") == 1.0)
      assert(r.getAs[Long]("n_eval_hits") == 1L)
    }
  }

  test("fixture gate: the LSH-vs-exact semantic-decontamination oracle " +
    "equivalence assumption holds — every above-threshold exact pair is " +
    "an identical-vector pair (cos_r == 1.0)") {
    // The semantic_decontamination_lsh DuckDB oracle computes the EXACT
    // product and hash-matches the LSH path only because (a) planted hits
    // sit at cos 1.0 (identical vectors collide in every band) and (b)
    // background cosines never reach 0.95. A future fixture with planted
    // (0.95, 1.0) near-dups would break that silently — the LSH path could
    // miss one with probability ~4e-4 per pair and flake the gate. Assert
    // the assumption on every fixture tier present, pair-level (a vector
    // can carry BOTH a 1.0 hit and a 0.96 hit, which a max-only check
    // would miss), with the same rounded-cosine the operator uses.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
         if new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val e = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("eval_id"), col("embedding").as("qv"))
      val nearButNotIdentical = e.crossJoin(broadcast(q))
        .select(round(graft.ops.VectorOps.cosine(col("qv"), col("embedding")),
          4).as("cos_r"))
        .filter(col("cos_r") >= 0.95 && col("cos_r") < 1.0)
        .count()
      assert(nearButNotIdentical == 0L,
        s"$dir: $nearButNotIdentical eval-corpus pairs sit in [0.95, 1.0) — " +
          "the LSH-vs-exact oracle equivalence no longer holds on this " +
          "fixture; re-derive the semantic_decontamination_lsh oracle")
    }
  }

  test("sub-threshold partial overlap does not flag") {
    val partialEval = Seq(
      (100L, "the quick brown fox sat still all day long today"))
      .toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(corpus, partialEval,
      col("doc_id"), col("text"), n = 3, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.isEmpty)
  }
}
