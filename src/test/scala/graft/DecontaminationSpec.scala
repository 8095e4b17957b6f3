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
