package graft

import org.apache.spark.sql.functions._
import graft.pipelines.CorpusCuration

/** The end-to-end curation composition: every doc gets exactly one
  * disposition, and each stage drops exactly its own violators. */
class CorpusCurationSpec extends SparkSpec {

  test("curate: disposition per stage, keepers split, nothing vanishes") {
    val good = (1 to 40).map(i => s"word$i").mkString(" ") + " the a of it is"
    val docs = spark.createDataFrame(Seq(
      (1L, good),                        // keep
      (2L, good.toUpperCase + "  "),     // exact dup of 1 after canonicalize
      (3L, good + " extramarker"),       // near dup of 1 (high jaccard)
      (4L, "too short the a"),           // low quality (< 20 tokens)
      (5L, (1 to 30).map(_ => "spam").mkString(" ")), // low quality (repetition)
      (6L, (50 to 95).map(i => s"other$i").mkString(" ") + " and the of in on"),
      (7L, null.asInstanceOf[String])))  // NULL text must NOT vanish
      .toDF("doc_id", "text")
    val out = CorpusCuration.curate(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.length == 7, s"every doc must be dispositioned: ${out.toSeq}")
    assert(out.find(_._1 == 7L).get._2 == "low_quality")
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == "keep")
    assert(byId(2L)._2 == "exact_dup" && byId(2L)._3 == "none")
    assert(byId(3L)._2 == "near_dup" && byId(3L)._3 == "none")
    assert(byId(4L)._2 == "low_quality")
    assert(byId(5L)._2 == "low_quality")
    assert(byId(6L)._2 == "keep")
    out.filter(_._2 == "keep").foreach { t =>
      assert(Set("train", "val", "test")(t._3), s"keeper needs a split: $t")
    }
  }
}
