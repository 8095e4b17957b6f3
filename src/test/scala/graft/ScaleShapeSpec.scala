package graft

import org.apache.spark.sql.functions._
import graft.ops.{Layout, TextAnalytics}

/** Physical-plan shape assertions for the global-ranking operators: none
  * of them may plan a single-partition (no-partition-spec) WindowExec —
  * the r6 decile scale-killer shape. The range-shuffle ranking machinery
  * (globalRowNumber / ntileExact) windows only WITHIN _pid partitions. */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  /** A WindowExec whose partition spec is empty prints as
    * "Window [...], [ordercols...]" with no partition list — detectable
    * as a Window node missing a partitionBy argument list. Spark also
    * WARN-logs "No Partition Defined" when planning one; asserting on the
    * plan text keeps the check deterministic. */
  private def singlePartitionWindows(plan: String): Seq[String] =
    plan.linesIterator.filter { l =>
      val t = l.dropWhile(c => !c.isLetter)
      // physical node renders as: Window [exprs], [partSpec], [orderSpec]
      // — two bracket groups after the exprs; a missing middle group
      // means empty partition spec
      t.startsWith("Window ") && t.count(_ == '[') < 3
    }.toSeq

  test("the detector itself flags a genuine no-partition window") {
    val df = (1L to 50L).map(i => (i, i * 2)).toDF("id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
    val bad = df.withColumn("rn", row_number().over(w))
    val plan = bad.queryExecution.executedPlan.toString
    assert(singlePartitionWindows(plan).nonEmpty,
      s"detector failed to flag:\n$plan")
  }

  test("bm25TopK plans no single-partition window") {
    val docs = (1L to 100L).map(i => i -> s"spark vector doc $i pad pad")
      .toDF("doc_id", "text")
    val plan = TextAnalytics.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("spark", "vector"), k = 5).queryExecution.executedPlan.toString
    assert(singlePartitionWindows(plan).isEmpty,
      s"single-partition WindowExec in:\n$plan")
  }

  test("zorderKey + rangeFileStats plan no single-partition window") {
    val df = (0L until 200L).map(i => (i, i % 17, i % 13)).toDF("id", "x", "y")
    val keyed = Layout.zorderKey(df, Seq(col("x"), col("y")), col("id"),
      bits = 4)
    val out = Layout.rangeFileStats(keyed, col("zkey"), col("id"),
      files = 4, stats = Seq("x" -> col("x")))
    val plan = out.queryExecution.executedPlan.toString
    assert(singlePartitionWindows(plan).isEmpty,
      s"single-partition WindowExec in:\n$plan")
  }
}
