package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, TextAnalytics}

/** Context-window chunking + sequence packing (LLM data-prep operators). */
class ChunkPackSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: stride windows, short tail, no redundant suffixes") {
    val df = Seq(
      1L -> (0 until 10).map(i => s"t$i").mkString(" "), // 10 tokens
      2L -> "a b c",                                     // under window
      3L -> "").toDF("doc_id", "text")
    val out = TextAnalytics.chunkTokens(df, col("doc_id"), col("text"),
      window = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: ceil((10-4)/2)+1 = 4 chunks at starts 0,2,4,6
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"), (1L, 1L, 4L, "t2 t3 t4 t5"),
      (1L, 2L, 4L, "t4 t5 t6 t7"), (1L, 3L, 4L, "t6 t7 t8 t9")))
    // doc 2: one (short) chunk; doc 3: no tokens, no rows
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
    assert(!out.exists(_._1 == 3L))
  }

  test("chunkTokens: doc exactly at window yields one chunk") {
    val df = Seq(1L -> "a b c d").toDF("doc_id", "text")
    val out = TextAnalytics.chunkTokens(df, col("doc_id"), col("text"),
      window = 4, stride = 1).collect()
    assert(out.length == 1 && out.head.getLong(2) == 4L)
  }

  test("packSequences matches a driver cumsum regardless of partitioning") {
    val texts = (0L until 50L).map(i => i -> ("w " * (i % 13 + 1).toInt).trim)
    val df = texts.toDF("doc_id", "text").repartition(7)
    val out = TextAnalytics.packSequences(df, col("doc_id"), col("text"),
      budget = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var cum = 0L
    val expected = texts.map { case (id, t) =>
      val n = t.split(" ").length.toLong
      val start = cum; cum += n
      (id, n, start / 20L, start - (start / 20L) * 20L)
    }
    assert(out.toSeq == expected)
  }

  test("prefixSumByRange equals the single-window truth on skewed data") {
    val df = (0L until 200L).map(i => (i, i % 17 + 1)).toDF("id", "v")
      .repartition(9)
    val out = Relational.prefixSumByRange(df, Seq(col("id")), col("v"), "cum")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    (0L until 200L).foreach { i =>
      acc += i % 17 + 1
      assert(out(i) == acc, s"id $i")
    }
  }
}
