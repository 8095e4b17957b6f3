package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order key + range-file stats (physical layout for data skipping). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference 2-column interleave: bit j of xb → 2j, of yb → 2j+1. */
  private def morton2(xb: Long, yb: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((xb >> j) & 1L) << (2 * j)) | (((yb >> j) & 1L) << (2 * j + 1))
    }

  test("zorderKey: exact interleave of equi-depth bucket indexes") {
    // 16 rows, 4 buckets per column → bucket = value div 4 for both cols
    val df = (0L until 16L).map(i => (i, i, 15L - i)).toDF("id", "x", "y")
      .repartition(5)
    val out = Layout.zorderKey(df, Seq(col("x"), col("y")), col("id"),
        bits = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0L until 16L).foreach { i =>
      val expected = morton2(i / 4, (15L - i) / 4, 2)
      assert(out(i) == expected, s"row $i")
    }
  }

  test("zorderKey: interleaved key bounds both dimensions per key range") {
    // 64 rows on an 8×8 grid; consecutive zkey quarters must each span at
    // most half of EACH dimension (a plain sort spans the full second dim)
    val df = (0L until 64L).map(i => (i, i % 8, i / 8)).toDF("id", "x", "y")
    val keyed = Layout.zorderKey(df, Seq(col("x"), col("y")), col("id"),
      bits = 3)
    val quarters = Layout.rangeFileStats(keyed, col("zkey"), col("id"),
        files = 4, stats = Seq("x" -> col("x"), "y" -> col("y")))
      .collect()
    assert(quarters.length == 4)
    quarters.foreach { r =>
      assert(r.getLong(1) == 16L) // equal-depth files
      assert(r.getLong(3) - r.getLong(2) <= 3, "x span") // x_max - x_min
      assert(r.getLong(5) - r.getLong(4) <= 3, "y span")
    }
  }

  test("zorderKey: deterministic under ties (rowKey breaks them)") {
    val df = (0L until 40L).map(i => (i, i % 4, i % 2)).toDF("id", "x", "y")
    val a = Layout.zorderKey(df.repartition(3), Seq(col("x"), col("y")),
      col("id"), bits = 4).select("id", "zkey").collect().map(_.toSeq).toSet
    val b = Layout.zorderKey(df.repartition(11), Seq(col("x"), col("y")),
      col("id"), bits = 4).select("id", "zkey").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("zorderKey rejects degenerate configs") {
    val df = Seq((1L, 2L, 3L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Layout.zorderKey(df, Seq(col("x")), col("id"))
    }
    intercept[IllegalArgumentException] {
      Layout.zorderKey(df, Seq(col("x"), col("y")), col("id"), bits = 32)
    }
  }
}
