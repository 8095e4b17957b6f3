package graft

import graft.ops.ImageOps

/** Golden micro-fixtures from the Assignment-2 spec (SURVEY.md §5.2.2). */
class ImageOpsSpec extends SparkSpec {

  test("M1 intensity: spec example pixel (10,20,30,65) -> 13") {
    // mean(10,20,30) = 20, * 65/100 = 13 (spec2 p.2 Step 2a)
    val out = ImageOps.intensity(Array[Byte](10, 20, 30, 65))
    assert(out.length == 1)
    assert(out(0) == 13.0f)
  }

  test("M3 diff+quantize: spec example [10,5,4,10,1] -> [-1,0,1,-1]") {
    // np.diff = [-5,-1,6,-9]; 3-level quantize at strict +/-1
    // (spec2 p.2 Step 2c) — a 1x5 image has row diffs only.
    val out = ImageOps.gradientFeatures(Array(10f, 5f, 4f, 10f, 1f), 1, 5)
    assert(out.toSeq == Seq(-1, 0, 1, -1))
  }

  test("M3 boundary: diffs of exactly +/-1 quantize to 0 (strict inequality)") {
    val out = ImageOps.gradientFeatures(Array(0f, 1f, 0f, 2f), 1, 4)
    assert(out.toSeq == Seq(0, 0, 1))
  }

  test("M3 shape: r x c input -> r*(c-1) + (r-1)*c features, row-major concat") {
    val img = Array.tabulate(12)(_.toFloat) // 3x4
    val out = ImageOps.gradientFeatures(img, 3, 4)
    assert(out.length == 3 * 3 + 2 * 4)
    // gradient 1 everywhere along rows (diff=1 -> 0), 4 down columns (-> 1)
    assert(out.toSeq == Seq.fill(9)(0) ++ Seq.fill(8)(1))
  }

  test("M2 block mean: 4x4 factor 2") {
    val img = Array[Float](
      1, 2, 10, 20,
      3, 4, 30, 40,
      5, 6, 50, 60,
      7, 8, 70, 80)
    val out = ImageOps.blockMean(img, 4, 4, 2)
    assert(out.toSeq == Seq(2.5f, 25f, 6.5f, 65f))
  }

  test("P8 tiling: row-major part index, correct pixel bytes") {
    // 4x4 image, 4 channels; pixel (r,c) has value r*4+c in every channel
    val img = Array.tabulate[Byte](4 * 4 * 4)(p => (p / 4).toByte)
    val tiles = ImageOps.tileImage(img, 4, 4, 2)
    assert(tiles.length == 4)
    assert(tiles.map(_._1).toSeq == Seq(0, 1, 2, 3))
    // tile 1 (top-right) holds pixels (0,2),(0,3),(1,2),(1,3) = 2,3,6,7
    val t1 = tiles(1)._2
    assert(t1.grouped(4).map(_.head.toInt).toSeq == Seq(2, 3, 6, 7))
    // tile 2 (bottom-left) holds pixels 8,9,12,13
    val t2 = tiles(2)._2
    assert(t2.grouped(4).map(_.head.toInt).toSeq == Seq(8, 9, 12, 13))
  }

  test("multimodal frame sampling: every stride-th fixed-size frame") {
    val video = Array.tabulate[Byte](40)(_.toByte) // 10 frames of 4 bytes
    val frames = ImageOps.sampleFrames(video, frameSize = 4, stride = 3)
    assert(frames.map(_._1).toSeq == Seq(0, 3, 6, 9))
    assert(frames.head._2.toSeq == Seq[Byte](0, 1, 2, 3))
    assert(frames(1)._2.toSeq == Seq[Byte](12, 13, 14, 15))
    // through the DataFrame generator
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq((1, video))).toDF("id", "video")
    val rows = ImageOps.frameSample(df, col("id"), col("video"), 4, 3).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6, 9))
  }

  test("multimodal audio: per-window RMS energy of 16-bit PCM") {
    // 4 samples of value 100, then 4 of value 0 -> windows of 4
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(_ => bb.putShort(100))
    (0 until 4).foreach(_ => bb.putShort(0))
    val e = ImageOps.pcmWindowEnergy(bb.array(), win = 4)
    assert(e.length == 2)
    assert(math.abs(e(0) - 100.0) < 1e-9)
    assert(e(1) == 0.0)
    // negative samples round-trip (LE signed)
    val bb2 = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putShort(-200); bb2.putShort(-200)
    assert(math.abs(ImageOps.pcmWindowEnergy(bb2.array(), 2)(0) - 200.0) < 1e-9)
    // through the DataFrame UDF
    import org.apache.spark.sql.functions._
    val e2 = spark.createDataFrame(Seq((1, bb.array())))
      .toDF("id", "pcm")
      .select(ImageOps.pcmEnergyUdf(col("pcm"), lit(4)))
      .first().getSeq[Double](0)
    assert(e2.length == 2 && math.abs(e2.head - 100.0) < 1e-9)
  }

  test("token n-gram string shingles: windows and short-doc fallback") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq((1, "a b c d"), (2, "x y")))
      .toDF("id", "text")
    val sh = df.select(col("id"),
        graft.ops.Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSeq).toMap
    assert(sh(1) == Seq("a b c", "b c d"))
    assert(sh(2) == Seq("x y")) // fewer than n tokens: whole-doc shingle
  }

  test("pipeline: tiles -> intensity -> blockMean -> gradient over DataFrame") {
    import org.apache.spark.sql.functions._
    val img = Array.tabulate[Byte](20 * 20 * 4)(p => ((p / 4) % 97).toByte)
    val df = spark.createDataFrame(Seq(("a.zip", img, 20, 20)))
      .toDF("name", "img", "rows", "cols")
    val tiles = ImageOps.tiles(df, col("name"), col("img"),
      col("rows"), col("cols"), t = 10)
    val feats = ImageOps.tileFeatures(tiles, factor = 5).collect()
    assert(feats.length == 4)
    assert(feats.map(_.getString(0)).sorted.toSeq ==
      Seq("a.zip-0", "a.zip-1", "a.zip-2", "a.zip-3"))
    // 2x2 downsampled tile -> 2*1 + 1*2 = 4 features each
    assert(feats.forall(_.getSeq[Int](1).length == 4))
  }
}
