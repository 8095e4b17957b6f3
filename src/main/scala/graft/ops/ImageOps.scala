package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal image kernels (SURVEY.md §2.2 P8, §2.6 M1–M3).
  *
  * Images are opaque `binary` columns (row-major rows×cols×4 uint8, RGBI)
  * with typed metadata (`rows`, `cols`) — the multimodal-column pattern: the
  * payload stays a byte blob through the scan (parquet reads it lazily),
  * and only the kernels below interpret it. Decoders for real container
  * formats (TIFF-in-zip, `a2_ahuja.py:13–24`) would plug in ahead of
  * `tile`; the container decode is STUBBED (see
  * [[graft.sources.ZipImages.decodeRawStub]]) because no imaging codec
  * ships in this environment — the Spark-side plumbing
  * (schema, tiling, kernels) is real and tested.
  *
  * Reference semantics:
  *  - P8 `divideImage` (a2:32–44): square tiles of `tileSize`, row-major
  *    part index `cp*i + j`, name `"<file>-<idx>"`.
  *  - M1 `convert4dImageToFeature` (a2:47–50): per-pixel
  *    mean(R,G,B) * I/100 as float32.
  *  - M2 `averagingOver{10,5}X{10,5}Windows` (a2:53–72): block mean with
  *    float32 accumulation (sum then divide), parameterized by factor.
  *  - M3 `computeFeatureVector` (a2:77–87): row-diff and col-diff,
  *    3-level quantize at ±1 (strict inequalities), flatten row-major,
  *    concat rowDiff++colDiff → int32 vector.
  *
  * These are per-row imperative kernels — Scala UDFs over primitive arrays
  * (not HOF chains) are the idiomatic Spark choice here; each runs inside
  * one task, no shuffle, and the DataFrame around them stays declarative.
  */
object ImageOps {

  /** Deterministic synthetic RGBI fixture shared by the `image_features`
    * and `image_similarity_md5` queries and their specs: byte p of image
    * i is ((p/4)·(i+3) + (p%4)·7) mod 251 — a closed form the DuckDB
    * oracle regenerates from range(), and the ONE definition the
    * float32-vs-double quantize-margin spec asserts against, so the
    * oracle's double-precision replay always covers the exact bytes the
    * queries hash. */
  def syntheticImage(i: Int, rows: Int = 100, cols: Int = 100): Array[Byte] =
    Array.tabulate(rows * cols * 4) { p =>
      val pix = p / 4; val ch = p % 4
      (((pix * (i + 3) + ch * 7) % 251) & 0xff).toByte
    }

  /** P8: one (rows×cols×4) image → ⌊r/t⌋·⌊c/t⌋ tiles of t×t×4, row-major
    * index. Returns array<struct<idx:int, tile:binary>>. */
  def tileImage(img: Array[Byte], rows: Int, cols: Int, t: Int): Array[(Int, Array[Byte])] = {
    val rp = rows / t
    val cp = cols / t
    val out = new Array[(Int, Array[Byte])](rp * cp)
    var i = 0
    while (i < rp) {
      var j = 0
      while (j < cp) {
        val tile = new Array[Byte](t * t * 4)
        var r = 0
        while (r < t) {
          System.arraycopy(img, ((i * t + r) * cols + j * t) * 4, tile, r * t * 4, t * 4)
          r += 1
        }
        out(cp * i + j) = (cp * i + j, tile)
        j += 1
      }
      i += 1
    }
    out
  }

  /** M1: RGBI uint8 → float32 intensity, mean(R,G,B) * I/100. */
  def intensity(img: Array[Byte]): Array[Float] = {
    val n = img.length / 4
    val out = new Array[Float](n)
    var p = 0
    while (p < n) {
      val r = img(4 * p) & 0xff
      val g = img(4 * p + 1) & 0xff
      val b = img(4 * p + 2) & 0xff
      val ir = img(4 * p + 3) & 0xff
      out(p) = (1.0f / 3.0f) * (r.toFloat + g + b) * (0.01f * ir)
      p += 1
    }
    out
  }

  /** M2: block mean over factor×factor windows (float32 sum, then divide —
    * matches numpy float32 accumulation order: row-major within block). */
  def blockMean(img: Array[Float], rows: Int, cols: Int, factor: Int): Array[Float] = {
    val rs = rows / factor
    val cs = cols / factor
    val out = new Array[Float](rs * cs)
    var i = 0
    while (i < rs) {
      var j = 0
      while (j < cs) {
        var s = 0.0f
        var r = 0
        while (r < factor) {
          var c = 0
          while (c < factor) {
            s += img((i * factor + r) * cols + j * factor + c)
            c += 1
          }
          r += 1
        }
        out(i * cs + j) = s / (factor * factor)
        j += 1
      }
      i += 1
    }
    out
  }

  /** M3: gradient features — np.diff along rows then cols, strict ±1
    * 3-level quantize, flatten, concat. r×c input → r·(c−1) + (r−1)·c ints. */
  def gradientFeatures(img: Array[Float], rows: Int, cols: Int): Array[Int] = {
    val out = new Array[Int](rows * (cols - 1) + (rows - 1) * cols)
    var k = 0
    var i = 0
    while (i < rows) {          // rowDiff: adjacent along a row
      var j = 0
      while (j < cols - 1) {
        val d = img(i * cols + j + 1) - img(i * cols + j)
        out(k) = if (d < -1) -1 else if (d > 1) 1 else 0
        k += 1; j += 1
      }
      i += 1
    }
    i = 0
    while (i < rows - 1) {      // colDiff: adjacent down a column
      var j = 0
      while (j < cols) {
        val d = img((i + 1) * cols + j) - img(i * cols + j)
        out(k) = if (d < -1) -1 else if (d > 1) 1 else 0
        k += 1; j += 1
      }
      i += 1
    }
    out
  }

  val tileUdf = udf((img: Array[Byte], rows: Int, cols: Int, t: Int) =>
    tileImage(img, rows, cols, t))
  val intensityUdf = udf((img: Array[Byte]) => intensity(img))
  val blockMeanUdf = udf((img: Seq[Float], rows: Int, cols: Int, f: Int) =>
    blockMean(img.toArray, rows, cols, f))
  val gradientUdf = udf((img: Seq[Float], rows: Int, cols: Int) =>
    gradientFeatures(img.toArray, rows, cols))

  /** (name, img, rows, cols) → (tile_name, tile, t, t): P8 + P9 naming. */
  def tiles(df: DataFrame, name: Column, img: Column, rows: Column,
            cols: Column, t: Int): DataFrame =
    df.select(name.as("name"),
        explode(tileUdf(img, rows, cols, lit(t))).as("part"))
      .select(
        concat(col("name"), lit("-"), col("part._1")).as("tile_name"),
        col("part._2").as("tile"),
        lit(t).as("rows"), lit(t).as("cols"))

  /** Frame sampling for opaque video payloads: treat the binary column as
    * fixed-size frames and keep every `stride`-th one (decoders for real
    * containers plug in ahead, like the zip/TIFF decode — the Spark-side
    * contract is (payload, frame_size, stride) → (frame_idx, frame)).
    * Per-row generator, no shuffle. */
  def sampleFrames(video: Array[Byte], frameSize: Int, stride: Int): Array[(Int, Array[Byte])] = {
    val n = video.length / frameSize
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var i = 0
    while (i < n) {
      out += ((i, java.util.Arrays.copyOfRange(video, i * frameSize, (i + 1) * frameSize)))
      i += stride
    }
    out.toArray
  }

  val sampleFramesUdf = udf((v: Array[Byte], frameSize: Int, stride: Int) =>
    sampleFrames(v, frameSize, stride))

  /** (id, video) → one row per sampled frame. */
  def frameSample(df: DataFrame, id: Column, video: Column,
                  frameSize: Int, stride: Int): DataFrame =
    df.select(id.as("id"),
        explode(sampleFramesUdf(video, lit(frameSize), lit(stride))).as("f"))
      .select(col("id"), col("f._1").as("frame_idx"), col("f._2").as("frame"))

  /** Audio feature extraction for opaque PCM payloads: signed 16-bit LE
    * samples framed into windows of `win` samples; per-window RMS energy.
    * The multimodal pattern again: binary column in, typed features out,
    * all per-row. */
  def pcmWindowEnergy(pcm: Array[Byte], win: Int): Array[Double] = {
    val samples = pcm.length / 2
    val windows = samples / win
    val out = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      var acc = 0.0
      var i = 0
      while (i < win) {
        val p = 2 * (w * win + i)
        val s = ((pcm(p) & 0xff) | (pcm(p + 1) << 8)).toShort.toDouble
        acc += s * s
        i += 1
      }
      out(w) = math.sqrt(acc / win)
      w += 1
    }
    out
  }

  val pcmEnergyUdf = udf((pcm: Array[Byte], win: Int) => pcmWindowEnergy(pcm, win))

  /** Full per-tile feature pipeline: M1 → M2(factor) → M3. */
  def tileFeatures(df: DataFrame, factor: Int): DataFrame =
    df.select(col("tile_name"),
        intensityUdf(col("tile")).as("inten"),
        col("rows"), col("cols"))
      .select(col("tile_name"),
        blockMeanUdf(col("inten"), col("rows"), col("cols"), lit(factor)).as("sub"),
        (col("rows") / factor).cast("int").as("srows"),
        (col("cols") / factor).cast("int").as("scols"))
      .select(col("tile_name"),
        gradientUdf(col("sub"), col("srows"), col("scols")).as("features"))
}
