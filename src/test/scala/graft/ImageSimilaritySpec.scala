package graft

import graft.pipelines.ImageSimilarity
import graft.sources.ZipImages

/** S2/S5 sources + the composed image-similarity DAG (SURVEY.md §5.2.4:
  * candidate-count bounds and distance monotonicity, mirroring the
  * structure of a2_ahuja_output.txt without its environment values). */
class ImageSimilaritySpec extends SparkSpec {

  test("S5 zip member extraction is real; stub codec round-trips") {
    val dir = ZipImages.ensureFixtures(n = 2, rows = 20, cols = 20)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "img0.zip"))
    val tiff = ZipImages.extractTiffMember(bytes)
    assert(tiff != null)
    val (r, c, img) = ZipImages.decodeRawStub(tiff)
    assert(r == 20 && c == 20 && img.length == 20 * 20 * 4)
    // deterministic pixel formula
    assert((img(0) & 0xff) == 0)           // r=0,c=0,ch=0, base 0
    assert((img(1) & 0xff) == 11)          // ch=1
    assert(ZipImages.extractTiffMember(Array[Byte](1, 2, 3)) == null)
  }

  /** Hand-built baseline uncompressed TIFF: 8-bit RGBI, chunky layout.
    * `strips` splits the pixel rows; data is appended after the IFD. */
  private def buildTiff(le: Boolean, width: Int, height: Int,
                        pixels: Array[Byte], rowsPerStrip: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val entries = 9
    val ifdOff = 8
    val bitsOff = ifdOff + 2 + 12 * entries + 4 // after entry table + next-IFD
    val stripTableOff = bitsOff + 8             // 4 SHORTs of bits-per-sample
    val dataOff = stripTableOff + 8 * nStrips   // offsets + counts (LONGs)
    val buf = ByteBuffer.allocate(dataOff + pixels.length)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    buf.put(if (le) 'I'.toByte else 'M'.toByte)
    buf.put(if (le) 'I'.toByte else 'M'.toByte)
    buf.putShort(42).putInt(ifdOff)
    buf.putShort(entries.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit =
      { buf.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
        if (typ == 3 && cnt == 1) { buf.putShort(value.toShort).putShort(0) }
        else buf.putInt(value) }
    entry(256, 4, 1, width)                     // ImageWidth
    entry(257, 4, 1, height)                    // ImageLength
    entry(258, 3, 4, bitsOff)                   // BitsPerSample -> offset
    entry(259, 3, 1, 1)                         // Compression = none
    // single-strip LONG values fit in 4 bytes and are inline per the spec
    entry(273, 4, nStrips,
      if (nStrips == 1) dataOff else stripTableOff)     // StripOffsets
    entry(277, 3, 1, 4)                         // SamplesPerPixel = RGBI
    entry(278, 4, 1, rowsPerStrip)              // RowsPerStrip
    entry(279, 4, nStrips,
      if (nStrips == 1) pixels.length
      else stripTableOff + 4 * nStrips)         // StripByteCounts
    entry(284, 3, 1, 1)                         // PlanarConfiguration chunky
    buf.putInt(0)                               // no next IFD
    (0 until 4).foreach(_ => buf.putShort(8))   // bits per sample
    var row = 0
    (0 until nStrips).foreach { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      buf.putInt(dataOff + row * width * 4)
      row += rows
    }
    row = 0
    (0 until nStrips).foreach { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      buf.putInt(rows * width * 4)
      row += rows
    }
    buf.put(pixels)
    buf.array()
  }

  test("S5 real codec: decodes hand-built uncompressed TIFFs (LE + BE, multi-strip)") {
    val pixels = Array.tabulate(3 * 2 * 4)(p => ((p * 7 + 3) % 251).toByte)
    for (le <- Seq(true, false); rps <- Seq(3, 2, 1)) {
      val tiff = buildTiff(le, width = 2, height = 3, pixels, rowsPerStrip = rps)
      val decoded = ZipImages.decodeTiff(tiff)
      assert(decoded != null, s"le=$le rps=$rps")
      val (r, c, img) = decoded
      assert(r == 3 && c == 2, s"le=$le rps=$rps")
      assert(img.toSeq == pixels.toSeq, s"le=$le rps=$rps")
    }
  }

  test("S5 real codec rejects non-baseline payloads; raw stub still decodes fixtures") {
    // compressed flag -> reject
    val pixels = Array.fill[Byte](2 * 2 * 4)(9)
    val good = buildTiff(le = true, 2, 2, pixels, rowsPerStrip = 2)
    assert(ZipImages.decodeTiff(good) != null)
    // flip Compression (tag 259) value to 5 (LZW): entry 4 value at
    // 8 + 2 + 12*3 + 8
    val lzw = good.clone()
    lzw(8 + 2 + 12 * 3 + 8) = 5
    assert(ZipImages.decodeTiff(lzw) == null)
    // truncated
    assert(ZipImages.decodeTiff(good.take(20)) == null)
    // raw fixture payloads are not TIFF and fall through to the stub
    val dir = ZipImages.ensureFixtures(n = 1, rows = 10, cols = 10)
    val zip = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "img0.zip"))
    val member = ZipImages.extractTiffMember(zip)
    assert(ZipImages.decodeTiff(member) == null)
    assert(ZipImages.decodeRawStub(member) != null)
  }

  test("S5 end-to-end: a real .tif inside a zip decodes through readImages") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft_tiffzip")
    val pixels = Array.tabulate(4 * 5 * 4)(p => (p % 200).toByte)
    val tiff = buildTiff(le = true, width = 5, height = 4, pixels, rowsPerStrip = 2)
    val zos = new ZipOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("real.zip")))
    try {
      zos.putNextEntry(new ZipEntry("real.tif")); zos.write(tiff); zos.closeEntry()
    } finally zos.close()
    val rows = ZipImages.readImages(spark, dir.toString).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "real.zip")
    assert(rows.head.getInt(1) == 4 && rows.head.getInt(2) == 5)
    assert(rows.head.getAs[Array[Byte]]("img").toSeq == pixels.toSeq)
  }

  test("S2 binaryFile source reads the zip corpus distributed") {
    val dir = ZipImages.ensureFixtures(n = 4, rows = 20, cols = 20)
    val imgs = ZipImages.readImages(spark, dir).collect()
    assert(imgs.length == 4)
    assert(imgs.map(_.getString(0)).sorted.toSeq ==
      Seq("img0.zip", "img1.zip", "img2.zip", "img3.zip"))
    assert(imgs.forall(_.getInt(1) == 20))
  }

  test("end-to-end: self-distance 0, twin image found, distances sorted") {
    val dir = ZipImages.ensureFixtures(n = 6, rows = 100, cols = 100)
    val out = ImageSimilarity.run(spark, dir, queryImages = Seq("img0.zip"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_._1)
    // every query tile is its own candidate at distance 0 (J4)
    byQuery.foreach { case (qt, rows) =>
      val self = rows.find(_._2 == qt)
      assert(self.isDefined, s"$qt lacks self-pair")
      assert(self.get._3 == 0.0)
    }
    // distances are sorted ascending within each query
    byQuery.values.foreach { rows =>
      val ds = rows.map(_._3).toSeq
      assert(ds == ds.sorted)
    }
    // the planted twin (img1) shares tiles with img0's query tiles
    assert(out.exists { case (q, c, _) =>
      q.startsWith("img0.zip") && c.startsWith("img1.zip") })
  }

  test("image_similarity_md5 fixture: float32 kernels and a double replica " +
    "quantize identically, with margin — the contract that lets the " +
    "DuckDB oracle replay the pipeline in double precision") {
    import graft.ops.ImageOps
    var minMargin = Double.MaxValue
    (0 until 4).foreach { i =>
      // the ONE shared fixture definition — asserting against anything
      // else would let the query's bytes drift out from under this spec
      val bytes = ImageOps.syntheticImage(i)
      ImageOps.tileImage(bytes, 100, 100, 50).foreach { case (_, tile) =>
        // production path: float32 intensity → float32 block mean → quantize
        val f32 = ImageOps.gradientFeatures(
          ImageOps.blockMean(ImageOps.intensity(tile), 50, 50, 5), 10, 10)
        // double replica of the same arithmetic (the oracle's precision)
        val n = tile.length / 4
        val inten = Array.tabulate(n) { p =>
          val r = tile(4 * p) & 0xff; val g = tile(4 * p + 1) & 0xff
          val b = tile(4 * p + 2) & 0xff; val ir = tile(4 * p + 3) & 0xff
          (1.0 / 3.0) * (r + g + b) * (0.01 * ir)
        }
        val sub = Array.tabulate(10, 10) { (bi, bj) =>
          var s = 0.0
          for (r <- 0 until 5; c <- 0 until 5)
            s += inten((bi * 5 + r) * 50 + bj * 5 + c)
          s / 25.0
        }
        val diffs =
          (for (bi <- 0 until 10; bj <- 0 until 9)
            yield sub(bi)(bj + 1) - sub(bi)(bj)) ++
          (for (bi <- 0 until 9; bj <- 0 until 10)
            yield sub(bi + 1)(bj) - sub(bi)(bj))
        val f64 = diffs.map(d => if (d < -1) -1 else if (d > 1) 1 else 0)
        assert(f32.toSeq == f64.toSeq, s"quantize divergence on img$i")
        minMargin = math.min(minMargin,
          diffs.map(d => math.abs(math.abs(d) - 1.0)).min)
      }
    }
    // margin to the ±1 thresholds dwarfs float32 accumulation error
    assert(minMargin > 0.01, s"quantize margin too thin: $minMargin")
  }

  test("candidate counts stay within LSH bounds (not the full corpus)") {
    val dir = ZipImages.ensureFixtures(n = 6, rows = 100, cols = 100)
    val out = ImageSimilarity.run(spark, dir, queryImages = Seq("img0.zip"))
      .collect()
    val totalTiles = 6 * 4 // 100x100 / 50 -> 4 tiles each
    out.groupBy(_.getString(0)).foreach { case (q, rows) =>
      assert(rows.length >= 1 && rows.length <= totalTiles,
        s"$q has ${rows.length} candidates")
    }
  }
}
