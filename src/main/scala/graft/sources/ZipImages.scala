package graft.sources

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 binary-file source + S5 zip-member extraction (SURVEY.md §2.1;
  * `a2_ahuja.py:13–24,416`).
  *
  * - S2: `spark.read.format("binaryFile")` → (path, content) rows — the
  *   idiomatic replacement for `sc.binaryFiles`.
  * - S5: the `ZipInputStream` member scan is REAL JVM code (find the first
  *   `.tif` entry, read its bytes), and [[decodeTiff]] is a real pure-JVM
  *   baseline uncompressed-TIFF reader (header + IFD + strip assembly) for
  *   the 8-bit 4-channel RGBI images the reference processes. Payloads the
  *   baseline reader rejects (compressed/planar/non-RGBI) fall back to the
  *   deterministic raw fixture format ([[decodeRawStub]]): 8-byte header
  *   (rows, cols int32 BE) followed by row-major rows×cols×4 RGBI bytes.
  *   Every operator downstream of the decode is codec-independent (they
  *   see (rows, cols, bytes)).
  */
object ZipImages {

  /** S5 first half (real): first `.tif`-suffixed member of a zip payload. */
  def extractTiffMember(zipBytes: Array[Byte]): Array[Byte] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var e = zis.getNextEntry
      while (e != null && !e.getName.toLowerCase.endsWith(".tif")) {
        e = zis.getNextEntry
      }
      if (e == null) null else zis.readAllBytes()
    } finally zis.close()
  }

  /** S5 second half, fixture fallback: rows/cols int32 BE header + raw
    * RGBI. Kept for the deterministic fixture corpus; real `.tif` payloads
    * go through [[decodeTiff]]. */
  def decodeRawStub(tiff: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (tiff == null || tiff.length < 8) return null
    val bb = ByteBuffer.wrap(tiff)
    val rows = bb.getInt
    val cols = bb.getInt
    // long arithmetic: rows*cols*4 overflows Int for adversarial headers,
    // which would let the guard pass on garbage and copyOfRange throw
    val expected = 8L + rows.toLong * cols * 4
    if (rows <= 0 || cols <= 0 || tiff.length < expected) return null
    (rows, cols, java.util.Arrays.copyOfRange(tiff, 8, expected.toInt))
  }

  /** S5 second half (real codec, minimal): baseline uncompressed-TIFF
    * reader — header, first IFD, strip assembly. Pure JVM, no imaging
    * library. Covers what the reference's multispectral ortho tiles need
    * (`a2_ahuja.py:13–24` reads them with `tifffile`): 8-bit samples,
    * 4 samples/pixel (RGBI), Compression = 1 (none), chunky layout
    * (PlanarConfiguration = 1), either byte order, any strip split.
    * Anything else returns null and the caller falls back to the raw stub.
    */
  def decodeTiff(tiff: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (tiff == null || tiff.length < 8) return null
    val le = tiff(0) == 'I'.toByte && tiff(1) == 'I'.toByte
    val be = tiff(0) == 'M'.toByte && tiff(1) == 'M'.toByte
    if (!le && !be) return null
    val bb = ByteBuffer.wrap(tiff)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    if (bb.getShort(2) != 42) return null
    // long arithmetic throughout: ifd near Int.MaxValue must fail the
    // guard, not overflow past it and throw out of the UDF
    val ifd = bb.getInt(4)
    if (ifd < 0 || ifd.toLong + 2 > tiff.length) return null
    val nEntries = bb.getShort(ifd) & 0xffff
    if (ifd.toLong + 2 + 12L * nEntries > tiff.length) return null

    // BYTE(1)/SHORT(3)/LONG(4) tag values; inline when they fit in 4 bytes
    def values(entryOff: Int): Array[Int] = {
      val typ = bb.getShort(entryOff + 2) & 0xffff
      val cnt = bb.getInt(entryOff + 4)
      val sz = typ match { case 1 => 1; case 3 => 2; case 4 => 4; case _ => return null }
      if (cnt < 0 || cnt > (1 << 24)) return null
      val total = sz * cnt
      val base = if (total <= 4) entryOff + 8 else bb.getInt(entryOff + 8)
      if (base < 0 || base.toLong + total > tiff.length) return null
      Array.tabulate(cnt) { i =>
        sz match {
          case 1 => tiff(base + i) & 0xff
          case 2 => bb.getShort(base + 2 * i) & 0xffff
          case 4 => bb.getInt(base + 4 * i)
        }
      }
    }

    var width = -1
    var height = -1
    var spp = 1
    var comp = 1
    var planar = 1
    var rowsPerStrip = Int.MaxValue // TIFF default: all rows in one strip
    var bits: Array[Int] = Array(1)
    var stripOffsets: Array[Int] = null
    var stripCounts: Array[Int] = null
    var e = 0
    while (e < nEntries) {
      val off = ifd + 2 + 12 * e
      val tag = bb.getShort(off) & 0xffff
      tag match {
        case 256 => val v = values(off); if (v == null || v.isEmpty) return null; width = v(0)
        case 257 => val v = values(off); if (v == null || v.isEmpty) return null; height = v(0)
        case 258 => val v = values(off); if (v == null) return null; bits = v
        case 259 => val v = values(off); if (v == null || v.isEmpty) return null; comp = v(0)
        case 273 => stripOffsets = values(off); if (stripOffsets == null) return null
        case 277 => val v = values(off); if (v == null || v.isEmpty) return null; spp = v(0)
        case 278 => val v = values(off); if (v == null || v.isEmpty) return null; rowsPerStrip = v(0)
        case 279 => stripCounts = values(off); if (stripCounts == null) return null
        case 284 => val v = values(off); if (v == null || v.isEmpty) return null; planar = v(0)
        case _ => // unknown tags are skipped, per the TIFF baseline contract
      }
      e += 1
    }
    if (width <= 0 || height <= 0 || comp != 1 || planar != 1 || spp != 4
        || bits.exists(_ != 8) || stripOffsets == null || stripCounts == null
        || stripOffsets.length != stripCounts.length
        || width.toLong * height * spp > (1L << 30)) return null
    val out = new Array[Byte](width * height * spp)
    var written = 0
    var s = 0
    while (s < stripOffsets.length) {
      val so = stripOffsets(s)
      val sc = stripCounts(s)
      if (so < 0 || sc < 0 || so.toLong + sc > tiff.length
          || written + sc > out.length) return null
      System.arraycopy(tiff, so, out, written, sc)
      written += sc
      s += 1
    }
    if (written != out.length) return null
    (height, width, out)
  }

  private val decodeUdf = udf((zipBytes: Array[Byte]) =>
    Option(extractTiffMember(zipBytes)).flatMap(t =>
      Option(decodeTiff(t)).orElse(Option(decodeRawStub(t)))))

  /** S2+S5+P9: zip dir → (name, rows, cols, img) one row per decodable
    * image, name = basename of the file path (a2:27–29). */
  def readImages(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        decodeUdf(col("content")).as("d"))
      .filter(col("d").isNotNull)
      .select(col("name"), col("d._1").as("rows"), col("d._2").as("cols"),
        col("d._3").as("img"))

  /** Deterministic zip fixture corpus: `n` images (rows×cols RGBI), each
    * zipped as `imgK.zip` holding one `.tif` member in the stub raw format.
    * Images 2i and 2i+1 share a base pattern with a tiny diagonal
    * perturbation — planted near-duplicate pairs for the LSH pipeline.
    * Driver-side by design (test scaffolding, not an operator). */
  // bump when the fixture byte format below changes
  private val FixtureVersion = "v1"

  def ensureFixtures(n: Int = 6, rows: Int = 100, cols: Int = 100): String = {
    val outDir = Paths.get("/tmp/graft_fixtures/images")
    synchronized {
      // content-marker idempotence: the corpus is a pure function of
      // (n, rows, cols, generator version), so a matching marker means the
      // bytes on disk are already exactly what this call would write —
      // repeated invocations (every Bench rep) cost one small file read
      val markerFile = outDir.resolve(".marker")
      val marker = s"$FixtureVersion|$n|$rows|$cols"
      if (Files.exists(markerFile) && new String(
          Files.readAllBytes(markerFile), java.nio.charset.StandardCharsets.UTF_8) == marker)
        return outDir.toString
      if (Files.exists(outDir)) {
        val it = Files.list(outDir).iterator()
        while (it.hasNext) Files.delete(it.next())
      }
      Files.createDirectories(outDir)
      (0 until n).foreach { i =>
        val img = new Array[Byte](rows * cols * 4)
        var p = 0
        var r = 0
        while (r < rows) {
          var c = 0
          while (c < cols) {
            var ch = 0
            while (ch < 4) {
              // quadratic + cross terms: tiles get distinct gradient
              // structure (a linear ramp would make every tile identical
              // after the diff/quantize step)
              var v = (r * r * 3 + c * c * 7 + r * c + ch * 11 + (i / 2) * 17) % 251
              if (i % 2 == 1 && r == c) v = (v + 40) % 251 // perturb the twin
              img(p) = v.toByte
              p += 1; ch += 1
            }
            c += 1
          }
          r += 1
        }
        val payload = ByteBuffer.allocate(8 + img.length)
          .putInt(rows).putInt(cols).put(img).array()
        val zipPath = outDir.resolve(s"img$i.zip")
        val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
        try {
          val entry = new ZipEntry(s"img$i.tif")
          // pin zip metadata so fixture bytes are bit-stable across runs
          entry.setTime(0L)
          zos.putNextEntry(entry)
          zos.write(payload)
          zos.closeEntry()
        } finally zos.close()
      }
      Files.write(markerFile, marker.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    outDir.toString
  }
}
