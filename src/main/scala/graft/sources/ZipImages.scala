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
  *   `.tif` entry, read its bytes). The TIFF *codec* is stubbed — no
  *   imaging library ships in this environment — behind a deterministic
  *   raw format ([[decodeRawStub]]): 8-byte header (rows, cols int32 BE)
  *   followed by row-major rows×cols×4 RGBI bytes. A real deployment swaps
  *   only `decode*`; every operator downstream of the decode is
  *   codec-independent (they see (rows, cols, bytes)).
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

  /** S5 second half (STUB codec): rows/cols int32 BE header + raw RGBI. */
  def decodeRawStub(tiff: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (tiff == null || tiff.length < 8) return null
    val bb = ByteBuffer.wrap(tiff)
    val rows = bb.getInt
    val cols = bb.getInt
    if (tiff.length < 8 + rows * cols * 4) return null
    (rows, cols, java.util.Arrays.copyOfRange(tiff, 8, 8 + rows * cols * 4))
  }

  private val decodeUdf = udf((zipBytes: Array[Byte]) =>
    Option(extractTiffMember(zipBytes)).flatMap(t => Option(decodeRawStub(t))))

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
