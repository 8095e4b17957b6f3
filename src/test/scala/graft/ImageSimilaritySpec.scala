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
