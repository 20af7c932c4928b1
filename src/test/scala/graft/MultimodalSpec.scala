package graft

import graft.operators.{Multimodal, Similarity}

/** Multimodal kernels (SURVEY §2 op 57): decode, bilinear resize,
  * crop-grid frame sampling and histogram feature extraction all run on
  * REAL decoded rasters (ImageIO PNGs); these specs pin the pixel math
  * against an independently-computed reference raster.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    Seq((1L, "the quick brown fox"), (2L, "jumps over the lazy dog"),
      (3L, "pack my box with five dozen jugs")).toDF("doc_id", "text")

  private def withImg = Multimodal.withSyntheticPng(docs, "doc_id", "text")

  /** The synthetic PNG's raster, recomputed independently of the
    * operator under test: pixel (x,y) = md5(text) byte (x+y) mod 16.
    */
  private def referenceRaster(text: String): (Int, Int, Array[Int]) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val w = 1 + (d(0) & 0xff) % 64
    val h = 1 + (d(1) & 0xff) % 64
    (w, h, Array.tabulate(w * h)(i => d((i % w + i / w) % 16) & 0xff))
  }

  test("resizeBilinear emits fixed-size buffers of real resampled pixels") {
    val out = Multimodal.resizeBilinear(withImg, "doc_id", "image", w = 8, h = 8)
      .as[(Long, Int, Int, Array[Byte])].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall { case (_, w, h, px) => w == 8 && h == 8 && px.length == 64 })
    // pin one output pixel against the hand-evaluated bilinear formula
    val (sw, sh, s) = referenceRaster("the quick brown fox")
    val px = out.head._4
    val sy = math.min(math.max(0.5 * sh / 8.0 - 0.5, 0.0), sh - 1.0)
    val sx = math.min(math.max(0.5 * sw / 8.0 - 0.5, 0.0), sw - 1.0)
    val (y0, x0) = (sy.toInt, sx.toInt)
    val (y1, x1) = (math.min(y0 + 1, sh - 1), math.min(x0 + 1, sw - 1))
    val (fy, fx) = (sy - y0, sx - x0)
    val v = (1 - fy) * ((1 - fx) * s(y0 * sw + x0) + fx * s(y0 * sw + x1)) +
      fy * ((1 - fx) * s(y1 * sw + x0) + fx * s(y1 * sw + x1))
    assert((px(0) & 0xff) == math.floor(v + 0.5).toInt)
  }

  test("resizeBilinear to the source dims is the identity") {
    val (sw, sh, s) = referenceRaster("the quick brown fox")
    val out = Multimodal.resizeBilinear(
        withImg.where($"doc_id" === 1), "doc_id", "image", w = sw, h = sh)
      .as[(Long, Int, Int, Array[Byte])].collect().head
    assert(out._2 == sw && out._3 == sh)
    assert(out._4.map(_ & 0xff).toSeq == s.toSeq)
  }

  test("frameGrid tiles partition the decoded raster exactly") {
    val out = Multimodal.frameGrid(withImg, "doc_id", "image", gx = 2, gy = 2)
      .as[(Long, Int, Int, Int, Array[Byte])].collect()
    for ((id, text) <- Seq((1L, "the quick brown fox"),
        (2L, "jumps over the lazy dog"), (3L, "pack my box with five dozen jugs"))) {
      val (sw, sh, s) = referenceRaster(text)
      val frames = out.filter(_._1 == id)
      // tile areas partition the image; tile pixel sums partition the total
      assert(frames.map(f => f._3 * f._4).sum == sw * sh)
      assert(frames.map(_._5.map(_ & 0xff).sum).sum == s.sum)
      // row-major indices, boundaries at integer-division gridlines
      for ((_, idx, fw, fh, _) <- frames) {
        val (tx, ty) = (idx % 2, idx / 2)
        assert(fw == (tx + 1) * sw / 2 - tx * sw / 2)
        assert(fh == (ty + 1) * sh / 2 - ty * sh / 2)
      }
    }
  }

  test("featureExtract histograms decoded samples, L2-normalized, ANN-ready") {
    val out = Multimodal.featureExtract(withImg, "doc_id", "image", dim = 64)
    val vecs = out.as[(Long, Array[Float])].collect()
    assert(vecs.forall(_._2.length == 64))
    for ((id, v) <- vecs) {
      val norm = v.map(x => x.toDouble * x).sum
      assert(math.abs(norm - 1.0) < 1e-5)
    }
    // bin mass must match the reference raster's histogram ratios
    val (_, _, s) = referenceRaster("the quick brown fox")
    val counts = s.groupBy(_ % 64).view.mapValues(_.length)
    val v1 = vecs.find(_._1 == 1L).get._2
    val nz = v1.zipWithIndex.filter(_._1 > 0).map(_._2).toSet
    assert(nz == counts.keySet)
    // the embedding column feeds the ANN operator unchanged
    val topk = Similarity.bruteForceTopK(
      out.where($"doc_id" === 1), out.where($"doc_id" =!= 1),
      "doc_id", "embedding", k = 1)
    assert(topk.count() == 1)
  }

  test("media kernels are deterministic across runs") {
    val a = Multimodal.featureExtract(withImg, "doc_id", "image")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val b = Multimodal.featureExtract(withImg, "doc_id", "image")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(a.zip(b).forall { case ((i, x), (j, y)) => i == j && x.sameElements(y) })
  }
}
