package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

/** Multimodal plumbing (SURVEY §2 op 57): the decode/resize/frame/
  * feature stages are stubs, but their Spark contracts — schemas,
  * fixed-size buffers, row fan-out, determinism, chaining into ANN —
  * are real and asserted here.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    Seq((1L, "the quick brown fox"), (2L, "jumps over the lazy dog"),
      (3L, "pack my box with five dozen jugs")).toDF("doc_id", "text")

  private def withImg = Multimodal.withFakeImage(docs, "text")

  test("resizeStub emits fixed-size buffers with stable metadata") {
    val out = Multimodal.resizeStub(withImg, "doc_id", "image", w = 8, h = 8)
      .as[(Long, Int, Int, Array[Byte])].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall { case (_, w, h, px) => w == 8 && h == 8 && px.length == 64 })
    // payload is md5(text): 16 bytes tiled 4× → every tile identical
    val px = out.head._4
    assert((0 until 64).forall(i => px(i) == px(i % 16)))
  }

  test("frameSampleStub fans one row out to ceil(nFrames/stride) frames") {
    val stride = 3
    val out = Multimodal.frameSampleStub(withImg, "doc_id", "image", stride)
      .as[(Long, Int, Array[Byte])].collect()
    val img = withImg.select($"doc_id", $"image").as[(Long, Array[Byte])]
      .collect().toMap
    for ((id, bytes) <- img) {
      val n = 1 + (bytes(0) & 0xff) % 32
      val expected = (n + stride - 1) / stride
      val frames = out.filter(_._1 == id)
      assert(frames.length == expected, s"doc $id: n=$n")
      assert(frames.map(_._2).sorted.toSeq == (0 until n by stride).toSeq)
      assert(frames.forall(_._3.length == 16))
    }
  }

  test("featureExtractStub yields L2-normalized vectors that chain into ANN") {
    val out = Multimodal.featureExtractStub(withImg, "doc_id", "image", dim = 64)
    val vecs = out.as[(Long, Array[Float])].collect()
    assert(vecs.forall(_._2.length == 64))
    for ((_, v) <- vecs) {
      val norm = v.map(x => x.toDouble * x).sum
      assert(math.abs(norm - 1.0) < 1e-5)
    }
    // the embedding column feeds the ANN operator unchanged
    val topk = Similarity.bruteForceTopK(
      out.where($"doc_id" === 1), out.where($"doc_id" =!= 1),
      "doc_id", "embedding", k = 1)
    assert(topk.count() == 1)
  }

  test("media stubs are deterministic across runs") {
    val a = Multimodal.featureExtractStub(withImg, "doc_id", "image")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val b = Multimodal.featureExtractStub(withImg, "doc_id", "image")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(a.zip(b).forall { case ((i, x), (j, y)) => i == j && x.sameElements(y) })
  }
}
