package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 op 57): media as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * Image decode is REAL (JDK-only `javax.imageio` — PNG/BMP/GIF need no
  * external codec): [[withSyntheticPng]] encodes a deterministic
  * grayscale PNG per row and [[decodeImage]] decodes any ImageIO-readable
  * bytes back to true dimensions + mean pixel. The audio/video-flavored
  * ops (resize-to-buffer, frame sampling, feature extraction) keep
  * deterministic stub kernels — the container ships no media codecs —
  * but their Spark plumbing (binary schema, typed Dataset mapPartitions
  * batching, flatMap fan-out) is the real shape; swap the kernel and
  * nothing else changes.
  */
object Multimodal {

  /** Attach an opaque binary payload (stand-in for image bytes). */
  def withFakeImage(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("image", to_binary(md5(col(textCol)), lit("hex")))

  /** Attach a REAL grayscale PNG payload, deterministically derived from
    * md5(text): dims (1 + d₀ mod 64) × (1 + d₁ mod 64), pixel (x,y) =
    * digest byte (x+y) mod 16. Encoded with ImageIO — a genuine,
    * decodable image whose post-decode stats any SQL engine can still
    * predict from the md5 hex (PNG grayscale is lossless).
    */
  def withSyntheticPng(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val d = md.digest(if (text == null) Array.emptyByteArray
                            else text.getBytes("UTF-8"))
          val w = 1 + (d(0) & 0xff) % 64
          val h = 1 + (d(1) & 0xff) % 64
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, d((x + y) % 16) & 0xff)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "image")
  }

  case class DecodedImage(doc_id: Long, width: Long, height: Long,
                          mean_px: Double)

  /** Real per-partition image decode: ImageIO bytes → true width/height
    * and mean of band-0 samples. Batched like the other media ops (a
    * real pipeline amortizes codec/model setup per batch). Empty or
    * undecodable payloads fail fast with the offending row id rather
    * than a bare NPE deep in ImageIO.
    */
  def decodeImage(df: DataFrame, idCol: String, binCol: String,
                  batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            require(bytes != null && bytes.nonEmpty, s"row $id: empty image payload")
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            require(img != null, s"row $id: undecodable image payload")
            val w = img.getWidth
            val h = img.getHeight
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            DecodedImage(id, w.toLong, h.toLong, sum.toDouble / (w.toLong * h))
          }
        }
      }
      .toDF()
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          pixels: Array[Byte])
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Batch size for per-partition media processing — the Scala analogue
    * of mapInPandas's Arrow batch shape. A real decoder amortizes model
    * /codec setup per BATCH, not per row, so the stubs preserve that
    * structure (grouped iterator, one "decode context" per batch).
    */
  val DefaultBatchSize = 64

  /** "Resize" every image to (w × h): emits a deterministic fake pixel
    * buffer of exactly w*h bytes (seeded from the payload), preserving
    * the real op's contract — fixed-size output buffers, batched
    * per-partition processing, binary-in/binary-out schema.
    */
  def resizeStub(df: DataFrame, idCol: String, binCol: String,
                 w: Int, h: Int,
                 batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // STUB decode context: real codecs allocate per-batch here.
          batch.map { case (id, bytes) =>
            // public operator taking arbitrary media bytes: an empty
            // payload must not surface as a bare mod-zero exception
            require(bytes != null && bytes.nonEmpty, s"row $id: empty media payload")
            val out = new Array[Byte](w * h)
            var i = 0
            while (i < out.length) {
              out(i) = bytes(i % bytes.length)
              i += 1
            }
            ResizedMedia(id, w, h, out)
          }
        }
      }
      .toDF()
  }

  /** Sample every `stride`-th frame from a "video" payload: one input
    * row fans out to ceil(nFrames/stride) rows — the row-multiplying
    * batch shape (flatMap) a real frame sampler has. Frame count derives
    * deterministically from the payload; each frame is a fixed-size
    * slice-stub.
    */
  def frameSampleStub(df: DataFrame, idCol: String, binCol: String,
                      stride: Int, frameBytes: Int = 16,
                      batchSize: Int = DefaultBatchSize): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            require(bytes != null && bytes.nonEmpty, s"row $id: empty media payload")
            val nFrames = 1 + (bytes(0) & 0xff) % 32
            (0 until nFrames by stride).iterator.map { f =>
              val frame = new Array[Byte](frameBytes)
              var i = 0
              while (i < frameBytes) {
                frame(i) = bytes((f + i) % bytes.length)
                i += 1
              }
              Frame(id, f, frame)
            }
          }
        }
      }
      .toDF()
  }

  /** "Feature-extract" media bytes into a dense embedding — the bridge
    * from multimodal payloads into the ANN/dedup operators (the output
    * column matches the `embeddings` table's `Array[Float]` shape, so
    * [[Similarity]] consumes it directly). Deterministic stub features:
    * byte histogram folded to `dim`, L2-normalized.
    */
  def featureExtractStub(df: DataFrame, idCol: String, binCol: String,
                         dim: Int = 64,
                         batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val acc = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) {
              acc((bytes(i) & 0xff) % dim) += 1f
              i += 1
            }
            var norm = 0.0
            var j = 0
            while (j < dim) { norm += acc(j).toDouble * acc(j); j += 1 }
            val inv = if (norm > 0) (1.0 / math.sqrt(norm)).toFloat else 0f
            j = 0
            while (j < dim) { acc(j) *= inv; j += 1 }
            MediaEmbedding(id, acc)
          }
        }
      }
      .toDF()
  }
}
