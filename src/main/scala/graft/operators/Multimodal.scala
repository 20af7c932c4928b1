package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 op 57): media as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The image path is REAL end-to-end on JDK-only `javax.imageio`
  * (PNG/BMP/GIF need no external codec): [[withSyntheticPng]] encodes a
  * deterministic grayscale PNG per row; [[decodeImage]],
  * [[resizeBilinear]], [[frameGrid]] and [[featureExtract]] all decode
  * the actual bytes and operate on the decoded raster — true dims,
  * bilinear-resampled pixels, subimage tiles, sample histograms. The
  * kernels are written as explicit IEEE-double formulas (not
  * `Graphics2D.drawImage`, whose filter taps are implementation-defined)
  * so a SQL oracle can replay every output pixel exactly. Video/audio
  * codecs don't ship in a JDK, so there is no mp4/wav parser here — but
  * the per-partition batched shape (one decode context per batch, the
  * Scala analogue of mapInPandas's Arrow batches) is exactly what a
  * codec-backed kernel drops into.
  */
object Multimodal {

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
  case class GridFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                       frame: Array[Byte])
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Batch size for per-partition media processing — the Scala analogue
    * of mapInPandas's Arrow batch shape. A real decoder amortizes model
    * /codec setup per BATCH, not per row, so every kernel preserves that
    * structure (grouped iterator, one "decode context" per batch).
    */
  val DefaultBatchSize = 64

  /** Decode any ImageIO-readable payload to its grayscale band-0 raster,
    * row-major. Shared decode step of the resize/frame/feature kernels.
    */
  private def grayRaster(id: Long, bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes != null && bytes.nonEmpty, s"row $id: empty media payload")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"row $id: undecodable media payload")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val s = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { s(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, s)
  }

  case class DHashBands(doc_id: Long, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Perceptual difference-hash (dHash; Krawetz's classic 8×8
    * gradient fingerprint) of a decoded image, emitted as FOUR 16-bit
    * band integers rather than one packed int64 — band-blocked
    * near-dup joins group directly on a band column and a 64-bit
    * pack would overflow signed BIGINT algebra in SQL engines.
    *
    * Sampling is NEAREST (gx = ⌊i·w/9⌋, gy = ⌊j·h/8⌋ over a 9×8
    * grid) — integer-exact, so the hash is bit-reproducible from the
    * raster alone (no float resample in the fingerprint path). Bit
    * k = j·8+i of the hash is 1 iff p(i+1,j) > p(i,j); band b holds
    * bits [16b, 16b+16) (j = 2b, 2b+1).
    */
  def dHashBands(df: DataFrame, idCol: String, binCol: String,
                 batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (w, h, s) = grayRaster(id, bytes)
            def px(i: Int, j: Int): Int = {
              val gx = i * w / 9
              val gy = j * h / 8
              s(gy * w + gx)
            }
            val bands = new Array[Int](4)
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                if (px(i + 1, j) > px(i, j)) {
                  val k = j * 8 + i
                  bands(k / 16) |= 1 << (k % 16)
                }
                i += 1
              }
              j += 1
            }
            DHashBands(id, bands(0), bands(1), bands(2), bands(3))
          }
        }
      }
      .toDF()
  }

  /** REAL resize: decode every image and bilinear-resample its raster to
    * (w × h) — binary-in/binary-out, fixed-size output buffers, batched
    * per-partition. Standard half-pixel-center sampling (source coord
    * `(o+0.5)·src/dst − 0.5`, clamped; the align-corners=false
    * convention of OpenCV/PIL/TF), output samples rounded half-up to
    * ints. The formula is spelled out (rather than delegated to
    * `Graphics2D`, whose bilinear taps are implementation-defined) so
    * results are bit-reproducible across engines — resizing an image to
    * its own dims is the identity, pinned in MultimodalSpec.
    */
  def resizeBilinear(df: DataFrame, idCol: String, binCol: String,
                     w: Int, h: Int,
                     batchSize: Int = DefaultBatchSize): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (sw, sh, s) = grayRaster(id, bytes)
            val out = new Array[Byte](w * h)
            var oy = 0
            while (oy < h) {
              val sy = math.min(math.max((oy + 0.5) * sh / h.toDouble - 0.5, 0.0), sh - 1.0)
              val y0 = sy.toInt
              val y1 = math.min(y0 + 1, sh - 1)
              val fy = sy - y0
              var ox = 0
              while (ox < w) {
                val sx = math.min(math.max((ox + 0.5) * sw / w.toDouble - 0.5, 0.0), sw - 1.0)
                val x0 = sx.toInt
                val x1 = math.min(x0 + 1, sw - 1)
                val fx = sx - x0
                val v = (1 - fy) * ((1 - fx) * s(y0 * sw + x0) + fx * s(y0 * sw + x1)) +
                  fy * ((1 - fx) * s(y1 * sw + x0) + fx * s(y1 * sw + x1))
                out(oy * w + ox) = math.floor(v + 0.5).toInt.toByte
                ox += 1
              }
              oy += 1
            }
            ResizedMedia(id, w, h, out)
          }
        }
      }
      .toDF()
  }

  /** REAL frame sampling via crop-grid: decode every image and split its
    * raster into a gx × gy grid of subimage tiles, one output row per
    * non-empty tile — the row-multiplying flatMap shape a video frame
    * sampler has, with genuine pixel slices. Tile (tx, ty) covers
    * `[tx·w/gx, (tx+1)·w/gx) × [ty·h/gy, (ty+1)·h/gy)` (integer
    * division, the `BufferedImage.getSubimage` tiling); images narrower
    * than the grid yield fewer tiles. frame_idx = ty·gx + tx, row-major.
    */
  def frameGrid(df: DataFrame, idCol: String, binCol: String,
                gx: Int = 2, gy: Int = 2,
                batchSize: Int = DefaultBatchSize): DataFrame = {
    require(gx > 0 && gy > 0, s"grid dims must be positive, got ${gx}x$gy")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            val (sw, sh, s) = grayRaster(id, bytes)
            for {
              ty <- (0 until gy).iterator
              tx <- 0 until gx
              x0 = tx * sw / gx; x1 = (tx + 1) * sw / gx
              y0 = ty * sh / gy; y1 = (ty + 1) * sh / gy
              if x1 > x0 && y1 > y0
            } yield {
              val fw = x1 - x0
              val fh = y1 - y0
              val tile = new Array[Byte](fw * fh)
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  tile((y - y0) * fw + (x - x0)) = s(y * sw + x).toByte
                  x += 1
                }
                y += 1
              }
              GridFrame(id, ty * gx + tx, fw, fh, tile)
            }
          }
        }
      }
      .toDF()
  }

  /** REAL feature extraction: decode every image and histogram its
    * raster samples into `dim` bins (value mod dim), L2-normalized —
    * the bridge from multimodal payloads into the ANN/dedup operators
    * (the output column matches the `embeddings` table's `Array[Float]`
    * shape, so [[Similarity]] consumes it directly). A luminance
    * histogram is the classic pre-neural image descriptor; a model-based
    * embedder swaps into the same batched kernel slot.
    */
  def featureExtract(df: DataFrame, idCol: String, binCol: String,
                     dim: Int = 64,
                     batchSize: Int = DefaultBatchSize): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (_, _, s) = grayRaster(id, bytes)
            val acc = new Array[Float](dim)
            var i = 0
            while (i < s.length) { acc(s(i) % dim) += 1f; i += 1 }
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

  /** Attach a synthetic 8-bit PCM payload, deterministically derived
    * from md5(text): length 256 + (d₀ mod 8)·64 samples, sample(i) =
    * (d(i mod 16) + i·(d((i+5) mod 16) mod 7)) mod 256 — an opaque
    * `binary` audio column whose post-decode stats a SQL engine can
    * predict from the md5 hex, exactly like [[withSyntheticPng]]. (No
    * wav/mp3 codec ships in a JDK; raw PCM is the container-free
    * ground truth an audio kernel would decode INTO anyway.)
    */
  def withSyntheticPcm(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val d = md.digest(if (text == null) Array.emptyByteArray
                            else text.getBytes("UTF-8"))
          val n = 256 + ((d(0) & 0xff) % 8) * 64
          val pcm = new Array[Byte](n)
          var i = 0
          while (i < n) {
            pcm(i) = (((d(i % 16) & 0xff) +
              i * ((d((i + 5) % 16) & 0xff) % 7)) % 256).toByte
            i += 1
          }
          (id, pcm)
        }
      }
      .toDF(idCol, "audio")
  }

  case class AudioFrame(doc_id: Long, frame_id: Long, n_samples: Long,
                        rms: Double, zcr: Double)

  /** Per-frame audio features over the raw PCM bytes: RMS energy of
    * the centered samples and the zero-crossing rate — the two
    * classic pre-neural audio descriptors (silence/voicing gates).
    * Complete 64-sample frames only; crossings count sign changes of
    * (s − 128) WITHIN the frame (s = 128 takes the positive side so
    * the sign is total). Batched per partition like every media
    * kernel here; all sums are integers, so the emitted doubles
    * replay exactly in SQL.
    */
  def audioFrameEnergy(df: DataFrame, idCol: String, binCol: String,
                       frame: Int = 64,
                       batchSize: Int = DefaultBatchSize): DataFrame = {
    require(frame > 1, s"frame must exceed 1, got $frame")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val nFrames = bytes.length / frame
            (0 until nFrames).map { f =>
              var sumSq = 0L
              var zc = 0L
              var prevPos = false
              var i = 0
              while (i < frame) {
                val s = (bytes(f * frame + i) & 0xff) - 128
                sumSq += s.toLong * s
                val pos = s >= 0
                if (i > 0 && pos != prevPos) zc += 1
                prevPos = pos
                i += 1
              }
              AudioFrame(id, f.toLong, frame.toLong,
                math.sqrt(sumSq.toDouble / frame),
                zc.toDouble / (frame - 1))
            }
          }
        }
      }
      .toDF()
  }
}
