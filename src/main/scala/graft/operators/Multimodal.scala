package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 op 57): media as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is STUBBED (this container ships no image/audio
  * codecs) with a deterministic fake — but the Spark-side plumbing is
  * real: binary column schema, typed Dataset mapPartitions (the Scala
  * analogue of mapInPandas batch processing), and a stable output
  * schema. Swap `decode` for a real codec and nothing else changes.
  */
object Multimodal {
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
                       height: Int, mean_byte: Double)

  /** Attach an opaque binary payload (stand-in for image bytes). */
  def withFakeImage(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("image", to_binary(md5(col(textCol)), lit("hex")))

  /** Per-partition "decode": bytes → typed metadata/features. */
  def decodeImageStub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: a real pipeline decodes image bytes here; deterministic
          // fake features keep schema/partitioning/batch shape honest.
          val w = 1 + (bytes(0) & 0xff) % 64
          val h = 1 + (bytes(1) & 0xff) % 64
          val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
          MediaMeta(id, bytes.length, w, h, mean)
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
