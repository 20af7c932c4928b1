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
}
