package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY columns with typed metadata, processed by batch-shaped
  * partition functions.
  *
  * The actual media decoding is STUBBED (this container ships no image/
  * audio codecs): `decodeStub` derives deterministic pseudo-features from
  * the bytes. Everything around it — the schema, the Dataset[MediaRow]
  * encoder, the batch iteration shape (decode `batchSize` blobs at a time,
  * like a vectorized/Arrow UDF would), the per-media_id partitioning, the
  * frame-explode — is real Spark and tested.
  *
  * Scale posture: binary stays opaque end-to-end (no driver collect, no
  * base64 round-trips); feature extraction is mapPartitions (one JVM call
  * per partition, amortized setup per batch exactly where a codec handle
  * would be reused); repartition by media_id spreads decode cost evenly.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                            format: String, width: Int, height: Int,
                            sample_rate: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, kind: String, phash: Long,
                                 brightness: Double, n_bytes: Int,
                                 embedding: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic synthetic media table (seeded by media_id). */
  def fixture(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (id % 7).toInt * 64
      val bytes = Array.tabulate[Byte](len)(j => ((id * 31 + j * 7) % 251).toByte)
      MediaRow(id, kind, bytes,
        format = if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
        width = if (kind == "image") 64 + (id % 4).toInt * 32 else 0,
        height = if (kind == "image") 64 else 0,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = if (kind == "video") 1000 + id * 10 else 0)
    }
  }

  /** STUB decode: a real implementation would decode the codec here
    * (JPEG/PNG/WAV). Returns deterministic pseudo pixel/sample statistics
    * derived from the raw bytes so the pipeline stays testable. */
  private[multimodal] def decodeStub(content: Array[Byte]): (Double, Array[Float]) = {
    val brightness =
      if (content.isEmpty) 0.0
      else content.map(b => (b & 0xff).toDouble).sum / content.length / 255.0
    val emb = Array.tabulate(16) { k =>
      var acc = 0L
      var j = k
      while (j < content.length) { acc += (content(j) & 0xff); j += 16 }
      (acc % 1000).toFloat / 1000.0f
    }
    (brightness, emb)
  }

  /** Batch-shaped feature extraction: decodes `batchSize` blobs per inner
    * batch within each partition (the Arrow/pandas-batch analog). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup is where a real codec/session handle would live
        batch.iterator.map { m =>
          val (brightness, emb) = decodeStub(m.content)
          val phash = m.content.foldLeft(1125899906842597L)((h, b) =>
            31 * h + (b & 0xff))
          MediaFeatures(m.media_id, m.kind, phash, brightness,
            m.content.length, emb)
        }
      }
    }
  }

  /** STUB resize: a real implementation would re-encode; here the plumbing
    * (binary in → binary out, metadata updated) is what's exercised. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
                   w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else {
        val scaled = java.util.Arrays.copyOf(m.content,
          math.max(1, math.min(m.content.length, w * h / 16)))
        m.copy(content = scaled, width = w, height = h)
      }
    }
  }

  /** STUB frame sampling: emits `framesPerVideo` deterministic byte slices
    * per video row (the explode/generator shape of video preprocessing). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   framesPerVideo: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val step = math.max(1, m.content.length / framesPerVideo)
      (0 until framesPerVideo).map { k =>
        val from = math.min(k * step, math.max(m.content.length - 1, 0))
        val until = math.min(from + step, m.content.length)
        Frame(m.media_id, k, java.util.Arrays.copyOfRange(m.content, from, until))
      }
    }
  }

  /** End-to-end demo frame: features joined back to metadata. */
  def featureTable(spark: SparkSession, n: Int): DataFrame = {
    val media = fixture(spark, n).repartition(col("media_id"))
    extractFeatures(spark, media).toDF()
      .join(media.toDF().select("media_id", "format", "duration_ms"), "media_id")
      .orderBy("media_id")
  }
}
