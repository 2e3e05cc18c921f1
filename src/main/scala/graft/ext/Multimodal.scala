package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample are per-partition batch transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, typed
  * Dataset API) is real and tested; the DECODE STEP IS A STUB — this
  * container has no image/audio codecs, so [[FakeCodec]] derives
  * deterministic pseudo-features from the bytes. Swapping in a real codec
  * (JNI, or `mapInPandas`+PIL on a PySpark edge) changes ONLY
  * `FakeCodec.decode`; every plan shape stays identical.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media: Array[Byte], format: String,
      n_bytes: Long)
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
      content_md5: String, n_frames: Int, features: Array[Double])

  /** ====== STUB ====== deterministic fake decoder standing in for a real
    * image/audio codec (none available in this container). Features are
    * byte statistics — stable, engine-independent, and obviously fake. */
  object FakeCodec {
    val FrameBytes = 1024

    def decode(media: Array[Byte]): Array[Double] = {
      if (media.isEmpty) return Array(0.0, 0.0, 0.0)
      val sum = media.foldLeft(0L)((a, b) => a + (b & 0xff))
      Array(
        media.length.toDouble,
        sum.toDouble / media.length,          // mean byte value
        (media.head & 0xff).toDouble          // "header" byte
      )
    }

    def frameCount(nBytes: Long): Int =
      math.ceil(nBytes.toDouble / FrameBytes).toInt
  }

  /** Wrap a text/binary source column as a media column with metadata —
    * the ingestion shape for any opaque-blob modality. */
  def attach(df: DataFrame, idCol: String, binCol: String,
      format: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(binCol).cast("binary").as("media"),
      lit(format).as("format"),
      length(col(binCol).cast("binary")).cast("long").as("n_bytes"))

  /** Per-partition batch decode: one codec instance per partition, rows
    * streamed through it — the mapPartitions shape a real decoder needs
    * (amortized init, bounded memory). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init once per partition here
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          format = r.format,
          n_bytes = r.n_bytes,
          content_md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(r.media).map("%02x".format(_)).mkString,
          n_frames = FakeCodec.frameCount(r.n_bytes),
          features = FakeCodec.decode(r.media))
      }
    }
  }

  /** Evenly-spaced frame sampling as pure column logic over the binary:
    * frame i = bytes [i*frameBytes, (i+1)*frameBytes). */
  def frameSample(df: DataFrame, nFrames: Int,
      frameBytes: Int = FakeCodec.FrameBytes): DataFrame =
    df.withColumn("frame_idx", explode(expr(
        s"sequence(0, int(least(ceil(n_bytes / $frameBytes), $nFrames)) - 1)")))
      .withColumn("frame",
        expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
}
