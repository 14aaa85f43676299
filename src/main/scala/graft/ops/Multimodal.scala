package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver contract: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as batch kernels over partitions).
  *
  * The decode kernels are STUBS — this container has no image/audio codecs
  * — implemented as deterministic functions of the bytes so the Spark-side
  * contract (schema, batch shape, partition-local execution, no driver
  * collect) is real and tested. A production deployment swaps
  * [[MediaKernels]] for codec-backed ones; nothing else changes.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, mime: String, bytes: Array[Byte],
                               width: Int, height: Int, duration_ms: Long)

  /** Extracted features: fixed-dim embedding + scalar stats. */
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                                 checksum: String, feature: Array[Float])

  /** Deterministic stand-ins for codec kernels. Real impls are drop-in:
    * same signatures, partition-local, no state. */
  object MediaKernels {
    /** STUB decode+featurize: 8-dim feature from byte histogram moments.
      * (Real: decode image → CNN/CLIP embed.) */
    def featurize(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      out.map(x => x / bytes.length * dim)
    }

    /** STUB frame-sample: byte offsets of evenly spaced "frames".
      * (Real: demux video, decode every k-th keyframe.) */
    def framePositions(nBytes: Long, nFrames: Int): Seq[Long] =
      if (nBytes <= 0 || nFrames <= 0) Nil
      else (0 until nFrames).map(i => i * nBytes / nFrames)

    /** STUB resize: recompute target dims preserving aspect ratio.
      * (Real: libvips/PIL resample.) */
    def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
      if (w <= 0 || h <= 0 || math.max(w, h) <= maxSide) (w, h)
      else if (w >= h) (maxSide, math.max(1, math.round(h.toFloat * maxSide / w)))
      else (math.max(1, math.round(w.toFloat * maxSide / h)), maxSide)
  }

  /** Batch feature extraction: partition-local iterator transform — the
    * exact shape a codec-backed kernel needs (amortize model/codec init
    * per partition, stream batches, never collect to the driver). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (codec handles, model weights — here the digest;
      // digest() resets the instance, so one per partition suffices)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
        MediaFeatures(m.media_id, m.mime, bytes.length.toLong,
          md.digest(bytes).map("%02x".format(_)).mkString,
          MediaKernels.featurize(bytes))
      }
    }
  }

  /** Synthesize a media table from the documents table (the container has
    * no real media fixtures): payload = UTF-8 bytes of the text. Keeps
    * every declared query runnable on driver testdata. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("bytes"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
      .as[MediaRecord]
  }
}
