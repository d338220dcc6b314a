package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payloads + typed metadata, processed with
  * iterator-style per-partition batch functions — the Spark-side shape of
  * the reference's blob columns (`rust/lance/src/dataset/blob.rs:42-168`)
  * and of pandas-UDF decode stages.
  *
  * The DECODE KERNELS ARE STUBS — image/audio codecs are not in this
  * environment. Every stub is deterministic (derived from the payload
  * bytes) and clearly marked, so the surrounding Spark plumbing — schema,
  * batch iteration, partitioning, feature vectors — is real and tested, and
  * swapping in a real codec changes exactly one function body.
  */
object Multimodal {

  case class MediaRow(id: Long, content: Array[Byte])
  case class DecodedImage(id: Long, width: Int, height: Int, channels: Int,
                          features: Array[Float])
  case class Frame(id: Long, frameIdx: Int, payload: Array[Byte])

  /** STUB image decode: width/height/channels derived deterministically from
    * the payload (a real implementation calls an image codec here; the
    * iterator-in/iterator-out shape is what `mapInPandas`/`mapPartitions`
    * needs at scale — one codec init per PARTITION, not per row). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init happens here (stubbed)
      rows.map { r =>
        val n = r.content.length
        // ??? real codec: ImageIO/libjpeg decode of r.content
        val width = 64 + (byteHash(r.content, 1) % 64).toInt
        val height = 64 + (byteHash(r.content, 2) % 64).toInt
        DecodedImage(r.id, width, height, 3, featureStub(r.content, 16))
      }
    }
  }

  /** STUB feature extraction: deterministic float vector from byte content
    * (real impl: a vision/audio encoder). Shape and dtype are the real
    * contract: Array[Float] embeddings flow into Knn/IvfIndex unchanged. */
  def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = ((byteHash(bytes, i + 3) % 2000L) - 1000L) / 1000.0f
      i += 1
    }
    out
  }

  private def byteHash(bytes: Array[Byte], seed: Int): Long = {
    var h = 0x9e3779b97f4a7c15L * (seed + 1)
    var i = 0
    val step = math.max(1, bytes.length / 64) // sample long payloads
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 0x100000001b3L
      i += step
    }
    h & Long.MaxValue
  }

  /** Frame sampling from a video-like binary payload: REAL byte plumbing
    * (fixed-stride ranges), stubbed only in that frames are byte slices
    * rather than codec-decoded pictures. Explodes one row per frame —
    * the fan-out shape a frame-level pipeline needs. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.content.length
      if (len == 0) Iterator.empty
      else {
        val frameSize = math.max(1, len / nFrames)
        (0 until math.min(nFrames, len)).iterator.map { i =>
          val from = i * frameSize
          val until = math.min(len, from + frameSize)
          Frame(r.id, i, java.util.Arrays.copyOfRange(r.content, from, until))
        }
      }
    }
  }

  /** Payload-level metadata without decoding: size, content hash —
    * real, codec-free, and what dedup-by-content uses at scale. */
  def withPayloadMeta(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("byte_size", length(col(contentCol)))
      .withColumn("content_hash", xxhash64(col(contentCol)))

  case class ResizedImage(id: Long, width: Int, height: Int, channels: Int,
                          payload: Array[Byte])

  /** STUB resize: output payload is a deterministic stride-sample of the
    * input sized exactly targetW·targetH·3 (a real implementation does a
    * bilinear resample after decode). The Spark contract is real: bounded
    * per-row output size — the property that keeps executor memory flat
    * when a resize stage runs over terabytes of mixed-size originals. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    val outLen = targetW * targetH * 3
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = r.content
        val out = new Array[Byte](outLen)
        if (in.nonEmpty) {
          var i = 0
          while (i < outLen) {
            out(i) = in(((i.toLong * in.length) / outLen).toInt) // ??? real: bilinear resample
            i += 1
          }
        }
        ResizedImage(r.id, targetW, targetH, 3, out)
      }
    }
  }
}
