package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** One media payload row: modality + opaque bytes (the 100 TB design keeps
  * image/audio/video as `binary` columns with typed metadata alongside —
  * decode happens late, batched, inside executors).
  */
final case class MediaRow(docId: Long, modality: String, payload: Array[Byte])

/** Extracted features for one payload. */
final case class MediaFeatures(
    docId: Long,
    modality: String,
    nBytes: Long,
    contentHash: String,
    width: Int,
    height: Int,
    embedding: Array[Float])

/** A payload after resize: new dims + the (stub-)re-encoded bytes. */
final case class ResizedMedia(
    docId: Long,
    modality: String,
    width: Int,
    height: Int,
    payload: Array[Byte])

/** One sampled frame of a video payload. */
final case class FrameRow(
    docId: Long,
    frameIdx: Int,
    nFrames: Int,
    frameHash: String)

/** Multimodal feature-extraction plumbing.
  *
  * The Spark-side shape is real: `mapPartitions` over batches of payload
  * rows (the JVM analog of `mapInPandas` — one vectorized batch per call,
  * here `BatchSize` rows), schema'd output via the MediaFeatures encoder,
  * partitioning preserved. The DECODE itself is a clearly-marked
  * deterministic stub — the image/audio codec libraries are not in this
  * environment — producing fake-but-stable dimensions and an embedding
  * derived from the payload hash, so the plumbing (batch shape, schema,
  * null-safety, partition parallelism) is testable end-to-end.
  */
object Multimodal {

  val BatchSize = 64
  val EmbeddingDim = 8

  /** STUB decode: replace with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) in production. Deterministic in the payload bytes. */
  def decodeStub(modality: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.floorMod(h, 1024)
    val height = 16 + math.floorMod(h >> 10, 1024)
    val emb = Array.tabulate(EmbeddingDim) { i =>
      // stable pseudo-feature from the hash; stands in for model output
      math.floorMod(h * (i * 2 + 1), 1000) / 1000.0f
    }
    (width, height, emb)
  }

  private def sha256Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Batched feature extraction: one decode call per row, iterated in
    * `BatchSize` groups per partition (keeps peak memory bounded and maps
    * 1:1 onto an Arrow-batch implementation). */
  def extractFeatures(spark: SparkSession, rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          val (w, h, emb) = decodeStub(r.modality, payload)
          MediaFeatures(r.docId, r.modality, payload.length.toLong, sha256Hex(payload), w, h, emb)
        }
      }
    }
  }

  /** STUB resize: a real implementation re-encodes scaled pixels; the
    * stub is deterministic in (payload, target dims) so the pipeline
    * shape — narrow, batched, binary-in/binary-out — is testable. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val seed = java.util.Arrays.hashCode(payload) ^ (w * 31 + h)
    val out = new Array[Byte](math.max(16, payload.length / 4))
    var x = seed
    var i = 0
    while (i < out.length) {
      x = x * 0x9e3779b1 + 1
      out(i) = (x >>> 24).toByte
      i += 1
    }
    out
  }

  /** Batched resize to fixed target dims — the standard normalization
    * step before a vision encoder. Same mapPartitions batch contract as
    * extractFeatures; payload stays opaque binary end-to-end. */
  def resizeAll(spark: SparkSession, rows: Dataset[MediaRow],
      targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          ResizedMedia(r.docId, r.modality, targetW, targetH,
            resizeStub(payload, targetW, targetH))
        }
      }
    }
  }

  /** Frame sampling for video payloads: emit `k` evenly-spaced frame
    * indexes per video (a real implementation seeks the container; the
    * stub derives a deterministic frame count and per-frame hash from the
    * payload). Explodes rows INSIDE the executor pass — a doc's payload
    * never rides more than one input row. */
  def sampleFrames(spark: SparkSession, rows: Dataset[MediaRow], k: Int): Dataset[FrameRow] = {
    import spark.implicits._
    rows.filter(_.modality == "video").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          val nFrames = 1 + math.floorMod(java.util.Arrays.hashCode(payload), 240)
          val take = math.min(k, nFrames)
          (0 until take).iterator.map { j =>
            val idx = (j.toLong * nFrames / take).toInt // evenly spaced
            FrameRow(r.docId, idx, nFrames,
              sha256Hex(payload ++ BigInt(idx).toByteArray))
          }
        }
      }
    }
  }
}
