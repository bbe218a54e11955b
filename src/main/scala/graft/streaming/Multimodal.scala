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
}
