package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** One media payload row: modality + opaque bytes (the 100 TB design keeps
  * image/audio/video as `binary` columns with typed metadata alongside —
  * decode happens late, batched, inside executors).
  */
final case class MediaRow(docId: Long, modality: String, payload: Array[Byte])

/** Extracted features for one payload. For images (width, height) are
  * pixel dimensions and durationMs is 0; for audio they carry
  * (sampleRate Hz, channels) and durationMs the true PCM duration. */
final case class MediaFeatures(
    docId: Long,
    modality: String,
    nBytes: Long,
    contentHash: String,
    width: Int,
    height: Int,
    durationMs: Long,
    embedding: Array[Float])

/** One decoded payload: modality-specific dimensions + signal-derived
  * embedding (see [[MediaFeatures]] for the per-modality field meaning). */
final case class Decoded(
    width: Int,
    height: Int,
    durationMs: Long,
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
  * partitioning preserved.
  *
  * IMAGE decode is REAL: `javax.imageio` (JDK-bundled — PNG, JPEG, GIF,
  * BMP) yields true pixel dimensions and a luminance-grid embedding from
  * actual pixels. AUDIO decode is REAL: `javax.sound.sampled`
  * (JDK-bundled — WAV, AIFF, AU) yields true sample-rate / channels /
  * duration and an amplitude-profile embedding from the actual PCM
  * frames. Video has no JDK codec, and undecodable bytes must not kill a
  * 10^9-row pipeline — both fall back to the clearly-marked deterministic
  * stub (fake-but-stable dimensions and a hash-derived embedding),
  * keeping every path total and testable.
  */
object Multimodal {

  val BatchSize = 64
  val EmbeddingDim = 8

  /** STUB decode — the fallback for modalities without a JDK codec
    * (video; replace with ffmpeg bindings in production) and for bytes no
    * installed image/audio reader accepts. Deterministic in the payload. */
  def decodeStub(modality: String, payload: Array[Byte]): Decoded = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.floorMod(h, 1024)
    val height = 16 + math.floorMod(h >> 10, 1024)
    val durationMs =
      if (modality == "image") 0L else 1000L + math.floorMod(h >> 4, 600000)
    val emb = Array.tabulate(EmbeddingDim) { i =>
      // stable pseudo-feature from the hash; stands in for model output
      math.floorMod(h * (i * 2 + 1), 1000) / 1000.0f
    }
    Decoded(width, height, durationMs, emb)
  }

  /** Real image decode: ImageIO → true (width, height) and an
    * `EmbeddingDim`-cell mean-luminance column profile of the actual
    * pixels (a stand-in for model output that is nonetheless REAL pixel
    * data — resolution-invariant and deterministic). None when the bytes
    * are not a decodable image. */
  private[streaming] def decodeImage(payload: Array[Byte]): Option[Decoded] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val acc = new Array[Double](EmbeddingDim)
        val cnt = new Array[Long](EmbeddingDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            val cell = math.min(EmbeddingDim - 1, x * EmbeddingDim / w)
            acc(cell) += luma / 255.0
            cnt(cell) += 1
            x += 1
          }
          y += 1
        }
        val emb = Array.tabulate(EmbeddingDim)(c =>
          if (cnt(c) == 0) 0.0f else (acc(c) / cnt(c)).toFloat)
        Some(Decoded(w, h, 0L, emb))
      }
    } catch { case _: Exception => None }

  /** PCM read-buffer size for [[decodeAudio]]'s chunked scan. */
  private val AudioChunkBytes = 64 << 10

  /** PCM byte cap for the rare stream-with-no-declared-frame-count path
    * (WAV/AIFF/AU all declare one): past this the decode degrades to the
    * stub instead of buffering unboundedly. */
  private val MaxUnsizedPcmBytes: Long = 64L << 20

  /** Real audio decode: `javax.sound.sampled.AudioSystem` (JDK-bundled —
    * WAV, AIFF, AU) → true (sampleRate, channels, duration) and an
    * `EmbeddingDim`-cell mean-|amplitude| time profile of the actual PCM
    * frames (normalized to signed 16-bit little-endian first, so the
    * amplitude math is uniform across source encodings). None when the
    * bytes are not a decodable audio stream.
    *
    * Memory is BOUNDED regardless of duration: the PCM is scanned in
    * `AudioChunkBytes` chunks (the frame total needed for the cell
    * mapping is available up front from `getFrameLength`), never
    * materialized whole — readAllBytes() on a large payload (or an
    * 8-bit/u-law source that doubles when normalized to 16-bit) could
    * throw OutOfMemoryError, which is an Error, ESCAPES the Exception
    * fallback below, and kills the task — contrary to the "must not
    * kill a 10^9-row pipeline" design. A stream that declares no frame
    * count falls back to a `MaxUnsizedPcmBytes`-capped buffer, and past
    * the cap to the stub. */
  private[streaming] def decodeAudio(payload: Array[Byte]): Option[Decoded] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val sampleRate = math.round(fmt.getSampleRate)
        val channels = fmt.getChannels
        if (channels <= 0) None
        else {
          val pcmFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, channels, channels * 2, fmt.getSampleRate,
            false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
          try {
            // the PCM_SIGNED conversion keeps the frame rate, so the
            // source's declared frame count IS the converted one
            val declared = in.getFrameLength
            if (declared >= 0) scanPcm(pcm, declared, sampleRate, channels)
            else {
              // no declared frame count: bounded buffer, stub past the cap
              val out = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](AudioChunkBytes)
              var read = pcm.read(buf)
              var over = false
              while (read > 0 && !over) {
                out.write(buf, 0, read)
                over = out.size() > MaxUnsizedPcmBytes
                if (!over) read = pcm.read(buf)
              }
              if (over) None
              else {
                val bytes = out.toByteArray
                val nFrames = (bytes.length / 2 / channels).toLong
                scanPcm(new java.io.ByteArrayInputStream(bytes), nFrames,
                  sampleRate, channels)
              }
            }
          } finally pcm.close()
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Chunked single-pass scan of a 16-bit little-endian PCM stream:
    * accumulates the per-cell mean-|amplitude| profile with one
    * `AudioChunkBytes` buffer as peak state. `nFrames` (known up front)
    * drives the sample→cell mapping; duration comes from the frames
    * actually decoded, so a stream shorter than declared still reports
    * its true duration. */
  private[graft] def scanPcm(pcm: java.io.InputStream, nFrames: Long,
      sampleRate: Int, channels: Int): Option[Decoded] = {
    val acc = new Array[Double](EmbeddingDim)
    val cnt = new Array[Long](EmbeddingDim)
    val buf = new Array[Byte](AudioChunkBytes)
    var sampleIdx = 0L
    var lo = -1 // low byte of a sample split across chunk boundaries
    var read = pcm.read(buf)
    while (read > 0) {
      var i = 0
      while (i < read) {
        if (lo < 0) lo = buf(i) & 0xff
        else {
          val s = (buf(i).toInt << 8) | lo
          lo = -1
          val frame = sampleIdx / channels
          // Long math throughout: frame * EmbeddingDim would overflow
          // Int past 2^28 frames (~1.7 h at 44.1 kHz) — the wrap would
          // index negative, throw, and silently downgrade a valid file
          // to the stub
          val cell =
            if (nFrames == 0) 0
            else math.min(EmbeddingDim - 1, (frame * EmbeddingDim / nFrames).toInt)
          acc(cell) += math.abs(s / 32768.0)
          cnt(cell) += 1
          sampleIdx += 1
        }
        i += 1
      }
      read = pcm.read(buf)
    }
    val framesRead = sampleIdx / channels
    val durationMs = if (sampleRate > 0) framesRead * 1000L / sampleRate else 0L
    val emb = Array.tabulate(EmbeddingDim)(c =>
      if (cnt(c) == 0) 0.0f else (acc(c) / cnt(c)).toFloat)
    Some(Decoded(sampleRate, channels, durationMs, emb))
  }

  // ---- ISO BMFF (MP4/MOV/M4V) container walk — pure JVM, no codec ----

  /** Big-endian u32 at `i` as a Long (MP4 sizes are unsigned). */
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterate the boxes of `b[from, until)`, calling `f(type, payloadFrom,
    * payloadUntil)` for each well-formed box; stops at the first
    * malformed header (size too small / overrunning the range / 64-bit
    * size beyond Int range — payloads are in-memory arrays here). */
  private def walkBoxes(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= until) {
      val size32 = u32(b, o)
      val tpe = boxType(b, o)
      val (header, size) =
        if (size32 == 1L && o + 16 <= until) (16, u64(b, o + 8))
        else if (size32 == 0L) (8, (until - o).toLong) // box runs to range end
        else (8, size32)
      if (size < header || o + size > until) return
      f(tpe, o + header, (o + size).toInt)
      o += size.toInt
    }
  }

  /** First child box of `tpe` inside `b[from, until)` as a
    * (payloadFrom, payloadUntil) range. */
  private def findBox(b: Array[Byte], from: Int, until: Int,
      tpe: String): Option[(Int, Int)] = {
    var hit: Option[(Int, Int)] = None
    walkBoxes(b, from, until)((t, s, e) => if (hit.isEmpty && t == tpe) hit = Some((s, e)))
    hit
  }

  /** Real video CONTAINER decode: an ISO BMFF box walk — the part of
    * video ingest that needs no codec. Duration comes from moov/mvhd
    * (timescale-normalized, version 0 and 1 layouts), pixel dimensions
    * from the first moov/trak/tkhd with nonzero 16.16 fixed-point
    * width×height (audio/hint tracks carry 0×0 and are skipped). The
    * embedding is an `EmbeddingDim`-segment mean-byte profile of the
    * payload — real byte statistics; FRAME pixels still need a codec
    * (ffmpeg bindings in production) and keep the stub fallback. None
    * when the bytes are not ISO BMFF or carry no parseable moov/mvhd. */
  private[graft] def decodeVideoMeta(payload: Array[Byte]): Option[Decoded] =
    try {
      findBox(payload, 0, payload.length, "moov").flatMap { case (ms, me) =>
        findBox(payload, ms, me, "mvhd").flatMap { case (hs, he) =>
          val version = payload(hs) & 0xff
          // version+flags (4), then v0: creation(4) mod(4) timescale(4)
          // duration(4); v1: creation(8) mod(8) timescale(4) duration(8)
          val (timescale, duration) =
            if (version == 1 && hs + 32 <= he) (u32(payload, hs + 20), u64(payload, hs + 24))
            else if (version == 0 && hs + 20 <= he) (u32(payload, hs + 12), u32(payload, hs + 16))
            else (0L, 0L)
          // all-ones duration (v0 u32, v1 u64) is ISO 14496-12's "duration
          // unknown" sentinel (fragmented/live-captured MP4) — a concrete
          // ~0xFFFFFFFF/timescale seconds would poison downstream duration
          // stats, so treat it as unparseable (stub fallback)
          val durationUnknown =
            if (version == 1) duration == -1L else duration == 0xFFFFFFFFL
          if (timescale <= 0 || durationUnknown) None
          else {
            val durationMs = duration * 1000L / timescale
            // first visual track's tkhd: width/height are 16.16 fixed
            // point at +76 (v0) / +88 (v1) from the tkhd payload start
            var w = 0
            var h = 0
            walkBoxes(payload, ms, me) { (t, ts, te) =>
              if (t == "trak" && w == 0)
                findBox(payload, ts, te, "tkhd").foreach { case (ks, ke) =>
                  val v = payload(ks) & 0xff
                  val wOff = if (v == 1) ks + 88 else ks + 76
                  if (wOff + 8 <= ke) {
                    val tw = (u32(payload, wOff) >> 16).toInt
                    val th = (u32(payload, wOff + 4) >> 16).toInt
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
                }
            }
            Some(Decoded(w, h, durationMs, byteProfile(payload)))
          }
        }
      }
    } catch { case _: Exception => None }

  /** `EmbeddingDim`-segment mean-byte profile of a payload — real byte
    * statistics standing in for a codec-derived embedding (shared by the
    * BMFF and WebM container decodes). */
  private def byteProfile(payload: Array[Byte]): Array[Float] = {
    val seg = math.max(1, payload.length / EmbeddingDim)
    Array.tabulate(EmbeddingDim) { c =>
      val s = c * seg
      val e = math.min(payload.length, s + seg)
      if (s >= e) 0.0f
      else {
        var acc = 0L
        var i = s
        while (i < e) { acc += payload(i) & 0xff; i += 1 }
        (acc.toDouble / (e - s) / 255.0).toFloat
      }
    }
  }

  // ---- Matroska/WebM (EBML) container metadata ------------------------

  /** EBML variable-length integer at `b(i)`: (value, byteWidth,
    * allValueBitsOnes). Width is encoded unary in the first byte's
    * leading zeros; element IDs keep the marker bit (the form Matroska
    * specs list IDs in), sizes strip it. All-ones value bits on a size
    * mean "unknown length" (live-captured streams). */
  private def ebmlVint(b: Array[Byte], i: Int, keepMarker: Boolean,
      maxLen: Int): Option[(Long, Int, Boolean)] = {
    if (i >= b.length) return None
    val first = b(i) & 0xff
    if (first == 0) return None
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len > maxLen || i + len > b.length) return None
    var v = if (keepMarker) first.toLong
      else (first & ((1 << (8 - len)) - 1)).toLong
    var ones = !keepMarker && (first & ((1 << (8 - len)) - 1)) == (1 << (8 - len)) - 1
    var j = 1
    while (j < len) {
      val byte = b(i + j) & 0xff
      v = (v << 8) | byte
      ones &&= byte == 0xff
      j += 1
    }
    Some((v, len, ones))
  }

  /** Walk sibling EBML elements in `b[from, until)`: `f(id, payloadFrom,
    * payloadUntil)`. Unknown-size elements (legal only as the LAST
    * sibling) extend to the range end; malformed data stops the walk
    * (tolerant parsing — the caller falls back to the stub). */
  private def walkEbml(b: Array[Byte], from: Int, until: Int)(
      f: (Long, Int, Int) => Unit): Unit = {
    var o = from
    var go = true
    while (go && o < until) {
      val parsed = for {
        (id, idLen, _) <- ebmlVint(b, o, keepMarker = true, maxLen = 4)
        (sz, szLen, unknown) <- ebmlVint(b, o + idLen, keepMarker = false, maxLen = 8)
      } yield (id, o + idLen + szLen, sz, unknown)
      parsed match {
        case Some((id, ps, sz, unknown)) =>
          val pe = if (unknown) until.toLong else ps.toLong + sz
          if (pe < ps || pe > until) go = false
          else {
            f(id, ps, pe.toInt)
            o = pe.toInt
            if (unknown) go = false
          }
        case None => go = false
      }
    }
  }

  /** First sibling element with `id` in `b[from, until)` as a payload
    * range (the [[findBox]] shape for EBML). */
  private def findEbml(b: Array[Byte], from: Int, until: Int,
      id: Long): Option[(Int, Int)] = {
    var hit: Option[(Int, Int)] = None
    walkEbml(b, from, until)((t, s, e) => if (hit.isEmpty && t == id) hit = Some((s, e)))
    hit
  }

  /** Big-endian unsigned integer spanning `b[from, until)` (EBML uint
    * elements are 1-8 bytes, exactly as wide as their content). */
  private def uintBE(b: Array[Byte], from: Int, until: Int): Long = {
    if (until - from < 1 || until - from > 8) return -1L
    var v = 0L
    var i = from
    while (i < until) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  private val EbmlHeaderId = 0x1A45DFA3L
  private val SegmentId = 0x18538067L
  private val InfoId = 0x1549A966L
  private val TimestampScaleId = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val TracksId = 0x1654AE6BL
  private val TrackEntryId = 0xAEL
  private val VideoSettingsId = 0xE0L
  private val PixelWidthId = 0xB0L
  private val PixelHeightId = 0xBAL

  /** Real Matroska/WebM container decode — the EBML counterpart of
    * [[decodeVideoMeta]]'s ISO BMFF walk (RFC 8794 EBML + the public
    * Matroska element registry): duration from Segment/Info (the
    * Duration float element, scaled by TimestampScale ns — Matroska's
    * default scale is 1 ms), pixel dimensions from the first
    * Tracks/TrackEntry/Video carrying nonzero PixelWidth×PixelHeight
    * (audio tracks have no Video element and are skipped naturally).
    * The embedding is the same byte-profile as BMFF; frame pixels still
    * need a codec. None when the bytes don't open with the EBML header
    * element or carry no parseable Segment/Info duration. */
  private[graft] def decodeWebmMeta(payload: Array[Byte]): Option[Decoded] =
    try {
      val isEbml = ebmlVint(payload, 0, keepMarker = true, maxLen = 4)
        .exists(_._1 == EbmlHeaderId)
      if (!isEbml) None
      else findEbml(payload, 0, payload.length, SegmentId).flatMap { case (ss, se) =>
        findEbml(payload, ss, se, InfoId).flatMap { case (is, ie) =>
          var scaleNs = 1000000L // Matroska default TimestampScale: 1 ms
          var durationScaled = -1.0
          walkEbml(payload, is, ie) { (id, ps, pe) =>
            if (id == TimestampScaleId) scaleNs = uintBE(payload, ps, pe)
            else if (id == DurationId && pe - ps == 4)
              durationScaled = java.lang.Float.intBitsToFloat(u32(payload, ps).toInt).toDouble
            else if (id == DurationId && pe - ps == 8)
              durationScaled = java.lang.Double.longBitsToDouble(u64(payload, ps))
          }
          if (durationScaled < 0 || scaleNs <= 0) None
          else {
            val durationMs = (durationScaled * scaleNs / 1e6).toLong
            var w = 0
            var h = 0
            findEbml(payload, ss, se, TracksId).foreach { case (ts, te) =>
              walkEbml(payload, ts, te) { (id, es, ee) =>
                if (id == TrackEntryId && w == 0)
                  findEbml(payload, es, ee, VideoSettingsId).foreach { case (vs, ve) =>
                    var tw = 0
                    var th = 0
                    walkEbml(payload, vs, ve) { (fid, fs, fe) =>
                      if (fid == PixelWidthId) tw = uintBE(payload, fs, fe).toInt
                      else if (fid == PixelHeightId) th = uintBE(payload, fs, fe).toInt
                    }
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
              }
            }
            Some(Decoded(w, h, durationMs, byteProfile(payload)))
          }
        }
      }
    } catch { case _: Exception => None }

  /** Decode dispatch: real ImageIO for images, real AudioSystem for
    * audio, real container metadata for video — ISO BMFF (MP4/MOV) box
    * walk first, then Matroska/WebM EBML — each with stub fallback for
    * bytes no parser accepts. */
  def decode(modality: String, payload: Array[Byte]): Decoded =
    modality match {
      case "image" => decodeImage(payload).getOrElse(decodeStub(modality, payload))
      case "audio" => decodeAudio(payload).getOrElse(decodeStub(modality, payload))
      case "video" => decodeVideoMeta(payload).orElse(decodeWebmMeta(payload))
        .getOrElse(decodeStub(modality, payload))
      case _ => decodeStub(modality, payload)
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
          val d = decode(r.modality, payload)
          MediaFeatures(r.docId, r.modality, payload.length.toLong, sha256Hex(payload),
            d.width, d.height, d.durationMs, d.embedding)
        }
      }
    }
  }

  /** Real image resize: decode, bilinear-rescale offscreen (headless-safe
    * BufferedImage raster ops — no display needed), re-encode as PNG.
    * None when the bytes are not a decodable image. */
  private[streaming] def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** STUB resize — fallback for undecodable bytes and codec-less
    * modalities; deterministic in (payload, target dims) so the pipeline
    * shape — narrow, batched, binary-in/binary-out — stays testable. */
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
          val bytes =
            if (r.modality == "image")
              resizeImage(payload, targetW, targetH)
                .getOrElse(resizeStub(payload, targetW, targetH))
            else resizeStub(payload, targetW, targetH)
          ResizedMedia(r.docId, r.modality, targetW, targetH, bytes)
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
