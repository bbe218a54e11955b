package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.{MediaRow, Multimodal}

/** Multimodal plumbing: schema, batch shape, determinism, null-safety. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("multimodal-spec")
  override def afterAll(): Unit = spark.stop()

  test("extractFeatures preserves rows, schema, and is deterministic") {
    import spark.implicits._
    val rows = (0L until 200L).map(i =>
      MediaRow(i, if (i % 2 == 0) "image" else "audio", s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(rows).repartition(8)
    val out1 = Multimodal.extractFeatures(spark, ds).collect().sortBy(_.docId)
    val out2 = Multimodal.extractFeatures(spark, ds).collect().sortBy(_.docId)
    assert(out1.length == 200)
    assert(out1.map(_.contentHash).toSeq == out2.map(_.contentHash).toSeq)
    assert(out1.forall(f => f.embedding.length == Multimodal.EmbeddingDim))
    assert(out1.forall(f => f.width >= 16 && f.height >= 16))
    val schema = Multimodal.extractFeatures(spark, ds).schema.fieldNames.toSeq
    assert(schema == Seq("docId", "modality", "nBytes", "contentHash", "width", "height",
      "durationMs", "embedding"))
  }

  test("real PNG payloads decode to true dimensions and pixel-derived embeddings") {
    import spark.implicits._
    // render a 64x48 image: left half black, right half white — the
    // luminance-column embedding must read ~0 on the left, ~1 on the right
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", png(64, 48)),
      MediaRow(2L, "image", png(320, 200)),
      MediaRow(3L, "image", "not an image".getBytes("UTF-8")), // fallback path
      MediaRow(4L, "audio", png(64, 48))) // wrong modality -> stub, not decode
    val out = Multimodal.extractFeatures(spark, spark.createDataset(rows))
      .collect().map(f => f.docId -> f).toMap
    assert(out(1L).width == 64 && out(1L).height == 48)
    assert(out(2L).width == 320 && out(2L).height == 200)
    val emb = out(1L).embedding
    assert(emb.take(4).forall(_ < 0.1f), "left half should be dark")
    assert(emb.drop(4).forall(_ > 0.9f), "right half should be bright")
    // undecodable image bytes fall back to the deterministic stub
    val si = Multimodal.decodeStub("image", "not an image".getBytes("UTF-8"))
    assert(out(3L).width == si.width && out(3L).height == si.height)
    // audio never routes through ImageIO even if the bytes ARE an image
    // (a PNG is not a decodable audio stream -> audio stub)
    val sa = Multimodal.decodeStub("audio", png(64, 48))
    assert(out(4L).width == sa.width && out(4L).height == sa.height)
  }

  test("real WAV payloads decode to true sample-rate/channels/duration and PCM embeddings") {
    import spark.implicits._
    // render 0.5 s of 8 kHz mono 16-bit PCM: first half silence, second
    // half a full-amplitude square wave — the amplitude-profile embedding
    // must read ~0 in its first cells and ~1 in its last
    def wav(sampleRate: Float, channels: Int, seconds: Double)(
        sample: Int => Short): Array[Byte] = {
      val n = (sampleRate * seconds).toInt
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val data = new Array[Byte](n * channels * 2)
      for (i <- 0 until n; c <- 0 until channels) {
        val s = sample(i)
        val off = (i * channels + c) * 2
        data(off) = (s & 0xff).toByte
        data(off + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mono = wav(8000f, 1, 0.5) { i =>
      if (i < 2000) 0.toShort
      else if (i % 8 < 4) Short.MaxValue else (-Short.MaxValue).toShort
    }
    val stereo = wav(44100f, 2, 0.25)(_ => 1000.toShort)
    val rows = Seq(
      MediaRow(1L, "audio", mono),
      MediaRow(2L, "audio", stereo),
      MediaRow(3L, "audio", "not audio".getBytes("UTF-8"))) // fallback path
    val out = Multimodal.extractFeatures(spark, spark.createDataset(rows))
      .collect().map(f => f.docId -> f).toMap
    // TRUE parameters, not stub values
    assert(out(1L).width == 8000 && out(1L).height == 1 && out(1L).durationMs == 500L)
    assert(out(2L).width == 44100 && out(2L).height == 2 && out(2L).durationMs == 250L)
    val emb = out(1L).embedding
    assert(emb.take(4).forall(_ < 0.01f), "first half should be silent")
    assert(emb.drop(4).forall(_ > 0.9f), "second half should be loud")
    // undecodable audio bytes fall back to the deterministic stub
    val st = Multimodal.decodeStub("audio", "not audio".getBytes("UTF-8"))
    assert(out(3L).width == st.width && out(3L).durationMs == st.durationMs)

    // > AudioChunkBytes (64 KiB) of PCM: the chunked scan must cross
    // multiple buffer reads and still report exact duration + profile
    // (1.5 s 44.1 kHz stereo = ~265 KB decoded)
    val big = wav(44100f, 2, 1.5)(_ => (Short.MaxValue / 2).toShort)
    val bigOut = Multimodal.extractFeatures(spark,
        spark.createDataset(Seq(MediaRow(9L, "audio", big))))
      .collect().head
    assert(bigOut.durationMs == 1500L && bigOut.width == 44100)
    assert(bigOut.embedding.forall(v => math.abs(v - 0.5f) < 0.01f))
  }

  test("scanPcm reassembles samples split across chunk reads (carry byte)") {
    // an InputStream that returns at most 3 bytes per read splits every
    // other 16-bit sample across read boundaries — the `lo` carry must
    // reassemble them to the same profile as one contiguous read
    // (AudioSystem streams read frame-aligned, so only a direct unit
    // test can reach this path)
    val rng = new scala.util.Random(7)
    // 10003 bytes = 5001 complete samples + ONE dangling low byte at
    // EOF, which both read paths must silently drop (not count as a
    // sample) — an even byte count would never leave a trailing carry
    val pcm = new Array[Byte](10003)
    rng.nextBytes(pcm)
    class Dribble(bytes: Array[Byte], max: Int) extends java.io.InputStream {
      private var i = 0
      override def read(): Int =
        if (i >= bytes.length) -1 else { i += 1; bytes(i - 1) & 0xff }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= bytes.length) return -1
        val n = math.min(math.min(len, max), bytes.length - i)
        System.arraycopy(bytes, i, b, off, n)
        i += n
        n
      }
    }
    val whole = Multimodal.scanPcm(
      new java.io.ByteArrayInputStream(pcm), nFrames = 2500, 8000, 2).get
    val dribbled = Multimodal.scanPcm(new Dribble(pcm, 3), nFrames = 2500, 8000, 2).get
    assert(dribbled.embedding.toSeq == whole.embedding.toSeq)
    assert(dribbled.durationMs == whole.durationMs)
    assert(whole.durationMs == 2500 * 1000L / 8000) // 2500 frames at 8 kHz
  }

  test("resizeAll re-encodes decodable images at the target dims") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(100, 80,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 100) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(MediaRow(1L, "image", bos.toByteArray))
    val out = Multimodal.resizeAll(spark, spark.createDataset(rows), 32, 24).collect().head
    // the output must be a REAL image at the target dims, not stub bytes
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(back != null, "resized payload is not a decodable image")
    assert(back.getWidth == 32 && back.getHeight == 24)
    // solid-color input stays (approximately) that color after bilinear scaling
    val rgb = back.getRGB(16, 12)
    assert(((rgb >> 16) & 0xff) == 0x33 && ((rgb >> 8) & 0xff) == 0x66 && (rgb & 0xff) == 0x99)
  }

  test("null payloads are handled") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(MediaRow(1L, "image", null)))
    val out = Multimodal.extractFeatures(spark, ds).collect()
    assert(out.head.nBytes == 0L)
  }

  test("resizeAll keeps row count, target dims, and binary payloads") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => MediaRow(i, "image", s"img-$i".getBytes("UTF-8")))
    val out = Multimodal.resizeAll(spark, spark.createDataset(rows), 224, 224)
      .collect().sortBy(_.docId)
    assert(out.length == 50)
    assert(out.forall(r => r.width == 224 && r.height == 224 && r.payload.nonEmpty))
    // deterministic in (payload, dims)
    val again = Multimodal.resizeAll(spark, spark.createDataset(rows), 224, 224)
      .collect().sortBy(_.docId)
    assert(out.zip(again).forall { case (a, b) => a.payload.sameElements(b.payload) })
  }

  test("sampleFrames emits k evenly-spaced in-range frames for videos only") {
    import spark.implicits._
    val rows = (0L until 40L).map(i =>
      MediaRow(i, if (i % 2 == 0) "video" else "image", s"vid-$i".getBytes("UTF-8")))
    val out = Multimodal.sampleFrames(spark, spark.createDataset(rows), k = 4).collect()
    val byDoc = out.groupBy(_.docId)
    assert(byDoc.keySet == (0L until 40L by 2).toSet) // videos only
    byDoc.values.foreach { frames =>
      assert(frames.length <= 4)
      assert(frames.forall(f => f.frameIdx >= 0 && f.frameIdx < f.nFrames))
      assert(frames.map(_.frameIdx).distinct.length == frames.length)
    }
  }

  // ---- ISO BMFF fixture builders: hand-assembled boxes, so the test
  // exercises the real wire layout (big-endian sizes, 16.16 dims) ------
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val size = payload.length + 8
    val out = java.nio.ByteBuffer.allocate(size)
    out.putInt(size).put(tpe.getBytes("US-ASCII")).put(payload)
    out.array()
  }
  private def be32(vs: Long*): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(vs.length * 4)
    vs.foreach(v => out.putInt(v.toInt))
    out.array()
  }
  private def mvhd0(timescale: Long, duration: Long): Array[Byte] =
    // full 100-byte v0 layout: vf, creation, mod, timescale, duration,
    // rate, volume+reserved, reserved x2, matrix (9), predefined (6),
    // next_track_ID
    box("mvhd", be32(Seq(0L, 0L, 0L, timescale, duration, 0x00010000L, 0L, 0L, 0L) ++
      Seq.fill(9)(0L) ++ Seq.fill(6)(0L) ++ Seq(3L): _*))
  private def tkhd0(trackId: Long, w: Int, h: Int): Array[Byte] =
    // v0: vf, creation, mod, trackId, reserved, duration, reserved x2,
    // layer/altgroup, volume/reserved, matrix (9 x u32), width, height
    box("tkhd", be32(Seq(0L, 0L, 0L, trackId, 0L, 500L, 0L, 0L, 0L, 0L) ++
      Seq.fill(9)(0L) ++ Seq(w.toLong << 16, h.toLong << 16): _*))

  test("decodeVideoMeta reads mvhd duration and the first visual tkhd dims") {
    val audioTrak = box("trak", tkhd0(1, 0, 0)) // 0x0: audio track, skipped
    val videoTrak = box("trak", tkhd0(2, 640, 360))
    val moov = box("moov", mvhd0(timescale = 600, duration = 1200) ++ audioTrak ++ videoTrak)
    val mp4 = box("ftyp", "isom0000".getBytes("US-ASCII")) ++ moov ++
      box("mdat", Array.fill[Byte](64)(7))
    val d = Multimodal.decodeVideoMeta(mp4).get
    assert(d.durationMs == 2000L) // 1200 ticks at 600/s
    assert(d.width == 640 && d.height == 360)
    assert(d.embedding.length == Multimodal.EmbeddingDim)
    assert(d.embedding.forall(v => v >= 0.0f && v <= 1.0f))
    // the dispatch path uses the container parse, not the stub
    val viaDispatch = Multimodal.decode("video", mp4)
    assert(viaDispatch.width == 640 && viaDispatch.durationMs == 2000L)
  }

  test("decodeVideoMeta treats the all-ones 'duration unknown' sentinel as unparseable") {
    // ISO 14496-12: duration is all 1s when it cannot be determined
    // (fragmented/live MP4) — must NOT surface as ~0xFFFFFFFF/600 seconds
    val moov = box("moov",
      mvhd0(timescale = 600, duration = 0xFFFFFFFFL) ++ box("trak", tkhd0(1, 640, 360)))
    val mp4 = box("ftyp", "isom0000".getBytes("US-ASCII")) ++ moov
    assert(Multimodal.decodeVideoMeta(mp4).isEmpty)
  }

  test("decodeVideoMeta rejects non-BMFF bytes; dispatch falls back to the stub") {
    assert(Multimodal.decodeVideoMeta("not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeVideoMeta(Array.emptyByteArray).isEmpty)
    // truncated: a declared box size overrunning the buffer must not throw
    val truncated = be32(4096L) ++ "moov".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0)
    assert(Multimodal.decodeVideoMeta(truncated).isEmpty)
    val stub = Multimodal.decode("video", "not a video".getBytes("UTF-8"))
    val expect = Multimodal.decodeStub("video", "not a video".getBytes("UTF-8"))
    assert(stub.width == expect.width && stub.height == expect.height &&
      stub.durationMs == expect.durationMs &&
      stub.embedding.sameElements(expect.embedding))
  }

  // ---- Matroska/WebM fixture builders: hand-assembled EBML elements
  // (id bytes as the registry lists them, 1-byte sizes) ----------------
  private def el(id: Int*)(payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 127)
    id.map(_.toByte).toArray ++ Array((0x80 | payload.length).toByte) ++ payload
  }
  private def beUint(v: Long, width: Int): Array[Byte] =
    Array.tabulate(width)(i => ((v >> (8 * (width - 1 - i))) & 0xff).toByte)

  test("decodeWebmMeta reads EBML duration/scale and the first video track dims") {
    val info = el(0x15, 0x49, 0xA9, 0x66)(
      el(0x2A, 0xD7, 0xB1)(beUint(1000000L, 3)) ++ // TimestampScale 1 ms
        el(0x44, 0x89)(beUint(
          java.lang.Float.floatToIntBits(12345.0f).toLong & 0xFFFFFFFFL, 4)))
    val audioTrack = el(0xAE)(Array.emptyByteArray) // no Video element
    val videoTrack = el(0xAE)(
      el(0xE0)(el(0xB0)(beUint(640, 2)) ++ el(0xBA)(beUint(360, 2))))
    val tracks = el(0x16, 0x54, 0xAE, 0x6B)(audioTrack ++ videoTrack)
    val segment = el(0x18, 0x53, 0x80, 0x67)(info ++ tracks)
    val webm = el(0x1A, 0x45, 0xDF, 0xA3)(Array.emptyByteArray) ++ segment
    val d = Multimodal.decodeWebmMeta(webm).get
    assert(d.durationMs == 12345L) // 12345 scale units x 1 ms
    assert(d.width == 640 && d.height == 360)
    assert(d.embedding.length == Multimodal.EmbeddingDim)
    // dispatch: BMFF parse rejects, EBML parse accepts — no stub
    val viaDispatch = Multimodal.decode("video", webm)
    assert(viaDispatch.width == 640 && viaDispatch.durationMs == 12345L)
    // 8-byte double Duration and the default TimestampScale (no element)
    val info2 = el(0x15, 0x49, 0xA9, 0x66)(
      el(0x44, 0x89)(beUint(java.lang.Double.doubleToLongBits(500.0), 8)))
    val webm2 = el(0x1A, 0x45, 0xDF, 0xA3)(Array.emptyByteArray) ++
      el(0x18, 0x53, 0x80, 0x67)(info2)
    val d2 = Multimodal.decodeWebmMeta(webm2).get
    assert(d2.durationMs == 500L && d2.width == 0 && d2.height == 0)
  }

  test("decodeWebmMeta rejects non-EBML, truncated, and duration-less bytes") {
    assert(Multimodal.decodeWebmMeta("not matroska".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWebmMeta(Array.emptyByteArray).isEmpty)
    // EBML magic but a declared size overrunning the buffer: must not throw
    val truncated = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
      Array(0x41.toByte, 0x00.toByte) // 2-byte size vint declaring 256 bytes
    assert(Multimodal.decodeWebmMeta(truncated).isEmpty)
    // a Segment whose Info has no Duration element: unparseable, stub falls back
    val noDur = el(0x1A, 0x45, 0xDF, 0xA3)(Array.emptyByteArray) ++
      el(0x18, 0x53, 0x80, 0x67)(el(0x15, 0x49, 0xA9, 0x66)(Array.emptyByteArray))
    assert(Multimodal.decodeWebmMeta(noDur).isEmpty)
  }
}
