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
    assert(schema == Seq("docId", "modality", "nBytes", "contentHash", "width", "height", "embedding"))
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
}
