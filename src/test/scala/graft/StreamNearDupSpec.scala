package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{NearDupStream, StreamDoc}

/** Streaming near-dup detection must surface (at least) every pair the
  * batch d06 operator verifies exact at J >= 0.8 — streamed in two
  * micro-batches so cross-batch pairs exercise the bucket state.
  */
class StreamNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("stream-neardup-spec")
  private val sf = "/root/testdata/sf0.001"
  override def afterAll(): Unit = spark.stop()

  test("streamed LSH candidates cover the batch-exact near-dup pairs") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => StreamDoc(id, t) }
    assert(docs.length > 10)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = NearDupStream.candidates(spark, input.toDS())
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode(OutputMode.Append).start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()

      val streamed = spark.table("neardup_cands")
        .select($"docA", $"docB").distinct()
        .as[(Long, Long)].collect().toSet
      val exact = graft.ops.Similarity.nearDupPairs(spark, sf)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(exact.nonEmpty, "test corpus has no near-dup pairs — spec is vacuous")
      val missed = exact -- streamed
      assert(missed.isEmpty, s"streaming missed ${missed.size} of ${exact.size} exact pairs")
      // candidates are a superset (est >= 0.6 vs exact >= 0.8) but must
      // still be sub-quadratic, not all-pairs
      val n = docs.length.toLong
      assert(streamed.size < n * (n - 1) / 4, s"candidate set ${streamed.size} is near-quadratic")
    } finally q.stop()
  }
}
