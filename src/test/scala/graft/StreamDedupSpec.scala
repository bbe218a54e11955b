package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Streaming exact dedup under watermark-bounded state. */
class StreamDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("stream-dedup-spec")
  override def afterAll(): Unit = spark.stop()

  test("dropDuplicates removes repeated event ids within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val H = 3600L * 1000000L
    val in = MemoryStream[(Long, Long, Long, String, Double, String)]
    val df = in.toDF().toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val q = Streams.dedupEvents(df)
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 10 * H, 1L, "a", 0.0, ""), (1L, 10 * H, 1L, "a", 0.0, ""), (2L, 10 * H + 1, 1L, "b", 0.0, ""))
      q.processAllAvailable()
      in.addData((1L, 10 * H, 1L, "a", 0.0, "")) // duplicate arriving later: still inside horizon
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }
}
