package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Ev, SessionOut, Streams}

/** Structured Streaming semantics: windowed counts under watermark and
  * stateful gap sessionization closing sessions via event-time timeout.
  */
class StreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("streams-spec")
  override def afterAll(): Unit = spark.stop()

  private val H = 3600L * 1000000L // 1 hour in µs

  test("hourlyCounts: tumbling event-time windows (update mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Double, String)]
    val df = in.toDF().toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val q = Streams.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Update).start()
    try {
      in.addData(
        (1L, 10L * H + 1L, 1L, "click", 0.0, ""),
        (2L, 10L * H + 2L, 2L, "click", 0.0, ""),
        (3L, 11L * H + 1L, 1L, "view", 0.0, ""))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .selectExpr("unix_micros(hour_start) AS hs", "event_type", "n_events")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((10L * H, "click", 2L)))
      assert(rows.contains((11L * H, "view", 1L)))
    } finally q.stop()
  }

  test("noveltyScoreFrom scores a document stream against a frozen vocabulary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the d102/d106 scoring half is a stream-static join + aggregation,
    // so an arriving snapshot can be novelty-scored as it lands
    val in = MemoryStream[(Long, String)]
    val vocab = graft.ops.Corpus.bigramVocab(Seq((1L, "a b c")).toDF("doc_id", "text"))
    val q = graft.ops.Corpus
      .noveltyScoreFrom(in.toDF().toDF("doc_id", "text"), vocab)
      .writeStream.format("memory").queryName("novelty_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData((10L, "a b x"), (11L, "a b c"))
      q.processAllAvailable()
      val rows = spark.table("novelty_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(rows == Map(
        10L -> ((2L, 1L, 0.5)),  // {a b} seen, {b x} novel
        11L -> ((2L, 0L, 0.0))))
    } finally q.stop()
  }

  test("sessionize: gap sessions close when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sessions = Streams.sessionize(spark, in.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session), then silence.
      in.addData(Ev(1L, 10L * H, "a"), Ev(1L, 10L * H + 600L * 1000000L, "b"))
      q.processAllAvailable()
      // Advance the watermark far past the gap: session must close.
      in.addData(Ev(2L, 20L * H, "c"))
      q.processAllAvailable()
      in.addData(Ev(2L, 30L * H, "d")) // push watermark again to flush
      q.processAllAvailable()
      val out = spark.table("sessions").as[SessionOut].collect().filter(_.userId == 1L)
      assert(out.length == 1)
      assert(out.head.startUs == 10L * H)
      assert(out.head.endUs == 10L * H + 600L * 1000000L)
      assert(out.head.nEvents == 2L)
    } finally q.stop()
  }

  test("sessionize: stream == batch d142 on an ordered replay of the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.ops.Tables.events(spark, dir)
    // batch truth: d142's per-session table, projected to the streaming
    // schema (the stream emits no type breadth)
    val expected = graft.ops.Events.sessionize(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5))).toSet
    val rows = ev.selectExpr("user_id", "ts_us", "event_type")
      .as[(Long, Long, String)].collect()
      .sortBy(_._2).map(t => Ev(t._1, t._2, t._3))
    val maxTs = rows.map(_.tsUs).max
    val in = MemoryStream[Ev]
    val sessions = Streams.sessionize(spark, in.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // ordered chunked replay (never late vs the 2 h watermark), then a
      // sentinel far past the horizon so every open session times out
      rows.grouped(math.max(rows.length / 5, 1)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      in.addData(Ev(-1L, maxTs + 30L * 86400000000L, "flush"))
      q.processAllAvailable()
      val got = spark.table("sessions_parity").as[SessionOut].collect()
        .filter(_.userId >= 0)
        .map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
