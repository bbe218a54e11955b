package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Ev, EventsStream}
import graft.ops.Events

/** Streaming Events family (r09 ask #6): the incremental cohort /
  * rolling-WAU forms must converge to the batch answers on a replayed
  * event log — including OUT-OF-ORDER replay, where cohort exactness
  * depends on the retraction protocol (−1 facts when a late event
  * shifts a user's first-active day earlier).
  */
class EventsStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("events-stream-spec")
  override def afterAll(): Unit = spark.stop()

  private val D = 86400000000L // 1 day in µs

  private def ev(u: Long, day: Long): Ev = Ev(u, day * D + u, "click")

  test("cohort shift emits retractions and converges to the batch cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val facts = EventsStream.cohortFacts(spark, in.toDS())
      .writeStream.format("memory").queryName("cohort_facts")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 looks like a day-10 cohort with day-12 activity
      in.addData(ev(1L, 10L), ev(1L, 12L))
      facts.processAllAvailable()
      // batch 2: a LATE day-8 event — the true cohort day
      in.addData(ev(1L, 8L))
      facts.processAllAvailable()
      val rows = spark.table("cohort_facts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // the stale day-10-cohort facts were retracted
      assert(rows.contains((10L, 0L, -1L)) && rows.contains((10L, 2L, -1L)), rows.toSeq)
      // net cells == batch on the same events
      val net = rows.groupBy(t => (t._1, t._2)).view
        .mapValues(_.map(_._3).sum).filter(_._2 > 0).toMap
      val batch = Events.cohortRetention(
          Seq((1L, 10L * D + 1L), (1L, 12L * D + 1L), (1L, 8L * D + 1L))
            .toDF("user_id", "ts_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(net == batch)
    } finally facts.stop()
  }

  test("stream == batch on a shuffled replay of the sf0.001 events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val eventsDf = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
    val evs = eventsDf.select($"user_id", $"ts_us").as[(Long, Long)]
      .collect().map { case (u, ts) => Ev(u, ts, "x") }
    // deterministic out-of-order replay in three batches
    val shuffled = new scala.util.Random(42L).shuffle(evs.toVector)
    val batches = shuffled.grouped((shuffled.size + 2) / 3).toSeq

    val inC = MemoryStream[Ev]
    val cohortQ = EventsStream.cohortRetention(spark, inC.toDS())
      .writeStream.format("memory").queryName("cohort_cells")
      .outputMode(OutputMode.Complete).start()
    val inW = MemoryStream[Ev]
    val wauQ = EventsStream.rollingActiveUsers(spark, inW.toDS())
      .writeStream.format("memory").queryName("wau_days")
      .outputMode(OutputMode.Complete).start()
    try {
      batches.foreach { b =>
        inC.addData(b); inW.addData(b)
        cohortQ.processAllAvailable(); wauQ.processAllAvailable()
      }
      val gotCohort = spark.table("cohort_cells").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val wantCohort = Events.cohortRetention(eventsDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(gotCohort == wantCohort)
      assert(wantCohort.nonEmpty)

      // the batch form clips fan-out past the data's last day; the
      // stream (no "last day" on an unbounded input) does not — compare
      // the clipped domain
      val wantWau = Events.rollingActiveUsers(eventsDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lastDay = wantWau.keys.max
      val gotWau = spark.table("wau_days").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
        .filter(_._1 <= lastDay)
      assert(gotWau == wantWau)
    } finally { cohortQ.stop(); wauQ.stop() }
  }
}
