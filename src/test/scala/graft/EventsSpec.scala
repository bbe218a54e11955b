package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Events

/** d116 cohort retention and d117 ordered funnel on planted event
  * streams: the retention triangle's exact cells, funnel ordering
  * semantics (a click BEFORE the first view must not count), and the
  * registered bindings' invariants on the driver tables.
  */
class EventsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = Sessions.build("events-spec")
  override def afterAll(): Unit = spark.stop()

  private val Day = 86400000000L

  private def eventsOf(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, ts, t), i) => (i.toLong, u, ts, t) }
      .toDF("event_id", "user_id", "ts_us", "event_type")
  }

  test("retention triangle counts distinct users per cohort/offset cell") {
    // user 1: days 0, 1, 3 (cohort 0); user 2: days 1, 1 (cohort 1);
    // user 3: day 0 only (cohort 0)
    val ev = eventsOf(
      (1L, 0L * Day + 5L, "view"), (1L, 1L * Day + 9L, "view"),
      (1L, 3L * Day + 2L, "view"),
      (2L, 1L * Day + 1L, "view"), (2L, 1L * Day + 2L, "click"),
      (3L, 0L * Day + 7L, "view"))
    val got = Events.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L,   // users 1 and 3 on their cohort day
      (0L, 1L) -> 1L,   // user 1 back on day 1
      (0L, 3L) -> 1L,   // user 1 back on day 3
      (1L, 0L) -> 1L))  // user 2 (two same-day events count once)
  }

  test("funnel steps must occur in order; drop-offs keep their prefix") {
    val ev = eventsOf(
      // user 1 completes in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE the first view — must not count; a later
      // click does, but no purchase after it
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 15L, "click"),
      (2L, 12L, "purchase"),
      // user 3: only an (ignored) error event
      (3L, 1L, "error"))
    val got = Events.funnel(ev).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))))
      .toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    // user 2's purchase at 12 precedes the qualifying click at 15
    assert(got(2L) == ((Some(10L), Some(15L), None, 2L)))
    assert(got(3L) == ((None, None, None, 0L)))
  }

  test("transition counts follow each user's (ts, event_id) order") {
    val ev = eventsOf(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "view"),
      (2L, 5L, "view"), (2L, 6L, "click"))
    val got = Events.eventTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 2L,    // both users
      ("click", "view") -> 1L))   // user 1 only; no cross-user pairs
  }

  test("d118 binding: transitions sum to events minus users at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val total = SparkEntry.queries("d118_event_transitions")(spark, sf)
      .collect().map(_.getLong(2)).sum
    val ev = graft.ops.Tables.events(spark, sf)
    assert(total == ev.count() - ev.select("user_id").distinct().count())
  }

  test("rfm keeps never-purchasers and measures recency from the stream's last day") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 0L * Day + 5L, "purchase", 10.50),
      (2L, 1L, 2L * Day + 1L, "purchase", 4.25),
      (3L, 2L, 3L * Day + 9L, "view", 0.0),
      (4L, 3L, 1L * Day + 1L, "purchase", 1.00))
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
    val got = Events.rfm(ev).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getLong(2), r.getDouble(3)))).toMap
    // stream's last day is 3 (user 2's view)
    assert(got(1L) == ((Some(1L), 2L, 14.75)))  // last purchase day 2
    assert(got(2L) == ((None, 0L, 0.0)))        // never purchased
    assert(got(3L) == ((Some(2L), 1L, 1.0)))
  }

  test("rolling active users slides the trailing window over distinct user-days") {
    // user 1 on days 0 and 2; user 2 on day 2 (twice — counts once)
    val ev = eventsOf(
      (1L, 0L * Day + 1L, "view"), (1L, 2L * Day + 1L, "view"),
      (2L, 2L * Day + 2L, "view"), (2L, 2L * Day + 9L, "click"))
    val got = Events.rollingActiveUsers(ev, window = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 0: {1}; day 1: {1} (trailing from day 0); day 2: {1, 2};
    // day 3 clipped (past the stream's last day)
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }

  test("registered bindings: triangle and funnel invariants at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val tri = SparkEntry.queries("d116_cohort_retention")(spark, sf).collect()
    assert(tri.nonEmpty)
    tri.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(2) >= 1))
    // offset-0 cells must count every cohort member exactly once: the
    // summed diagonal equals the distinct user count
    val users = graft.ops.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(tri.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum == users)

    val fun = SparkEntry.queries("d117_funnel")(spark, sf).collect()
    assert(fun.length.toLong == users)
    fun.foreach { r =>
      val ts = Seq(Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
        .map(_.map(_.asInstanceOf[Long]))
      val reached = r.getLong(4)
      assert(ts.count(_.isDefined).toLong == reached)
      // defined prefix, strictly increasing
      assert(ts.takeWhile(_.isDefined).length.toLong == reached)
      val defined = ts.flatten
      assert(defined == defined.sorted && defined.distinct == defined)
    }
  }

  test("d124: a volume spike z-scores anomalous against the trailing week") {
    // baseline days 0-6 alternate 1/3 events (mean 13/7 over 7 days at
    // day 7's frame... use explicit counts); day 7 spikes to 40
    val counts = Seq(1, 3, 1, 3, 1, 3, 1, 40)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (d.toLong, d.toLong * Day + i))
    }
    import spark.implicits._
    val ev = rows.zipWithIndex
      .map { case ((_, ts), i) => (i.toLong, 1L, ts, "view") }
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.dailyAnomalies(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    // day 0: no baseline — nulls, not anomalous
    assert(got(0L).getLong(2) == 0L && !got(0L).getBoolean(6))
    assert(got(0L).isNullAt(3) && got(0L).isNullAt(5))
    // day 7: baseline = days 0..6 -> counts (1,3,1,3,1,3,1): mean 13/7,
    // sample std over those 7 values; 40 is far outside
    assert(got(7L).getBoolean(6), got(7L).toString)
    assert(got(7L).getDouble(5) > 2.0)
    // an in-pattern day is not anomalous
    assert(!got(5L).getBoolean(6))
    // baseline stats replicate a direct computation (day 7's frame)
    val base = counts.take(7).map(_.toDouble)
    val mean = base.sum / base.length
    val std = math.sqrt(base.map(c => (c - mean) * (c - mean)).sum / (base.length - 1))
    assert(math.abs(got(7L).getDouble(3) - mean) < 5e-5)
    assert(math.abs(got(7L).getDouble(4) - std) < 5e-5)
  }

  test("d124: a constant baseline (zero variance) yields NULL z, no flag") {
    import spark.implicits._
    val rows = (0 to 5).flatMap(d => Seq((d.toLong, d.toLong * Day + 1)))
      .zipWithIndex.map { case ((_, ts), i) => (i.toLong, 1L, ts, "view") }
    val ev = rows.toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.dailyAnomalies(ev).collect().map(r => r.getLong(0) -> r).toMap
    // every day has exactly 1 event; later days have a constant baseline
    assert(got(5L).getDouble(4) == 0.0)
    assert(got(5L).isNullAt(5) && !got(5L).getBoolean(6))
  }

  test("d124: calendar gaps baseline by RANGE (true trailing days)") {
    import spark.implicits._
    // events on days 0..6 and day 20: day 20's trailing 7-day window is
    // empty (days 13..19 have no rows) -> base_n 0, no flag
    val rows = ((0 to 6).map(_.toLong) :+ 20L).zipWithIndex
      .map { case (d, i) => (i.toLong, 1L, d * Day + 1, "view") }
    val ev = rows.toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.dailyAnomalies(ev).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(20L).getLong(2) == 0L && !got(20L).getBoolean(6))
  }

  test("d142: sessions split on STRICT gap; an exactly-threshold gap does not") {
    import spark.implicits._
    val M = 1000000L // 1 second in µs
    // gap = 1 minute. user 1: 0s, 10s, 70s (gap == 60s -> SAME session),
    // 131s (gap 61s -> new). user 2: one event.
    val ev = Seq(
      (0L, 1L, 0L * M, "view"), (1L, 1L, 10L * M, "view"),
      (2L, 1L, 70L * M, "click"), (3L, 1L, 131L * M, "view"),
      (4L, 2L, 5L * M, "purchase"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.sessionize(ev, gapMinutes = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.size == 3)
    assert(got((1L, 1L)) == ((0L, 70L * M, 70L * M, 3L, 2L)))
    assert(got((1L, 2L)) == ((131L * M, 131L * M, 0L, 1L, 1L)))
    assert(got((2L, 1L)) == ((5L * M, 5L * M, 0L, 1L, 1L)))
  }

  test("d142: session_idx counts each user's sessions independently from 1") {
    import spark.implicits._
    val H = 3600000000L // 1 hour in µs
    // default 30-min gap; user 1 has 3 well-separated bursts, user 2 has 2
    val rows = Seq(
      (1L, 0L), (1L, 60L), (1L, 2 * H), (1L, 4 * H), (1L, 4 * H + 5L),
      (2L, 0L), (2L, 10 * H))
    val ev = rows.zipWithIndex
      .map { case ((u, ts), i) => (i.toLong, u, ts, "view") }
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.sessionize(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(got == Map(
      (1L, 1L) -> 2L, (1L, 2L) -> 1L, (1L, 3L) -> 2L,
      (2L, 1L) -> 1L, (2L, 2L) -> 1L))
  }

  test("d142 binding: sessions partition the events exactly at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.ops.Tables.events(spark, dir)
    val sessions = Events.sessionize(ev)
    val nEvents = ev.count()
    val agg = sessions.agg(
      org.apache.spark.sql.functions.sum("n_events"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .collect()(0)
    // every event lands in exactly one session; durations never negative
    assert(agg.getLong(0) == nEvents)
    assert(sessions.where(org.apache.spark.sql.functions.col("duration_us") < 0).count() == 0)
  }
}
