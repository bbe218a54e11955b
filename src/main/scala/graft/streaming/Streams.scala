package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (events table shape, epoch-microsecond time). */
final case class Ev(userId: Long, tsUs: Long, eventType: String)

/** A closed user session (gap-based sessionization output). */
final case class SessionOut(userId: Long, startUs: Long, endUs: Long, nEvents: Long)

private final case class SessionState(startUs: Long, endUs: Long, n: Long)

/** Structured Streaming surface (SURVEY.md §2C): the same event-analytics
  * semantics the batch queries expose (q22 hourly windows, q23 gap
  * sessionization), re-expressed over unbounded input with watermarks and
  * typed state. `readStream` file sources consume the same parquet layout
  * the batch engine reads, so batch and streaming share one data contract.
  *
  * Scale notes: both ops shuffle once on the grouping key; state is
  * per-key and bounded (hourly windows expire by watermark, sessions are
  * dropped on event-time timeout), which is what keeps the state store
  * from growing without bound on an unbounded stream.
  */
object Streams {

  /** Streaming source over the events parquet layout. A file stream
    * needs an explicit schema, so the `ts` type is read off the existing
    * files once (batch footer peek at stream-construction time — new
    * files must keep the shape, the normal file-stream contract); the
    * stream then exposes the same epoch-µs `ts_us` the batch loader
    * (graft.ops.Tables.events) exposes, so batch and streaming share one
    * column contract across both testdata generations (µs timestamps or
    * legacy ns-as-Long). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = spark.read.parquet(dir).schema
    spark.readStream
      .schema(onDisk)
      .parquet(dir)
      .withColumn("ts_us", graft.ops.Tables.tsToMicros(onDisk("ts").dataType))
      .drop("ts")
  }

  /** Tumbling 1-hour event-time windows per event type, 2-hour watermark
    * (streaming analog of q22_event_hourly). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n_events"))

  /** Streaming exact dedup: drop repeated event_ids inside the watermark
    * horizon (the state store only keeps ids newer than the watermark —
    * bounded state, the standard streaming dedup for training pipelines). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id", "ts")

  /** Gap-based sessionization with typed state + event-time timeout
    * (streaming analog of q23_sessionize). A session closes when the
    * watermark passes its end + gap; closed sessions are appended. */
  def sessionize(spark: SparkSession, events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L

    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "2 hours")
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.startUs, s.endUs, s.n))
          } else {
            val sorted = it.map(_._2).toVector.sorted
            var closed = Vector.empty[SessionOut]
            var cur = state.getOption
            for (ts <- sorted) {
              cur match {
                case Some(s) if ts - s.endUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, math.max(s.endUs, ts), s.n + 1))
                case Some(s) =>
                  closed :+= SessionOut(userId, s.startUs, s.endUs, s.n)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once the watermark passes end + gap
              state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
            }
            closed.iterator
          }
        })
  }
}
