package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One cohort-retention delta: `delta` is +1 (a user newly active at
  * this (cohort, offset) cell) or −1 (a retraction — the user's cohort
  * shifted earlier when a late out-of-order event revealed an earlier
  * first-active day, so facts emitted under the old cohort are taken
  * back). `sum(delta)` per cell equals the batch count exactly. */
final case class CohortFact(cohortDay: Long, dayOffset: Long, delta: Long)

/** One rolling-active-users delta: user newly covers report day `day`
  * (always +1 — window coverage is monotone under new activity). */
final case class WauFact(day: Long, delta: Long)

private final case class UserDays(cohortDay: Long, days: Array[Long])

/** Streaming counterparts of the [[graft.ops.Events]] batch family
  * (r09 verdict ask #6): cohort retention and rolling active users in
  * their natural incremental form — a per-user stateful
  * distinct-(user, day) pass (`flatMapGroupsWithState`, the
  * [[Streams.sessionize]] / [[NearDupStream]] pattern) emitting DELTA
  * facts, then an ordinary streaming aggregation. Exactness is by
  * retraction, not by watermark: an out-of-order event that shifts a
  * user's cohort earlier emits −1 facts for the stale cells and re-emits
  * the corrected ones, so `sum(delta)` converges to the batch answer on
  * ANY replay order (EventsStreamSpec proves stream == batch on a
  * shuffled replay of the events table).
  *
  * Scale: the shuffle is one exchange on user_id (the same key the
  * batch path shuffles); per-user state is the user's distinct active
  * DAYS (8 bytes/day — years of daily activity fit in a few KB), not
  * raw events. Facts are cell-sized, so the downstream aggregation is
  * tiny. No timeout is installed: active-day state is the product
  * analytics state of record (a retention query needs full user
  * history by definition); cap horizon by filtering `events` upstream
  * if a deployment wants bounded lookback.
  */
object EventsStream {

  private val DayUs = 86400000000L

  /** Incremental cohort retention: the fact stream (append mode). */
  def cohortFacts(spark: SparkSession, events: Dataset[Ev]): Dataset[CohortFact] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[Ev], state: GroupState[UserDays]) => {
          val seen: Set[Long] =
            state.getOption.map(_.days.toSet).getOrElse(Set.empty)
          val fresh = it.map(e => Math.floorDiv(e.tsUs, DayUs)).toSet.diff(seen)
          if (fresh.isEmpty) Iterator.empty
          else {
            val all = seen ++ fresh
            val cohort = all.min
            val prior = state.getOption.map(_.cohortDay)
            state.update(UserDays(cohort, all.toArray))
            prior match {
              case Some(c) if c == cohort =>
                fresh.iterator.map(d => CohortFact(c, d - c, 1L))
              case Some(c) =>
                // cohort shifted earlier: retract everything emitted
                // under the old cohort, re-emit the full corrected set
                seen.iterator.map(d => CohortFact(c, d - c, -1L)) ++
                  all.iterator.map(d => CohortFact(cohort, d - cohort, 1L))
              case None =>
                all.iterator.map(d => CohortFact(cohort, d - cohort, 1L))
            }
          }
        })
  }

  /** The retention triangle as a live aggregation over [[cohortFacts]]
    * — batch [[graft.ops.Events.cohortRetention]]'s schema
    * (cohort_day, day_offset, n_users). Retraction leftovers sum to 0
    * and are filtered, so the non-zero cells equal the batch rows. */
  def cohortRetention(spark: SparkSession, events: Dataset[Ev]): DataFrame =
    cohortFacts(spark, events)
      .groupBy(col("cohortDay").as("cohort_day"), col("dayOffset").as("day_offset"))
      .agg(sum(col("delta")).as("n_users"))
      .where(col("n_users") > 0)

  /** Incremental rolling-active-users facts: a user's new active day
    * `d` newly covers every report day in [d, d+window) not already
    * covered by an earlier-seen day — coverage is monotone, so the
    * stream is pure +1s (no retractions needed). Unlike the batch
    * form, fan-out past the data's last day is NOT clipped: a live
    * stream has no "last day" (the trailing horizon days simply keep
    * accumulating as later activity arrives).
    *
    * Per-batch cost is bounded by the window, not the user's history: a
    * seen day s can intersect a fresh day d's coverage only when
    * s > d − window, so the coverage set is built from the seen days
    * inside the window horizon of the batch's OLDEST fresh day —
    * O(window²) interval expansion instead of O(|seen|·window) for a
    * long-lived hot user. The seen-day STATE itself stays complete
    * (arbitrarily late events must still dedup against ancient covered
    * days — the shuffled-replay parity spec exercises exactly that);
    * it grows one Long per active day per user, ~3 KB/user-decade,
    * which is the deliberate price of exactness under unbounded
    * lateness. */
  def wauFacts(spark: SparkSession, events: Dataset[Ev],
      window: Int = 7): Dataset[WauFact] = {
    require(window >= 1, "need window >= 1")
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[Ev], state: GroupState[Array[Long]]) => {
          val seen: Set[Long] = state.getOption.map(_.toSet).getOrElse(Set.empty)
          val fresh = it.map(e => Math.floorDiv(e.tsUs, DayUs)).toSet.diff(seen)
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update((seen ++ fresh).toArray)
            val horizon = fresh.min - window // older seen days can't overlap
            val covered = seen.iterator.filter(_ > horizon)
              .flatMap(d => d until d + window).toSet
            (fresh.flatMap(d => d until d + window) -- covered)
              .iterator.map(d => WauFact(d, 1L))
          }
        })
  }

  /** Trailing-`window`-day active users as a live aggregation over
    * [[wauFacts]] — batch [[graft.ops.Events.rollingActiveUsers]]'s
    * schema (day, n_users), minus that path's last-day clip (see
    * [[wauFacts]]). */
  def rollingActiveUsers(spark: SparkSession, events: Dataset[Ev],
      window: Int = 7): DataFrame =
    wauFacts(spark, events, window)
      .groupBy(col("day"))
      .agg(sum(col("delta")).as("n_users"))
}
