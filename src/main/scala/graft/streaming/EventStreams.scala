package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming surface over the events table: windowed
  * aggregation with watermarks, and gap-based sessionization both as a
  * stateful streaming operator (flatMapGroupsWithState) and as the exact
  * batch equivalent (window functions) used by the DuckDB oracle.
  *
  * The reference has no data-plane streams (SURVEY §1.1) — this is the
  * forward-looking ingestion surface a 100 TB pipeline needs: the same
  * transforms run on `readStream` (kafka/files) and on batch backfill.
  */
object EventStreams {

  /** Tumbling-window aggregation — the same plan runs on a streaming or
    * batch `events` DataFrame (pass watermark=None for batch, where
    * late-data bounds are meaningless). */
  def windowedCounts(events: DataFrame, width: String = "1 hour",
                     watermark: Option[String] = Some("10 minutes")): DataFrame =
    watermark.fold(events)(w => events.withWatermark("ts", w))
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Batch gap-sessionization: a session breaks after `gapMinutes` of
    * user inactivity. Pure window functions — the oracle-checkable twin
    * of the stateful streaming version below. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // microsecond precision: second-truncated gaps would misclassify
    // boundaries within 1s of the cutoff (event timestamps carry µs).
    val gap = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(byUser))
    val news = when(gap.isNull || gap > gapMinutes * 60000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", news)
      .withColumn("session_seq", sum(col("__new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 4).as("session_value"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, value: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, value: Double)

  /** Streaming gap-sessionization via flatMapGroupsWithState: emits a
    * session when the gap timeout fires. State is one small struct per
    * active user — bounded by active-user cardinality, not event volume. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30)
                      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.value))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.value + e.value))
                case Some(s) =>
                  out += SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.result().iterator
          }
      }
  }
}
