package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Event-time streaming analytics over an events stream (batch or
  * streaming DataFrame — the expressions are identical; only the source
  * differs).
  *
  * These are the Structured Streaming capabilities a training-data
  * pipeline needs on live event feeds: watermarked tumbling-window
  * aggregation (late data dropped after the delay) and stateful
  * sessionization via `flatMapGroupsWithState` with event-time timeouts.
  * State is per-key in the state store — sized by active keys, not
  * history.
  */
object StreamOps {

  /** Tumbling-window counts per event type with an event-time watermark:
    * on a stream, windows finalize (and state is dropped) once the
    * watermark passes their end. */
  def tumblingCounts(
      events: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), windowDuration).as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("win.start").as("window_start"),
        col("event_type"), col("n"))

  /** Streaming deduplication on arbitrary key columns (e.g. a content
    * hash): only the FIRST arrival of each key within the watermark
    * horizon is emitted. Built on `dropDuplicatesWithinWatermark`, so
    * per-key dedup state is DROPPED once the event-time watermark passes —
    * state is bounded by distinct keys per horizon, not all history, which
    * is what makes continuous corpus-ingest dedup feasible: an unbounded
    * `dropDuplicates` state would grow with every document ever seen.
    * A batch frame takes plain `dropDuplicates` (one arbitrary survivor
    * per key — Spark rejects the within-watermark variant outside
    * streaming). */
  def streamingDedup(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermarkDelay: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  /** Watermarked stream-stream interval join: pair each left row with the
    * right rows sharing `keyCol` whose `rightTsCol` falls within
    * `[leftTs - before, leftTs + after]` (e.g. "every view in the 5
    * minutes before a click", attribution-style).
    *
    * On streams, BOTH sides carry event-time watermarks and the join
    * condition carries the time range — exactly the two things Structured
    * Streaming's symmetric hash join needs to BOUND its buffered state:
    * each side's rows are dropped from the state store once the watermark
    * moves past the range they could still join into. Without the range
    * bound a stream-stream join must buffer both streams forever. On
    * batch frames the identical expression is an ordinary range-bounded
    * equi-join (`withWatermark` is a no-op) — which is what the SQL
    * oracle verifies.
    *
    * Scale shape: shuffle on `keyCol` only; state (streaming) is bounded
    * by rows per watermark horizon, not history. Both sides keep their
    * own columns (the duplicate join key is dropped from the right);
    * rename collisions before calling. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      before: String, after: String, watermarkDelay: String): DataFrame = {
    require(leftTsCol != rightTsCol,
      "interval join needs distinct timestamp column names on the two sides")
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    val cond = l(keyCol) === r(keyCol) &&
      r(rightTsCol) >= l(leftTsCol) - expr(s"INTERVAL $before") &&
      r(rightTsCol) <= l(leftTsCol) + expr(s"INTERVAL $after")
    l.join(r, cond).drop(r(keyCol))
  }

  /** Gap-based sessionization of a BATCH event table — the declarative
    * gaps-and-islands twin of the streaming [[sessionize]]: a session
    * break is a quiet period longer than `gapMicros`; the session id is
    * the running count of breaks per user.
    *
    * Output: one row per (user, session) with start/end/event count.
    *
    * Time arithmetic is exact integer microseconds (never a seconds-
    * truncating cast), so boundaries match an exact-SQL engine to the
    * microsecond. Scale: both windows and the final aggregate partition
    * by user — a per-user history is window-local, never a global sort. */
  def sessionizeBatch(
      events: DataFrame, userCol: String, tsCol: String,
      gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withUs = events.select(col(userCol).as("user_id"), col(tsCol).as("__ts"),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"))
    val w = Window.partitionBy("user_id").orderBy("__us")
    val prev = lag("__us", 1).over(w)
    val brk = when(prev.isNull || col("__us") - prev > gapMicros, 1L).otherwise(0L)
    withUs.withColumn("__brk", brk)
      .withColumn("session_id", sum("__brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("__ts").as("session_start"), max("__ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Internal per-user session accumulator (public: encoder codegen needs
    * constructor access). */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization: a user's events belong to one session until
    * a quiet period of `gapMs`. Sessions emit when the event-time
    * watermark passes last-event + gap (timeout), so output is final. */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String)(implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(
              userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var emitted = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // t may precede s.start (late-but-valid event newer than
                  // the watermark): extend the session backward too, so
                  // session_start never postdates a member event
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) => // gap exceeded within the batch: emit, restart
                  emitted ::= Session(
                    userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            emitted.reverseIterator
          }
      }
  }
}
