package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Each operator exists twice with identical semantics:
  *  - a BATCH form (verified against the DuckDB oracle), and
  *  - a Structured Streaming form (same logic as an unbounded query:
  *    watermarked tumbling windows; sessionization as explicit
  *    per-key state in flatMapGroupsWithState), exercised in
  *    StreamingSpec against the batch results.
  *
  * Scale: the window agg is a standard streaming shuffle on
  * (window, event_type) with partial aggregation; sessionization
  * shuffles on user_id once and holds O(1) state per key.
  */
object EventStream {

  /** Exact decimal cast so double sums are order-independent (the
    * oracle hash compare must not see float accumulation order).
    */
  private def decVal(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 6))

  val gapMicros: Long = 30L * 60 * 1000 * 1000 // 30 min session gap

  // ---------------------------------------------------------------
  /** e01 batch: tumbling 1-hour windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(decVal(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** e21 batch: SLIDING (hopping) windows — every event lands in
    * size/slide overlapping windows (here 4), the dashboard window
    * class tumbling can't express (a "last 2 h, refreshed every
    * 30 min" metric). Spark's `window()` TVF explodes each row into
    * its hops BEFORE the hash agg, so the whole thing is one
    * map-side-combined aggregation over a 4× row stream — no
    * self-join, no per-window re-scan; state (and shuffle) is
    * windows × event_types, calendar-bounded.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(decVal(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** e21 streaming: identical expression under a watermark — the
    * engine evicts a hop once the watermark passes its END, so state
    * is the live 4 hops per type, not history.
    */
  def slidingStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "4 hours")
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(decVal(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** e01 streaming: the same aggregation over an unbounded source with
    * a 2-hour watermark bounding state.
    */
  def tumblingStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(decVal(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  /** e22 batch: the MULTI-STATEFUL pipeline — at-least-once input →
    * exact dedup → hourly counts → 4-hour rollup (peak hour, total,
    * active hours), all one query. Each stage is a separate stateful
    * operator; the rollup aggregates the hourly AGGREGATE stream, not
    * raw events, so its state is hours × types, not rows.
    */
  def dedupThenRollup(events: DataFrame): DataFrame =
    rollup4h(events.dropDuplicates("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events")))

  /** e22 streaming: the same three stages CHAINED IN ONE streaming
    * query — Spark ≥3.4's multiple-stateful-operator support.
    * `dropDuplicatesWithinWatermark` holds each event_id only until
    * the watermark passes it (at-least-once redeliveries land inside
    * the delay, so state is bounded without an explicit TTL column);
    * the hourly aggregate emits a window when the watermark closes
    * it; `window_time()` re-derives an event-time column FROM the
    * closed window so the 4-hour aggregate can watermark-chain off
    * it. One query, three stateful operators, each with
    * watermark-bounded state — the alternative is three jobs wired
    * through two intermediate tables.
    */
  def dedupThenRollupStream(events: DataFrame): DataFrame =
    rollup4h(events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events")))

  /** Shared tail of e22's two forms: 4-hour rollup of the hourly
    * count stream, keyed by the closed window's event time.
    */
  private def rollup4h(hourly: DataFrame): DataFrame =
    hourly
      .groupBy(window(window_time(col("window")), "4 hours"),
        col("event_type"))
      .agg(max(col("n_events")).as("peak_hourly"),
        sum(col("n_events")).as("total_events"),
        count(lit(1)).as("n_active_hours"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("peak_hourly"), col("total_events"), col("n_active_hours"))

  // ---------------------------------------------------------------
  /** e18 batch: per-window event-type counts (the trending feed's
    * maintained state).
    */
  def trendingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** e18 streaming: the same counts under a 2-hour watermark. In
    * UPDATE output mode each micro-batch re-emits a key's full
    * cumulative count, so a keyed MERGE sink (incoming wins) holds
    * the correct running state at all times — rank happens at READ,
    * where it belongs (Structured Streaming cannot rank across an
    * aggregated stream, and the serving layer wants the counts table
    * anyway).
    */
  def trendingCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Top-k per window over a counts table, deterministic tiebreak on
    * the type name. Catalyst's rank-limit pushdown (WindowGroupLimit)
    * bounds every map task at k rows per window — the q23 plan.
    */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start")
      .orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("window_start"), col("event_type"),
        col("n_events").cast(LongType).as("n_events"),
        col("rnk").cast(IntegerType).as("rnk"))
  }

  /** e02 batch: gap-based sessionization — a new session starts when
    * the inter-event gap exceeds 30 minutes. Pure window functions:
    * one shuffle on user_id.
    */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Catalog.epochMicros, not unix_micros: the events ts is canonical
    // TIMESTAMP_NTZ (Catalog.normalizeEventTs) and unix_micros rejects
    // NTZ input outright.
    val us = graft.sources.Catalog.epochMicros _
    val prev = lag(us(col("ts")), 1).over(w)
    events
      .withColumn("new_s",
        when(prev.isNull || us(col("ts")) - prev > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_s")).over(run).cast(IntegerType))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(decVal(col("value"))).cast(DoubleType).as("total_value"))
  }

  // ---------------------------------------------------------------
  /** e04 batch: exactly-once view over an at-least-once stream —
    * re-delivered events collapse to one row per event key.
    */
  def dedup(events: DataFrame): DataFrame = events.dropDuplicates("event_id")

  /** e04 streaming: the same dedup with state BOUNDED by the
    * watermark — `dropDuplicatesWithinWatermark` only remembers keys
    * inside the watermark horizon, so state is O(events per window)
    * instead of O(all keys ever seen). Re-delivery later than the
    * watermark would re-emit; at-least-once sources re-deliver within
    * seconds-to-minutes, far inside the horizon.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  // ---------------------------------------------------------------
  /** e09: the per-batch reduction of the streaming upsert — latest
    * event per user within the batch, deterministically tie-broken by
    * event_id. One map-side-bounded window per micro-batch (batches
    * are small next to the table); the cross-batch combine is the
    * Merge materialization's incoming-wins rule, so in-order delivery
    * gives last-write-wins on the maintained table.
    */
  def latestPerUser(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("last_ts").desc, col("last_event_id").desc)
    batch.select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** e12: CDC op-log reduction — latestPerUser's shape but KEEPING
    * the change op ('D' for error events, 'U' otherwise). A tombstone
    * must survive both the per-batch reduce and the merge: a delete is
    * a newer FACT about the key, not an absence — dropping it inside a
    * batch would resurrect an older update, and dropping it from the
    * maintained table would let a pre-delete row win the next merge.
    * The mirror therefore stores tombstones and filters `op = 'D'` at
    * READ time (exactly the Debezium → lakehouse merge-mirror shape).
    */
  def latestPerUserCdc(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("last_ts").desc, col("last_event_id").desc)
    batch.select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        col("value").as("last_value"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ---------------------------------------------------------------
  /** e05: stream-static enrichment — events joined to a driver-small
    * static dimension (customer segments). The SAME code serves batch
    * and streaming inputs: a broadcast equi-join is stateless, so on a
    * stream each micro-batch joins against the broadcast dim with no
    * streaming state at all (the canonical stream-static join). The
    * stream side never shuffles.
    */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
        broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"),
        col("c_mktsegment").as("segment"))

  // --- streaming sessionization ----------------------------------
  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: BigDecimal)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  private def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** Fold one sorted micro-batch into the per-user session state:
    * extends the open session or closes it and opens a new one.
    * Returns (sessions closed by this batch, the still-open session).
    */
  private def foldBatch(batch: Iterator[Ev],
      openIn: Option[SessionState]): (Seq[SessionState], Option[SessionState]) = {
    def dec(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var open = openIn
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    for (e <- sorted) {
      val t = micros(e.ts)
      open match {
        case Some(s) if t - s.end <= gapMicros =>
          open = Some(s.copy(end = t, n = s.n + 1, total = s.total + dec(e.value)))
        case other =>
          other.foreach(closed += _)
          open = Some(SessionState(t, t, 1, dec(e.value)))
      }
    }
    (closed.toSeq, open)
  }

  /** e02 streaming: explicit per-user session state. Events arrive in
    * micro-batches; completed sessions (gap exceeded) are emitted, the
    * open session rides in GroupState. This form has NO timeout: an
    * idle user's last session stays open until their next event (or a
    * test sentinel). Production uses [[sessionizeStreamEventTime]],
    * where the watermark itself closes idle sessions.
    */
  def sessionizeStream(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          val (closed, open) = foldBatch(batch, state.getOption.flatMap(_.headOption))
          state.update(open.toList)
          closed.iterator.map(s => Session(userId,
            toTs(s.start), toTs(s.end), s.n, s.total.toDouble))
      }
  }

  /** e02 streaming, PRODUCTION form: event-time timeout closes idle
    * sessions when the watermark passes `last event + gap` — no
    * sentinel events, state strictly bounded by the watermark horizon
    * (the input must carry `withWatermark("ts", ...)`). Timeout
    * handling and gap-fold share one code path with
    * [[sessionizeStream]], so the emitted sessions are identical —
    * only WHEN the final session of an idle user emits differs.
    */
  def sessionizeStreamEventTime(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: no later
            // event can extend it (late data would be dropped by the
            // watermark anyway) — emit and clear
            val timedOut = state.getOption.toSeq.flatten
            state.remove()
            timedOut.iterator.map(s => Session(userId,
              toTs(s.start), toTs(s.end), s.n, s.total.toDouble))
          } else {
            val (closed, open) = foldBatch(batch, state.getOption.flatMap(_.headOption))
            state.update(open.toList)
            open.foreach { s =>
              // fire when the watermark passes the gap horizon; the
              // max() keeps the timestamp legal if the watermark
              // already moved past it within this trigger
              val horizonMs = Math.floorDiv(s.end + gapMicros, 1000L)
              state.setTimeoutTimestamp(
                Math.max(horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map(s => Session(userId,
              toTs(s.start), toTs(s.end), s.n, s.total.toDouble))
          }
      }
  }
}
