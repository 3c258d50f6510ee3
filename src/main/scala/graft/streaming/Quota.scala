package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** PER-ENTITY ADMISSION QUOTA (e24 — ingestion rate limiting, the
  * per-source/per-user cap every large-scale collection pipeline
  * enforces so one hot entity cannot flood a day's intake): each user
  * may ADMIT at most `quota` events per event-time day; the rest of
  * that user-day's events are REJECTED (kept, labeled — auditability
  * beats silent drops). The BATCH form replays admission in the
  * (ts, event_id) total order — a deterministic pure function of the
  * data, which is what the DuckDB oracle gates; the STREAMING form
  * admits in ARRIVAL order (sorted within each micro-batch, FIFO
  * across batches — what "first N" means to a live admission
  * controller), and the two agree row for row exactly when delivery
  * is event-time-ordered (the parity spec's feed; an out-of-order
  * straggler competes for whatever quota remains on arrival).
  *
  * Two forms with identical decision semantics:
  *  - BATCH (registered, DuckDB-gated): one row_number window per
  *    (user, day) — rank ≤ quota admits. One shuffle on the window
  *    key; WindowGroupLimit does NOT apply (every row is kept, only
  *    labeled), so the cost is the sort within each user-day.
  *  - STREAMING ([[quotaStream]]): Spark 4's `transformWithState`
  *    (arbitrary stateful v2) — the API that replaces
  *    flatMapGroupsWithState with COMPOSABLE typed state (here a
  *    MapState of live windows per user, not one monolithic blob),
  *    NAMED EVENT-TIME TIMERS (one per open window, firing when the
  *    watermark passes the window end to emit that window's
  *    admitted/rejected summary and free its entry — bounded state
  *    without a TTL guess), and declarative state TTL
  *    ([[RateLimiter]] below demonstrates the TTL-reset idiom).
  *    Requires the RocksDB state store provider.
  *
  * Scale shape: state per user = live (unclosed) windows only —
  * O(users × watermark horizon / window), never history; each
  * micro-batch shuffles once on user_id. At 100 TB of events the
  * batch form is the backfill path and the streaming form the
  * continuous path, sharing one decision function
  * ([[foldDecisions]]) — same fold, differing only in the order
  * contract documented there.
  */
object Quota {

  val dayMs: Long = 24L * 3600 * 1000

  /** Batch decisions: every event labeled admitted/rejected. */
  def admissions(events: DataFrame, quota: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("window_start"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("window_start", date_trunc("day", col("ts")))
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("window_start"), col("event_id"),
        (col("rn") <= quota).as("admitted"))
  }

  /** Batch per-(user, day) summary — what the streaming form's timers
    * emit when the watermark closes a window.
    */
  def admissionSummary(events: DataFrame, quota: Int): DataFrame =
    admissions(events, quota)
      .groupBy("user_id", "window_start")
      .agg(sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(!col("admitted"), 1L).otherwise(0L)).as("n_rejected"))

  // --- streaming form ----------------------------------------------

  final case class QEv(event_id: Long, ts: Timestamp, user_id: Long)
  /** Union row: kind = "decision" (per event) | "summary" (per closed
    * window, emitted by the window's event-time timer).
    */
  final case class QOut(kind: String, user_id: Long, window_start: Timestamp,
      event_id: Long, admitted: Boolean, n_admitted: Long, n_rejected: Long)
  final case class WinCounts(admitted: Long, rejected: Long)

  private def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** WALL-CLOCK day start for a timestamp — LocalDate truncation, the
    * same calendar day `date_trunc('day', ts)` assigns on the batch
    * side (events ts is canonical TIMESTAMP_NTZ, so date_trunc is
    * wall-clock too): a raw floorDiv(epoch, 86400000) would truncate
    * in UTC and put evening events in a different window than the
    * batch form under any non-UTC JVM/session zone. (DST-shifted
    * midnights move the timer's firing point by the offset delta —
    * the key recovery in handleExpiredTimer is self-consistent either
    * way; pin UTC, as this repo does, to avoid even that.)
    */
  private[graft] def windowStartMs(ts: Timestamp): Long =
    Timestamp.valueOf(ts.toLocalDateTime.toLocalDate.atStartOfDay).getTime

  /** The shared decision fold: admit while the window's admitted
    * count is below quota. ORDER CONTRACT: the fold admits in the
    * order given — the batch form replays the corpus in the
    * (ts, event_id) total order (deterministic, oracle-gated); the
    * streaming form sorts within each micro-batch but across batches
    * admission is ARRIVAL order, which is what a live rate limiter
    * means by "first N" (an out-of-order straggler competes for
    * whatever quota is left when it arrives, exactly like every
    * production admission controller). The two forms agree row for
    * row whenever delivery is event-time-ordered — the condition the
    * parity spec feeds and the condition under which "replay the
    * batch form" reproduces the stream's decisions.
    */
  private[graft] def foldDecisions(quota: Int, userId: Long,
      sorted: Seq[QEv], get: Long => Option[WinCounts],
      put: (Long, WinCounts) => Unit): Seq[QOut] =
    sorted.map { e =>
      val wStart = windowStartMs(e.ts)
      val cur = get(wStart).getOrElse(WinCounts(0L, 0L))
      val admit = cur.admitted < quota
      put(wStart, if (admit) cur.copy(admitted = cur.admitted + 1)
                  else cur.copy(rejected = cur.rejected + 1))
      QOut("decision", userId, new Timestamp(wStart), e.event_id, admit, -1L, -1L)
    }

  /** transformWithState processor: MapState[windowStart → counts] per
    * user + one event-time timer per open window. Decisions emit
    * inline; a window's summary emits exactly once, when the
    * watermark passes its end (the timer), and its state entry is
    * freed — the state-cleanup contract timers exist for.
    *
    * CLOSED-WINDOW stragglers: an event for a window the watermark
    * already closed would re-create the freed MapState entry, re-arm
    * a timer at the already-past close, and emit a SECOND summary
    * with a reset count (the r14 ADVICE finding). handleInputRows
    * therefore diverts such events up front — windowStart + dayMs ≤
    * current watermark — as `kind = "late"` rows (auditability beats
    * silent drops, the e24 rule) that never touch state. This is
    * DEFENSE IN DEPTH: Spark 4's TWS operator also runs its own
    * late-record filter on the previous micro-batch's watermark
    * (spec-observed: a sub-watermark straggler usually never reaches
    * the processor at all), but the exactly-once summary contract is
    * this class's documented invariant and must not depend on an
    * upstream filter whose watermark (previous-batch) lags the one
    * timers fire on — the guard closes that seam, and the spec pins
    * the contract whichever layer enforces it. Within-horizon
    * stragglers still compete for whatever quota remains, the
    * live-admission contract.
    */
  class QuotaProcessor(quota: Int)
      extends StatefulProcessor[Long, QEv, QOut] {
    @transient private var counts: MapState[Long, WinCounts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, WinCounts]("win_counts",
        Encoders.scalaLong, Encoders.product[WinCounts], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[QEv],
        timerValues: TimerValues): Iterator[QOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val (live, closed) = rows.toSeq
        .sortBy(e => (micros(e.ts), e.event_id))
        .partition(e => windowStartMs(e.ts) + dayMs > wm)
      val out = foldDecisions(quota, userId, live,
        w => if (counts.containsKey(w)) Some(counts.getValue(w)) else None,
        (w, c) => {
          if (!counts.containsKey(w))
            // first event of this user-day: arm the close timer
            // (re-arming the same (key, ts) would be a set-insert
            // no-op, but the containsKey guard keeps intent explicit)
            getHandle.registerTimer(w + dayMs)
          counts.updateValue(w, c)
        })
      (out ++ closed.map(e => QOut("late", userId,
        new Timestamp(windowStartMs(e.ts)), e.event_id, false, -1L, -1L)))
        .iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[QOut] = {
      val wStart = expiredTimerInfo.getExpiryTimeInMs - dayMs
      if (!counts.containsKey(wStart)) Iterator.empty
      else {
        val c = counts.getValue(wStart)
        counts.removeKey(wStart) // the window is closed: free its state
        Iterator.single(QOut("summary", userId, new Timestamp(wStart),
          -1L, false, c.admitted, c.rejected))
      }
    }

    /** Load one window's counts (the initial-state handoff at
      * batch→streaming cutover) and arm its close timer — the same
      * state entry and timer the live path would have built.
      */
    private[streaming] def seed(wStart: Long, c: WinCounts): Unit = {
      if (!counts.containsKey(wStart)) getHandle.registerTimer(wStart + dayMs)
      counts.updateValue(wStart, c)
    }
  }

  /** e24 streaming: decisions stream out per micro-batch; summaries
    * stream out as the watermark closes each user-day. Input must
    * carry `withWatermark("ts", …)`.
    */
  def quotaStream(events: Dataset[QEv], quota: Int): Dataset[QOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(quota),
        TimeMode.EventTime, OutputMode.Append)
  }

  /** One (user, window) count carried INTO the stream at cutover. */
  final case class SeedCounts(user_id: Long, window_start: Timestamp,
      n_admitted: Long, n_rejected: Long)

  /** [[QuotaProcessor]] with INITIAL STATE — the batch→streaming
    * cutover path (StatefulProcessorWithInitialState): a mid-day
    * cutover must not reset anyone's quota, so the streaming query
    * starts from the backfill's per-(user, window) counts. Each
    * seed lands in the same MapState the live path maintains and
    * arms the same window-close timer, so a seeded window summarizes
    * exactly once with backfill + streamed counts combined.
    */
  class QuotaProcessorSeeded(quota: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, QEv, QOut, SeedCounts] {
    private val inner = new QuotaProcessor(quota)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      inner.setHandle(getHandle)
      inner.init(outputMode, timeMode)
    }

    override def handleInitialState(userId: Long, seed: SeedCounts,
        timerValues: TimerValues): Unit =
      inner.seed(seed.window_start.getTime,
        WinCounts(seed.n_admitted, seed.n_rejected))

    override def handleInputRows(userId: Long, rows: Iterator[QEv],
        timerValues: TimerValues): Iterator[QOut] =
      inner.handleInputRows(userId, rows, timerValues)

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[QOut] =
      inner.handleExpiredTimer(userId, timerValues, expiredTimerInfo)
  }

  /** [[quotaStream]] seeded with a batch backfill's counts
    * ([[admissionSummary]]'s shape) — the cutover form. */
  def quotaStreamSeeded(events: Dataset[QEv], seeds: Dataset[SeedCounts],
      quota: Int): Dataset[QOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessorSeeded(quota),
        TimeMode.EventTime, OutputMode.Append,
        seeds.groupByKey(_.user_id))
  }

  /** The TTL idiom on the same API (wall-clock rate limiting — "at
    * most `quota` per rolling TTL horizon per key"): the count lives
    * in a ValueState whose TTL IS the reset mechanism — no timers, no
    * window bookkeeping; an idle key's state simply expires and the
    * next event starts fresh. This is the form for wall-clock
    * admission control (API gateways, crawl politeness); it trades
    * the deterministic replay of [[QuotaProcessor]] for zero cleanup
    * logic — which is exactly why the deterministic, oracle-gated e24
    * uses timers instead. TTL state REQUIRES TimeMode.ProcessingTime
    * (engine-enforced), and a ProcessingTime-mode TWS operator asks
    * the engine for another micro-batch unconditionally (its
    * wall-clock work could always be due) — so drive this query with
    * Trigger.Once/periodic triggers, never
    * processAllAvailable/AvailableNow, which would spin on the
    * operator's standing another-batch request (StreamingSpec pins
    * the behavior through Trigger.Once restarts).
    */
  class RateLimiter(quota: Int, ttl: java.time.Duration)
      extends StatefulProcessor[Long, QEv, QOut] {
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig(ttl))

    override def handleInputRows(userId: Long, rows: Iterator[QEv],
        timerValues: TimerValues): Iterator[QOut] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      sorted.iterator.map { e =>
        val cur = if (n.exists()) n.get() else 0L
        n.update(cur + 1)
        QOut("decision", userId, new Timestamp(0L), e.event_id,
          cur < quota, -1L, -1L)
      }
    }
  }

  def rateLimitStream(events: Dataset[QEv], quota: Int,
      ttl: java.time.Duration): Dataset[QOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RateLimiter(quota, ttl),
        TimeMode.ProcessingTime, OutputMode.Append)
  }
}
