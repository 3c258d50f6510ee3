package graft.queries

import graft.sources.Catalog
import graft.streaming.EventStream

/** SURVEY.md §2.E — event-stream operators, verified in their batch
  * form against DuckDB (identical semantics to the streaming forms,
  * which StreamingSpec exercises with MemoryStream + watermark /
  * flatMapGroupsWithState).
  */
object Streaming {

  private def q(name: String, oracle: String)(f: Catalog => org.apache.spark.sql.DataFrame): Q =
    Q(name, (s, dir) => f(Catalog(s, dir)), Some(oracle.stripMargin.trim))

  // e01 — tumbling 1-hour windows per event type
  val e01: Q = q("e01_event_windows",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
    EventStream.tumbling(c.events).orderBy("window_start", "event_type")
  }

  // e02 — 30-minute-gap sessionization
  val e02: Q = q("e02_sessionize",
    """WITH s AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq FROM s)
      |SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM t GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""") { c =>
    EventStream.sessionize(c.events).orderBy("user_id", "session_seq")
  }

  val all: Seq[Q] = Seq(e01, e02)
}
