package graft.suite

import org.apache.spark.sql.functions._

import graft.streaming.Sessions
import Registry.tbl

/** Streaming extension suite. The session_window query runs the exact
  * code path shared with readStream (see graft.streaming.Sessions and
  * SessionsSpec, which proves batch == streaming on the same input); the
  * oracle reproduces Spark's session-merge semantics in exact
  * microseconds: a new event at >= gap after the previous one starts a
  * new session, session end = last event + gap.
  */
object StreamingQueries {

  private val GapUs = 900000000L // 15 min

  def all: Seq[QDef] = Seq(

    QDef(
      "stream_session_window",
      (s, dir) =>
        Sessions.sessionize(tbl(s, dir, "events"), "15 minutes")
          .select(col("user_id"),
            col("session_start"), col("session_end"), col("n_events"))
          .orderBy("user_id", "session_start"),
      Some(s"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        b AS (SELECT user_id, us,
          CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= $GapUs
               THEN 1 ELSE 0 END AS brk FROM e),
        g AS (SELECT user_id, us,
          sum(brk) OVER (PARTITION BY user_id ORDER BY us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b)
        SELECT user_id,
               min(us) // 1000000 AS session_start,
               (max(us) + $GapUs) // 1000000 AS session_end,
               count(*) AS n_events
        FROM g GROUP BY user_id, sid ORDER BY user_id, session_start"""))
  )
}
