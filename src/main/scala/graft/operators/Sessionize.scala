package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: label every event with a per-key session
  * index, where a new session starts when the gap to the previous event
  * of the same key exceeds `gapSeconds` — the standard web/clickstream
  * session definition, and the batch twin of Structured Streaming's
  * `session_window` (whose aggregate output SessionizeSpec proves this
  * labeling reproduces exactly).
  *
  * Unlike `groupBy(session_window(...))` this keeps the EVENT rows,
  * labeled — the shape a training pipeline needs to carry session
  * features onto examples (session length, position-in-session, ...).
  *
  * Shape: one window partitioned by the keys, ordered by (ts, tiebreak):
  * `lag` flags session starts, a running sum over the same window turns
  * flags into a dense per-key session index. ONE shuffle keyed by the
  * session keys; both windows are key-partitioned (never a
  * single-partition stage), and per-key row counts bound every window
  * buffer — the same plan at any corpus size.
  */
object Sessionize {

  /** Adds `session_idx` (1-based, dense per key). `tiebreak` makes the
    * ordering total when two events share a timestamp. */
  def assignSessions(df: DataFrame, keys: Seq[String], tsCol: String,
                     gapSeconds: Long, tiebreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gapSeconds > 0, "session gap must be positive")
    val order = (col(tsCol) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    // NTZ pins to UTC (see TimeMicros): the session zone is not a fixed
    // offset under DST, and gap arithmetic needs monotonicity
    def micros(c: org.apache.spark.sql.Column) =
      TimeMicros.micros(c, df.schema(tsCol).dataType)
    val newSession = when(prev.isNull
        .or(micros(col(tsCol)) - micros(prev) > gapSeconds * 1000000L),
      1L).otherwise(0L)
    df.withColumn("session_idx", sum(newSession).over(run))
  }

  /** Per-session aggregate view: (keys..., session_idx, session_start,
    * session_end, n_events) — the `session_window` equivalent, derived
    * from the labeling so both surfaces agree by construction. */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String,
               gapSeconds: Long, tiebreak: Seq[String] = Nil): DataFrame =
    assignSessions(df, keys, tsCol, gapSeconds, tiebreak)
      .groupBy((keys :+ "session_idx").map(col): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
