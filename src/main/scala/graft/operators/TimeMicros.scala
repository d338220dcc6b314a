package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Shared micros embedding for the temporal operators (as-of, interval,
  * sessionize). Timestamps become epoch BIGINT micros; numerics cast.
  *
  * TimestampNTZ embeds ZONE-FREE (equivalently: pinned to UTC), never
  * via the session zone: a session zone with daylight-saving transitions
  * is not a fixed offset, so the naive `ntz.cast(timestamp)` embedding is
  * non-monotonic across a fall-back boundary (wall-clock times repeat) —
  * a session gap computed across it shrinks by an hour and a bin
  * assignment misaligns. Even a convert_timezone('UTC', session, ntz)
  * round-trip is unsafe: an instant rendering into the session zone's
  * repeated hour casts back ambiguously. So the embedding decomposes the
  * wall clock into fields that are zone-free on NTZ by definition —
  * `unix_date(date)` + `hour`/`minute` + `date_part('SECOND')` (a
  * Decimal(8,6) carrying the micros fraction) — and recombines them as
  * epoch micros. Pure codegen'd functions, exact, monotonic under any
  * session zone. TimeMicrosDstSpec proves gap/bin results identical
  * under America/New_York vs UTC across a DST fall-back corpus,
  * including instants landing in the repeated hour.
  */
object TimeMicros {

  /** Epoch-micros embedding of `c`, whose static type is `dt`. */
  def micros(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType =>
      unix_date(c.cast(org.apache.spark.sql.types.DateType)).cast("long") *
          86400000000L +
        hour(c).cast("long") * 3600000000L +
        minute(c).cast("long") * 60000000L +
        (date_part(lit("SECOND"), c) * lit(1000000L)).cast("long")
    case _ => c.cast("long")
  }
}
