package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IntervalJoin, Sessionize}

/** DST safety of the TimestampNTZ micros embedding (TimeMicros): the
  * temporal operators must produce IDENTICAL results whether the session
  * zone is UTC or a DST zone. The corpus straddles America/New_York's
  * 2024-11-03 fall-back (01:00–02:00 wall-clock repeats): under the old
  * session-zone cast, the NTZ→instant embedding was non-monotonic there —
  * a gap across the boundary shrank by an hour and bins misaligned.
  */
class TimeMicrosDstSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // NTZ wall-clock events around the 2024-11-03 02:00→01:00 fall-back.
  // Gaps (in wall-clock minutes): 40, 40, 50, 45 — all under an hour, so
  // a 3600s-gap sessionization must see ONE session per user; a
  // session-zone embedding in New_York stretches the 01:50→02:30 step to
  // +1h40m (DST ends) and splits it.
  private def ntzEvents: DataFrame = Seq(
    (1L, "2024-11-03T00:30:00", 1L),
    (1L, "2024-11-03T01:10:00", 2L),
    (1L, "2024-11-03T01:50:00", 3L),
    (1L, "2024-11-03T02:40:00", 4L),
    (1L, "2024-11-03T03:25:00", 5L),
    (2L, "2024-11-03T01:45:00", 6L),
    (2L, "2024-11-03T02:15:00", 7L),
    // user 3: wall times whose as-UTC instants land INSIDE New York's
    // repeated 01:00–02:00 EST hour (UTC 05:00–06:00 on 2024-11-03) —
    // the case where even a convert_timezone round-trip is ambiguous
    (3L, "2024-11-03T05:15:00", 8L),
    (3L, "2024-11-03T05:45:00", 9L)
  ).map { case (u, s, e) => (u, LocalDateTime.parse(s), e) }
    .toDF("user_id", "ts", "event_id")

  private def inZone[A](zone: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try body finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  private def sessionRows(zone: String): Set[(Long, Long, Long)] =
    inZone(zone) {
      Sessionize.sessions(ntzEvents, Seq("user_id"), "ts",
          gapSeconds = 3600L, tiebreak = Seq("event_id"))
        .select($"user_id", $"session_idx", $"n_events")
        .as[(Long, Long, Long)].collect().toSet
    }

  test("sessionize: one session per user, identical under NY and UTC") {
    val utc = sessionRows("UTC")
    val ny = sessionRows("America/New_York")
    assert(utc == ny, s"utc=$utc ny=$ny")
    assert(utc == Set((1L, 1L, 5L), (2L, 1L, 2L), (3L, 1L, 2L)), utc.toString)
  }

  private def intervalPairs(zone: String): Set[(Long, Long)] = inZone(zone) {
    val pts = ntzEvents.select($"event_id".as("pt_id"), $"user_id", $"ts")
    val ivs = ntzEvents
      .select($"event_id".as("iv_id"), $"user_id",
        $"ts".as("win_start"),
        ($"ts" + expr("INTERVAL 45 MINUTES")).as("win_end"))
    IntervalJoin.intervalJoin(pts, ivs, "ts", "win_start", "win_end",
        Seq("user_id"))
      .select($"pt_id", $"iv_id").as[(Long, Long)].collect().toSet
  }

  test("interval join: bin assignment identical under NY and UTC") {
    val utc = intervalPairs("UTC")
    val ny = intervalPairs("America/New_York")
    assert(utc == ny, s"utc=$utc ny=$ny")
    // wall-clock containment, computed by hand: every event is inside its
    // own 45-min window; 40-min successors are inside their predecessor's
    assert(utc == Set(
      (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L),
      (2L, 1L), (3L, 2L), (5L, 4L), (6L, 6L), (7L, 7L), (7L, 6L),
      (8L, 8L), (9L, 8L), (9L, 9L)), utc.toString)
  }

  private def overlapPairs(zone: String): Set[(Long, Long)] = inZone(zone) {
    val l = ntzEvents.select($"event_id".as("l_id"), $"user_id",
      $"ts".as("ls"), ($"ts" + expr("INTERVAL 30 MINUTES")).as("le"))
    val r = ntzEvents.select($"event_id".as("r_id"), $"user_id",
      $"ts".as("rs"), ($"ts" + expr("INTERVAL 30 MINUTES")).as("re"))
    IntervalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", Seq("user_id"))
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
  }

  test("overlap join: identical under NY and UTC") {
    val utc = overlapPairs("UTC")
    val ny = overlapPairs("America/New_York")
    assert(utc == ny, s"utc=$utc ny=$ny")
    // self-overlap always; 40-min-apart neighbours never (30-min spans);
    // user 2's pair is 30 min apart → boundary-touch overlap both ways
    assert(utc == Set(
      (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L),
      (6L, 6L), (7L, 7L), (6L, 7L), (7L, 6L),
      (8L, 8L), (9L, 9L), (8L, 9L), (9L, 8L)), utc.toString)
  }
}
