package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

/** Gap-based sessionization: one key-partitioned window; proven
  * equivalent to Spark's native `session_window` aggregate. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ev = Seq(
    // user 1: two sessions (gap 100s splits at t=400)
    (1L, 0L), (1L, 50L), (1L, 90L), (1L, 400L), (1L, 450L),
    // user 2: one session
    (2L, 10L), (2L, 20L),
    // user 3: singleton
    (3L, 1000L)
  ).map { case (u, t) => (u, new java.sql.Timestamp(t * 1000L)) }
    .toDF("user_id", "ts")

  test("assignSessions labels events with dense per-key session indexes") {
    val got = Sessionize.assignSessions(ev, Seq("user_id"), "ts", 100L)
      .select($"user_id", unix_micros($"ts") / 1000000L, $"session_idx")
      .as[(Long, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, 0.0, 1L), (1L, 50.0, 1L), (1L, 90.0, 1L),
      (1L, 400.0, 2L), (1L, 450.0, 2L),
      (2L, 10.0, 1L), (2L, 20.0, 1L),
      (3L, 1000.0, 1L)), got.toString)
  }

  test("sessions == Spark's native session_window aggregate (randomized)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      (rnd.nextInt(20).toLong, new java.sql.Timestamp(rnd.nextInt(100000) * 1000L), i)
    }
    val df = rows.toDF("user_id", "ts", "event_id")
      // session_window semantics collapse duplicate timestamps; keep ties
      // out of the generator's way by deduping (key, ts)
      .dropDuplicates("user_id", "ts")
    val gap = 120L
    val ours = Sessionize.sessions(df, Seq("user_id"), "ts", gap)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    val native = df.groupBy($"user_id", session_window($"ts", s"$gap seconds"))
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(ours == native,
      s"diff: ${(ours diff native).take(3)} / ${(native diff ours).take(3)}")
  }

  test("the window is key-partitioned — no single-partition stage") {
    val plan = Sessionize.assignSessions(ev, Seq("user_id"), "ts", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"sessionize must never move the corpus to one partition:\n$plan")
  }
}
