package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.GraftStreaming

/** Streaming sessionization: native session_window + watermark; sessions
  * emit once the watermark passes their close, late-but-in-bound events
  * extend open sessions, and closed sessions equal the batch operator's. */
class StreamingSessionizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions close at the watermark and match batch Sessionize") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = GraftStreaming.sessionizeStream(
      mem.toDF().toDF("user_id", "ts"), Seq("user_id"), "ts",
      gapSeconds = 100L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(50)), (2L, ts(10)))
      q.processAllAvailable()
      // a later event still inside user 1's gap EXTENDS the open session
      mem.addData((1L, ts(120)))
      q.processAllAvailable()
      // user 1's session is still open (close = 220 > watermark 120);
      // user 2's [10,10] may already have emitted (close 110 < 120)
      assert(spark.table("sessions_out")
        .filter($"user_id" === 1L).isEmpty)
      // jump the watermark far ahead: both sessions close and emit
      mem.addData((3L, ts(10000)))
      q.processAllAvailable()
      mem.addData((3L, ts(20000)))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .select($"user_id", unix_micros($"session_start") / 1000000L,
          unix_micros($"session_end") / 1000000L, $"n_events")
        .as[(Long, Double, Double, Long)].collect().toSet
      assert(got == Set((1L, 0.0, 120.0, 3L), (2L, 10.0, 10.0, 1L),
        (3L, 10000.0, 10000.0, 1L)), got.toString)
      // the closed sessions equal the batch operator over the closed
      // events (user 3's t=20000 session is still open in the stream)
      val batch = operators.Sessionize.sessions(
        Seq((1L, ts(0)), (1L, ts(50)), (1L, ts(120)), (2L, ts(10)),
          (3L, ts(10000)))
          .toDF("user_id", "ts"), Seq("user_id"), "ts", 100L)
        .select($"user_id", unix_micros($"session_start") / 1000000L,
          unix_micros($"session_end") / 1000000L, $"n_events")
        .as[(Long, Double, Double, Long)].collect().toSet
      assert(batch == got, s"batch $batch vs stream $got")
    } finally q.stop()
  }
}
