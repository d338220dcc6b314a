package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.GraftStreaming

/** Streaming point-in-interval join: Spark's native stream-stream
  * time-range join composed with the interval-width bound; results on
  * the closed slice equal batch IntervalJoin. */
class StreamingIntervalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("stream-stream interval join equals batch IntervalJoin on the closed slice") {
    implicit val sc = spark.sqlContext
    val pts = MemoryStream[(Long, Long, Timestamp)] // (click_id, user_id, ts)
    val ivs = MemoryStream[(Long, Long, Timestamp, Timestamp)] // (error_id, user_id, ws, we)
    val out = GraftStreaming.intervalJoinStream(
      pts.toDF().toDF("click_id", "user_id", "ts"),
      ivs.toDF().toDF("error_id", "user_id", "ws", "we"),
      "ts", "ws", "we", Seq("user_id"),
      maxIntervalWidth = "300 seconds", watermarkDelay = "60 seconds")
    val q = out.writeStream.format("memory")
      .queryName("ivj_out").outputMode("append").start()
    try {
      // windows: u1 [100, 400], u1 [350, 650]; u2 [100, 400]
      ivs.addData((10L, 1L, ts(100), ts(400)), (11L, 1L, ts(350), ts(650)),
        (12L, 2L, ts(100), ts(400)))
      // points: u1 at 90 (miss), 150 (iv10), 380 (iv10+iv11), 500 (iv11);
      // u2 at 200 (iv12); u3 at 200 (no interval)
      pts.addData((100L, 1L, ts(90)), (101L, 1L, ts(150)),
        (102L, 1L, ts(380)), (103L, 1L, ts(500)),
        (104L, 2L, ts(200)), (105L, 3L, ts(200)))
      q.processAllAvailable()
      // push the watermark far past every event on both streams
      pts.addData((999L, 9L, ts(100000)))
      ivs.addData((99L, 9L, ts(100000), ts(100001)))
      q.processAllAvailable()
      pts.addData((998L, 9L, ts(200000)))
      ivs.addData((98L, 9L, ts(200000), ts(200001)))
      q.processAllAvailable()
      val got = spark.table("ivj_out")
        .filter($"user_id" <= 3L)
        .select($"click_id", $"error_id").as[(Long, Long)].collect().toSet
      val exp = Set((101L, 10L), (102L, 10L), (102L, 11L), (103L, 11L),
        (104L, 12L))
      assert(got == exp, got.toString)
      // batch twin agrees
      val lB = Seq((100L, 1L, ts(90)), (101L, 1L, ts(150)),
        (102L, 1L, ts(380)), (103L, 1L, ts(500)), (104L, 2L, ts(200)),
        (105L, 3L, ts(200))).toDF("click_id", "user_id", "ts")
      val rB = Seq((10L, 1L, ts(100), ts(400)), (11L, 1L, ts(350), ts(650)),
        (12L, 2L, ts(100), ts(400))).toDF("error_id", "user_id", "ws", "we")
      val batch = graft.operators.IntervalJoin.intervalJoin(
          lB, rB, "ts", "ws", "we", Seq("user_id"))
        .select($"click_id", $"error_id").as[(Long, Long)].collect().toSet
      assert(batch == exp, batch.toString)
    } finally q.stop()
  }
}
