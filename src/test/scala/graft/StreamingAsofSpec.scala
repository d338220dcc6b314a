package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.GraftStreaming

/** Streaming AS-OF join: lefts emit once the watermark passes them,
  * matched to the latest prior-or-equal right; right history prunes to
  * the latest-at-watermark; results equal batch AsofJoin on the closed
  * slice. */
class StreamingAsofSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("watermark-final emission matches batch AsofJoin; nulls when no prior right") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Timestamp)] // (click_id, user_id, ts)
    val rMem = MemoryStream[(Long, Timestamp, Double)] // (user_id, ts, price)
    val out = GraftStreaming.asofJoinStream(
      lMem.toDF().toDF("click_id", "user_id", "ts"),
      rMem.toDF().toDF("user_id", "ts", "price"),
      Seq("user_id"), "ts", "ts", Seq("price"), watermarkDelay = "100 seconds")
    val q = out.writeStream.format("memory")
      .queryName("asof_out").outputMode("append").start()
    try {
      // rights at t=10 (price 1.0) and t=50 (price 2.0); lefts at 5, 30, 60
      // the two sources land in separate micro-batches; the 100 s
      // lateness bound keeps the lefts on time while the rights' batch
      // advances the watermark
      rMem.addData((1L, ts(10), 1.0), (1L, ts(50), 2.0))
      lMem.addData((100L, 1L, ts(5)), (101L, 1L, ts(30)), (102L, 1L, ts(60)))
      q.processAllAvailable()
      // watermark (max 60s - 100s delay) still at epoch → nothing final yet
      assert(spark.table("asof_out").isEmpty)
      // advance the watermark past every buffered left (both sides feed
      // the union watermark; push both so min(watermarks) advances)
      lMem.addData((999L, 9L, ts(1000)))
      rMem.addData((9L, ts(1000), 0.0))
      q.processAllAvailable()
      lMem.addData((998L, 9L, ts(2000)))
      rMem.addData((9L, ts(2000), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .filter($"user_id" === 1L)
        .select($"click_id", $"price")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      // t=5: no prior right → null; t=30: right@10; t=60: right@50
      assert(got == Map(100L -> null, 101L -> 1.0, 102L -> 2.0), got.toString)
      // batch twin agrees on the same closed slice
      val lB = Seq((100L, 1L, ts(5)), (101L, 1L, ts(30)), (102L, 1L, ts(60)))
        .toDF("click_id", "user_id", "ts")
      val rB = Seq((1L, ts(10), 1.0), (1L, ts(50), 2.0))
        .toDF("user_id", "ts", "price")
      val batch = graft.operators.AsofJoin.asofJoin(lB, rB, Seq("user_id"),
          "ts", "ts", Seq("price"), suffix = "")
        .select($"click_id", $"price")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(batch == got.view.filterKeys(_ < 999L).toMap, s"batch=$batch got=$got")
    } finally q.stop()
  }

  test("right history prunes but the latest-at-watermark right still matches") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Timestamp)]
    val rMem = MemoryStream[(Long, Timestamp, Double)]
    val out = GraftStreaming.asofJoinStream(
      lMem.toDF().toDF("click_id", "user_id", "ts"),
      rMem.toDF().toDF("user_id", "ts", "price"),
      Seq("user_id"), "ts", "ts", Seq("price"), watermarkDelay = "100 seconds")
    val q = out.writeStream.format("memory")
      .queryName("asof_prune_out").outputMode("append").start()
    try {
      // right far in the past; watermark advances far beyond it before
      // any left arrives — the pruned history must keep that right
      rMem.addData((1L, ts(10), 7.0))
      lMem.addData((999L, 9L, ts(5000)))
      rMem.addData((9L, ts(5000), 0.0))
      q.processAllAvailable()
      lMem.addData((100L, 1L, ts(6000))) // left after the watermark jump
      rMem.addData((9L, ts(8000), 0.0))
      lMem.addData((998L, 9L, ts(8000)))
      q.processAllAvailable()
      rMem.addData((9L, ts(9000), 0.0))
      lMem.addData((997L, 9L, ts(9000)))
      q.processAllAvailable()
      val got = spark.table("asof_prune_out")
        .filter($"user_id" === 1L).select($"click_id", $"price")
        .as[(Long, Double)].collect().toSet
      assert(got == Set((100L, 7.0)),
        s"latest right below the watermark must survive pruning: $got")
    } finally q.stop()
  }
}
