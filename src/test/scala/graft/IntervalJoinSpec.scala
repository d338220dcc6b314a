package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IntervalJoin

/** Binned interval join: leveled equi-join formulation proven equivalent
  * to the naive range join, exactly-once (no dedup stage needed), with
  * degenerate outlier intervals routed to coarser bin levels. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("keyed containment join == naive range join (randomized, with outliers)") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 3000).map { i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(1000000).toLong)
    }.toDF("pt_id", "k", "pt")
    val ivs = ((0 until 300).map { i =>
      val s = rnd.nextInt(1000000).toLong
      (i.toLong, rnd.nextInt(10).toLong, s, s + rnd.nextInt(500))
    } ++ Seq(
      // a corpus-spanning outlier: at fine width 100 it covers 10000
      // fine bins > binsCap, forcing the coarse level-1 leg
      (300L, 3L, 0L, 999999L),
      // empty interval (end < start): dropped
      (301L, 4L, 10L, 5L),
      // zero-length interval
      (302L, 5L, 777L, 777L)
    )).toDF("iv_id", "k", "s", "e")

    val got = IntervalJoin.intervalJoin(pts, ivs, "pt", "s", "e", Seq("k"),
        binWidthMicros = 100L)
      .select($"pt_id", $"iv_id").as[(Long, Long)].collect().toSeq
    val want = pts.join(ivs, pts("k") === ivs("k") &&
        pts("pt") >= ivs("s") && pts("pt") <= ivs("e"))
      .select($"pt_id", $"iv_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted == want.sorted,
      s"got ${got.length} pairs want ${want.length}")
    // exactly-once: no dedup stage, so duplicates would surface here
    assert(got.distinct.length == got.length, "pairs must appear exactly once")
  }

  test("keyless (pure range) join and auto width match the naive join") {
    val pts = (0 until 500).map(i => (i.toLong, i * 7L % 10000)).toDF("pt_id", "pt")
    val rnd = new scala.util.Random(3)
    val ivs = (0 until 80).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, s, s + rnd.nextInt(200))
    }.toDF("iv_id", "s", "e")
    val got = IntervalJoin.intervalJoin(pts, ivs, "pt", "s", "e")
      .select($"pt_id", $"iv_id").as[(Long, Long)].collect().toSeq.sorted
    val want = pts.join(ivs, pts("pt") >= ivs("s") && pts("pt") <= ivs("e"))
      .select($"pt_id", $"iv_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == want, s"got ${got.length} want ${want.length}")
  }

  test("timestamp columns bin on micros; colliding right names get the suffix") {
    val pts = Seq((1L, ts(100)), (2L, ts(250)), (3L, ts(900)))
      .toDF("id", "ts")
    val ivs = Seq((10L, ts(90), ts(120)), (11L, ts(200), ts(300)))
      .toDF("id", "ws", "we")
    val out = IntervalJoin.intervalJoin(pts, ivs, "ts", "ws", "we")
    assert(out.columns.contains("id_r"), out.columns.mkString(","))
    val got = out.select($"id", $"id_r").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)), got.toString)
  }

  test("overlap join == naive overlap join, exactly-once (randomized)") {
    val rnd = new scala.util.Random(23)
    val lhs = (0 until 400).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, rnd.nextInt(6).toLong, s, s + rnd.nextInt(800))
    }.toDF("l_id", "k", "ls", "le")
    val rhs = ((0 until 300).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, rnd.nextInt(6).toLong, s, s + rnd.nextInt(500))
    } ++ Seq(
      // a corpus-spanning outlier interval on EACH side: both stay
      // bounded because only interval sides replicate, never points
      (300L, 2L, 0L, 99999L)
    )).toDF("r_id", "k", "s", "e")
    val got = IntervalJoin.overlapJoin(lhs, rhs, "ls", "le", "s", "e",
        Seq("k"), binWidthMicros = 200L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSeq
    val want = lhs.join(rhs, lhs("k") === rhs("k") &&
        lhs("ls") <= rhs("e") && rhs("s") <= lhs("le"))
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted == want.sorted,
      s"got ${got.length} pairs want ${want.length}")
    assert(got.distinct.length == got.length, "pairs must appear exactly once")
  }

  test("the plan is an equi-join — never a nested-loop / cartesian product") {
    val pts = Seq((1L, 1L, 100L)).toDF("pt_id", "k", "pt")
    val ivs = Seq((10L, 1L, 90L, 120L)).toDF("iv_id", "k", "s", "e")
    val plan = IntervalJoin.intervalJoin(pts, ivs, "pt", "s", "e", Seq("k"),
        binWidthMicros = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must stay an equi-join:\n$plan")
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
}
