package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** AS-OF join: latest right row with ts ≤ (or <) the left row's ts per
  * key, via one key-partitioned window — never a range join. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 15L, "l3"), (3L, 5L, "l4")
  ).toDF("k", "ts", "lv")

  private def right = Seq(
    (1L, 10L, "r10"), (1L, 18L, "r18"), (2L, 1L, "r1"), (4L, 2L, "rX")
  ).toDF("k", "ts", "rv")

  test("inclusive bound: equal-ts right row matches; unmatched rows keep nulls") {
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .orderBy($"k", $"ts")
      .as[(Long, Long, String, Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, 10L, "l1", Some("r10")),
      (1L, 20L, "l2", Some("r18")),
      (2L, 15L, "l3", Some("r1")),
      (3L, 5L, "l4", None)), got.toString)
  }

  test("strict bound excludes the equal-ts right row") {
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("rv"),
        strict = true)
      .orderBy($"k", $"ts")
      .as[(Long, Long, String, Option[String])].collect().toSeq
    assert(got.head == ((1L, 10L, "l1", None)), got.toString)
    assert(got(1) == ((1L, 20L, "l2", Some("r18"))), got.toString)
  }

  test("same-(key, ts) right rows tie-break to the greatest payload, deterministically") {
    val r2 = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "ts", "rv")
    val l2 = Seq((1L, 11L, "l")).toDF("k", "ts", "lv")
    for (_ <- 0 until 3) {
      val got = AsofJoin.asofJoin(l2.repartition(5), r2.repartition(3),
          Seq("k"), "ts", "ts", Seq("rv"))
        .as[(Long, Long, String, Option[String])].head()
      assert(got == ((1L, 11L, "l", Some("b"))), got.toString)
    }
  }

  test("the plan is a key-partitioned window — no single-partition stage") {
    val df = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("rv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"asof join must never move the corpus to one partition:\n$plan")
  }
}
