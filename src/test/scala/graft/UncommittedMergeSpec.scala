package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Two-phase merge (reference `MergeInsertBuilder.execute_uncommitted` +
  * `LanceDataset.commit`, Python `dataset.py:113-135`): stage the expensive
  * merge work, commit separately — nothing visible in between, conflicts
  * surface at commit.
  */
class UncommittedMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_umerge_").toString + "/t"

  private def seed(t: String): Unit =
    GraftTable.write(spark.range(0, 100).toDF("id")
      .withColumn("v", col("id") * 10), t, "overwrite")

  test("staged merge is invisible until commit; stats stamped at stage time") {
    val t = fresh(); seed(t)
    val src = spark.range(90, 110).toDF("id").withColumn("v", lit(-1L))
    val st = GraftTable.mergeInsertUncommitted(spark, t, src, Seq("id"))
    // the reference returns (transaction, stats) — same numbers here
    assert(st.stats == Map("num_updated_rows" -> 10L,
      "num_inserted_rows" -> 10L, "num_deleted_rows" -> 0L), st.stats.toString)
    // NOTHING visible before commit
    assert(GraftTable.read(spark, t).count() == 100L)
    assert(GraftTable.read(spark, t).filter(col("v") === -1L).count() == 0L)
    val m = GraftTable.commitMerge(spark, t, st)
    assert(m.opStats("num_updated_rows") == 10L)
    assert(m.opStats("num_inserted_rows") == 10L)
    val got = GraftTable.read(spark, t)
    assert(got.count() == 110L)
    assert(got.filter(col("v") === -1L).count() == 20L)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("commit over a conflicting concurrent delete aborts — no hidden re-read") {
    val t = fresh(); seed(t)
    val src = spark.range(0, 5).toDF("id").withColumn("v", lit(-1L))
    val st = GraftTable.mergeInsertUncommitted(spark, t, src, Seq("id"))
    // a concurrent delete removes a row the staged merge updates
    GraftTable.delete(spark, t, "id = 3")
    val e = intercept[IllegalStateException] {
      GraftTable.commitMerge(spark, t, st)
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // the table shows only the delete; the stale transaction landed nothing
    assert(GraftTable.read(spark, t).count() == 99L)
    assert(GraftTable.read(spark, t).filter(col("v") === -1L).count() == 0L)
    // caller re-stages against the fresh snapshot and commits cleanly
    val st2 = GraftTable.mergeInsertUncommitted(spark, t, src, Seq("id"))
    assert(st2.stats("num_updated_rows") == 4L && st2.stats("num_inserted_rows") == 1L)
    GraftTable.commitMerge(spark, t, st2)
    assert(GraftTable.read(spark, t).filter(col("v") === -1L).count() == 5L)
    assert(GraftTable.countRows(spark, t) == 100L)
  }

  test("double commit of one staged merge is rejected with a clear error") {
    val t = fresh(); seed(t)
    val st = GraftTable.mergeInsertUncommitted(spark, t,
      spark.range(0, 3).toDF("id").withColumn("v", lit(-1L)), Seq("id"))
    GraftTable.commitMerge(spark, t, st)
    val e = intercept[IllegalArgumentException] {
      GraftTable.commitMerge(spark, t, st)
    }
    assert(e.getMessage.contains("already committed"), e.getMessage)
    assert(GraftTable.countRows(spark, t) == 100L)
  }

  test("a CAS-race retry that aborts leaves the staged merge re-invocable with a clear error") {
    val t = fresh(); seed(t)
    val src = spark.range(0, 5).toDF("id").withColumn("v", lit(-1L))
    val st = GraftTable.mergeInsertUncommitted(spark, t, src, Seq("id"))
    // between attempt 1's staged-file renames and its CAS, a concurrent
    // delete contests a row the merge updates: attempt 1 loses the CAS,
    // attempt 2 aborts in conflict resolution — AFTER the renames stood
    @volatile var fired = false
    GraftTable.DmlTestHooks.beforeCas = { _ =>
      if (!fired) { fired = true; GraftTable.delete(spark, t, "id = 3") }
    }
    try {
      val e = intercept[IllegalStateException](GraftTable.commitMerge(spark, t, st))
      assert(e.getMessage.contains("conflict"), e.getMessage)
    } finally GraftTable.DmlTestHooks.beforeCas = _ => ()
    // the failed attempt renamed the staged files into fragment names; a
    // permitted re-invocation must pick up the CURRENT paths and fail with
    // the same clear conflict error — not a rename/FileNotFound crash on
    // the original staged names
    val e2 = intercept[IllegalStateException](GraftTable.commitMerge(spark, t, st))
    assert(e2.getMessage.contains("conflict"), e2.getMessage)
    // the table shows only the delete; the contested merge landed nothing
    assert(GraftTable.countRows(spark, t) == 99L)
    assert(GraftTable.read(spark, t).filter(col("v") === -1L).count() == 0L)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("a concurrent append composes: commit lands over the newer base") {
    val t = fresh(); seed(t)
    val src = spark.range(50, 55).toDF("id").withColumn("v", lit(-7L))
    val st = GraftTable.mergeInsertUncommitted(spark, t, src, Seq("id"))
    GraftTable.write(spark.range(500, 510).toDF("id")
      .withColumn("v", col("id")), t, "append")
    GraftTable.commitMerge(spark, t, st)
    val got = GraftTable.read(spark, t)
    assert(got.count() == 110L)
    assert(got.filter(col("v") === -7L).count() == 5L)
    assert(GraftTable.validate(spark, t).isEmpty)
  }
}
