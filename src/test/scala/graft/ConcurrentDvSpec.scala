package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** DV-level conflict resolution between concurrent DML commits (reference
  * `transaction.rs` conflict semantics): operations with disjoint row sets
  * compose; contested rows abort — and composing deletes never double-count
  * `numDeleted`, keeping the metadata `countRows` fast path exact.
  *
  * Races are made deterministic through `GraftTable.DmlTestHooks`: thread A
  * stages its DV under snapshot v, parks; the concurrent commit B lands;
  * A resumes into its commit loop over the newer base.
  */
class ConcurrentDvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def fresh(): String =
    Files.createTempDirectory("graft_dvrace_").toString + "/t"

  private def seed(t: String): Unit =
    GraftTable.write(spark.range(0, 100).toDF("id")
      .withColumn("v", col("id")), t, "overwrite")

  /** Run `staged` on a thread that parks at its pre-commit hook (first DML
    * of kind `op` only), run `concurrent` on this thread, release, join.
    * Returns the staged thread's failure, if any. */
  private def race(op: String)(staged: => Unit)(concurrent: => Unit): Option[Throwable] = {
    val parked = new CountDownLatch(1)
    val go = new CountDownLatch(1)
    val first = new AtomicBoolean(false)
    GraftTable.DmlTestHooks.beforeCommit = o =>
      if (o == op && first.compareAndSet(false, true)) {
        parked.countDown()
        go.await(60, TimeUnit.SECONDS)
      }
    try {
      @volatile var err: Option[Throwable] = None
      val th = new Thread(() =>
        try staged catch { case e: Throwable => err = Some(e) })
      th.start()
      assert(parked.await(60, TimeUnit.SECONDS), "staged DML never reached its hook")
      concurrent
      go.countDown()
      th.join(120000)
      assert(!th.isAlive, "staged DML did not finish")
      err
    } finally GraftTable.DmlTestHooks.beforeCommit = _ => ()
  }

  test("overlapping concurrent deletes compose without double-counting") {
    val t = fresh(); seed(t)
    val err = race("delete") {
      GraftTable.delete(spark, t, "id < 20")
    } {
      GraftTable.delete(spark, t, "id < 10")
    }
    assert(err.isEmpty, err.map(_.toString).getOrElse(""))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.numDeleted == 20L, s"ids 0..19 deleted once, numDeleted=${m.numDeleted}")
    assert(GraftTable.countRows(spark, t) == 80L)
    assert(GraftTable.read(spark, t).count() == 80L)
    // the racing delete reports only the rows IT removed (10 were already gone)
    assert(m.opStats == Map("num_deleted_rows" -> 10L))
    // composed DV files stay ADDRESS-DISJOINT (ADVICE r9): validate and
    // compaction count DV rows without distinct and rely on this
    val dv = spark.read.parquet(m.dvFiles.map(p => s"$t/$p"): _*)
    assert(dv.count() == dv.distinct().count(),
      "overlapping composed deletes committed duplicate DV addresses")
    assert(dv.count() == 20L)
    assert(GraftTable.validate(spark, t).isEmpty)
    // compaction over the composed DVs keeps the counts exact
    GraftTable.compact(spark, t)
    assert(GraftTable.countRows(spark, t) == 80L)
    assert(GraftTable.read(spark, t).count() == 80L)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("composed delete fully covered by a concurrent delete commits no DV") {
    val t = fresh(); seed(t)
    val dv0 = GraftTable.loadManifest(spark, t).dvFiles.size
    val err = race("delete") {
      GraftTable.delete(spark, t, "id < 10")
    } {
      GraftTable.delete(spark, t, "id < 10")
    }
    assert(err.isEmpty, err.map(_.toString).getOrElse(""))
    val m = GraftTable.loadManifest(spark, t)
    // every staged address was already masked — the remainder is empty, so
    // the racing delete appends NO DV file and counts nothing
    assert(m.dvFiles.size == dv0 + 1, s"expected one DV (the concurrent delete's), got ${m.dvFiles}")
    assert(m.numDeleted == 10L)
    assert(m.opStats == Map("num_deleted_rows" -> 0L))
    assert(GraftTable.countRows(spark, t) == 90L)
    assert(GraftTable.read(spark, t).count() == 90L)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("delete staged before a concurrent compaction aborts, never resurrects") {
    val t = fresh(); seed(t)
    val err = race("delete") {
      GraftTable.delete(spark, t, "id < 10")
    } {
      GraftTable.compact(spark, t)
    }
    assert(err.exists(_.getMessage.contains("conflict")), err.toString)
    // the staged DV addressed pre-compaction fragment ids — nothing committed
    assert(GraftTable.countRows(spark, t) == 100L)
    assert(GraftTable.read(spark, t).count() == 100L)
  }

  test("update contested by a concurrent delete aborts") {
    val t = fresh(); seed(t)
    val err = race("update") {
      GraftTable.update(spark, t, Map("v" -> "v + 1000"), Some("id = 5"))
    } {
      GraftTable.delete(spark, t, "id = 5")
    }
    assert(err.exists(_.getMessage.contains("conflict")), err.toString)
    // the concurrently-deleted row stays deleted — no resurrected copy
    assert(GraftTable.read(spark, t).filter(col("id") === 5).count() == 0L)
    assert(GraftTable.countRows(spark, t) == 99L)
  }

  test("delete contested by a concurrent update aborts") {
    val t = fresh(); seed(t)
    val err = race("delete") {
      GraftTable.delete(spark, t, "id = 7")
    } {
      GraftTable.update(spark, t, Map("v" -> "v + 1"), Some("id = 7"))
    }
    assert(err.exists(_.getMessage.contains("contested by a concurrent update")),
      err.toString)
    // the update's rewritten copy survives (the delete never saw it)
    val row = GraftTable.read(spark, t).filter(col("id") === 7).collect()
    assert(row.length == 1 && row(0).getLong(1) == 8L)
    assert(GraftTable.countRows(spark, t) == 100L)
  }

  test("merge contested by a concurrent delete re-stages and succeeds") {
    val t = fresh(); seed(t)
    val src = spark.range(5, 6).toDF("id").withColumn("v", lit(777L))
    val err = race("merge_insert") {
      GraftTable.mergeInsert(spark, t, src, Seq("id"))
    } {
      GraftTable.delete(spark, t, "id = 5")
    }
    // conflict_retries (reference default 10): the merge re-stages against
    // the post-delete snapshot — the matched-update becomes an insert
    assert(err.isEmpty, err.map(_.toString).getOrElse(""))
    val rows = GraftTable.read(spark, t).filter(col("id") === 5).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 777L)
    assert(GraftTable.countRows(spark, t) == 100L)
    assert(GraftTable.loadManifest(spark, t).opStats == Map(
      "num_updated_rows" -> 0L, "num_inserted_rows" -> 1L,
      "num_deleted_rows" -> 0L))
  }

  test("delete racing a concurrent delete+restore keeps its full DV (no lost delete)") {
    val t = fresh(); seed(t)
    val v0 = GraftTable.loadManifest(spark, t).version
    val err = race("delete") {
      GraftTable.delete(spark, t, "id < 10")
    } {
      // concurrent delete of the same rows, then restore rolls it back —
      // the rows are LIVE again at the staged delete's commit base, so its
      // DV must NOT be rewritten against the restored-away DV
      GraftTable.delete(spark, t, "id < 10")
      GraftTable.restore(spark, t, v0)
    }
    assert(err.isEmpty, err.map(_.toString).getOrElse(""))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.numDeleted == 10L, s"the staged delete must land in full: $m")
    assert(m.opStats == Map("num_deleted_rows" -> 10L))
    assert(GraftTable.countRows(spark, t) == 90L)
    assert(GraftTable.read(spark, t).filter(col("id") < 10).count() == 0L,
      "ids < 10 must be deleted — composing against a restored-away DV lost the delete")
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("merge retry_timeout bounds sustained conflict retries by wall-clock") {
    val t = fresh(); seed(t)
    val src = spark.range(0, 50).toDF("id").withColumn("v", lit(-5L))
    // every attempt, delete one more row the merge's staged DV covers —
    // sustained contention that an attempt-count bound alone rides out
    // with a full target re-read per retry
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    GraftTable.DmlTestHooks.beforeCommit = op =>
      if (op == "merge_insert")
        GraftTable.delete(spark, t, s"id = ${n.getAndIncrement()}")
    try {
      val e = intercept[IllegalStateException] {
        GraftTable.mergeInsert(spark, t, src, Seq("id"),
          conflictRetries = 100, retryTimeoutMs = 1L)
      }
      assert(e.getMessage.contains("retry_timeout"), e.getMessage)
      assert(n.get() < 100, s"deadline must abort long before the attempt bound (${n.get()})")
    } finally GraftTable.DmlTestHooks.beforeCommit = _ => ()
  }

  test("tighten-nullability racing a restore that resurrects a null aborts") {
    val t = fresh()
    val df = spark.range(0, 10).toDF("id")
      .withColumn("v", when(col("id") === 3, lit(null)).otherwise(col("id")))
    GraftTable.write(df, t, "overwrite")  // v1: a null at id=3
    GraftTable.delete(spark, t, "id = 3") // v2: the null row is DV-dead
    val err = race("alter_nullability") {
      GraftTable.alterNullability(spark, t, Map("v" -> false))
    } {
      GraftTable.restore(spark, t, 1L)    // same fragment ids, null resurrected
    }
    assert(err.exists(_.getMessage.contains("conflict")), err.toString)
    // the constraint must NOT be committed over the live null
    assert(GraftTable.loadManifest(spark, t).schema("v").nullable)
    assert(GraftTable.read(spark, t).filter(col("v").isNull).count() == 1L)
  }

  test("disjoint concurrent delete and update compose") {
    val t = fresh(); seed(t)
    val err = race("update") {
      GraftTable.update(spark, t, Map("v" -> "v + 1000"), Some("id = 50"))
    } {
      GraftTable.delete(spark, t, "id < 10")
    }
    assert(err.isEmpty, err.map(_.toString).getOrElse(""))
    val got = GraftTable.read(spark, t).filter(col("id") === 50).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1050L)
    assert(GraftTable.countRows(spark, t) == 90L)
    assert(GraftTable.read(spark, t).count() == 90L)
  }
}
