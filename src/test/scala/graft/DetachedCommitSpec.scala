package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.format.GraftTable

/** Detached commits (reference `commit(detached=True)`,
  * `commit_detached_transaction` `rust/lance/src/io/commit.rs:606-626`,
  * `DETACHED_VERSION_MASK` `lance-table/src/format/manifest.rs:107`,
  * Python `dataset.py:3066`): a manifest committed at a random
  * mask-bit version OUTSIDE the lineage — invisible to HEAD, versions,
  * history and time travel, checkout-able only by its returned handle,
  * its files protected from cleanup until the handle is dropped.
  */
class DetachedCommitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_detached_").toString + "/t"

  test("detached append: invisible to lineage, readable by handle") {
    val t = tmp()
    GraftTable.write((0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), t, "overwrite")
    val headV = GraftTable.loadManifest(spark, t).version

    val dv = GraftTable.writeDetached(
      (100L until 130L).map(i => (i, i * 2)).toDF("id", "v"), t)
    assert(GraftTable.isDetachedVersion(dv))

    // lineage untouched: HEAD version, row count, versions listing, history
    assert(GraftTable.loadManifest(spark, t).version == headV)
    assert(GraftTable.read(spark, t).count() == 100)
    assert(GraftTable.versions(spark, t).forall(!GraftTable.isDetachedVersion(_)))
    assert(GraftTable.detachedVersions(spark, t) == Seq(dv))

    // the handle serves base + detached rows
    val snap = GraftTable.read(spark, t, version = Some(dv))
    assert(snap.count() == 130)
    assert(snap.agg(sum("id")).head().getLong(0) == (0L until 130L).sum)

    // a LATER lineage append does not disturb the snapshot
    GraftTable.write(Seq((999L, 0L)).toDF("id", "v"), t, "append")
    assert(GraftTable.read(spark, t).count() == 101)
    assert(GraftTable.read(spark, t, version = Some(dv)).count() == 130)

    // time travel by timestamp never resolves to the detached version
    val asOf = GraftTable.versionAsOfTimestamp(spark, t, Long.MaxValue)
    assert(asOf.exists(v => !GraftTable.isDetachedVersion(v)))
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("cleanup keeps detached-referenced files; dropDetached releases them") {
    val t = tmp()
    GraftTable.write((0L until 50L).map(i => (i, i)).toDF("id", "v"), t, "overwrite")
    val dv = GraftTable.writeDetached(
      (50L until 60L).map(i => (i, i)).toDF("id", "v"), t)
    // churn lineage past the keep window so cleanup has something to drop
    (0 until 4).foreach(i =>
      GraftTable.write(Seq((1000L + i, 0L)).toDF("id", "v"), t, "append"))
    // zero grace: files referenced by NO surviving manifest are reclaimed
    // immediately — detached-only fragments must NOT be among them
    GraftTable.cleanupOldVersions(spark, t, keepLast = 2,
      unverifiedGraceMillis = 0L)
    assert(GraftTable.read(spark, t, version = Some(dv)).count() == 60,
      "cleanup deleted fragments a live detached snapshot references")

    GraftTable.dropDetached(spark, t, dv)
    assert(GraftTable.detachedVersions(spark, t).isEmpty)
    val stats = GraftTable.cleanupOldVersions(spark, t, keepLast = 2,
      unverifiedGraceMillis = 0L)
    assert(stats.filesRemoved > 0,
      "dropping the handle must make the detached-only fragments reclaimable")
    intercept[Exception] {
      GraftTable.read(spark, t, version = Some(dv)).count()
    }
    assert(GraftTable.read(spark, t).count() == 54)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("detached commit runs through the external-KV handler (object-store path)") {
    val t = tmp()
    GraftTable.write((0L until 20L).map(i => (i, i)).toDF("id", "v"), t, "overwrite")
    spark.conf.set(graft.format.CommitHandler.ConfKey, "kvmem:detached-spec")
    try {
      val dv = GraftTable.writeDetached(
        (20L until 25L).map(i => (i, i)).toDF("id", "v"), t)
      assert(GraftTable.isDetachedVersion(dv))
      assert(GraftTable.read(spark, t, version = Some(dv)).count() == 25)
      assert(GraftTable.read(spark, t).count() == 20)
      GraftTable.dropDetached(spark, t, dv) // also forgets the KV claim
      // the version handle is reusable after forget: a fresh detached
      // commit through the same KV must not be blocked by stale claims
      val dv2 = GraftTable.writeDetached(
        (25L until 30L).map(i => (i, i)).toDF("id", "v"), t)
      assert(GraftTable.read(spark, t, version = Some(dv2)).count() == 25)
    } finally spark.conf.unset(graft.format.CommitHandler.ConfKey)
  }

  test("guards: dropDetached refuses lineage versions; handle collision caveat") {
    val t = tmp()
    GraftTable.write(Seq((1L, 1L)).toDF("id", "v"), t, "overwrite")
    val e = intercept[IllegalArgumentException] {
      GraftTable.dropDetached(spark, t, 1L)
    }
    assert(e.getMessage.contains("not a detached version"))
  }
}
