package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Config-driven post-commit auto-cleanup (reference `auto_cleanup_hook`,
  * `rust/lance/src/dataset/cleanup.rs:554`; enabled/disabled via table
  * config like `enable_auto_cleanup` / `disable_auto_cleanup`,
  * `python/python/lance/dataset.py`). */
class AutoCleanupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_autoclean_").toString + "/t"

  private def df(i: Int) = Seq((i.toLong, s"row$i")).toDF("id", "v")

  test("interval-gated cleanup prunes old versions on commit") {
    val t = tmp()
    GraftTable.write(df(1), t, "overwrite", configUpdates = Map(
      GraftTable.AutoCleanupIntervalKey -> "3",
      GraftTable.AutoCleanupKeepKey -> "2"))                   // v1
    (2 to 9).foreach(i => GraftTable.write(df(i), t, "append")) // v2..v9
    // v9 is a multiple of 3 → hook fired with keep_last=2: only v8, v9 left
    assert(GraftTable.versions(spark, t) == Seq(8L, 9L))
    // latest content complete (data files referenced by survivors kept)
    assert(GraftTable.read(spark, t).count() == 9L)
    // pruned version is gone
    intercept[Exception] { GraftTable.read(spark, t, version = Some(3L)).count() }
  }

  test("tagged versions survive auto-cleanup") {
    val t = tmp()
    GraftTable.write(df(1), t, "overwrite", configUpdates = Map(
      GraftTable.AutoCleanupIntervalKey -> "4",
      GraftTable.AutoCleanupKeepKey -> "1"))                   // v1
    GraftTable.write(df(2), t, "append")                       // v2
    GraftTable.tag(spark, t, "keepme", 2L)
    (3 to 8).foreach(i => GraftTable.write(df(i), t, "append")) // v3..v8
    val vs = GraftTable.versions(spark, t)
    assert(vs.contains(2L), s"tagged v2 must survive, got $vs")
    assert(vs.contains(8L))
    assert(!vs.contains(5L))
    assert(GraftTable.read(spark, t, version = Some(2L)).count() == 2L)
  }

  test("cleanup spares young unverified files (a concurrent writer's stage)") {
    val t = tmp()
    GraftTable.write(df(1), t, "overwrite")                  // v1
    GraftTable.write(df(2), t, "append")                     // v2
    GraftTable.write(df(3), t, "append")                     // v3
    // simulate another writer's staged-but-uncommitted fragment: a parquet
    // file under data/ that no manifest references
    val staged = new java.io.File(t, "data/txn-inflight")
    staged.mkdirs()
    df(99).coalesce(1).write.mode("overwrite")
      .parquet(staged.getAbsolutePath + "/part")
    def inflight(): Boolean = new java.io.File(staged, "part").exists()
    assert(inflight())
    GraftTable.cleanupOldVersions(spark, t, keepLast = 1) // default 7d grace
    assert(inflight(), "young unreferenced files survive the sweep")
    assert(GraftTable.versions(spark, t) == Seq(3L))
    assert(GraftTable.read(spark, t).count() == 3L)
    // with the grace forced to zero the unverified file is reclaimed
    GraftTable.write(df(4), t, "append")
    GraftTable.cleanupOldVersions(spark, t, keepLast = 1, unverifiedGraceMillis = 0L)
    assert(!inflight(), "aged-out unverified files are reclaimed")
  }

  test("streaming ingest with auto-cleanup keeps version history bounded") {
    val t = tmp()
    GraftTable.write(df(0), t, "overwrite", configUpdates = Map(
      GraftTable.AutoCleanupIntervalKey -> "5",
      GraftTable.AutoCleanupKeepKey -> "3"))                 // v1
    (1 to 20).foreach(i =>
      graft.streaming.GraftStreaming.commitBatch(t, df(i), i.toLong, "ingest"))
    val vs = GraftTable.versions(spark, t)
    assert(vs.length < 10, s"history bounded under continuous ingest: $vs")
    assert(GraftTable.read(spark, t).count() == 21L, "no data lost")
    // the exactly-once batch high-water mark rides config and survives
    graft.streaming.GraftStreaming.commitBatch(t, df(99), 5L, "ingest") // replay
    assert(GraftTable.read(spark, t).count() == 21L, "replayed batch skipped")
  }

  test("removing the config key disables the hook (delete_config_keys)") {
    val t = tmp()
    GraftTable.write(df(1), t, "overwrite", configUpdates = Map(
      GraftTable.AutoCleanupIntervalKey -> "2",
      GraftTable.AutoCleanupKeepKey -> "1"))                   // v1
    GraftTable.updateConfig(spark, t, Map.empty,
      remove = Seq(GraftTable.AutoCleanupIntervalKey))         // v2: key gone
    (3 to 6).foreach(i => GraftTable.write(df(i - 1), t, "append")) // v3..v6
    assert(GraftTable.versions(spark, t) == (1L to 6L),
      "no cleanup once the interval key is removed")
  }
}
