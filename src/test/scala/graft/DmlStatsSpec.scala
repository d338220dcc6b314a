package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Per-commit DML statistics (reference DML results: `merge_insert` returns
  * num_inserted/updated/deleted rows, `update` returns rows_updated —
  * `python/python/lance/dataset.py:91-138,2046`). Stamped into the manifest
  * commit from metadata the commit already holds, surfaced through the SQL
  * command results and `CALL g.system.history`.
  */
class DmlStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def fresh(): String =
    Files.createTempDirectory("graft_dmlstats_").toString + "/t"

  private def seed(t: String): Unit =
    GraftTable.write(spark.range(0, 100).toDF("id")
      .withColumn("v", col("id") * 2), t, "overwrite")

  test("delete stamps num_deleted_rows; no-op delete reports 0") {
    val t = fresh(); seed(t)
    val m = GraftTable.delete(spark, t, "id < 10")
    assert(m.opStats == Map("num_deleted_rows" -> 10L))
    val noop = GraftTable.delete(spark, t, "id = -1")
    assert(noop.opStats == Map("num_deleted_rows" -> 0L))
    // delete-all fast path reports the live-row count it dropped
    val all = GraftTable.delete(spark, t, "true")
    assert(all.opStats == Map("num_deleted_rows" -> 90L))
  }

  test("update stamps num_updated_rows") {
    val t = fresh(); seed(t)
    val m = GraftTable.update(spark, t, Map("v" -> "v + 1"), Some("id % 4 = 0"))
    assert(m.opStats == Map("num_updated_rows" -> 25L))
  }

  test("merge stamps all three counts (update + insert + by-source delete)") {
    val t = fresh(); seed(t)
    val src = spark.range(90, 120).toDF("id").withColumn("v", lit(-1L))
    val m = GraftTable.mergeInsert(spark, t, src, Seq("id"),
      whenNotMatchedBySourceDelete = true, deleteCondition = Some("id < 5"))
    assert(m.opStats == Map("num_updated_rows" -> 10L,
      "num_inserted_rows" -> 20L, "num_deleted_rows" -> 5L))
  }

  test("a later commit never inherits the previous commit's stats") {
    val t = fresh(); seed(t)
    GraftTable.delete(spark, t, "id < 10")
    val m = GraftTable.write(spark.range(100, 110).toDF("id")
      .withColumn("v", col("id") * 2), t, "append")
    assert(!m.opStats.contains("num_deleted_rows"), m.opStats.toString)
    // the append stamps its own stat instead
    assert(m.opStats == Map("num_inserted_rows" -> 10L))
    // and the persisted delete commit keeps its own stats for history
    val deleted = GraftTable.loadManifest(spark, t, Some(m.version - 1))
    assert(deleted.opStats == Map("num_deleted_rows" -> 10L))
  }

  test("commit message and txn properties stamp one commit, surface in manifest") {
    val t = fresh(); seed(t)
    GraftTable.write(spark.range(100, 110).toDF("id")
      .withColumn("v", col("id") * 2), t, "append",
      commitMessage = Some("nightly batch 42"),
      txnProperties = Map("job" -> "j-7"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.txnProperties == Map("message" -> "nightly batch 42", "job" -> "j-7"))
    // the NEXT commit does not inherit the annotations
    GraftTable.delete(spark, t, "id = 0")
    assert(GraftTable.loadManifest(spark, t).txnProperties.isEmpty)
    // the annotated commit keeps them for history
    assert(GraftTable.loadManifest(spark, t, Some(m.version)).txnProperties
      .get("job").contains("j-7"))
  }

  test("graft.write.rows.per.fragment splits an oversized partition") {
    val t = fresh()
    GraftTable.write(spark.range(0, 10).toDF("id").withColumn("v", col("id")),
      t, "overwrite",
      configUpdates = Map(GraftTable.MaxRowsPerFragmentKey -> "100"))
    GraftTable.write(spark.range(1000, 2000).toDF("id")
      .withColumn("v", col("id")).coalesce(1), t, "append")
    val m = GraftTable.loadManifest(spark, t)
    val appended = m.fragments.filter(_.addedVersion == m.version)
    assert(appended.size >= 10 && appended.forall(_.rows <= 100),
      s"1000-row partition must split at 100 rows/fragment: " +
        appended.map(_.rows).mkString(","))
    assert(GraftTable.read(spark, t).count() == 1010)
  }

  test("compaction stamps CompactionMetrics-style rewrite stats") {
    val t = fresh(); seed(t)
    GraftTable.delete(spark, t, "id < 10")
    val before = GraftTable.loadManifest(spark, t).fragments.size.toLong
    val m = GraftTable.compact(spark, t)
    assert(m.opStats("rows_materialized_deleted") == 10L)
    assert(m.opStats("fragments_removed") == before)
    assert(m.opStats("fragments_added") >= 1L)
    // CALL g.system.history surfaces them as k=v pairs
    assert(m.opStats.keySet ==
      Set("fragments_removed", "fragments_added", "rows_materialized_deleted"))
  }
}
