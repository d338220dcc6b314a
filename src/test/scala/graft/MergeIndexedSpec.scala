package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.index.ScalarIndex

/** Index-assisted merge_insert (reference `MergeInsertBuilder.use_index`,
  * `python/python/lance/dataset.py:223`): a single-key merge without a
  * by-source-delete clause reads only the fragments that can contain a
  * source key when a fresh BTREE index exists on the key.
  */
class MergeIndexedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def fresh(): String =
    Files.createTempDirectory("graft_merge_idx_").toString + "/t"

  /** 10 fragments × 100 rows, btree index on `id`. */
  private def seed(t: String): Unit = {
    for (i <- 0 until 10) {
      val df = spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("v", col("id") * 10)
      GraftTable.write(df.coalesce(1), t, if (i == 0) "overwrite" else "append")
    }
    ScalarIndex.buildBtree(spark, t, "id", s"$t/_indices")
  }

  private def sourceHitting2Fragments = spark.range(0, 5).toDF("id")
    .withColumn("v", col("id") * 10 + 1) // keys 0–4 (frag 0) …
    .union(spark.range(905, 910).toDF("id").withColumn("v", col("id") * 10 + 1))
    .union(spark.range(2000, 2005).toDF("id").withColumn("v", lit(-1L))) // inserts

  test("indexed merge scans only candidate fragments and matches full-scan result") {
    val t1 = fresh(); val t2 = fresh()
    seed(t1); seed(t2)
    val m = GraftTable.mergeInsert(spark, t1, sourceHitting2Fragments, Seq("id"))
    assert(m.opStats.contains("merge_index_fragments_scanned"), "pruned path must run")
    assert(m.opStats("merge_index_fragments_total") == 10L)
    assert(m.opStats("merge_index_fragments_scanned") == 2L,
      s"source keys live in 2 of 10 fragments; scanned ${m.opStats("merge_index_fragments_scanned")}")
    GraftTable.mergeInsert(spark, t2, sourceHitting2Fragments, Seq("id"), useIndex = false)
    val a = GraftTable.read(spark, t1).orderBy("id").collect().toSeq
    val b = GraftTable.read(spark, t2).orderBy("id").collect().toSeq
    assert(a == b, "indexed and full-scan merges must produce identical tables")
    assert(a.size == 1005 && a.count(_.getLong(1) % 10 == 1) == 10)
  }

  test("fragments appended after the index build still match (scanned flat)") {
    val t = fresh()
    seed(t)
    GraftTable.write(spark.range(5000, 5100).toDF("id")
      .withColumn("v", col("id") * 10).coalesce(1), t, "append")
    val src = spark.range(5050, 5055).toDF("id").withColumn("v", lit(7L))
    val m = GraftTable.mergeInsert(spark, t, src, Seq("id"))
    assert(m.opStats.contains("merge_index_fragments_scanned"))
    // 0 candidate covered fragments + 1 uncovered
    assert(m.opStats("merge_index_fragments_scanned") == 1L)
    val got = GraftTable.read(spark, t).filter(col("v") === 7L).count()
    assert(got == 5, "matches in uncovered fragments must update, not duplicate")
    assert(GraftTable.read(spark, t).count() == 1100)
  }

  test("source key matching only a DV-deleted row classifies as insert") {
    val t = fresh()
    seed(t)
    GraftTable.delete(spark, t, "id = 42")
    val src = spark.range(42, 43).toDF("id").withColumn("v", lit(999L))
    GraftTable.mergeInsert(spark, t, src, Seq("id"))
    val rows = GraftTable.read(spark, t).filter(col("id") === 42).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 999L)
  }

  test("multi-key merge prunes on the one indexed key") {
    val t = fresh(); val t2 = fresh()
    seed(t); seed(t2) // btree on id only
    // composite key (id, v): a match requires BOTH equal — pruning on id's
    // index alone is a sound superset. Keys 0–4 match (same v); keys
    // 9990–9994 exist in no fragment → inserts.
    val src = spark.range(0, 5).toDF("id").withColumn("v", col("id") * 10)
      .union(spark.range(9990, 9995).toDF("id").withColumn("v", col("id") * 10))
    val m = GraftTable.mergeInsert(spark, t, src, Seq("id", "v"))
    assert(m.opStats.contains("merge_index_fragments_scanned"),
      "multi-key merge must still take the indexed path via the id key")
    assert(m.opStats("merge_index_fragments_scanned") == 1L,
      s"source keys live in 1 fragment; scanned ${m.opStats("merge_index_fragments_scanned")}")
    assert(m.opStats("num_updated_rows") == 5L)
    assert(m.opStats("num_inserted_rows") == 5L)
    assert(m.opStats("num_deleted_rows") == 0L)
    GraftTable.mergeInsert(spark, t2, src, Seq("id", "v"), useIndex = false)
    val a = GraftTable.read(spark, t).orderBy("id").collect().toSeq
    val b = GraftTable.read(spark, t2).orderBy("id").collect().toSeq
    assert(a == b, "indexed and full-scan multi-key merges must agree")
  }

  test("by-source-delete merges fall back to the full scan") {
    val t = fresh()
    seed(t)
    val m = GraftTable.mergeInsert(spark, t,
      spark.range(0, 5).toDF("id").withColumn("v", lit(1L)), Seq("id"),
      whenNotMatchedBySourceDelete = true, deleteCondition = Some("id >= 990"))
    assert(!m.opStats.contains("merge_index_fragments_scanned"),
      "not-matched-by-source needs every target row — pruning would be unsound")
    assert(GraftTable.read(spark, t).count() == 990)
  }

  test("stale index (post-compaction) falls back until remapped") {
    val t = fresh()
    seed(t)
    GraftTable.compact(spark, t)
    val m = GraftTable.mergeInsert(spark, t,
      spark.range(0, 3).toDF("id").withColumn("v", lit(5L)), Seq("id"))
    assert(!m.opStats.contains("merge_index_fragments_scanned"),
      "coverage addresses dead fragments — index must be vetoed")
    assert(GraftTable.read(spark, t).filter(col("v") === 5L).count() == 3)
  }

  test("when_matched_fail aborts on a match and passes when insert-only") {
    val t = fresh()
    seed(t)
    val clash = spark.range(7, 8).toDF("id").withColumn("v", lit(0L))
    val e = intercept[IllegalStateException] {
      GraftTable.mergeInsert(spark, t, clash, Seq("id"), whenMatchedFail = true)
    }
    assert(e.getMessage.contains("when_matched_fail"))
    GraftTable.mergeInsert(spark, t,
      spark.range(9000, 9005).toDF("id").withColumn("v", lit(1L)), Seq("id"),
      whenMatchedFail = true)
    assert(GraftTable.read(spark, t).count() == 1005)
  }
}
