package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.format.GraftTable
import graft.index.ScalarIndex
import graft.operators.Fts

/** External distributed index build → one metadata commit (reference
  * `merge_index_metadata`, `python/dataset.py:3006`): workers stage
  * fragment-slice sub-indexes under a shared uuid; a single merge call
  * validates coverage, merges data, recomputes global statistics, and
  * commits the manifest entry. */
class ExternalIndexMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_extidx_").toString + "/t"

  test("BTREE: two workers' slices merge into one committed, serving index") {
    val t = tmp()
    GraftTable.write((0L until 400L).map(i => (i, i % 17)).toDF("id", "k")
      .repartitionByRange(4, col("id")), t, "overwrite")
    val m = GraftTable.loadManifest(spark, t)
    val frags = m.fragments.map(_.id)
    assert(frags.size == 4)
    val uuid = java.util.UUID.randomUUID().toString
    // "workers": disjoint fragment slices of one snapshot
    ScalarIndex.buildBtreePart(spark, t, "k", uuid, 0, frags.take(2))
    ScalarIndex.buildBtreePart(spark, t, "k", uuid, 1, frags.drop(2))
    assert(ScalarIndex.mergeBtreeParts(spark, t, "k", uuid) == 400L)
    // ONE manifest commit carries the entry, under the build uuid
    val m2 = GraftTable.loadManifest(spark, t)
    assert(m2.version == m.version + 1)
    val e = m2.indices.find(_.name == "btree_k").getOrElse(fail("no entry"))
    assert(e.uuid == uuid)
    assert(e.indexType == "BTREE")
    assert(e.fragmentIds.toSet == frags.toSet)
    // staging folded away
    assert(!new java.io.File(s"$t/_indices/_staged/$uuid").exists)
    // the merged index SERVES: its (value → addr) rows equal the table's
    val viaIdx = spark.read.parquet(s"$t/_indices/btree_k")
      .filter(col("v") === 5L).select(col(GraftTable.RowAddrCol))
      .as[Long].collect().toSet
    val viaScan = GraftTable.read(spark, t, withRowAddr = true)
      .filter(col("k") === 5L).select(col(GraftTable.RowAddrCol))
      .as[Long].collect().toSet
    assert(viaIdx == viaScan && viaIdx.nonEmpty)
    // and incremental maintenance picks up from the merged marker
    GraftTable.write(Seq((1000L, 5L)).toDF("id", "k"), t, "append")
    assert(ScalarIndex.optimizeBtree(spark, t, "k", s"$t/_indices") == 1L)
  }

  test("merge refuses overlap, holes, and snapshot drift") {
    val t = tmp()
    GraftTable.write((0L until 100L).map(i => (i, i % 5)).toDF("id", "k")
      .repartitionByRange(4, col("id")), t, "overwrite")
    val frags = GraftTable.loadManifest(spark, t).fragments.map(_.id)
    // overlap: both parts index fragment 0
    val u1 = "u-overlap"
    ScalarIndex.buildBtreePart(spark, t, "k", u1, 0, frags.take(2))
    ScalarIndex.buildBtreePart(spark, t, "k", u1, 1, frags.take(1) ++ frags.drop(2))
    val e1 = intercept[IllegalArgumentException] {
      ScalarIndex.mergeBtreeParts(spark, t, "k", u1)
    }
    assert(e1.getMessage.contains("overlap"), e1.getMessage)
    // hole: a fragment no part covers
    val u2 = "u-hole"
    ScalarIndex.buildBtreePart(spark, t, "k", u2, 0, frags.take(2))
    ScalarIndex.buildBtreePart(spark, t, "k", u2, 1, frags.slice(2, 3))
    val e2 = intercept[IllegalArgumentException] {
      ScalarIndex.mergeBtreeParts(spark, t, "k", u2)
    }
    assert(e2.getMessage.contains("missing"), e2.getMessage)
    // drift: a commit lands between the two part builds
    val u3 = "u-drift"
    ScalarIndex.buildBtreePart(spark, t, "k", u3, 0, frags.take(2))
    GraftTable.write(Seq((500L, 1L)).toDF("id", "k"), t, "append")
    val frags2 = GraftTable.loadManifest(spark, t).fragments.map(_.id)
    ScalarIndex.buildBtreePart(spark, t, "k", u3, 1, frags2.filterNot(frags.take(2).contains))
    val e3 = intercept[IllegalArgumentException] {
      ScalarIndex.mergeBtreeParts(spark, t, "k", u3)
    }
    assert(e3.getMessage.contains("different snapshots"), e3.getMessage)
  }

  test("INVERTED: merged parts score exactly like one direct full build") {
    val t = tmp()
    val docs = (0L until 40L).map(i =>
      (i, s"spark vector ${if (i % 3 == 0) "table join" else "scan filter"} doc$i"))
      .toDF("id", "text")
    GraftTable.write(docs.repartitionByRange(4, col("id")), t, "overwrite")
    val m = GraftTable.loadManifest(spark, t)
    val frags = m.fragments.map(_.id)
    val uuid = java.util.UUID.randomUUID().toString
    Fts.buildPartForTable(spark, t, "id", "text", uuid, 0, frags.take(2))
    Fts.buildPartForTable(spark, t, "id", "text", uuid, 1, frags.drop(2))
    assert(Fts.mergePartsForTable(spark, t, "id", "text", uuid) == 40L)
    val e = GraftTable.loadManifest(spark, t).indices
      .find(_.name == "fts_text").getOrElse(fail("no entry"))
    assert(e.uuid == uuid && e.indexType == "FTS")
    // global statistics (df/avgdl/N) must come from the UNION, so scores
    // equal a single-shot build over the full corpus
    val ref = Files.createTempDirectory("extidx_ref_").toString
    Fts.buildIndex(docs, "id", "text", ref)
    def top(idx: String) = Fts.matchQuery(spark, idx, Seq("table", "vector"), 10)
      .select(col("doc_id"), round(col("_score"), 6).as("s"))
      .as[(Long, Double)].collect().toSeq
    assert(top(s"$t/_indices/fts_text") == top(ref))
    // WAND over the merged index agrees too (block stats recomputed)
    val viaWand = Fts.matchQueryWand(spark, s"$t/_indices/fts_text",
        Seq("table", "vector"), 10, seedBlocks = 4, minPostings = 0L)
      .select(col("doc_id"), round(col("_score"), 6).as("s"))
      .as[(Long, Double)].collect().toSeq
    assert(viaWand == top(ref))
  }
}
