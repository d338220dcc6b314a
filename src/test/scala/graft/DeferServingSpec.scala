package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.{IvfIndex, Knn}

/** Deferred index remap serving (reference `defer_index_remap` +
  * FragReuseIndex, `rust/lance/src/dataset/optimize.rs:155-166`): a
  * content-preserving rewrite (compaction / clustering) records its source
  * fragment ids, the DV files it materialized, and persists each row's
  * pre-rewrite `_rowaddr` as a physical `__old_addr` column, so an index
  * whose coverage the rewrite retired keeps SERVING those rows at their OLD
  * addresses — only the deletion-sized exclusion sets (materialized-DV
  * sidecars, post-rewrite DVs mapped backward) touch the old address
  * space — until `optimize_index` remaps permanently. */
class DeferServingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embeddings = Tables.embeddings(spark, sf)

  private def queryVec(id: Long): Array[Float] =
    embeddings.filter($"vec_id" === id).select("embedding")
      .head().getSeq[Float](0).toArray

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def flatIds(t: String, q: Array[Float], k: Int): Seq[Long] =
    Knn.flatSearch(GraftTable.read(spark, t), "embedding", q, k, "l2",
      tieBreakers = Seq($"vec_id")).select("vec_id").as[Long].collect().toSeq

  private def searchIds(t: String, ix: String, q: Array[Float]): Seq[Long] =
    IvfIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 8).select("vec_id").as[Long].collect().toSeq

  private def covered(ix: String): Set[Long] =
    graft.index.ScalarIndex.readCoverage(spark, ix).get.fragmentIds.toSet

  test("unindexed compaction skips the provenance column entirely") {
    val t = tmp("defer_skip_t")
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.forall(f =>
      !f.oldAddrStored && f.srcFragIds.isEmpty && f.srcDvFiles.isEmpty),
      "no index exists to defer for — the 8-bytes/row column is waste")
  }

  test("compaction outputs record provenance and persist __old_addr") {
    val t = tmp("defer_prov_t")
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding",
      s"$t/_indices/ivf_embedding", nlist = 8)
    val srcIds = GraftTable.loadManifest(spark, t).fragments.map(_.id).toSet
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.nonEmpty)
    m.fragments.foreach { f =>
      assert(f.oldAddrStored, s"fragment ${f.id} lost the __old_addr marker")
      assert(f.srcFragIds.nonEmpty && f.srcFragIds.toSet.subsetOf(srcIds),
        s"fragment ${f.id} provenance ${f.srcFragIds} not within $srcIds")
    }
    // the physical column exists, is non-null, and holds pre-rewrite
    // fragment ids in its upper 32 bits
    val olds = GraftTable.readFragments(spark, t, m, m.fragments,
        withOldAddr = true)
      .select(shiftrightunsigned(col(GraftTable.OldAddrCol), 32).as("f"))
      .as[Long].collect()
    assert(olds.length == 500)
    assert(olds.toSet.subsetOf(srcIds))
  }

  test("pure compaction: whole corpus served from the index, no flat leg") {
    val t = tmp("defer_pure_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m = GraftTable.loadManifest(spark, t)
    val (translatable, fresh) = IvfIndex.deferServing(m, covered(ix))
    assert(fresh.isEmpty, s"rewrite outputs fell to the flat leg: $fresh")
    assert(translatable.map(_.id).toSet == m.fragments.map(_.id).toSet)
    // nprobes = nlist => exact through the address translation
    val q = queryVec(3L)
    assert(searchIds(t, ix, q) == flatIds(t, q, 10))
  }

  test("materialized deletions stay dead through the translation") {
    val t = tmp("defer_del_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.delete(spark, t, "vec_id % 10 = 0")
    GraftTable.compactFiles(spark, t, targetRows = 2000, materializeDeletions = 0.01)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.numDeleted == 0L, "compaction should have materialized the DVs")
    val (_, fresh) = IvfIndex.deferServing(m, covered(ix))
    assert(fresh.isEmpty)
    // deleted rows' stale candidates find no translation and are dropped
    val q = queryVec(3L)
    val got = searchIds(t, ix, q)
    assert(got == flatIds(t, q, 10))
    assert(!got.exists(_ % 10 == 0))
  }

  test("cleanup keeps the old-address DV sidecars rewrite outputs reference") {
    val t = tmp("defer_cleanup_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.delete(spark, t, "vec_id % 10 = 0")
    GraftTable.compactFiles(spark, t, targetRows = 2000, materializeDeletions = 0.01)
    val m = GraftTable.loadManifest(spark, t)
    val sidecars = m.fragments.flatMap(_.srcDvFiles).distinct
    assert(sidecars.nonEmpty, "materializing compaction must stamp srcDvFiles")
    // drop every pre-rewrite version; the sidecars are referenced by no
    // surviving manifest's dvFiles — only by the fragments' srcDvFiles
    GraftTable.cleanupOldVersions(spark, t, keepLast = 1,
      unverifiedGraceMillis = 0L)
    val fsys = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    sidecars.foreach { p =>
      assert(fsys.exists(new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(t), p)),
        s"cleanup deleted referenced DV sidecar $p")
    }
    // and the deferred search still masks the materialized deletions
    val q = queryVec(3L)
    val got = searchIds(t, ix, q)
    assert(got == flatIds(t, q, 10))
    assert(!got.exists(_ % 10 == 0))
  }

  test("deletes AFTER the rewrite are masked at translated addresses") {
    val t = tmp("defer_postdel_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val q = queryVec(3L)
    val before = searchIds(t, ix, q)
    GraftTable.delete(spark, t, s"vec_id = ${before.head}")
    val got = searchIds(t, ix, q)
    assert(got == flatIds(t, q, 10))
    assert(!got.contains(before.head))
  }

  test("appends after the rewrite go to the flat leg, translation keeps serving") {
    val t = tmp("defer_append_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    // append a twin of row 3 under a fresh id — it must surface via the
    // flat leg while the compacted corpus serves through the index
    val twin = embeddings.filter($"vec_id" === 3L)
      .withColumn("vec_id", lit(100003L))
    GraftTable.write(twin, t, "append")
    val m = GraftTable.loadManifest(spark, t)
    val (translatable, fresh) = IvfIndex.deferServing(m, covered(ix))
    assert(fresh.size == 1 && translatable.nonEmpty)
    val q = queryVec(3L)
    val got = searchIds(t, ix, q)
    assert(got == flatIds(t, q, 10))
    assert(got.contains(100003L))
  }

  test("layout clustering outputs also serve via translation") {
    val t = tmp("defer_cluster_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.cluster(spark, t, Seq("label"), targetRows = 2000)
    val m = GraftTable.loadManifest(spark, t)
    val (translatable, fresh) = IvfIndex.deferServing(m, covered(ix))
    assert(fresh.isEmpty, s"cluster outputs fell to the flat leg: $fresh")
    assert(translatable.nonEmpty)
    val q = queryVec(3L)
    assert(searchIds(t, ix, q) == flatIds(t, q, 10))
  }

  test("write rejects reserved graft column names") {
    val t = tmp("defer_reserved_t")
    val bad = embeddings.withColumn(GraftTable.OldAddrCol, lit(0L))
    val e = intercept[IllegalArgumentException] {
      GraftTable.write(bad, t, "overwrite")
    }
    assert(e.getMessage.contains("reserved"))
    // case-insensitively (Spark resolution is)
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.write(embeddings.withColumn("_ROWADDR", lit(0L)), t, "overwrite")
    }
    assert(e2.getMessage.contains("reserved"))
    // and on the no-rewrite schema-evolution routes
    val ok = tmp("defer_reserved_ok")
    GraftTable.write(embeddings, ok, "overwrite")
    val e3 = intercept[IllegalArgumentException] {
      GraftTable.addColumnsFiles(spark, ok, Seq(GraftTable.RowIdCol -> "1"))
    }
    assert(e3.getMessage.contains("reserved"))
    // and on the rename route
    val e4 = intercept[IllegalArgumentException] {
      GraftTable.alterColumns(spark, ok,
        renames = Map("label" -> GraftTable.RowAddrCol))
    }
    assert(e4.getMessage.contains("reserved"))
  }

  test("sidecars are group-private; optimize_index retires provenance and unpins them") {
    val t = tmp("defer_retire_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.delete(spark, t, "vec_id % 10 = 0")
    val shared = GraftTable.loadManifest(spark, t).dvFiles
    GraftTable.compactFiles(spark, t, targetRows = 2000, materializeDeletions = 0.01)
    val m1 = GraftTable.loadManifest(spark, t)
    val sidecars = m1.fragments.flatMap(_.srcDvFiles).distinct
    assert(sidecars.nonEmpty)
    // private copies, never the table's shared DV files
    assert(sidecars.intersect(shared).isEmpty, s"$sidecars pins $shared")
    // deferred search works off the sidecar
    val q = queryVec(3L)
    assert(searchIds(t, ix, q) == flatIds(t, q, 10))
    // optimize_index remaps; the coverage commit retires the provenance
    IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix)
    val m2 = GraftTable.loadManifest(spark, t)
    assert(m2.fragments.forall(f =>
      f.srcFragIds.isEmpty && f.srcDvFiles.isEmpty),
      m2.fragments.map(f => (f.id, f.srcFragIds, f.srcDvFiles)).toString)
    // ...which lets cleanup reclaim the sidecar files
    GraftTable.cleanupOldVersions(spark, t, keepLast = 1,
      unverifiedGraceMillis = 0L)
    val fsys = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    sidecars.foreach { p =>
      assert(!fsys.exists(new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(t), p)),
        s"retired sidecar $p still on disk after cleanup")
    }
    assert(searchIds(t, ix, q) == flatIds(t, q, 10))
  }

  test("HNSW serves deferred too: compaction + post-rewrite delete, no flat leg") {
    import graft.operators.HnswIndex
    val t = tmp("defer_hnsw_t")
    val ix = s"$t/_indices/hnsw_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    HnswIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m = GraftTable.loadManifest(spark, t)
    val (_, fresh) = IvfIndex.deferServing(m, covered(ix))
    assert(fresh.isEmpty, s"rewrite outputs fell to the flat leg: $fresh")
    val q = queryVec(3L)
    val before = HnswIndex.searchCombined(spark, t, ix, "vec_id", "embedding",
        q, 10, nprobes = 8).select("vec_id").as[Long].collect().toSeq
    assert(before.toSet == flatIds(t, q, 10).toSet)
    // a delete AFTER the rewrite is masked through the backward mapping
    GraftTable.delete(spark, t, s"vec_id = ${before.head}")
    val got = HnswIndex.searchCombined(spark, t, ix, "vec_id", "embedding",
        q, 10, nprobes = 8).select("vec_id").as[Long].collect().toSeq
    assert(got.toSet == flatIds(t, q, 10).toSet)
    assert(!got.contains(before.head))
  }

  test("value-changing update breaks provenance; second-generation rewrite breaks the chain") {
    val t = tmp("defer_chain_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.compactFiles(spark, t, targetRows = 300)
    val gen1 = GraftTable.loadManifest(spark, t)
    // an update rewrite must NOT claim translatability
    GraftTable.update(spark, t, Map("label" -> "99"), Some("vec_id = 7"))
    val mU = GraftTable.loadManifest(spark, t)
    val updated = mU.fragments.filterNot(f => gen1.fragments.exists(_.id == f.id))
    assert(updated.nonEmpty)
    updated.foreach(f => assert(f.srcFragIds.isEmpty && !f.oldAddrStored,
      s"update output ${f.id} falsely claims content-preserving provenance"))
    // a second compaction's sources are gen-1 ids the index never covered:
    // the chain is broken, those outputs serve from the flat leg
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m2 = GraftTable.loadManifest(spark, t)
    val (translatable, fresh) = IvfIndex.deferServing(m2, covered(ix))
    assert(translatable.isEmpty && fresh.nonEmpty)
    // correctness holds either way
    val q = queryVec(3L)
    assert(searchIds(t, ix, q) == flatIds(t, q, 10))
  }
}
