package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.{Fts, HnswIndex, IvfIndex, Knn, PqIndex}

/** Post-compaction index REMAP ([[graft.operators.IndexRemap]]): optimize
  * after a compaction moves index rows to their new addresses instead of
  * re-encoding or rebuilding, and the compaction planner bins rewrite
  * candidates by coverage signature so outputs never mix indexed and
  * unindexed rows. */
class IndexRemapSpec extends AnyFunSuite {
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

  test("IVF: optimize after compaction remaps instead of re-encoding") {
    val t = tmp("remap_ivf_t")
    val ix = s"$t/_indices/ivf_embedding"
    // 4 small fragments, all compaction candidates
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m1 = GraftTable.loadManifest(spark, t)
    assert(m1.operation == "rewrite")
    val n = IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix)
    // pure compaction: every output fragment is wholly index-composed, so
    // NOTHING needed re-encoding
    assert(n == 0L, s"expected zero re-encoded rows, got $n")
    // coverage moved to the live fragment set
    val cov = graft.index.ScalarIndex.readCoverage(spark, ix).get
    assert(cov.fragmentIds.toSet == m1.fragments.map(_.id).toSet)
    // dataset holds exactly the corpus at live addresses
    val vecs = spark.read.parquet(s"$ix/vectors")
    assert(vecs.count() == 500)
    val liveFrags = m1.fragments.map(_.id).toSet
    val addrsOk = vecs.select(shiftrightunsigned(col(GraftTable.RowAddrCol), 32).as("f"))
      .as[Long].collect().forall(liveFrags.contains)
    assert(addrsOk, "remapped dataset still holds dead addresses")
    // search is exact vs flat
    val q = queryVec(3L)
    val got = IvfIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 8).select("vec_id").as[Long].collect().toSeq
    assert(got == flatIds(t, q, 10))
  }

  test("IVF remap drops materialized deletions from the dataset") {
    val t = tmp("remap_ivf_del_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 8)
    GraftTable.delete(spark, t, "vec_id % 10 = 0")
    // deletion debt forces every fragment into the rewrite
    GraftTable.compactFiles(spark, t, targetRows = 2000, materializeDeletions = 0.01)
    val m1 = GraftTable.loadManifest(spark, t)
    assert(m1.numDeleted == 0L, "compaction should have materialized the DVs")
    assert(IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix) == 0L)
    assert(spark.read.parquet(s"$ix/vectors").count() == 450)
    val q = queryVec(3L)
    val got = IvfIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 8).select("vec_id").as[Long].collect().toSeq
    assert(got == flatIds(t, q, 10))
    assert(!got.exists(_ % 10 == 0))
  }

  test("HNSW: remap keeps delta generations and adjacency — no rebuild") {
    val t = tmp("remap_hnsw_t")
    val ix = s"$t/_indices/hnsw_embedding"
    GraftTable.write(embeddings.filter($"vec_id" < 400)
      .repartitionByRange(4, $"vec_id"), t, "overwrite")
    HnswIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 4)
    // append + optimize -> a delta generation a rebuild would destroy
    GraftTable.write(embeddings.filter($"vec_id" >= 400), t, "append")
    HnswIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ix/graph_delta_000")))
    val nbrsBefore = spark.read.parquet(s"$ix/graph")
      .select($"id", $"nbrs").as[(Long, Seq[Seq[Long]])].collect().toMap
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    HnswIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix)
    // delta generation survived (a rebuild drops it) and adjacency is
    // bit-identical — the graph was remapped, not reconstructed
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ix/graph_delta_000")),
      "delta generation lost — optimize rebuilt instead of remapping")
    val nbrsAfter = spark.read.parquet(s"$ix/graph")
      .select($"id", $"nbrs").as[(Long, Seq[Seq[Long]])].collect().toMap
    assert(nbrsAfter == nbrsBefore, "adjacency changed across remap")
    val q = queryVec(7L)
    val got = HnswIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 4, ef = 500).select("vec_id").as[Long].collect().toSeq
    assert(got == flatIds(t, q, 10))
  }

  test("HNSW: deleted rows stay as routing-only dead nodes after remap") {
    val t = tmp("remap_hnsw_del_t")
    val ix = s"$t/_indices/hnsw_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    HnswIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 4)
    GraftTable.delete(spark, t, "vec_id % 7 = 0")
    GraftTable.compactFiles(spark, t, targetRows = 2000, materializeDeletions = 0.01)
    HnswIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix)
    val g = spark.read.parquet(s"$ix/graph")
    // every node is still present (the beam must route through dead ones)…
    assert(g.count() == 500)
    // …but deleted rows carry a null address
    val deadIds = g.filter(col(GraftTable.RowAddrCol).isNull)
      .select("id").as[Long].collect().toSet
    assert(deadIds.nonEmpty && deadIds.forall(_ % 7 == 0))
    val q = queryVec(3L)
    val got = HnswIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 4, ef = 500).select("vec_id").as[Long].collect().toSeq
    assert(got == flatIds(t, q, 10))
    assert(!got.exists(_ % 7 == 0))
  }

  test("compactFiles bins by coverage signature — outputs never mix") {
    val t = tmp("remap_bins_t")
    val ix = s"$t/_indices/ivf_embedding"
    GraftTable.write(embeddings.filter($"vec_id" < 300)
      .repartitionByRange(3, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", ix, nlist = 4)
    // two more small fragments the index does not cover
    GraftTable.write(embeddings.filter($"vec_id" >= 300)
      .repartitionByRange(2, $"vec_id"), t, "append")
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    val m1 = GraftTable.loadManifest(spark, t)
    // all five fragments were rewrite candidates, but covered and
    // uncovered rows landed in SEPARATE outputs
    m1.fragments.foreach { f =>
      val ids = GraftTable.readFragments(spark, t, m1, Seq(f))
        .select("vec_id").as[Long].collect()
      assert(ids.forall(_ < 300) || ids.forall(_ >= 300),
        s"fragment ${f.id} mixes indexed and unindexed rows")
    }
    // and optimize therefore remaps the covered bin, re-encoding only the
    // appended rows
    val n = IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix)
    assert(n == 200L, s"expected only the 200 appended rows encoded, got $n")
    val q = queryVec(11L)
    val got = IvfIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 4).select("vec_id").as[Long].collect().toSeq
    assert(got == flatIds(t, q, 10))
  }

  test("cluster() scatters rows but optimize still converges correctly") {
    val t = tmp("remap_cluster_t")
    val ix = s"$t/_indices/pq_embedding"
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    PqIndex.buildForTable(spark, t, "vec_id", "embedding", ix,
      nlist = 4, m = 8, k = 16)
    // full coverage: every clustered output is index-composed, so even a
    // global reorder remaps cleanly
    GraftTable.cluster(spark, t, Seq("vec_id"), targetRows = 100)
    assert(PqIndex.optimizeForTable(spark, t, "vec_id", "embedding", ix) == 0L)
    val q = queryVec(5L)
    val got = PqIndex.searchCombined(spark, t, ix, "vec_id", "embedding", q,
      10, nprobes = 4, refineFactor = 50)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == flatIds(t, q, 10))
  }

  test("FTS: pure compaction is a zero-IO coverage move") {
    val docs = (0L until 200L).map(i =>
      (i, s"alpha bravo token$i charlie ${if (i % 3 == 0) "delta" else "echo"}"))
      .toDF("doc_id", "text")
    val t = tmp("remap_fts_t")
    GraftTable.write(docs.repartition(4), t, "overwrite")
    Fts.buildForTable(spark, t, "doc_id", "text")
    val ix = s"$t/_indices/fts_text"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    def mtimes(sub: String): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$ix/$sub")).toSeq
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = HnswIndexSpecHelpers.ftsTop(spark, t, ix, "delta", 5)
    val postingsBefore = mtimes("postings")
    GraftTable.compactFiles(spark, t, targetRows = 2000)
    assert(Fts.optimizeForTable(spark, t, "doc_id", "text") == 0L)
    // postings untouched: the remap moved coverage metadata only
    assert(mtimes("postings") == postingsBefore,
      "FTS postings rewritten on a pure compaction")
    val cov = graft.index.ScalarIndex.readCoverage(spark, ix).get
    val m1 = GraftTable.loadManifest(spark, t)
    assert(cov.fragmentIds.toSet == m1.fragments.map(_.id).toSet)
    assert(HnswIndexSpecHelpers.ftsTop(spark, t, ix, "delta", 5) == before)
  }

  test("FTS: materialized deletions force the rebuild path (stats exact)") {
    val docs = (0L until 200L).map(i => (i, s"alpha bravo token$i"))
      .toDF("doc_id", "text")
    val t = tmp("remap_fts_del_t")
    GraftTable.write(docs.repartition(4), t, "overwrite")
    Fts.buildForTable(spark, t, "doc_id", "text")
    GraftTable.delete(spark, t, "doc_id % 5 = 0")
    GraftTable.compactFiles(spark, t, targetRows = 2000, materializeDeletions = 0.01)
    Fts.optimizeForTable(spark, t, "doc_id", "text")
    // stats reflect the live corpus only
    val ix = s"$t/_indices/fts_text"
    val nDocs = spark.read.parquet(s"$ix/meta").head().getAs[Long]("n_docs")
    assert(nDocs == 160L, s"stale n_docs after delete-materializing compaction: $nDocs")
  }
}

/** Tiny shared helper so the FTS tests read naturally above. */
object HnswIndexSpecHelpers {
  def ftsTop(spark: SparkSession, tablePath: String, indexPath: String,
             term: String, k: Int): Seq[Long] = {
    import spark.implicits._
    Fts.matchQuery(spark, indexPath, Seq(term), k)
      .select("doc_id").as[Long].collect().toSeq
  }
}
