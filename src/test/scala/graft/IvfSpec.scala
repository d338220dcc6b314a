package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, Knn}

class IvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def embeddings = Tables.embeddings(spark, sf)

  private def queryVec(id: Long): Array[Float] =
    embeddings.filter($"vec_id" === id).select("embedding")
      .head().getSeq[Float](0).toArray

  private def buildIdx(nlist: Int): String = {
    val dir = Files.createTempDirectory("ivf_").toString
    IvfIndex.build(embeddings, "vec_id", "embedding", dir, nlist)
    dir
  }

  test("nprobes = nlist equals flat search exactly") {
    val idx = buildIdx(8)
    val q = queryVec(0L)
    val ivf = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(embeddings, "embedding", q, 10, "l2",
      tieBreakers = Seq($"vec_id")).select("vec_id").as[Long].collect().toSeq
    assert(ivf == flat)
  }

  test("serveLocal: driver-local IVF serving matches search() bit-for-bit, no jobs when warm (r14)") {
    val idx = buildIdx(8)
    IvfIndex.serveUnpersist(idx)
    val resident = IvfIndex.serveWarm(spark, idx, "vec_id", "embedding")
    assert(resident == embeddings.count(), s"all rows resident, got $resident")
    for (metric <- Seq("l2", "cosine", "dot"); qid <- Seq(0L, 7L, 123L)) {
      val q = queryVec(qid)
      val batched = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10,
          nprobes = 3, metric = metric)
        .select(col("vec_id"), col(Knn.DistanceCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val tracker = spark.sparkContext.statusTracker
      val before = tracker.getJobIdsForGroup(null).length
      val served = IvfIndex.serveLocal(spark, idx, "vec_id", "embedding", q,
        10, nprobes = 3, metric = metric)
      assert(tracker.getJobIdsForGroup(null).length == before,
        "warm serveLocal must not launch a Spark job")
      assert(served == batched, s"$metric qid=$qid: $served != $batched")
    }
    // packed f16 storage serves too (r16): resident vectors are the
    // decoded f16 values and the query rounds through f16 like f16Lit,
    // so ids AND distances match the batched f16 kernels bit-for-bit
    import graft.functions.F16Functions._
    val f16dir = Files.createTempDirectory("ivf_serve_f16_").toString
    IvfIndex.build(embeddings.select($"vec_id", f16Pack($"embedding").as("emb")),
      "vec_id", "emb", f16dir, nlist = 4)
    IvfIndex.serveUnpersist(f16dir)
    for (metric <- Seq("l2", "cosine", "dot"); qid <- Seq(0L, 123L)) {
      val q = queryVec(qid)
      val batchedF16 = IvfIndex.search(spark, f16dir, "vec_id", "emb", q, 5,
          nprobes = 2, metric = metric)
        .select(col("vec_id"), col(Knn.DistanceCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val servedF16 = IvfIndex.serveLocal(spark, f16dir, "vec_id", "emb", q, 5,
        nprobes = 2, metric = metric)
      assert(servedF16 == batchedF16,
        s"f16 $metric qid=$qid: $servedF16 != $batchedF16")
    }
  }

  test("serveLocal staleness guard: retrain at the same path serves the NEW index (r15)") {
    // pin the epoch-recheck throttle off: the guard semantics under test
    // must not depend on the rebuild outlasting the TTL window (r16)
    spark.conf.set("spark.graft.serve.epoch.ttl.ms", "0")
    try {
      val dir = Files.createTempDirectory("ivf_stale_").toString
      IvfIndex.build(embeddings.filter($"vec_id" < 300), "vec_id", "embedding",
        dir, nlist = 4)
      IvfIndex.serveUnpersist(dir)
      val q = queryVec(0L)
      val servedOld = IvfIndex.serveLocal(spark, dir, "vec_id", "embedding",
        q, 5, nprobes = 4)
      assert(servedOld.forall(_._1 < 300))
      // retrain IN PLACE over a disjoint id range; no explicit serveUnpersist —
      // the epoch guard alone must drop the resident partitions, or serveLocal
      // keeps answering from the dead incarnation
      IvfIndex.build(embeddings.filter($"vec_id" >= 300 && $"vec_id" < 600),
        "vec_id", "embedding", dir, nlist = 4)
      val servedNew = IvfIndex.serveLocal(spark, dir, "vec_id", "embedding",
        q, 5, nprobes = 4)
      assert(servedNew.forall(id => id._1 >= 300 && id._1 < 600),
        s"stale serve cache answered for the dropped index: $servedNew")
      val batched = IvfIndex.search(spark, dir, "vec_id", "embedding", q, 5,
          nprobes = 4)
        .select(col("vec_id"), col(Knn.DistanceCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(servedNew == batched)
    } finally spark.conf.unset("spark.graft.serve.epoch.ttl.ms")
  }

  test("serve budget shrink evicts down to the new capacity immediately (r15, ADVICE r14)") {
    val idx = buildIdx(8)
    IvfIndex.serveUnpersist(idx)
    spark.conf.set(IvfIndex.ServeCacheBudgetKey, "8")
    try {
      IvfIndex.serveWarm(spark, idx, "vec_id", "embedding")
      assert(IvfIndex.serveCacheSize >= 8)
      // lowering the budget must release entries on the NEXT conf refresh,
      // not one-per-future-cold-load
      spark.conf.set(IvfIndex.ServeCacheBudgetKey, "3")
      IvfIndex.serveLocal(spark, idx, "vec_id", "embedding", queryVec(0L),
        5, nprobes = 2)
      assert(IvfIndex.serveCacheSize <= 3,
        s"shrunk budget left ${IvfIndex.serveCacheSize} resident")
    } finally spark.conf.unset(IvfIndex.ServeCacheBudgetKey)
  }

  test("f16 storage end-to-end: index stores packed bytes, search serves them") {
    import graft.functions.F16Functions._
    val packed = embeddings.select($"vec_id", f16Pack($"embedding").as("emb"))
    val dir = Files.createTempDirectory("ivf_f16_").toString
    IvfIndex.build(packed, "vec_id", "emb", dir, nlist = 8)
    // the index dataset keeps the PACKED column — half the bytes at rest
    val idxSchema = spark.read.parquet(s"$dir/vectors").schema
    assert(idxSchema("emb").dataType ==
      org.apache.spark.sql.types.BinaryType, idxSchema.treeString)
    val q = queryVec(0L)
    // full probes: IVF-f16 must equal flat f16 search exactly (same
    // decoded values, same kernels — deterministic)
    val ivf = IvfIndex.search(spark, dir, "vec_id", "emb", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearchF16(packed, "emb", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == flat)
    // and the f16 ranking is a faithful stand-in for f32 truth
    val truth = Knn.flatSearch(embeddings, "embedding", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSet
    assert(truth.intersect(ivf.toSet).size >= 9,
      s"f16 quantization should barely disturb top-10: ${ivf.toSet}")
  }

  test("f16 table: buildForTable + optimize + searchCombined stay packed") {
    import graft.functions.F16Functions._
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_f16_tbl_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_f16_idx_").toString
    val packed = embeddings.select($"vec_id", f16Pack($"embedding").as("emb"))
    val cut = 400L
    GraftTable.write(packed.filter($"vec_id" < cut)
      .repartitionByRange(2, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "emb", idx, nlist = 8)
    GraftTable.write(packed.filter($"vec_id" >= cut), t, "append")
    // BEFORE optimize: the fresh leg flat-searches the packed column
    val q = queryVec(1L)
    val pre = IvfIndex.searchCombined(spark, t, idx, "vec_id", "emb", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    IvfIndex.optimizeForTable(spark, t, "vec_id", "emb", idx)
    val post = IvfIndex.searchCombined(spark, t, idx, "vec_id", "emb", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearchF16(GraftTable.read(spark, t), "emb", q, 10,
      "l2", Seq($"vec_id")).select("vec_id").as[Long].collect().toSeq
    assert(pre == flat && post == flat)
    assert(spark.read.parquet(s"$idx/vectors").schema("emb").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("partition assignment covers all rows exactly once") {
    val idx = buildIdx(8)
    val vecs = spark.read.parquet(s"$idx/vectors")
    assert(vecs.count() == 500)
    assert(vecs.select("vec_id").distinct().count() == 500)
    val pids = vecs.select(IvfIndex.PidCol).distinct()
      .as[Int].collect().toSet
    assert(pids.subsetOf((0 until 8).toSet) && pids.nonEmpty)
  }

  test("recall@10 with nprobes=4/8 over 20 queries is reasonable") {
    val idx = buildIdx(8)
    val recalls = (0L until 20L).map { qid =>
      val q = queryVec(qid)
      val truth = Knn.flatSearch(embeddings, "embedding", q, 10, "l2",
        tieBreakers = Seq($"vec_id")).select("vec_id").as[Long].collect().toSet
      val approx = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, 4)
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(approx).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    info(f"mean recall@10 nprobes=4/8: $mean%.3f")
    assert(mean >= 0.5, s"recall too low: $mean")
  }

  test("probing fewer partitions reads less data (partition pruning)") {
    val idx = buildIdx(8)
    val q = queryVec(0L)
    val plan = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, 2)
      .queryExecution.executedPlan.toString
    // partition filter on __ivf_pid must appear as a partition-level filter
    assert(plan.contains("PartitionFilters") && plan.contains(IvfIndex.PidCol), plan)
  }

  test("knn_combined: fresh fragments are searched flat and merged") {
    import graft.format.GraftTable
    import java.nio.file.Files
    val t = Files.createTempDirectory("ivf_comb_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_comb_idx_").toString
    // index covers the first 400 vectors; 100 appended AFTER the build
    GraftTable.write(embeddings.filter($"vec_id" < 400), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    GraftTable.write(embeddings.filter($"vec_id" >= 400), t, "append")

    val q = queryVec(0L)
    val combined = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(embeddings, "embedding", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(combined == flat) // nprobes=nlist ⇒ combined == exact flat over ALL data
    // and the true top-10 includes post-index vectors (else the test is vacuous)
    assert(flat.exists(_ >= 400L), s"pick a query whose neighbors span the split: $flat")
  }

  test("fast_search skips the fresh-fragment leg; identical when coverage is complete") {
    import graft.format.GraftTable
    import java.nio.file.Files
    val t = Files.createTempDirectory("ivf_fast_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_fast_idx_").toString
    GraftTable.write(embeddings.filter($"vec_id" < 400), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    GraftTable.write(embeddings.filter($"vec_id" >= 400), t, "append")
    val q = queryVec(0L)
    val fast = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8,
      fastSearch = true)
    // zero fresh-fragment work: the plan reads ONLY the index dataset — no
    // union leg, no scan of the table's fragment files
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan)
    assert(!plan.contains("frag-"), plan)
    // results come from indexed (covered) data only == flat over vec_id<400
    val got = fast.select("vec_id").as[Long].collect().toSeq
    val flatCovered = Knn.flatSearch(embeddings.filter($"vec_id" < 400), "embedding",
        q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(got == flatCovered)
    // with complete coverage, fast_search is IDENTICAL to the normal path
    assert(IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx) == 100L)
    val fast2 = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8,
        fastSearch = true)
      .select("vec_id").as[Long].collect().toSeq
    val normal2 = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(fast2 == normal2)
  }

  test("deterministic build: same centroids across runs") {
    val m1 = IvfIndex.train(embeddings, "vec_id", "embedding", 8)
    val m2 = IvfIndex.train(embeddings, "vec_id", "embedding", 8)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("optimizeForTable indexes appended fragments; search == flat afterwards") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_opt_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_opt_idx_").toString
    GraftTable.write(embeddings.filter($"vec_id" < 400), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    GraftTable.write(embeddings.filter($"vec_id" >= 400), t, "append")
    val n = IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx)
    assert(n == 100)
    // after optimize the marker moved: searchCombined has no flat branch,
    // and the pure index search over all partitions equals flat search
    val q = queryVec(0L)
    val viaIdx = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(embeddings, "embedding", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(viaIdx == flat)
    // idempotent: nothing new to index
    assert(IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx) == 0L)
  }

  test("prefilter applies before the top-k cut: exactly k filtered rows") {
    val idx = buildIdx(8)
    val q = queryVec(0L)
    val pre = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, 8,
        prefilter = Some($"label" === 3))
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(embeddings.filter($"label" === 3), "embedding", q,
        10, "l2", tieBreakers = Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(pre == flat)
    assert(pre.size == 10) // k matches exist → exactly k returned
  }

  test("searchCombined after delete+compaction: no duplicates, no resurrected rows") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_cmp_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_cmp_idx_").toString
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    // delete a slab concentrated in the first range fragment, then partial
    // compaction: the DV is materialized, the indebted fragment id retired
    GraftTable.delete(spark, t, "vec_id < 62")
    GraftTable.compactFiles(spark, t, targetRows = 250, materializeDeletions = 0.1)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.dvFiles.isEmpty && m.numDeleted == 0L, "DV should be materialized")
    val q = queryVec(0L)
    val got = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.distinct == got, s"duplicate ids in top-k: $got")
    assert(got.forall(_ >= 62L), s"deleted rows resurfaced: $got")
    val flat = Knn.flatSearch(GraftTable.read(spark, t), "embedding", q, 10, "l2",
      Seq($"vec_id")).select("vec_id").as[Long].collect().toSeq
    assert(got == flat)
  }

  test("optimizeForTable after compaction drops dead-fragment rows from the index") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_cmpo_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_cmpo_idx_").toString
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    GraftTable.delete(spark, t, "vec_id < 62")
    GraftTable.compactFiles(spark, t, targetRows = 250, materializeDeletions = 0.1)
    IvfIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx)
    val vecs = spark.read.parquet(s"$idx/vectors")
    // index must hold each live row exactly once, no deleted rows
    assert(vecs.count() == GraftTable.countRows(spark, t))
    assert(vecs.select("vec_id").distinct().count() == vecs.count())
    assert(vecs.filter($"vec_id" < 62).count() == 0)
    // and a pure index search over all partitions equals flat over live rows
    val q = queryVec(0L)
    val viaIdx = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(GraftTable.read(spark, t), "embedding", q, 10, "l2",
      Seq($"vec_id")).select("vec_id").as[Long].collect().toSeq
    assert(viaIdx == flat)
  }

  test("searchCombined threads metric + prefilter through both legs") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_pfc_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_pfc_idx_").toString
    // covered: [0, 400); fresh append: [400, 500); DV-delete: [125, 187)
    GraftTable.write(embeddings.filter($"vec_id" < 400)
      .repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    GraftTable.write(embeddings.filter($"vec_id" >= 400), t, "append")
    GraftTable.delete(spark, t, "vec_id >= 125 AND vec_id < 187")
    val q = queryVec(0L)
    val got = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q,
        10, 8, metric = "cosine",
        prefilter = Some($"label" === 3 && $"vec_id" =!= 0L))
      .select("vec_id").as[Long].collect().toSeq
    val expected = Knn.flatSearch(
        embeddings.filter($"label" === 3 && $"vec_id" =!= 0L &&
          !($"vec_id" >= 125 && $"vec_id" < 187)),
        "embedding", q, 10, "cosine", tieBreakers = Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
    assert(got.size == 10)
  }

  test("index keyed by stable _rowid keeps returning the same ids across compaction") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_rid_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_rid_idx_").toString
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id")
      .sortWithinPartitions("vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, GraftTable.RowIdCol, "embedding", idx, nlist = 8)
    val q = queryVec(0L)
    val before = IvfIndex.searchCombined(spark, t, idx, GraftTable.RowIdCol,
        "embedding", q, 10, 8)
      .select(GraftTable.RowIdCol).as[Long].collect().toSeq
    GraftTable.delete(spark, t, "vec_id < 62")
    GraftTable.compactFiles(spark, t, targetRows = 250, materializeDeletions = 0.1)
    val after = IvfIndex.searchCombined(spark, t, idx, GraftTable.RowIdCol,
        "embedding", q, 10, 8)
      .select(GraftTable.RowIdCol).as[Long].collect().toSeq
    // the ids of surviving neighbors are UNCHANGED by the rewrite (addresses
    // moved; ids didn't): post-compaction results == pre-compaction results
    // minus the deleted ids, refilled from the live tail
    val expected = Knn.flatSearch(GraftTable.read(spark, t, withRowId = true),
        "embedding", q, 10, "l2", Seq(col(GraftTable.RowIdCol)))
      .select(GraftTable.RowIdCol).as[Long].collect().toSeq
    assert(after == expected)
    assert(before.filter(after.contains).forall(after.contains))
    // sorted-range write ⇒ _rowid == vec_id here, so deleted ids are < 62
    assert(after.forall(_ >= 62L))
  }

  test("searchCombined subtracts rows deleted after the index build") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_del_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_del_idx_").toString
    GraftTable.write(embeddings, t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    val q = queryVec(0L)
    val top = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    val victim = top.head // delete the best hit (vec_id 0 itself)
    GraftTable.delete(spark, t, s"vec_id = $victim")
    val after = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding", q, 10, 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(!after.contains(victim), s"deleted $victim still returned: $after")
    assert(after.size == 10)
    val flat = Knn.flatSearch(
        GraftTable.read(spark, t), "embedding", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(after == flat) // nprobes=nlist + DV subtraction == exact over live rows
  }

  test("distance_range through the indexed path == flat range result") {
    import graft.format.GraftTable
    val t = Files.createTempDirectory("ivf_range_").toString + "/t"
    val idx = Files.createTempDirectory("ivf_range_idx_").toString
    GraftTable.write(embeddings.repartitionByRange(4, $"vec_id"), t, "overwrite")
    IvfIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    val q = queryVec(3L)
    val lo = 0.4; val hi = 1.5
    val ranged = IvfIndex.searchCombined(spark, t, idx, "vec_id", "embedding",
        q, k = 10, nprobes = 8, distanceRange = Some((lo, hi)))
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.withDistance(embeddings, "embedding", q, "l2")
      .filter($"_distance" >= lo && $"_distance" < hi)
      .orderBy($"_distance", $"vec_id").limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(ranged == flat, s"$ranged vs $flat")
    assert(ranged.nonEmpty)
  }

  test("ivf_assign fails fast on a wrong-dimension vector") {
    val idx = buildIdx(8)
    val model = IvfIndex.loadModel(spark, idx)
    val dim = model.centroids(0).length
    // ingest vector with dropped dims must throw, not silently assign via
    // a truncated distance (VERDICT r6 #5, mirrors RqEncode)
    val bad = Seq((1L, (0 until dim - 3).map(_.toFloat))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      import org.apache.spark.sql.graftshim.ColumnBridge
      bad.withColumn("pid", ColumnBridge.column(graft.operators.IvfAssign(
        ColumnBridge.expression(col("embedding")), model.centroids))).collect()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(rootMsg(ex).contains("dims"), s"unexpected failure: ${rootMsg(ex)}")
  }

  test("serveLocal prefilter: true top-k of the allowed set, parity with batched (r16)") {
    val idx = buildIdx(8)
    IvfIndex.serveUnpersist(idx)
    IvfIndex.serveWarm(spark, idx, "vec_id", "embedding")
    val q = queryVec(0L)
    val batched = IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10,
        nprobes = 3, prefilter = Some(col("vec_id") % 2 === 0))
      .select(col("vec_id"), col(Knn.DistanceCol))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = IvfIndex.serveLocal(spark, idx, "vec_id", "embedding", q, 10,
      nprobes = 3, allowed = Some(id => id % 2 == 0))
    assert(served == batched, s"$served != $batched")
    assert(served.size == 10 && served.forall(_._1 % 2 == 0),
      "the prefilter result must be the TRUE top-k of the allowed set")
  }
}
