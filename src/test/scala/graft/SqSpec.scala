package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.{Knn, SqIndex}

class SqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embeddings = Tables.embeddings(spark, sf)

  private def queryVec(id: Long): Array[Float] =
    embeddings.filter($"vec_id" === id).select("embedding").head().getSeq[Float](0).toArray

  private def buildIdx(): String = {
    val dir = Files.createTempDirectory("sq_").toString
    SqIndex.build(embeddings, "vec_id", "embedding", dir, nlist = 8)
    dir
  }

  test("sq codes are d bytes; bounds cover the data; encode round-trips within a step") {
    val idx = buildIdx()
    val codes = spark.read.parquet(s"$idx/vectors")
      .select(SqIndex.CodeCol).as[Array[Byte]].collect()
    assert(codes.length == 500)
    assert(codes.forall(_.length == 64)) // one byte per dimension
    val sq = SqIndex.loadSq(spark, idx)
    assert(sq.d == 64)
    // decode error is bounded by one quantization step per dimension
    val v = queryVec(7L)
    val steps = sq.steps
    val enc = v.indices.map { i =>
      if (steps(i) <= 0f) sq.lo(i)
      else sq.lo(i) + math.round((v(i) - sq.lo(i)) / steps(i) / 255f * 255f) * steps(i)
    }
    v.indices.foreach { i =>
      assert(math.abs(enc(i) - v(i)) <= steps(i) + 1e-6, s"dim $i off by more than a step")
    }
  }

  test("full probes + large refine == flat search exactly") {
    val idx = buildIdx()
    val q = queryVec(0L)
    val full = SqIndex.search(spark, idx, "vec_id", "embedding", q, 10, nprobes = 8,
      refineFactor = 100)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(embeddings, "embedding", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(full == flat)
  }

  test("recall@10 beats PQ-class fidelity at modest refine") {
    val idx = buildIdx()
    val recalls = (0L until 15L).map { qid =>
      val q = queryVec(qid)
      val truth = Knn.flatSearch(embeddings, "embedding", q, 10, "l2", Seq($"vec_id"))
        .select("vec_id").as[Long].collect().toSet
      val approx = SqIndex.search(spark, idx, "vec_id", "embedding", q, 10,
        nprobes = 4, refineFactor = 5)
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(approx).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    info(f"IVF_SQ mean recall@10 (nprobes=4/8, refine=5): $mean%.3f")
    // int8 residuals are far finer than PQ's 32x compression — expect high recall
    assert(mean >= 0.8, s"recall too low for SQ: $mean")
  }

  test("prefilter restricts candidates before ranking") {
    val idx = buildIdx()
    val q = queryVec(0L)
    val got = SqIndex.search(spark, idx, "vec_id", "embedding", q, 10, nprobes = 8,
      refineFactor = 100, prefilter = Some($"vec_id" % 2 === 0))
      .select("vec_id").as[Long].collect().toSeq
    assert(got.forall(_ % 2 == 0) && got.size == 10)
    val flat = Knn.flatSearch(embeddings.filter($"vec_id" % 2 === 0),
      "embedding", q, 10, "l2", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(got == flat)
  }

  test("buildForTable + optimizeForTable: delta append, compaction rewrite") {
    val t = Files.createTempDirectory("sq_tbl_").toString + "/t"
    val idx = s"$t/_indices/ivfsq_embedding"
    GraftTable.write(embeddings.limit(400).repartition(4), t, "overwrite")
    SqIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 4)
    // append 100 more, optimize indexes only the delta
    GraftTable.write(embeddings.filter($"vec_id" >= 400).coalesce(1), t, "append")
    assert(SqIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx) == 100L)
    assert(SqIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx) == 0L)
    val n = spark.read.parquet(s"$idx/vectors").count()
    assert(n == 500L)
    // compaction invalidates some covered fragments -> filtered rewrite
    GraftTable.delete(spark, t, "vec_id % 10 = 3")
    GraftTable.compactFiles(spark, t, targetRows = 200, materializeDeletions = 0.01)
    SqIndex.optimizeForTable(spark, t, "vec_id", "embedding", idx)
    val m = GraftTable.loadManifest(spark, t)
    val live = m.fragments.map(_.id).toSet
    val fragsInIdx = spark.read.parquet(s"$idx/vectors")
      .select(shiftrightunsigned(col(GraftTable.RowAddrCol), 32).as("f"))
      .distinct().as[Long].collect().toSet
    assert(fragsInIdx.subsetOf(live), s"index holds dead fragments: ${fragsInIdx.diff(live)}")
  }

  test("cosine metric: full probes + refine == flat cosine search") {
    val dir = Files.createTempDirectory("sq_cos_").toString
    SqIndex.build(embeddings, "vec_id", "embedding", dir, nlist = 8, metric = "cosine")
    val q = queryVec(3L)
    val got = SqIndex.search(spark, dir, "vec_id", "embedding", q, 10, nprobes = 8,
        refineFactor = 100)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(embeddings, "embedding", q, 10, "cosine", Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(got == flat)
  }

  test("searchCombined: deletes + fresh appends == flat over the live set") {
    val t = Files.createTempDirectory("sq_comb_").toString + "/t"
    val idx = s"$t/_indices/ivfsq_embedding"
    GraftTable.write(embeddings.filter($"vec_id" < 400).repartition(4), t, "overwrite")
    SqIndex.buildForTable(spark, t, "vec_id", "embedding", idx, nlist = 8)
    GraftTable.delete(spark, t, "vec_id % 7 = 0") // indexed rows now DV-dead
    GraftTable.write(embeddings.filter($"vec_id" >= 400), t, "append") // uncovered
    val qv = queryVec(0L)
    val got = SqIndex.searchCombined(spark, t, idx, "vec_id", "embedding", qv,
        k = 10, nprobes = 8, refineFactor = 100)
      .select("vec_id").as[Long].collect().toSeq
    val flat = Knn.flatSearch(GraftTable.read(spark, t), "embedding", qv, 10, "l2",
        Seq($"vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    assert(got == flat)
    assert(got.filter(_ < 400).forall(_ % 7 != 0)) // deleted indexed rows stay dead
  }

  test("serveLocal: SQ serving matches search() ids AND distances, no jobs warm (r16)") {
    val idx = buildIdx()
    SqIndex.serveUnpersist(idx)
    val resident = SqIndex.serveWarm(spark, idx, "vec_id", "embedding")
    assert(resident == embeddings.count(), s"all code rows resident, got $resident")
    for (qid <- Seq(0L, 7L, 123L); rf <- Seq(4, 10)) {
      val q = queryVec(qid)
      val batched = SqIndex.search(spark, idx, "vec_id", "embedding", q, 10,
          nprobes = 3, refineFactor = rf)
        .select(col("vec_id"), col(Knn.DistanceCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val tracker = spark.sparkContext.statusTracker
      val before = tracker.getJobIdsForGroup(null).length
      val served = SqIndex.serveLocal(spark, idx, "vec_id", "embedding", q,
        10, nprobes = 3, refineFactor = rf)
      assert(tracker.getJobIdsForGroup(null).length == before,
        "warm serveLocal must not launch a Spark job")
      assert(served == batched, s"qid=$qid rf=$rf: $served != $batched")
    }
    // cosine metric through a cosine-built index
    val cosDir = Files.createTempDirectory("sq_serve_cos_").toString
    SqIndex.build(embeddings, "vec_id", "embedding", cosDir, nlist = 8,
      metric = "cosine")
    SqIndex.serveUnpersist(cosDir)
    val q = queryVec(42L)
    val cb = SqIndex.search(spark, cosDir, "vec_id", "embedding", q, 10,
        nprobes = 4, refineFactor = 6)
      .select(col("vec_id"), col(Knn.DistanceCol))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(SqIndex.serveLocal(spark, cosDir, "vec_id", "embedding", q, 10,
      nprobes = 4, refineFactor = 6) == cb)
  }

  test("serveLocal staleness + budget: epoch retires rebuilds, warm refuses over-budget (r16)") {
    spark.conf.set("spark.graft.serve.epoch.ttl.ms", "0")
    try {
      val dir = Files.createTempDirectory("sq_stale_").toString
      SqIndex.build(embeddings.filter($"vec_id" < 300), "vec_id", "embedding",
        dir, nlist = 4)
      SqIndex.serveUnpersist(dir)
      val q = queryVec(0L)
      assert(SqIndex.serveLocal(spark, dir, "vec_id", "embedding", q, 5,
        nprobes = 4).forall(_._1 < 300))
      SqIndex.build(embeddings.filter($"vec_id" >= 300 && $"vec_id" < 600),
        "vec_id", "embedding", dir, nlist = 4)
      val servedNew = SqIndex.serveLocal(spark, dir, "vec_id", "embedding", q, 5,
        nprobes = 4)
      assert(servedNew.forall(p => p._1 >= 300 && p._1 < 600),
        s"stale serve cache answered for the dropped index: $servedNew")
    } finally spark.conf.unset("spark.graft.serve.epoch.ttl.ms")
    val idx = buildIdx()
    SqIndex.serveUnpersist(idx)
    spark.conf.set(SqIndex.ServeCodesBudgetKey, "4")
    try {
      val e = intercept[IllegalArgumentException] {
        SqIndex.serveWarm(spark, idx, "vec_id", "embedding") // nlist=8 > 4
      }
      assert(e.getMessage.contains(SqIndex.ServeCodesBudgetKey), e.getMessage)
      spark.conf.set(SqIndex.ServeCodesBudgetKey, "3")
      SqIndex.serveLocal(spark, idx, "vec_id", "embedding", queryVec(0L), 5,
        nprobes = 2)
      assert(SqIndex.serveCacheSize <= 3,
        s"shrunk budget left ${SqIndex.serveCacheSize} resident")
    } finally spark.conf.unset(SqIndex.ServeCodesBudgetKey)
  }

  test("serveLocal prefilter: applied before ranking, parity with batched (r16)") {
    val idx = buildIdx()
    SqIndex.serveUnpersist(idx)
    SqIndex.serveWarm(spark, idx, "vec_id", "embedding")
    val q = queryVec(0L)
    val batched = SqIndex.search(spark, idx, "vec_id", "embedding", q, 10,
        nprobes = 3, refineFactor = 6, prefilter = Some(col("vec_id") % 2 === 0))
      .select(col("vec_id"), col(Knn.DistanceCol))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = SqIndex.serveLocal(spark, idx, "vec_id", "embedding", q, 10,
      nprobes = 3, refineFactor = 6, allowed = Some(id => id % 2 == 0))
    assert(served == batched, s"$served != $batched")
    assert(served.size == 10 && served.forall(_._1 % 2 == 0))
  }
}
