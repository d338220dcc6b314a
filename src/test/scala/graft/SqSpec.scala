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
}
