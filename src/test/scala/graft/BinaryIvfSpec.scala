package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.{BinaryIvfIndex, Knn, PackSignBits}

/** Hamming-metric binary-vector ANN (reference Hamming as a first-class
  * DistanceType, `rust/lance-index/src/vector.rs:124`,
  * `rust/lance-linalg/src/distance/hamming.rs`): sign-bit packing,
  * k-majority training, full-probe == flat equivalence, and the combined
  * fresh/delete discipline every other family follows.
  */
class BinaryIvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def packed(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out, ColumnBridge.column(PackSignBits(ColumnBridge.expression(col(in)))))

  /** n deterministic 64-dim float vectors → 8-byte packed binary. */
  private def vectors(n: Int): DataFrame =
    spark.range(0, n).toDF("id")
      .withColumn("emb",
        expr("transform(sequence(0, 63), j -> CAST(sin(id * 131 + j * 17) AS FLOAT))"))
      .transform(d => packed(d, "emb", "bvec"))
      .select(col("id"), col("bvec"))

  test("pack_sign_bits: bit i = (x_i >= 0), zero-padded to whole bytes") {
    val df = Seq((1L, Array(1.0f, -2.0f, 3.0f, -4.0f, 0.0f, -1.0f, 2.0f, -3.0f, 5.0f)))
      .toDF("id", "v")
    val b = packed(df, "v", "b").select("b").head().getAs[Array[Byte]](0)
    assert(b.toSeq == Seq(0xAA.toByte, 0x80.toByte))
  }

  test("full-probe binary IVF search equals the flat hamming scan") {
    val dir = Files.createTempDirectory("graft_bivf_").toString
    val vecs = vectors(500).cache()
    val q = vecs.filter(col("id") === 0L).head().getAs[Array[Byte]](1)
    BinaryIvfIndex.build(vecs, "id", "bvec", dir, nlist = 8)
    val exact = BinaryIvfIndex.search(spark, dir, "id", "bvec", q, k = 10, nprobes = 8)
      .select(col("id"), col(Knn.DistanceCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val flat = Knn.flatSearchBinary(vecs, "bvec", q, 10, tieBreakers = Seq(col("id")))
      .select(col("id"), col(Knn.DistanceCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact == flat, s"full probe must equal flat:\n$exact\n$flat")
    assert(exact.head == (0L, 0L), "the query vector itself is its own nearest")
    // narrow probes still return k rows (approximate, never short)
    assert(BinaryIvfIndex.search(spark, dir, "id", "bvec", q, k = 10, nprobes = 2)
      .collect().length == 10)
    vecs.unpersist()
  }

  test("k-majority: majority bits, exact ties -> 1, empty cluster kept") {
    val data = Array(Array(0xF0.toByte), Array(0xF0.toByte), Array(0x0F.toByte))
    val cents = Array(Array(0xF0.toByte), Array(0x0F.toByte), Array(0xFF.toByte))
    val out = BinaryIvfIndex.kMajorityStep(data, cents)
    assert(out(0).toSeq == Seq(0xF0.toByte), "two 0xF0 members → majority 0xF0")
    assert(out(1).toSeq == Seq(0x0F.toByte))
    assert(out(2).toSeq == Seq(0xFF.toByte), "empty cluster keeps its centroid")
  }

  test("optimizeForTable: append-assign fresh fragments, REMAP after compaction") {
    val t = Files.createTempDirectory("graft_bivf_o_").toString + "/t"
    val idx = Files.createTempDirectory("graft_bivf_oi_").toString
    val vecs = vectors(200)
    GraftTable.write(vecs, t, "overwrite")
    BinaryIvfIndex.buildForTable(spark, t, "id", "bvec", idx, nlist = 4)
    val q = vecs.filter(col("id") === 5L).head().getAs[Array[Byte]](1)
    // append a twin under a new id; after optimize, even the INDEXED-ONLY
    // path (fast_search) must see it — it was assigned into the dataset
    GraftTable.write(vecs.filter(col("id") === 5L).withColumn("id", lit(8888L)),
      t, "append")
    assert(BinaryIvfIndex.optimizeForTable(spark, t, "id", "bvec", idx) == 1L)
    val rf = BinaryIvfIndex.searchCombined(spark, t, idx, "id", "bvec", q,
      k = 5, nprobes = 4, fastSearch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rf.contains((8888L, 0L)), rf.toString)
    // delete + compact retires the covered fragment ids; optimize REMAPs
    // addresses (assignments untouched) and the index serves exact again
    GraftTable.delete(spark, t, "id = 5")
    GraftTable.compact(spark, t)
    BinaryIvfIndex.optimizeForTable(spark, t, "id", "bvec", idx)
    val r = BinaryIvfIndex.searchCombined(spark, t, idx, "id", "bvec", q,
      k = 5, nprobes = 4).collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val flat = Knn.flatSearchBinary(GraftTable.read(spark, t), "bvec", q, 5,
      tieBreakers = Seq(col("id"))).select(col("id"), col(Knn.DistanceCol))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == flat, s"post-remap full-probe must equal flat:\n$r\n$flat")
    assert(!r.exists(_._1 == 5L) && r.contains((8888L, 0L)), r.toString)
  }

  test("combined: fresh appends included, deletes masked, fast_search indexed-only") {
    val t = Files.createTempDirectory("graft_bivf_t_").toString + "/t"
    val idx = Files.createTempDirectory("graft_bivf_i_").toString
    val vecs = vectors(300)
    GraftTable.write(vecs, t, "overwrite")
    BinaryIvfIndex.buildForTable(spark, t, "id", "bvec", idx, nlist = 4)
    val q = vecs.filter(col("id") === 7L).head().getAs[Array[Byte]](1)
    val r0 = BinaryIvfIndex.searchCombined(spark, t, idx, "id", "bvec", q,
      k = 5, nprobes = 4).collect()
    assert(r0.head.getLong(0) == 7L && r0.head.getLong(1) == 0L, r0.mkString(","))
    // append an identical vector under a new id — combined must surface it
    GraftTable.write(vecs.filter(col("id") === 7L).withColumn("id", lit(9999L)),
      t, "append")
    val r1 = BinaryIvfIndex.searchCombined(spark, t, idx, "id", "bvec", q,
      k = 5, nprobes = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r1.contains((7L, 0L)) && r1.contains((9999L, 0L)), r1.toString)
    // fast_search trades freshness for latency: the twin is invisible
    val rf = BinaryIvfIndex.searchCombined(spark, t, idx, "id", "bvec", q,
      k = 5, nprobes = 4, fastSearch = true).collect().map(_.getLong(0)).toSeq
    assert(!rf.contains(9999L) && rf.head == 7L, rf.toString)
    // delete the original — masked from indexed candidates before top-k
    GraftTable.delete(spark, t, "id = 7")
    val r2 = BinaryIvfIndex.searchCombined(spark, t, idx, "id", "bvec", q,
      k = 5, nprobes = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!r2.exists(_._1 == 7L) && r2.contains((9999L, 0L)), r2.toString)
  }

  test("serveLocal: driver-local hamming serving matches the batched search, no jobs warm (r16)") {
    val dir = Files.createTempDirectory("graft_bivf_serve_").toString
    val vecs = vectors(500).cache()
    BinaryIvfIndex.build(vecs, "id", "bvec", dir, nlist = 8)
    BinaryIvfIndex.serveUnpersist(dir)
    val resident = BinaryIvfIndex.serveWarm(spark, dir, "id", "bvec")
    assert(resident == 500L, s"$resident resident")
    Seq(0L, 42L, 311L).foreach { qid =>
      val q = vecs.filter(col("id") === qid).head().getAs[Array[Byte]](1)
      val batched = BinaryIvfIndex.search(spark, dir, "id", "bvec", q,
          k = 10, nprobes = 8)
        .select(col("id"), col(Knn.DistanceCol)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val tracker = spark.sparkContext.statusTracker
      val before = tracker.getJobIdsForGroup(null).length
      val served = BinaryIvfIndex.serveLocal(spark, dir, "id", "bvec", q,
        10, nprobes = 8)
      assert(tracker.getJobIdsForGroup(null).length == before,
        "warm hamming serveLocal launched a Spark job")
      assert(served == batched, s"qid=$qid: $served != $batched")
    }
    // id-predicate prefilter parity vs the batched Column prefilter
    val q = vecs.filter(col("id") === 5L).head().getAs[Array[Byte]](1)
    val batchedPf = BinaryIvfIndex.search(spark, dir, "id", "bvec", q,
        k = 10, nprobes = 8, prefilter = Some(col("id") % 3 === 1))
      .select(col("id"), col(Knn.DistanceCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val servedPf = BinaryIvfIndex.serveLocal(spark, dir, "id", "bvec", q,
      10, nprobes = 8, allowed = Some(id => id % 3 == 1))
    assert(servedPf == batchedPf, s"$servedPf != $batchedPf")
    // staleness: in-place rebuild over a disjoint id range serves the NEW
    // index (deep-epoch guard, ttl pinned off)
    spark.conf.set("spark.graft.serve.epoch.ttl.ms", "0")
    try {
      val dir2 = Files.createTempDirectory("graft_bivf_stale_").toString
      BinaryIvfIndex.build(vecs.filter(col("id") < 250), "id", "bvec", dir2, nlist = 4)
      BinaryIvfIndex.serveUnpersist(dir2)
      assert(BinaryIvfIndex.serveLocal(spark, dir2, "id", "bvec", q, 5, nprobes = 4)
        .forall(_._1 < 250))
      BinaryIvfIndex.build(vecs.filter(col("id") >= 250), "id", "bvec", dir2, nlist = 4)
      val fresh = BinaryIvfIndex.serveLocal(spark, dir2, "id", "bvec", q, 5, nprobes = 4)
      assert(fresh.forall(_._1 >= 250), s"stale hamming serve: $fresh")
    } finally spark.conf.unset("spark.graft.serve.epoch.ttl.ms")
    BinaryIvfIndex.serveUnpersist(dir)
  }
}
