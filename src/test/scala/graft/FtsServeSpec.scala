package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Fts

/** Driver-local single-query FTS serving (r15, VERDICT r14 #4): parity
  * with the batched matchQuery/booleanQuery/fuzzyQuery top-k, the no-job
  * guarantee when warm, the staleness guard, and the budget refusals. */
class FtsServeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val idx: String = {
    val dir = Files.createTempDirectory("fts_serve_").toString
    Fts.buildIndex(Tables.documents(spark, sf), "doc_id", "text", dir)
    dir
  }

  test("serveLocal matches matchQuery top-k (ids AND scores), zero jobs when warm") {
    Fts.serveUnpersist(idx)
    val terms = Seq("spark", "vector")
    val resident = Fts.serveWarm(spark, idx, terms)
    assert(resident > 0, "warm must load the query terms' postings")
    val batched = Fts.matchQuery(spark, idx, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val served = Fts.serveLocal(spark, idx, terms, 20)
    assert(tracker.getJobIdsForGroup(null).length == before,
      "warm serveLocal must not launch a Spark job")
    assert(served == batched, s"$served != $batched")
  }

  test("3+-term queries: canonical-order sums keep serve/batched bit-parity (r16)") {
    // with 3+ distinct terms per doc, fp addition order matters at the ulp
    // level; both sides now fold ascending-sorted addends (ADVICE r15 #2),
    // so ids AND raw double scores must be identical — and the batched
    // score must be partitioning-invariant
    Fts.serveUnpersist(idx)
    for (terms <- Seq(Seq("spark", "vector", "table"),
                      Seq("spark", "vector", "table", "data", "query"))) {
      val batched = Fts.matchQuery(spark, idx, terms, 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val served = Fts.serveLocal(spark, idx, terms, 50)
      assert(served == batched, s"$terms: $served != $batched")
      // at least one doc must actually match 3+ terms or this proves nothing
      val multi = spark.read.parquet(s"$idx/postings")
        .filter(col("token").isin(terms: _*))
        .groupBy("doc_id").count().filter(col("count") >= 3).count()
      assert(multi > 0, s"fixture too weak: no doc matches 3+ of $terms")
    }
  }

  test("serveBoolean and serveFuzzy match their batched twins") {
    Fts.serveUnpersist(idx)
    val boolBatched = Fts.booleanQuery(spark, idx,
      must = Seq("table"), should = Seq("vector"), mustNot = Seq("slow"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val boolServed = Fts.serveBoolean(spark, idx,
      must = Seq("table"), should = Seq("vector"), mustNot = Seq("slow"), k = 20)
    assert(boolServed == boolBatched, s"$boolServed != $boolBatched")
    // a must term with no postings empties the result, like the batched
    // intersect over an empty leg
    assert(Fts.serveBoolean(spark, idx, Seq("zzzznothere"), Seq("vector"),
      Nil, 10).isEmpty)
    val fuzzBatched = Fts.fuzzyQuery(spark, idx, Seq("vectr"),
      fuzziness = 1, prefixLength = 1, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fuzzServed = Fts.serveFuzzy(spark, idx, Seq("vectr"),
      fuzziness = 1, prefixLength = 1, k = 20)
    assert(fuzzServed == fuzzBatched, s"$fuzzServed != $fuzzBatched")
  }

  test("servePhrase and serveBoost match their batched twins") {
    Fts.serveUnpersist(idx)
    val phraseBatched = Fts.phraseQuery(spark, idx, Seq("hash join"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val phraseServed = Fts.servePhrase(spark, idx, Seq("hash join"))
    assert(phraseServed == phraseBatched, s"$phraseServed != $phraseBatched")
    assert(phraseBatched.nonEmpty, "fixture phrase must match something")
    // slop variant
    val slopBatched = Fts.phraseQuery(spark, idx, Seq("hash join"), slop = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(Fts.servePhrase(spark, idx, Seq("hash join"), slop = 2) == slopBatched)
    // warm phrase serving runs zero jobs
    Fts.servePhrase(spark, idx, Seq("hash join"))
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    Fts.servePhrase(spark, idx, Seq("hash join"))
    assert(tracker.getJobIdsForGroup(null).length == before)
    val boostBatched = Fts.boostQuery(spark, idx, Seq("table"), Seq("slow"),
      negativeBoost = 0.5, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val boostServed = Fts.serveBoost(spark, idx, Seq("table"), Seq("slow"),
      negativeBoost = 0.5, k = 20)
    assert(boostServed == boostBatched, s"$boostServed != $boostBatched")
  }

  test("serveMultiMatch matches the batched multiMatch (ids AND scores) (r16)") {
    // two field indexes over the same corpus: full text (boost 1) and a
    // derived title field = first 3 tokens (boost 2), max-combined —
    // the q_fts_multimatch shape at spec scale
    val docs = Tables.documents(spark, sf)
    val fullDir = Files.createTempDirectory("fts_mm_full_").toString
    Fts.buildIndex(docs, "doc_id", "text", fullDir)
    val titleDir = Files.createTempDirectory("fts_mm_title_").toString
    Fts.buildIndex(
      docs.select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 3)).as("title")),
      "doc_id", "title", titleDir)
    Fts.serveUnpersist(fullDir); Fts.serveUnpersist(titleDir)
    val fields = Seq((titleDir, 2.0), (fullDir, 1.0))
    val terms = Seq("spark", "vector")
    val batched = Fts.multiMatch(spark, fields, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = Fts.serveMultiMatch(spark, fields, terms, 20)
    assert(served == batched, s"$served != $batched")
    assert(batched.nonEmpty, "fixture must match something")
    // warm: zero jobs
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    Fts.serveMultiMatch(spark, fields, terms, 20)
    assert(tracker.getJobIdsForGroup(null).length == before,
      "warm serveMultiMatch must not launch a Spark job")
  }

  test("staleness guard: rebuild at the same path serves the NEW index") {
    // pin the epoch-recheck throttle off: the guard semantics under test
    // must not depend on the rebuild outlasting the TTL window (r16)
    spark.conf.set("spark.graft.serve.epoch.ttl.ms", "0")
    try {
      val dir = Files.createTempDirectory("fts_serve_stale_").toString
      Fts.buildIndex(Seq((1L, "alpha beta"), (2L, "alpha gamma"))
        .toDF("doc_id", "text"), "doc_id", "text", dir)
      Fts.serveUnpersist(dir)
      assert(Fts.serveLocal(spark, dir, Seq("alpha"), 10).map(_._1).toSet ==
        Set(1L, 2L))
      // rebuild in place over different docs, NO explicit unpersist: the
      // epoch guard alone must drop the resident state
      Fts.buildIndex(Seq((7L, "alpha delta"), (8L, "epsilon"))
        .toDF("doc_id", "text"), "doc_id", "text", dir)
      val served = Fts.serveLocal(spark, dir, Seq("alpha"), 10)
      assert(served.map(_._1) == Seq(7L),
        s"stale serve state answered for the dropped index: $served")
    } finally spark.conf.unset("spark.graft.serve.epoch.ttl.ms")
  }

  test("budgets: doc-count refusal, term-LRU shrink eviction, warm refusal") {
    Fts.serveUnpersist(idx)
    spark.conf.set(Fts.ServeDocBudgetKey, "3") // corpus is far bigger
    try {
      val e = intercept[IllegalArgumentException] {
        Fts.serveLocal(spark, idx, Seq("spark"), 5)
      }
      assert(e.getMessage.contains(Fts.ServeDocBudgetKey), e.getMessage)
    } finally spark.conf.unset(Fts.ServeDocBudgetKey)
    // term LRU: shrinking the budget evicts down immediately
    Fts.serveUnpersist(idx)
    spark.conf.set(Fts.ServeTermBudgetKey, "8")
    try {
      Fts.serveWarm(spark, idx, Seq("spark", "vector", "table", "hash"))
      assert(Fts.serveCacheSize >= 4)
      spark.conf.set(Fts.ServeTermBudgetKey, "2")
      Fts.serveLocal(spark, idx, Seq("spark"), 5)
      assert(Fts.serveCacheSize <= 2,
        s"shrunk budget left ${Fts.serveCacheSize} resident")
      // warming more terms than the budget refuses instead of thrashing
      val e2 = intercept[IllegalArgumentException] {
        Fts.serveWarm(spark, idx, Seq("spark", "vector", "table"))
      }
      assert(e2.getMessage.contains("serve budget"), e2.getMessage)
    } finally spark.conf.unset(Fts.ServeTermBudgetKey)
  }
}
