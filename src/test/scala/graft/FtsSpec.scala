package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Fts

class FtsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "the lazy dog sleeps"),
    (3L, "quick quick quick fox runs"),
    (4L, "a brown dog and a brown fox"),
    (5L, "nothing relevant here")
  ).toDF("doc_id", "text")

  private def buildTmpIndex(): String = {
    val dir = Files.createTempDirectory("fts_idx_").toString
    Fts.buildIndex(corpus, "doc_id", "text", dir)
    dir
  }

  test("match query ranks higher tf first; indexed == flat") {
    val idx = buildTmpIndex()
    val indexed = Fts.matchQuery(spark, idx, Seq("quick", "fox"), 5)
      .as[(Long, Double)].collect().toSeq
    val flat = Fts.matchFlat(corpus, "doc_id", "text", Seq("quick", "fox"), 5)
      .as[(Long, Double)].collect().toSeq
    assert(indexed.map(_._1) == flat.map(_._1))
    indexed.zip(flat).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
    assert(indexed.head._1 == 3L) // tf(quick)=3 dominates
    assert(!indexed.map(_._1).contains(5L))
  }

  test("phrase query requires adjacency") {
    val idx = buildTmpIndex()
    val got = Fts.phraseQuery(spark, idx, Seq("quick", "brown")).as[Long].collect().toSet
    assert(got == Set(1L)) // only doc 1 has "quick brown" adjacent
    val rev = Fts.phraseQuery(spark, idx, Seq("brown", "fox")).as[Long].collect().toSet
    assert(rev == Set(1L, 4L))
  }

  test("three-term phrase") {
    val idx = buildTmpIndex()
    val got = Fts.phraseQuery(spark, idx, Seq("the", "quick", "brown")).as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("boolean: must + should + mustNot") {
    val idx = buildTmpIndex()
    // must contain fox, boost brown, exclude lazy
    val got = Fts.booleanQuery(spark, idx, Seq("fox"), Seq("brown"), Seq("lazy"), 10)
      .as[(Long, Double)].collect().toSeq
    val ids = got.map(_._1).toSet
    assert(ids == Set(1L, 3L, 4L)) // 2 and 5 lack fox (must); 2 also excluded by lazy
    // results sorted by score descending
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("containsTokens column + SQL registration agree") {
    val df = corpus
    val viaCol = df.filter(Fts.containsTokens($"text", "quick fox"))
      .select("doc_id").as[Long].collect().toSet
    assert(viaCol == Set(1L, 3L))
    Fts.registerSql(spark)
    df.createOrReplaceTempView("fts_corpus")
    val viaSql = spark.sql(
      "SELECT doc_id FROM fts_corpus WHERE contains_tokens(text, 'quick fox')")
      .as[Long].collect().toSet
    assert(viaSql == viaCol)
  }

  test("tokenizer lowercases and splits punctuation") {
    val toks = Seq((1L, "Hello, World! FOO-bar 42"))
      .toDF("id", "t")
      .select(Fts.tokenize($"t")).as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("phrase slop allows bounded gaps, keeps order") {
    val idx = buildTmpIndex()
    // "quick brown" with one word between: doc 1 is "the quick brown fox" —
    // "quick fox" are 2 apart there; slop=1 matches, slop=0 does not
    assert(Fts.phraseQuery(spark, idx, Seq("quick", "fox"), slop = 0)
      .as[Long].collect().toSet == Set(3L)) // "quick fox" adjacent only in doc 3
    assert(Fts.phraseQuery(spark, idx, Seq("quick", "fox"), slop = 1)
      .as[Long].collect().toSet == Set(1L, 3L)) // gap of 1 admits doc 1
    // order still enforced: "fox quick" never matches doc 1
    assert(Fts.phraseQuery(spark, idx, Seq("fox", "quick"), slop = 1)
      .as[Long].collect().toSet == Set.empty[Long])
  }

  test("optimizeIndex: incremental build equals full rebuild exactly") {
    val half1 = corpus.filter($"doc_id" <= 3)
    val half2 = corpus.filter($"doc_id" > 3)
    val incDir = Files.createTempDirectory("fts_inc_").toString
    Fts.buildIndex(half1, "doc_id", "text", incDir)
    Fts.optimizeIndex(half2, "doc_id", "text", incDir)
    val fullDir = buildTmpIndex()
    for (terms <- Seq(Seq("quick", "fox"), Seq("brown"), Seq("dog", "sleeps"))) {
      val inc = Fts.matchQuery(spark, incDir, terms, 5).as[(Long, Double)].collect().toSeq
      val full = Fts.matchQuery(spark, fullDir, terms, 5).as[(Long, Double)].collect().toSeq
      assert(inc.map(_._1) == full.map(_._1), s"doc order for $terms")
      inc.zip(full).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
    }
    // phrase positions survive the delta append
    assert(Fts.phraseQuery(spark, incDir, Seq("brown", "fox")).as[Long].collect().toSet ==
      Fts.phraseQuery(spark, fullDir, Seq("brown", "fox")).as[Long].collect().toSet)
  }
}
