package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{UrlCuration => UC}

class UrlCurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(UC.normalizeUrl(col("url")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("normalizeUrl: case, www, ports, tracking params, fragments, slashes") {
    assert(norm("HTTPS://WWW.Example.COM:443/Path/To/X/") ==
      Seq("https://example.com/Path/To/X")) // path case preserved
    assert(norm("http://example.com:80/a") == Seq("http://example.com/a"))
    assert(norm("http://example.com:8080/a") == Seq("http://example.com:8080/a"))
    assert(norm("https://a.com/p?utm_source=x&keep=1&fbclid=z#frag") ==
      Seq("https://a.com/p?keep=1"))
    // every param is tracking → the query evaporates entirely
    assert(norm("https://a.com/p?utm_a=1&utm_b=2&gclid=3") ==
      Seq("https://a.com/p"))
    assert(norm("  https://a.com/  ") == Seq("https://a.com"))
    // no scheme: defrag/trim only, no authority guessing
    assert(norm("example.com/Path#f") == Seq("example.com/Path"))
  }

  test("hostOf strips userinfo and port; registeredDomain honors multi-part suffixes") {
    val hosts = Seq(
      "https://User:p@Sub.Example.COM:8443/x",
      "https://cdn.news.co.uk/a",
      "https://single/a").toDF("url")
      .select(UC.hostOf(col("url")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(hosts == Seq("sub.example.com", "cdn.news.co.uk", "single"))
    val doms = Seq("a.b.example.com", "cdn.news.co.uk", "news.co.uk",
      "example.com", "localhost").toDF("h")
      .select(UC.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(doms == Seq("example.com", "news.co.uk", "news.co.uk",
      "example.com", "localhost"))
  }

  test("blocklistFilter: subdomain semantics, case-insensitive; join variant agrees") {
    val docs = Seq(
      (1L, "https://ads.example.com/x"),     // subdomain of blocked
      (2L, "https://example.com/y"),         // exact blocked
      (3L, "https://notexample.com/z"),      // NOT a subdomain (no dot match)
      (4L, "https://EXAMPLE.com/w"),         // case-insensitive host
      (5L, "https://fine.org/ok"),
      (6L, "https://deep.ads.tracker.net/q") // subdomain chain, blocked parent
    ).toDF("id", "url")
    val blocked = Set("example.com", "tracker.net")
    val kept = UC.blocklistFilter(docs, "url", blocked)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 5L))
    val keptJoin = UC.blocklistFilterJoin(docs, "url", "id",
        blocked.toSeq.toDF("domain"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(keptJoin == kept, "join variant must agree with the probe variant")
    // empty blocklist keeps everything
    assert(UC.blocklistFilter(docs, "url", Set.empty).count() == 6)
    // a NULL url has no host to block: BOTH variants keep the row
    val withNull = docs.unionByName(
      Seq((7L, Option.empty[String])).toDF("id", "url"))
    val keptNull = UC.blocklistFilter(withNull, "url", blocked)
      .select("id").as[Long].collect().sorted.toSeq
    assert(keptNull == Seq(3L, 5L, 7L), keptNull.toString)
    val keptNullJoin = UC.blocklistFilterJoin(withNull, "url", "id",
        blocked.toSeq.toDF("domain"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(keptNullJoin == keptNull, "variants must agree on NULL urls")
  }

  test("domainCap: hierarchical rank equals the naive per-domain row_number, any salt") {
    val docs = (1L to 400L).map(i =>
      (i, s"d${i % 7}")).toDF("id", "domain")
    val bucket = pmod(pmod(col("id"), lit(10000L)) * lit(7919L), lit(10000L))
    val naive = docs.withColumn("rk",
        row_number().over(Window.partitionBy(col("domain"))
          .orderBy(bucket, col("id"))))
      .filter(col("rk") <= 20).select("id").as[Long].collect().sorted.toSeq
    for (salt <- Seq(1, 7, 32)) {
      val got = UC.domainCap(docs, "domain", "id", 20, saltBuckets = salt)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == naive, s"saltBuckets=$salt")
    }
    // partitioning-invariant: same survivors from a reshuffled input
    val reshuffled = UC.domainCap(docs.repartition(13), "domain", "id", 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(reshuffled == naive)
    // cap above the domain size keeps everything
    assert(UC.domainCap(docs, "domain", "id", 1000).count() == 400)
    // every window in the plan is partitioned (the 100-TB guard)
    graft.operators.TextAnalysis.requirePartitionedWindows(
      UC.domainCap(docs, "domain", "id", 20), "domainCap")
    intercept[IllegalArgumentException] {
      UC.domainCap(docs, "domain", "id", 0)
    }
    // NULL domains are one capped group (row_number semantics), never
    // silently dropped by the offset join
    val withNulls = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) "d0" else null)).toDF("id", "domain")
    val gotNull = UC.domainCap(withNulls, "domain", "id", 10)
    assert(gotNull.filter(col("domain").isNull).count() == 10)
    assert(gotNull.filter(col("domain") === "d0").count() == 10)
  }
}
