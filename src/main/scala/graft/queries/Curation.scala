package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{TextAnalysis => TA, UrlCuration => UC}

/** URL/domain-level curation coverage (RefinedWeb §2.1-2.2): URL
  * canonicalization, blocklist filtering, exact per-domain caps — the
  * web-pipeline stages that run before content filtering. Each gate
  * synthesizes a deterministic `url` column from the documents table
  * (the corpus carries none) with the IDENTICAL expression on the Spark
  * and DuckDB sides, then the oracle replays the operator's arithmetic
  * step by step (the normalization regex chain is RE2/java.util.regex
  * common-subset, the cap rank is one `row_number()`).
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic URLs: mixed-case scheme/host (canonicalized)
    * and path (preserved), default port, `www.`, tracking params +
    * fragment on even ids, trailing slash on odd ids, a multi-part
    * public suffix for the `de` slice. The DuckDB twin is [[urlCte]]. */
  private def withUrl(s: SparkSession, d: String): DataFrame = {
    val tld = when(col("lang") === "de", lit("site.co.uk"))
      .otherwise(concat(lit("site-"), col("lang"), lit(".com")))
    Tables.documents(s, d).withColumn("url",
      concat(lit("HTTPS://WWW.cdn."), col("source"), lit("."), tld,
        lit(":443/Docs/"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("/?utm_source=x&page="), (col("doc_id") % 7).cast("string"),
            lit("&gclid=g123#top")))
          .otherwise(lit("/"))))
  }

  private val urlCte =
    """u AS (SELECT *, 'HTTPS://WWW.cdn.' || source || '.' ||
      |  (CASE WHEN lang = 'de' THEN 'site.co.uk'
      |        ELSE 'site-' || lang || '.com' END) ||
      |  ':443/Docs/' || doc_id ||
      |  (CASE WHEN doc_id % 2 = 0
      |        THEN '/?utm_source=x&page=' || (doc_id % 7) || '&gclid=g123#top'
      |        ELSE '/' END) AS url
      |  FROM documents)""".stripMargin

  /** DuckDB replay of [[UC.normalizeUrl]]'s rewrite chain, step for step. */
  private val normCte =
    """n0 AS (SELECT doc_id, regexp_replace(trim(url), '#.*$', '', 'g') AS t0 FROM u),
      |n1 AS (SELECT doc_id, regexp_replace(t0,
      |         '([?&])(?:utm_[a-z0-9]*|fbclid|gclid|msclkid)=[^&]*', '\1', 'g') AS t1
      |       FROM n0),
      |n2 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(t1,
      |         '&{2,}', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g') AS t2
      |       FROM n1),
      |n3 AS (SELECT doc_id, t2,
      |         regexp_extract(t2, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS auth
      |       FROM n2),
      |n4 AS (SELECT doc_id,
      |         CASE WHEN length(auth) > 0 THEN
      |           regexp_replace(regexp_replace(regexp_replace(lower(auth),
      |             '://www\.', '://'),
      |             '^(http://[^/:]+):80$', '\1'),
      |             '^(https://[^/:]+):443$', '\1') ||
      |           substr(t2, length(auth) + 1)
      |         ELSE t2 END AS joined
      |       FROM n3),
      |norm AS (SELECT doc_id, regexp_replace(joined, '/+$', '', 'g') AS url_norm
      |         FROM n4)""".stripMargin

  /** DuckDB replay of [[UC.hostOf]] + [[UC.registeredDomain]] (the
    * packaged multi-part-suffix table inlined). */
  private val hostCte = {
    val suffixes = UC.MultiPartSuffixes.map(s => s"'$s'").mkString(", ")
    s"""h0 AS (SELECT doc_id,
       |         lower(regexp_extract(url, '://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host
       |       FROM u),
       |h1 AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h0),
       |hosts AS (SELECT doc_id, host,
       |         CASE WHEN len(ls) <= 2 THEN host
       |              WHEN (ls[-2] || '.' || ls[-1]) IN ($suffixes)
       |                THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
       |              ELSE ls[-2] || '.' || ls[-1] END AS domain
       |       FROM h1)""".stripMargin
  }

  /** UT1-style blocklist for the gate: one registered domain (kills the
    * whole `de` slice via suffix match), one exact host, one subdomain
    * parent — exercising all three match shapes. */
  private val Blocked = Seq("site.co.uk", "cdn.src1.site-en.com", "src3.site-fr.com")

  val queries: Map[String, Q] = Map(
    // URL canonicalization: scheme/host case, www., default port,
    // tracking params, fragment, trailing slash — plus host extraction
    // and public-suffix registered domain. The oracle replays every
    // rewrite step with the same regexes.
    "q_url_normalize" -> { (s, d) =>
      val u = withUrl(s, d)
      u.select(col("doc_id"),
          UC.normalizeUrl(col("url")).as("url_norm"),
          UC.hostOf(col("url")).as("host"),
          UC.registeredDomain(UC.hostOf(col("url"))).as("domain"))
        .orderBy(col("doc_id"))
    },

    // Blocklist filtering (RefinedWeb §2.1): drop docs whose host is a
    // blocked domain or any subdomain of one. The codegen'd suffix-probe
    // expression ([[graft.operators.HostBlocked]]) — no join, no shuffle.
    "q_url_blocklist" -> { (s, d) =>
      UC.blocklistFilter(withUrl(s, d), "url", Blocked.toSet)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("source"))
    },

    // Exact per-domain cap (RefinedWeb §2.2 domain diversity): keep at
    // most 30 docs per registered domain, chosen by the deterministic
    // hash permutation — the hierarchical (salted) rank, never one
    // window partition per domain. saltBuckets=8 exercises the prefix
    // sum; the oracle is a plain row_number() replay.
    "q_domain_cap" -> { (s, d) =>
      val docs = withUrl(s, d)
        .withColumn("domain", UC.registeredDomain(UC.hostOf(col("url"))))
      val capped = UC.domainCap(docs, "domain", "doc_id", 30, saltBuckets = 8)
      TA.requirePartitionedWindows(capped, "q_domain_cap")
      capped.groupBy(col("domain"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("domain"))
    })

  val oracleSql: Map[String, String] = Map(
    "q_url_normalize" ->
      s"""WITH $urlCte,
         |$normCte,
         |$hostCte
         |SELECT n.doc_id, n.url_norm, h.host, h.domain
         |FROM norm n JOIN hosts h ON n.doc_id = h.doc_id
         |ORDER BY n.doc_id""".stripMargin,
    "q_url_blocklist" -> {
      val cond = Blocked.map(b =>
        s"(host = '$b' OR host LIKE '%.' || '$b')").mkString(" OR ")
      s"""WITH $urlCte,
         |$hostCte
         |SELECT u.source, count(*) AS n, CAST(sum(u.doc_id) AS BIGINT) AS id_sum
         |FROM u JOIN hosts h ON u.doc_id = h.doc_id
         |WHERE NOT ($cond)
         |GROUP BY u.source ORDER BY u.source""".stripMargin
    },
    "q_domain_cap" ->
      s"""WITH $urlCte,
         |$hostCte,
         |r AS (SELECT doc_id, domain,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY ((doc_id % 10000) * 7919) % 10000, doc_id) AS rk
         |      FROM hosts)
         |SELECT domain, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM r WHERE rk <= 30
         |GROUP BY domain ORDER BY domain""".stripMargin)
}
