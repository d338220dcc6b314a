package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** URL/domain-level corpus curation — the web-pipeline stages that run
  * BEFORE content filtering (RefinedWeb, arXiv:2306.01116 §2.1-2.2: URL
  * blocklist filtering and per-domain caps; CCNet/C4 apply the same
  * canonicalize-then-dedup shape). Every operator is deterministic,
  * engine-invariant, and composed from codegen'd string/window functions
  * so a DuckDB oracle can replay it exactly.
  *
  *  - [[normalizeUrl]]: canonical URL form (case, fragments, tracking
  *    params, default ports, `www.`, trailing slash) — the key under
  *    which exact URL dedup ([[Dedup.exactDedup]]) collapses re-crawls.
  *  - [[hostOf]] / [[registeredDomain]]: host extraction + a packaged
  *    multi-part-suffix table (public-suffix-style, last-2/last-3 labels).
  *  - [[blocklistFilter]]: drop documents whose host matches a blocked
  *    domain or any of its parents (the UT1-blocklist stage). The
  *    blocklist ships as a per-executor reference object probed by a
  *    codegen'd suffix-chain expression — ZERO joins and zero shuffles on
  *    the corpus side; [[blocklistFilterJoin]] is the join variant for
  *    blocklists too large to ship.
  *  - [[domainCap]]: exact per-domain document cap without a per-domain
  *    global sort — hierarchical rank (salted local row_number + a prefix
  *    sum over per-salt counts), the [[TextAnalysis.packShards]] device,
  *    so a 10⁸-document domain never serializes through one task.
  */
object UrlCuration {

  /** Tracking query parameters stripped by [[normalizeUrl]] (the common
    * utm/click-id set; extend per deployment). */
  val TrackingParamPattern = "utm_[a-z0-9]*|fbclid|gclid|msclkid"

  /** Multi-part public suffixes where the registered domain keeps THREE
    * labels (`foo.co.uk`), not two. A packaged subset of the public
    * suffix list's most common entries — the full list drops in as conf
    * without code changes ([[registeredDomain]] takes an override). */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.sg", "com.mx", "com.ar", "com.tr", "com.tw",
    "co.kr", "or.kr", "co.za", "org.za", "co.id", "co.th")

  /** Canonical URL form. Deterministic rewrite chain (each step one
    * codegen'd regexp/string op, identical semantics in DuckDB's RE2):
    *  1. trim; drop the `#fragment`;
    *  2. strip tracking params ([[TrackingParamPattern]]) and repair the
    *     separator debris (`?&` → `?`, `&&` runs → `&`, trailing `?`/`&`);
    *  3. lowercase the scheme+authority ONLY (paths stay case-sensitive),
    *     drop a leading `www.` and the scheme's default port;
    *  4. strip trailing slashes.
    * A URL with no `scheme://` authority is returned trimmed/defragged
    * but otherwise untouched (no guessing). */
  def normalizeUrl(url: Column): Column = {
    val t0 = regexp_replace(trim(url), "#.*$", "")
    val t1 = regexp_replace(t0, s"([?&])(?:$TrackingParamPattern)=[^&]*", "$1")
    val t2 = regexp_replace(regexp_replace(regexp_replace(
      t1, "&{2,}", "&"), "\\?&", "?"), "[?&]+$", "")
    val auth = regexp_extract(t2, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = t2.substr(length(auth) + 1, lit(1 << 20))
    val authLc = regexp_replace(
      regexp_replace(
        regexp_replace(lower(auth), "://www\\.", "://"),
        "^(http://[^/:]+):80$", "$1"),
      "^(https://[^/:]+):443$", "$1")
    val joined = when(length(auth) > 0, concat(authLc, rest)).otherwise(t2)
    regexp_replace(joined, "/+$", "")
  }

  /** Lower-cased host of a URL (userinfo and port stripped); empty string
    * when the URL carries no `scheme://` authority. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Registered (pay-level) domain of a host: last two labels, or last
    * three when the two-label tail is a multi-part suffix (`co.uk` et
    * al.). Hosts with ≤ 2 labels return unchanged. */
  def registeredDomain(host: Column,
                       multiPart: Seq[String] = MultiPartSuffixes): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(n <= 2, host)
      .otherwise(when(array_contains(typedLit(multiPart), last2), last3)
        .otherwise(last2))
  }

  /** Every dot-suffix of a host, shortest-first is NOT guaranteed —
    * `a.b.c` → `[a.b.c, b.c, c]`. The join variant's explode key. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Drop documents whose URL's host is a blocked domain or a subdomain
    * of one (UT1-style category blocklists; RefinedWeb §2.1). The set
    * ships ONCE per executor as a codegen reference object and each row
    * pays O(labels) hash probes — no join, no shuffle, the corpus scan
    * stays one codegen stage. Sized for driver-resident blocklists (UT1's
    * adult list ≈ 4M entries ≈ 10² MB); beyond that use
    * [[blocklistFilterJoin]]. A NULL url is KEPT (it has no host to
    * block) — the same answer the join variant gives, spec-pinned. */
  def blocklistFilter(df: DataFrame, urlCol: String,
                      blocked: Set[String]): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val set = new java.util.HashSet[String](blocked.size * 2)
    blocked.foreach(d => set.add(d.toLowerCase))
    val hit = ColumnBridge.column(
      HostBlocked(ColumnBridge.expression(hostOf(col(urlCol))),
        new HostBlocked.BlockSet(set)))
    df.filter(!coalesce(hit, lit(false)))
  }

  /** Join variant for blocklists too large to ship to executors: the
    * host's suffix chain explodes (≤ label-count rows/doc, bounded), hits
    * semi-join the blocklist (broadcast when small, shuffle-hash
    * otherwise), and the hit ids anti-join back. Two id-keyed shuffles —
    * the price of an out-of-memory blocklist. */
  def blocklistFilterJoin(df: DataFrame, urlCol: String, idCol: String,
                          blocklist: DataFrame): DataFrame = {
    val domCol = blocklist.columns.head
    val bl = blocklist.select(lower(col(domCol)).as("__sfx")).distinct()
    val hits = df
      .select(col(idCol), explode(hostSuffixes(hostOf(col(urlCol)))).as("__sfx"))
      .join(bl, Seq("__sfx"), "left_semi")
      .select(col(idCol)).distinct()
    df.join(hits, Seq(idCol), "left_anti")
  }

  private def hashBucket(idCol: String): Column =
    pmod(pmod(col(idCol).cast("long"), lit(10000L)) * lit(7919L), lit(10000L))

  /** Keep at most `cap` documents per domain — deterministically: rows
    * rank within their domain by the SAME multiplicative-hash permutation
    * the sampling operators use (then id), so the survivor set is
    * identical on every run, partitioning, and engine, and a DuckDB
    * oracle replays it as one `row_number()`.
    *
    * 100-TB shape: a plain `row_number() OVER (PARTITION BY domain)`
    * serializes each domain through one task — a 10⁸-page domain is
    * exactly what the cap exists for. Instead the rank is hierarchical
    * (the [[TextAnalysis.packShards]] prefix-sum device): the hash-bucket
    * range splits into `saltBuckets` ORDER-PRESERVING slices, row_number
    * runs per (domain, slice) — bounded by c/saltBuckets rows — and slice
    * offsets come from a prefix sum over the per-slice COUNT table
    * (|domains|·saltBuckets rows, never the corpus), joined back — the
    * join is left to AQE like packShards' offset join: at 10⁷⁺ distinct
    * domains a forced broadcast would collect the whole offset table to
    * the driver, while a small table broadcasts on its own.
    * Global rank = offset + local rank, exactly.
    *
    * NULL domains form their own capped group (the same grouping a plain
    * `row_number() OVER (PARTITION BY domain)` gives — both engines sort
    * NULL into one partition), carried through the join on an internal
    * non-null key so the inner equi-join cannot drop them.
    *
    * Cost note: the input is scanned twice (rank + count pass). The count
    * pass prunes to (domainCol, idCol); if domainCol is a DERIVED
    * expression (regexps over the url) rather than a stored column,
    * persist the projection first to pay the derivation once. */
  def domainCap(df: DataFrame, domainCol: String, idCol: String, cap: Int,
                saltBuckets: Int = 32): DataFrame = {
    require(cap > 0, s"domainCap needs a positive cap, got $cap")
    require(saltBuckets >= 1 && saltBuckets <= 10000,
      s"saltBuckets must be in [1, 10000], got $saltBuckets")
    val bkt = hashBucket(idCol)
    // non-null grouping key: NULL domains are one group, like row_number
    val domKey = coalesce(col(domainCol).cast("string"),
      lit(" __graft_null_domain__"))
    val w = df.withColumn("__dom", domKey)
      .withColumn("__bkt", bkt)
      .withColumn("__salt", (col("__bkt") * lit(saltBuckets) / lit(10000L)).cast("int"))
    val local = Window.partitionBy(col("__dom"), col("__salt"))
      .orderBy(col("__bkt"), col(idCol))
    val ranked = w.withColumn("__lr", row_number().over(local))
    val counts = w.groupBy(col("__dom"), col("__salt"))
      .agg(count(lit(1)).as("__c"))
    val pre = Window.partitionBy(col("__dom")).orderBy(col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(pre), lit(0L)))
      .select(col("__dom"), col("__salt"), col("__off"))
    ranked.join(offsets, Seq("__dom", "__salt"))
      .filter(col("__off") + col("__lr") <= cap)
      .drop("__dom", "__bkt", "__salt", "__lr", "__off")
  }
}

/** Is `host` equal to, or a subdomain of, any domain in `blocked`?
  * Codegen'd suffix-chain probe: walk the host right-to-left one label at
  * a time and test each suffix against the shipped HashSet — O(labels)
  * probes per row, no per-row allocation beyond the suffix substrings.
  * The set rides the stage's task binary (one broadcast per executor).
  * The set sits behind [[HostBlocked.BlockSet]]'s IDENTITY equality:
  * a case-class field of the raw HashSet would make every Catalyst
  * canonicalization / semantic-equality pass traverse all ~4M entries. */
case class HostBlocked(child: Expression, blocked: HostBlocked.BlockSet)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "host_blocked"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"host_blocked requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val host = input.toString
    HostBlocked.matches(host, blocked.set)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("blockedSet", blocked.set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.operators.HostBlocked.matches($h.toString(), $setRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HostBlocked {
  /** Identity-equality wrapper for the blocklist: Catalyst hashes and
    * compares expression trees during analysis/optimization, and a raw
    * HashSet field would make each pass O(|blocklist|). Two HostBlocked
    * expressions are semantically equal only when they share the SAME
    * set instance — conservative (no cross-query subexpression dedup),
    * never wrong. Serializable: ships inside the task binary as before. */
  final class BlockSet(val set: java.util.HashSet[String]) extends Serializable {
    override def hashCode(): Int = System.identityHashCode(this)
    override def equals(o: Any): Boolean = o match {
      case b: BlockSet => this eq b
      case _ => false
    }
  }

  /** Shared by eval and codegen: probe every dot-suffix of `host`. */
  def matches(host: String, blocked: java.util.HashSet[String]): Boolean = {
    if (blocked.isEmpty || host.isEmpty) return false
    var from = 0
    while (from >= 0 && from < host.length) {
      if (blocked.contains(if (from == 0) host else host.substring(from)))
        return true
      val dot = host.indexOf('.', from)
      from = if (dot < 0) -1 else dot + 1
    }
    false
  }
}
