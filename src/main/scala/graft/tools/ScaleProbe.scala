package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Fts, IvfIndex, TextAnalysis => TA, UrlCuration}

/** Scaling-curve harness: replicate the sf0.1 inputs ×1/×8/×64 (docs,
  * embeddings) and ×1/×4/×16 (lineitem/orders), run the heaviest operator
  * families at each factor, and report wall time + fitted scaling exponent
  * per operator.
  *
  * The point is 100 TB evidence: correctness gates prove the operators
  * right at one size; this measures how their cost GROWS. An operator whose
  * measured exponent between the two largest factors is ~1.0 scales
  * linearly in input size (the best a full-data operator can do); >1.2
  * would flag a super-linear stage (e.g. a candidate-pair explosion) that a
  * 1000-executor cluster cannot buy back.
  *
  * Replication preserves the property each operator's cost depends on:
  *  - near-dup corpora are WORD-SALTED per copy (`c3xWORD`) — token
  *    universes are disjoint across copies, so duplicate DENSITY (pairs per
  *    doc) stays constant as the corpus grows; plain replication would make
  *    every doc an exact dup of f−1 others and quadratically explode the
  *    true pair count, measuring the data change rather than the engine.
  *  - FTS corpora replicate UNSALTED with shifted doc ids — per-token
  *    postings lists grow linearly, the realistic "same language, more
  *    documents" regime; match-time work grows with df(term).
  *  - embeddings get a per-copy deterministic jitter so k-means does not
  *    degenerate on 64 identical copies of every point.
  *  - lineitem/orders shift their join keys per copy — join fan-out per key
  *    stays constant (more keys, not hotter keys).
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [outDir] [op1,op2,...]
  * Env: SPARK_GRAFT_CPUS (32), SPARK_GRAFT_SHUFFLE (32), SCALE_REPS (2).
  * Prints one `SCALE ...` line per (op, factor, rep) and a final JSON
  * summary with per-op exponents. The optional op list restricts the run
  * (replicated inputs are cached in outDir, so a subset re-run is cheap).
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/scaleprobe")
    val onlyOps: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.getOrElse("SCALE_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import java.nio.file.{Files, Paths}

    // default sweep ×1/×8/×64 (docs) and ×1/×4/×16 (row tables); env
    // overrides extend the tail (the r13 ×256 confirmation sweep runs
    // SCALE_DOC_FACTORS=64,256 on the steepest curves)
    def factorsEnv(key: String, dflt: Seq[Int]): Seq[Int] =
      sys.env.get(key).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(dflt)
    val docFactors = factorsEnv("SCALE_DOC_FACTORS", Seq(1, 8, 64))
    val rowFactors = factorsEnv("SCALE_ROW_FACTORS", Seq(1, 4, 16))

    // ---- replicated inputs (written once, read back for every timing) ----
    def ensure(path: String)(write: => Unit): Unit =
      if (!Files.exists(Paths.get(path, "_SUCCESS"))) write

    def docsSalted(f: Int): String = {
      val p = s"$outDir/docs_salted_x$f"
      ensure(p) {
        val base = Tables.documents(spark, sfDir)
        (0 until f).map { i =>
          val shifted = base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
          if (i == 0) shifted
          else shifted.withColumn("text", regexp_replace(col("text"), "(\\w+)", s"c${i}x$$1"))
        }.reduce(_ unionByName _)
          .repartition(math.max(4, f))
          .write.mode(SaveMode.Overwrite).parquet(p)
      }
      p
    }
    def docsPlain(f: Int): String = {
      val p = s"$outDir/docs_plain_x$f"
      ensure(p) {
        val base = Tables.documents(spark, sfDir)
        (0 until f).map { i =>
          base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
        }.reduce(_ unionByName _)
          .repartition(math.max(4, f))
          .write.mode(SaveMode.Overwrite).parquet(p)
      }
      p
    }
    def embs(f: Int): String = {
      val p = s"$outDir/embs_x$f"
      ensure(p) {
        val base = Tables.embeddings(spark, sfDir)
        (0 until f).map { i =>
          base.withColumn("vec_id", col("vec_id") + lit(i.toLong * 100000000L))
            .withColumn("embedding",
              transform(col("embedding"), x => x + lit(i * 1e-4f) * pmod(col("vec_id"), lit(7)).cast("float")))
        }.reduce(_ unionByName _)
          .repartition(math.max(4, f))
          .write.mode(SaveMode.Overwrite).parquet(p)
      }
      p
    }
    def rowTables(f: Int): (String, String) = {
      val pl = s"$outDir/lineitem_x$f"; val po = s"$outDir/orders_x$f"
      ensure(pl) {
        val base = Tables.lineitem(spark, sfDir)
        (0 until f).map { i =>
          base.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 1000000000L))
        }.reduce(_ unionByName _)
          .repartition(math.max(8, 2 * f))
          .write.mode(SaveMode.Overwrite).parquet(pl)
      }
      ensure(po) {
        val base = Tables.orders(spark, sfDir)
        (0 until f).map { i =>
          base.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 1000000000L))
        }.reduce(_ unionByName _)
          .repartition(math.max(8, 2 * f))
          .write.mode(SaveMode.Overwrite).parquet(po)
      }
      (pl, po)
    }

    def shingled(path: String): DataFrame =
      spark.read.parquet(path).withColumn("sh", TA.shingleSet(col("text"), 3))

    // ---- timing ----
    case class Obs(op: String, factor: Int, rows: Long, sec: Double)
    val results = collection.mutable.ArrayBuffer[Obs]()
    def time(op: String, factor: Int)(body: => Long): Unit = {
      if (onlyOps.exists(!_.contains(op))) return
      var best = Double.MaxValue; var rows = 0L
      for (r <- 1 to reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"SCALE op=$op%-18s factor=$factor%-3d rep=$r rows=$rows%-10d sec=$s%.3f")
        best = math.min(best, s)
      }
      results += Obs(op, factor, rows, best)
    }

    // warmup
    Tables.lineitem(spark, sfDir).filter("l_quantity > 0").count()
    Tables.documents(spark, sfDir).count()

    // ---- relational family ----
    for (f <- rowFactors) {
      val (pl, po) = rowTables(f)
      time("agg_lineitem", f) {
        spark.read.parquet(pl)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1)))
          .collect().length.toLong
      }
      time("join_topk", f) {
        val li = spark.read.parquet(pl); val o = spark.read.parquet(po)
        o.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .orderBy(desc("rev"), col("o_orderkey")).limit(10)
          .collect().length.toLong
      }
    }

    // ---- bucketed layout (r11): the same lineitem⋈orders aggregate twice,
    // once over plain parquet (full shuffle of both sides) and once over
    // graft tables bucketed on the join key (co-located, zero exchanges —
    // asserted on the plan). The gap is what bucketing buys a repeated
    // 100 TB join; both must stay ~linear. ----
    for (f <- rowFactors) {
      val (pl, po) = rowTables(f)
      val bl = s"$outDir/bk_lineitem_x$f"; val bo = s"$outDir/bk_orders_x$f"
      // graft tables have no _SUCCESS: probe the manifest dir directly
      def ensureGraft(path: String)(write: => Unit): Unit =
        if (!Files.exists(Paths.get(path, "_manifests"))) write
      ensureGraft(bl) {
        graft.format.GraftTable.write(spark.read.parquet(pl)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
          bl, "overwrite", bucketBy = Some((32, Seq("l_orderkey"))))
        ()
      }
      ensureGraft(bo) {
        graft.format.GraftTable.write(spark.read.parquet(po)
          .select(col("o_orderkey")),
          bo, "overwrite", bucketBy = Some((32, Seq("o_orderkey"))))
        ()
      }
      def revAgg(o: DataFrame, li: DataFrame): Long =
        o.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .count()
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        time("plain_join_agg", f) {
          revAgg(spark.read.parquet(po).select(col("o_orderkey")),
            spark.read.parquet(pl)
              .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
        }
        time("bucket_join_agg", f) {
          val o = graft.format.GraftTable.read(spark, bo)
          val li = graft.format.GraftTable.read(spark, bl)
          val joined = o.join(li, col("o_orderkey") === col("l_orderkey"))
          val plan = joined.queryExecution.executedPlan.toString
          require(!plan.contains("Exchange hashpartitioning"),
            s"bucket_join_agg must not shuffle:\n$plan")
          revAgg(o, li)
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }

    // ---- events family (r10): sessionize / as-of / interval join.
    // Replication shifts user_id AND event_id per copy — more users at
    // constant per-user event density, so window buffers and per-bin
    // occupancy stay fixed while the corpus grows: each operator is one
    // (or, interval, two) key-keyed shuffle and the fitted exponent must
    // stay ~linear. A super-linear reading here would mean a candidate
    // expansion (interval) or an unpartitioned window (sessionize/asof)
    // crept back in. ----
    def eventsRep(f: Int): String = {
      val p = s"$outDir/events_x$f"
      ensure(p) {
        val base = Tables.events(spark, sfDir)
        (0 until f).map { i =>
          base.withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L))
            .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
        }.reduce(_ unionByName _)
          .repartition(math.max(4, f))
          .write.mode(SaveMode.Overwrite).parquet(p)
      }
      p
    }
    for (f <- docFactors) {
      val p = eventsRep(f)
      time("sessionize", f) {
        graft.operators.Sessionize.sessions(spark.read.parquet(p),
          Seq("user_id"), "ts", gapSeconds = 21600L, tiebreak = Seq("event_id"))
          .agg(count(lit(1))).collect().head.getLong(0)
      }
      time("asof_join", f) {
        val ev = spark.read.parquet(p)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        graft.operators.AsofJoin.asofJoin(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("value")).count()
      }
      time("interval_join", f) {
        val ev = spark.read.parquet(p)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"),
            col("ts").as("win_start"),
            (col("ts") + expr("INTERVAL 5 MINUTES")).as("win_end"))
        graft.operators.IntervalJoin.intervalJoin(clicks, errors, "ts",
          "win_start", "win_end", Seq("user_id")).count()
      }
    }

    // ---- near-dup family (salted: constant duplicate density) ----
    for (f <- docFactors) {
      val p = docsSalted(f)
      time("minhash_lsh", f) {
        Dedup.minhashNearDupPairs(shingled(p), "doc_id", "sh", 0.8).count()
      }
      time("simhash", f) {
        Dedup.simhashNearDupPairs(shingled(p), "doc_id", "sh", 3).count()
      }
      time("ngram_jaccard", f) {
        Dedup.ngramJaccardPairs(shingled(p), "doc_id", "sh", "source", 0.5).count()
      }
    }

    // ---- degenerate-duplicate minhash (r14, VERDICT r13 #1): G groups of
    // 100 EXACT copies each — the dirty-corpus shape where naive LSH
    // banding emits N²×bands rows per group before anything prunes.
    // Identical signatures group to one representative before banding, so
    // the candidate set is exactly the true pair set (G × C(100,2)) —
    // require'd, not just timed — and cost grows ~linearly in G (the
    // output itself is linear: fixed pairs per group × G groups).
    // Inter-group token universes are disjoint so no cross-group noise. ----
    for (f <- docFactors) {
      time("minhash_degenerate", f) {
        val groups = 10 * f
        val copies = 100
        val corpus = spark.range(groups.toLong * copies)
          .select(col("id").as("doc_id"), pmod(col("id"), lit(groups)).as("g"))
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(1), lit(12)),
              i => concat(lit("g"), col("g"), lit("w"), i))))
          .withColumn("sh", TA.shingleSet(col("text"), 3))
        val n = Dedup.minhashCandidates(corpus, "doc_id", "sh").count()
        val want = groups.toLong * (copies.toLong * (copies - 1) / 2)
        require(n == want, s"degenerate candidates $n != true pairs $want")
        n
      }
    }

    // ---- dense-bucket simhash (r16, VERDICT r15 #1): one 16-bit chunk
    // bucket holding 250f DISTINCT sketches — the organic shape at 10⁹⁺
    // sketches (~N/65536 per bucket) that the uncapped chunk join would
    // compare quadratically (C(250f,2) per factor). With the bucket cap the
    // dense bucket is skipped and the candidate set is EXACTLY the 10f
    // genuine near-dup pairs, each colliding only in sparse size-2 buckets
    // — require'd, not just timed — so cost grows with N, not N². Sketches
    // are constructed directly (sketch-level entry): decoys i·(2¹⁶+2³²+2⁴⁸)
    // all share chunk-0 key 0 and are singletons in chunks 1-3 (i < 2¹⁴);
    // pair j = x_j and x_j xor 2²⁹ (hamming 1) with per-j unique chunk keys
    // in the 0x4000+ range decoys never reach. ----
    for (f <- docFactors) {
      time("simhash_dense", f) {
        val decoys = 250L * f
        val pairs = 10L * f
        val mul = (1L << 16) | (1L << 32) | (1L << 48)
        val decoyDf = spark.range(1, decoys + 1)
          .select((col("id") * mul).as("sim"), (col("id") + 1000000L).as("doc_id"))
        val xs = spark.range(1, pairs + 1).select(
          (col("id")
            + (lit(0x4000L) + col("id") * 2) * lit(1L << 16)
            + (lit(0x4000L) + col("id")) * lit(1L << 32)
            + (lit(0x4000L) + col("id")) * lit(1L << 48)).as("sim"),
          (col("id") * 2).as("doc_id"))
        val ys = xs.select(col("sim").bitwiseXOR(lit(1L << 29)).as("sim"),
          (col("doc_id") + 1).as("doc_id"))
        val sh = decoyDf.unionByName(xs).unionByName(ys)
        val cand = Dedup.simhashSketchCandidates(
          sh.select(col("sim")).distinct(), maxBucket = 64).count()
        require(cand == pairs, s"dense-bucket candidates $cand != true pairs $pairs")
        val out = Dedup.simhashPairsFromSketches(sh, "doc_id", 3, maxBucket = 64).count()
        require(out == pairs, s"dense-bucket verified pairs $out != $pairs")
        out
      }
    }

    // ---- URL curation (r16): blocklist filtering is a pure codegen'd
    // suffix-probe scan (α must be ~1, no shuffle), and the per-domain cap
    // must stay near-linear even when ONE domain holds half the corpus —
    // the exact skew a plain per-domain row_number() would serialize
    // through one task. Survivor counts are require'd against the
    // closed-form expectation, not just timed. ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      time("url_blocklist", f) {
        val blocked =
          (0 until 1000).map(i => s"blocked$i.example").toSet + "site-7.com"
        val docs = spark.read.parquet(p).withColumn("url",
          concat(lit("https://cdn.d"), pmod(col("doc_id"), lit(100)),
            lit(".site-"), pmod(col("doc_id"), lit(13)), lit(".com/x/"),
            col("doc_id")))
        val kept = UrlCuration.blocklistFilter(docs, "url", blocked).count()
        val total = spark.read.parquet(p).count()
        val want = total - spark.read.parquet(p)
          .filter(pmod(col("doc_id"), lit(13)) === 7).count()
        require(kept == want, s"url_blocklist kept $kept != $want")
        kept
      }
      time("domain_cap", f) {
        val docs = spark.read.parquet(p).withColumn("domain",
          when(pmod(col("doc_id"), lit(2)) === 0, lit("hot.com"))
            .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(101)),
              lit(".com"))))
        val kept = UrlCuration.domainCap(docs, "domain", "doc_id", 50,
          saltBuckets = 32).count()
        val want = docs.groupBy(col("domain")).count()
          .select(sum(least(col("count"), lit(50L)))).head().getLong(0)
        require(kept == want, s"domain_cap kept $kept != $want")
        kept
      }
    }

    // ---- corpus line dedup (r10): boilerplate removal is two line-keyed
    // aggs + one doc-keyed reassembly — every shuffle keyed by line/doc,
    // never pairwise, so the fitted exponent must stay ~linear ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      time("line_dedup", f) {
        val toks = split(col("text"), " ")
        val withLines = spark.read.parquet(p).withColumn("lines",
          when(size(toks) >= 3,
            transform(sequence(lit(0), (size(toks) / lit(3)).cast("int") - 1),
              i => concat_ws(" ", slice(toks, i * lit(3) + lit(1), lit(3)))))
            .otherwise(typedLit(Array.empty[String])))
        Dedup.lineDedup(withLines, "doc_id", "lines").count()
      }
    }

    // ---- incremental minhash dedup (r13): a FIXED 256-doc arriving batch
    // against a GROWING persisted bucket store — the ingest-time claim is
    // that the batch, not the corpus, is the unit of work: probe cost may
    // grow only with the store scan (metadata rows), never with corpus
    // text. Batch docs are store members under shifted ids, so every
    // factor yields the same 256 guaranteed old-new pairs. ----
    for (f <- docFactors) {
      val p = docsSalted(f)
      val store = s"$outDir/mh_inc_store_x$f"
      val sh = shingled(p)
      time("minhash_inc_build", f) {
        Dedup.minhashIndexBuild(sh, "doc_id", "sh", store)
        graft.format.GraftTable.read(spark, store).count()
      }
      val batch = sh.orderBy(col("doc_id")).limit(256)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L))
        .localCheckpoint()
      time("minhash_inc_probe", f) {
        Dedup.minhashIncremental(batch, "doc_id", "sh", sh, store, 0.8).count()
      }
    }

    // ---- exact-substring dedup (r13, arXiv:2107.06499): windows stream
    // as 8-byte hashes, duplicate set = one map-side-combined count,
    // span merge = doc-keyed window — cost must stay linear in corpus
    // tokens (the SALTED corpus keeps duplicate density constant, so the
    // hit/merge stage cannot shrink relative to the scan) ----
    for (f <- docFactors) {
      val p = docsSalted(f)
      time("substring_dedup", f) {
        Dedup.exactSubstringSpans(spark.read.parquet(p), "doc_id", "text",
          k = 8).count()
      }
    }

    // ---- decontamination (r9): FIXED benchmark (the ×1 corpus's every-97th
    // doc) against a growing corpus — the realistic shape. The benchmark
    // gram set is bounded + broadcast, so cost must be ONE linear pass over
    // the corpus (α ≈ 1 at saturation, sub-linear here), never a shuffle of
    // corpus grams. ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      val bench = spark.read.parquet(docsPlain(1))
        .filter(col("doc_id") % 97 === 0).select(col("text").as("btext"))
      time("decontaminate", f) {
        Dedup.contaminationFlags(spark.read.parquet(p), "doc_id", "text",
          bench, "btext", n = 8).count()
      }
    }

    // ---- FTS family (plain replication: postings grow linearly) ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      val idx = s"$outDir/fts_x$f"
      time("fts_build", f) {
        Fts.buildIndex(spark.read.parquet(p), "doc_id", "text", idx,
          numPostingFiles = math.max(8, f))
        spark.read.parquet(s"$idx/postings").count()
      }
      time("fts_match", f) {
        Fts.matchQuery(spark, idx, Seq("data", "model", "training"), 10)
          .collect().length.toLong
      }
    }

    // ---- vector family ----
    for (f <- docFactors) {
      val p = embs(f)
      val idx = s"$outDir/ivf_x$f"
      time("ivf_build", f) {
        IvfIndex.build(spark.read.parquet(p), "vec_id", "embedding", idx, nlist = 64)
        spark.read.parquet(s"$idx/vectors").count()
      }
      val q = Array.tabulate(64)(i => (math.sin(i * 0.37) * 0.5).toFloat)
      time("ivf_search", f) {
        IvfIndex.search(spark, idx, "vec_id", "embedding", q, 10, nprobes = 8)
          .collect().length.toLong
      }
    }

    // ---- shard packing (r10): hierarchical prefix sum — EVERY window
    // partitioned (require'd on the optimized plan inside packShards), so
    // cost must be ~linear with no single-partition stage. The r9
    // formulation funneled every bucket aggregate through ONE task. ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      time("pack_shards", f) {
        TA.packShards(spark.read.parquet(p)
            .withColumn("did", monotonically_increasing_id()),
          "did", "text", 10000L)
          .agg(countDistinct(col("shard"))).collect().head.getLong(0)
      }
      // sequence packing shares the hierarchical prefix sum; the explode
      // adds output-proportional rows only — same ~linear expectation
      time("pack_sequences", f) {
        TA.packSequences(spark.read.parquet(p)
            .withColumn("did", monotonically_increasing_id()),
          "did", "text", 2048L)
          .agg(count(lit(1))).collect().head.getLong(0)
      }
    }

    // ---- r11 text operators: all three are pure per-row passes (no
    // shuffle), so the expected curve is plain linearity in the corpus —
    // α ≈ 1 with NO super-linear stage. ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      time("gopher_ngrams", f) {
        // sum a produced statistic so column pruning can't skip the work
        TA.gopherNgramStats(spark.read.parquet(p)
            .withColumn("did", monotonically_increasing_id()), "did", "text")
          .agg(sum(col("dup_5gram_char_frac") + col("top_2gram_char_frac")))
          .collect().head.getDouble(0).toLong
      }
      time("quality_filter", f) {
        TA.gopherQualityFilter(spark.read.parquet(p)
            .withColumn("did", monotonically_increasing_id()), "did", "text",
          minTokens = 12, minStopWords = 1)
          .groupBy(col("kept")).count().collect().map(_.getLong(1)).sum
      }
      time("bpe_count", f) {
        spark.read.parquet(p).select(
            graft.functions.BpeTokenizer.bpeTokenCount(col("text"),
              graft.functions.BpeTokenizer.EnglishMerges).as("n"))
          .agg(sum(col("n"))).collect().head.getLong(0)
      }
    }

    // ---- hamming binary-vector family (r10): sign-bit-packed embeddings.
    // Search must stay probe-pruned (α≈0) like the float family; build is
    // the linear assign+write pass over 32×-smaller vectors. ----
    for (f <- docFactors) {
      val p = embs(f)
      val idx = s"$outDir/bivf_x$f"
      import org.apache.spark.sql.graftshim.ColumnBridge
      val packed = spark.read.parquet(p).withColumn("bvec",
          ColumnBridge.column(graft.operators.PackSignBits(
            ColumnBridge.expression(col("embedding")))))
        .select(col("vec_id"), col("bvec"))
      time("hamming_build", f) {
        graft.operators.BinaryIvfIndex.build(packed, "vec_id", "bvec", idx, nlist = 64)
        spark.read.parquet(s"$idx/vectors").count()
      }
      val q = graft.operators.BinaryIvfIndex.packQuery(
        Array.tabulate(64)(i => (math.sin(i * 0.37) * 0.5).toFloat))
      time("hamming_search", f) {
        graft.operators.BinaryIvfIndex.search(spark, idx, "vec_id", "bvec",
          q, 10, nprobes = 8).collect().length.toLong
      }
    }

    // ---- lazy blob slice (r10): resolving ONE handle and reading a 4 KB
    // range must stay flat while the blob corpus grows ×64 — descriptors
    // travel through the scan, payload IO is the requested span only ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      val tbl = s"$outDir/blob_x$f"
      // graft tables leave no _SUCCESS — presence of a committed manifest
      // is the "already replicated" signal (ensure() is for plain parquet)
      if (graft.format.GraftTable.latestVersion(spark, tbl).isEmpty) {
        val df = spark.read.parquet(p)
          .withColumn("did", monotonically_increasing_id())
          .withColumn("payload", expr("cast(repeat(text, 4) as binary)"))
          .select(col("did"), col("payload"))
        graft.format.GraftTable.write(
          graft.format.BlobStore.packBlobs(df, tbl, "payload"), tbl, "overwrite")
      }
      // the row-address lookup is SETUP (a corpus-sized TakeOrdered that
      // grows with the factor) — resolve it outside the timed body so the
      // probe measures handle resolution + the 4 KB ranged read only
      val addr = graft.format.GraftTable.read(spark, tbl, withRowAddr = true)
        .orderBy(col("did")).limit(1)
        .select(col(graft.format.GraftTable.RowAddrCol))
        .head().getLong(0)
      time("blob_slice", f) {
        val ref = graft.format.BlobStore
          .takeBlobRefs(spark, tbl, Seq(addr), "payload").head
        graft.format.BlobStore.readRange(spark, tbl, ref, 0L,
          math.min(4096L, ref.length).toInt).length.toLong
      }
    }

    // ---- graft-format write path + format scan overhead ----
    for (f <- docFactors) {
      val p = docsPlain(f)
      val tbl = s"$outDir/gtable_x$f"
      time("graft_write", f) {
        org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tbl),
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(tbl), true)
        graft.format.GraftTable.write(spark.read.parquet(p), tbl, "overwrite")
        graft.format.GraftTable.countRows(spark, tbl)
      }
      // scan_agg/ngram below need the table even when a subset re-run
      // filters graft_write itself out
      if (scala.util.Try(graft.format.GraftTable.latestVersion(spark, tbl))
          .toOption.flatten.isEmpty)
        graft.format.GraftTable.write(spark.read.parquet(p), tbl, "overwrite")
      // identical filtered agg over the raw parquet vs the graft table —
      // the table format's read overhead (manifest listing, metadata
      // columns) must stay flat, not grow with data
      def scanAgg(df: DataFrame): Long = df
        .filter(col("lang") === "de")
        .agg(count(lit(1)), sum(col("n_chars")))
        .collect().length.toLong
      time("parquet_scan_agg", f) { scanAgg(spark.read.parquet(p)) }
      time("graft_scan_agg", f) { scanAgg(graft.format.GraftTable.read(spark, tbl)) }
      // NGRAM build on the r8 sorted-postings layout: cost must track the
      // corpus linearly with a FIXED file count — the old
      // directory-per-trigram layout died here on file-count explosion
      time("ngram_build", f) {
        graft.index.ScalarIndex.buildNgram(spark, tbl, "text", s"$tbl/_indices")
        val dir = new org.apache.hadoop.fs.Path(s"$tbl/_indices/ngram_text")
        val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        fs.listStatus(dir).count(s => !s.getPath.getName.startsWith("_")).toLong
      }
      time("ngram_lookup", f) {
        graft.index.ScalarIndex.containsViaNgram(spark, tbl, s"$tbl/_indices",
          "text", "vector scan").count()
      }
    }

    // ---- index-assisted merge_insert (r9, reference use_index): a small
    // fixed upsert batch against an ever-bigger target. The indexed path
    // reads the btree postings (pushed IN over sorted files) + only the
    // fragments holding source keys — cost tracks the BATCH (α≈0); the
    // full-scan path full-outer-joins the whole target — cost tracks the
    // TABLE (α≈1). The gap is what makes continuous upsert ingestion
    // viable on a 100 TB table. ----
    for (f <- rowFactors) {
      val (_, po) = rowTables(f)
      val tbl = s"$outDir/mergetbl_x$f"
      ensure(tbl) {
        graft.format.GraftTable.write(
          spark.read.parquet(po)
            .repartitionByRange(math.max(8, 2 * f), col("o_orderkey")),
          tbl, "overwrite")
        graft.index.ScalarIndex.buildBtree(spark, tbl, "o_orderkey", s"$tbl/_indices")
      }
      val upd = spark.read.parquet(po).filter(col("o_orderkey") < 1000)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      val batch = upd.unionByName(
        upd.withColumn("o_orderkey", col("o_orderkey") + 8000000000L))
        .localCheckpoint()
      time("merge_indexed", f) {
        graft.format.GraftTable.mergeInsert(spark, tbl, batch, Seq("o_orderkey"))
          .opStats.values.sum
      }
      time("merge_full", f) {
        graft.format.GraftTable.mergeInsert(spark, tbl, batch, Seq("o_orderkey"),
          useIndex = false).opStats.values.sum
      }
    }

    // ---- zero-copy import vs full ingest (r8 commitFiles): registering
    // the SAME replicated parquet the `graft_write` row fully re-ingests
    // is one executor-free footer pass + a manifest commit — its cost must
    // track file COUNT (near-flat here; the replication only doubles file
    // count per 8× data), while graft_write's cost tracks data volume
    // (alpha ~1). The gap is what metadata-only registration buys a 100 TB
    // migration. ----
    val wantImport = onlyOps.forall(_.contains("import_files"))
    if (wantImport) for (f <- docFactors) {
      val p = docsPlain(f)
      val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
        spark.sparkContext.hadoopConfiguration)
      val conf = spark.sparkContext.hadoopConfiguration
      val tbl = s"$outDir/import_tbl_x$f"
      // PRIVATE replica, copied OUTSIDE the timed body: commitFiles renames
      // the registered files in place, which must never touch the shared
      // docsPlain cache other probes read — and the copy must not pollute
      // the timing (it is O(data); the import being measured is not)
      val src = s"$outDir/import_src_x$f"
      fsys.delete(new org.apache.hadoop.fs.Path(src), true)
      fsys.mkdirs(new org.apache.hadoop.fs.Path(src))
      val it0 = fsys.listFiles(new org.apache.hadoop.fs.Path(p), false)
      while (it0.hasNext) {
        val s = it0.next()
        if (s.getPath.getName.endsWith(".parquet"))
          org.apache.hadoop.fs.FileUtil.copy(fsys, s.getPath, fsys,
            new org.apache.hadoop.fs.Path(src, s.getPath.getName), false, conf)
      }
      time("import_files", f) {
        fsys.delete(new org.apache.hadoop.fs.Path(tbl), true)
        graft.format.GraftTable.createEmpty(spark, tbl,
          spark.read.parquet(p).schema)
        // recursive per-rep listing: rep 2 re-imports the frag-renamed
        // files (collisions land in one same-fs subdir per attempt)
        val it = fsys.listFiles(new org.apache.hadoop.fs.Path(src), true)
        val buf = collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val s = it.next()
          if (s.getPath.getName.endsWith(".parquet")) buf += s.getPath.toString
        }
        graft.format.GraftTable.commitFiles(spark, tbl, buf.toSeq.sorted)
        graft.format.GraftTable.countRows(spark, tbl)
      }
    }

    // ---- HNSW maintenance: CONSTANT-size delta optimize vs full rebuild.
    // The delta row's alpha should sit near 0 (cost tracks the delta, not
    // the corpus); the rebuild row near 1 — the gap is what delta
    // maintenance buys an append-heavy 100 TB table. ----
    val wantHnsw = onlyOps.forall(s =>
      s.contains("hnsw_delta_opt") || s.contains("hnsw_rebuild"))
    if (wantHnsw) for (f <- docFactors) {
      val p = embs(f)
      val tbl = s"$outDir/hnsw_tbl_x$f"; val idx = s"$outDir/hnsw_idx_x$f"
      val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
        spark.sparkContext.hadoopConfiguration)
      Seq(tbl, idx).foreach(d => fsys.delete(new org.apache.hadoop.fs.Path(d), true))
      graft.format.GraftTable.write(
        spark.read.parquet(p).repartitionByRange(math.max(4, f), col("vec_id")),
        tbl, "overwrite")
      graft.operators.HnswIndex.buildForTable(spark, tbl, "vec_id", "embedding",
        idx, nlist = 32)
      var shift = 1L
      time("hnsw_delta_opt", f) {
        val delta = Tables.embeddings(spark, sfDir)
          .withColumn("vec_id", col("vec_id") + lit(900000000L) * lit(shift))
        shift += 1
        graft.format.GraftTable.write(delta, tbl, "append")
        graft.operators.HnswIndex.optimizeForTable(spark, tbl, "vec_id",
          "embedding", idx)
      }
      time("hnsw_rebuild", f) {
        graft.operators.HnswIndex.buildForTable(spark, tbl, "vec_id",
          "embedding", idx, nlist = 32).centroids.length.toLong
      }
    }

    // ---- version-delta reads (r8): a CONSTANT-size append onto a corpus
    // that grows with the factor; deltaInserted(1, 2) must cost the DELTA
    // (flat line), because the scan prunes to fragments with
    // addedVersion > begin before touching storage. ----
    val wantDelta = onlyOps.forall(_.contains("delta_inserted"))
    if (wantDelta) for (f <- docFactors) {
      val p = docsPlain(f)
      val tbl = s"$outDir/delta_tbl_x$f"
      val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
        spark.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(tbl), true)
      graft.format.GraftTable.write(
        spark.read.parquet(p).repartition(math.max(4, f)), tbl, "overwrite")
      graft.format.GraftTable.write(
        Tables.documents(spark, sfDir).limit(2000)
          .withColumn("doc_id", col("doc_id") + lit(900000000L)),
        tbl, "append")
      time("delta_inserted", f) {
        graft.format.GraftTable.deltaInserted(spark, tbl, 1L, 2L)
          .agg(count(lit(1)), sum(col("n_chars"))).collect()
        2000L
      }
    }

    // ---- continuous ingest with the delta-MERGE policy (r8): the factor
    // axis is the number of append→optimize cycles, not the corpus size.
    // Without merging, each cycle adds one delta generation and the
    // per-query beam count grows linearly with maintenance count; with
    // maxDeltas=4 the generation count (the `rows` column) must stay
    // bounded and the search time flat as cycles go 1 → 16. ----
    val wantIngest = onlyOps.forall(_.contains("hnsw_ingest_search"))
    if (wantIngest) for (c <- Seq(1, 4, 16)) {
      val p = embs(1)
      val tbl = s"$outDir/hnswing_tbl_c$c"; val idx = s"$outDir/hnswing_idx_c$c"
      val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
        spark.sparkContext.hadoopConfiguration)
      Seq(tbl, idx).foreach(d => fsys.delete(new org.apache.hadoop.fs.Path(d), true))
      graft.format.GraftTable.write(
        spark.read.parquet(p).repartitionByRange(4, col("vec_id")),
        tbl, "overwrite")
      graft.operators.HnswIndex.buildForTable(spark, tbl, "vec_id", "embedding",
        idx, nlist = 32)
      val slab = Tables.embeddings(spark, sfDir).limit(500)
      for (i <- 1 to c) {
        graft.format.GraftTable.write(
          slab.withColumn("vec_id", col("vec_id") + lit(900000000L) * lit(i.toLong)),
          tbl, "append")
        graft.operators.HnswIndex.optimizeForTable(spark, tbl, "vec_id",
          "embedding", idx, maxDeltas = 4)
      }
      val q = Array.tabulate(64)(i => (math.sin(i * 0.37) * 0.5).toFloat)
      val nGen = fsys.listStatus(new org.apache.hadoop.fs.Path(idx))
        .map(_.getPath.getName).count(_.startsWith("graph_delta_")).toLong
      time("hnsw_ingest_search", c) {
        graft.operators.HnswIndex.searchCombined(spark, tbl, idx, "vec_id",
          "embedding", q, k = 10, nprobes = 8, ef = 200, refineFactor = 4,
          fastSearch = true).collect()
        nGen // rows column = delta generations alive after c cycles (≤ 4)
      }
    }

    // ---- post-compaction index REMAP vs the re-encode it replaces
    // (IndexRemap, r7). Each round deletes a constant-size slab, compacts
    // the indebted fragment away, then optimizes: the remap cost tracks the
    // REWRITTEN fragment (constant across factors), while the full PQ
    // rebuild it replaces grows with the corpus. ----
    val wantRemap = onlyOps.forall(s =>
      s.contains("remap_opt") || s.contains("pq_rebuild"))
    if (wantRemap) for (f <- docFactors) {
      val p = embs(f)
      val tbl = s"$outDir/remap_tbl_x$f"; val idx = s"$outDir/remap_idx_x$f"
      val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
        spark.sparkContext.hadoopConfiguration)
      Seq(tbl, idx).foreach(d => fsys.delete(new org.apache.hadoop.fs.Path(d), true))
      graft.format.GraftTable.write(
        spark.read.parquet(p).repartitionByRange(math.max(4, f), col("vec_id")),
        tbl, "overwrite")
      graft.operators.PqIndex.buildForTable(spark, tbl, "vec_id", "embedding",
        idx, nlist = 32)
      val baseRows = Tables.embeddings(spark, sfDir).count()
      var slab = 0L
      time("remap_opt", f) {
        // a fresh constant-size slab each rep, always inside the base-id
        // range so the debt is identical at every factor
        val lo = slab * (baseRows / 4); val hi = lo + baseRows / 8
        slab += 1
        graft.format.GraftTable.delete(spark, tbl,
          s"vec_id >= $lo AND vec_id < $hi")
        graft.format.GraftTable.compactFiles(spark, tbl,
          targetRows = 2048, materializeDeletions = 0.01)
        graft.operators.PqIndex.optimizeForTable(spark, tbl, "vec_id",
          "embedding", idx)
      }
      time("pq_rebuild", f) {
        graft.operators.PqIndex.buildForTable(spark, tbl, "vec_id",
          "embedding", idx, nlist = 32)._1.centroids.length.toLong
      }
    }

    // ---- deferred index remap serving (r11): a pure compaction retires
    // every covered fragment id, but the IVF keeps serving the rewritten
    // corpus by translating stale candidate addresses through the outputs'
    // persisted __old_addr column. The translation's corpus-sized work is a
    // 16 B/row two-long address scan; the alternative — those outputs
    // falling to the flat leg — re-reads dim·4 B/row of vectors AND runs
    // the distance kernel on all of them. Both legs are ~linear in the
    // corpus; the probe certifies the constant-factor gap that makes
    // deferral serviceable at 100 TB (and that the in-probe require holds:
    // the flat leg really is empty). ----
    val wantDefer = onlyOps.forall(s =>
      s.contains("defer_search") || s.contains("defer_flat"))
    if (wantDefer) for (f <- docFactors) {
      val p = embs(f)
      val tbl = s"$outDir/defer_tbl_x$f"
      // table-local: provenance stamping needs the IndexMeta commit
      val idx = s"$tbl/_indices/ivf_embedding"
      val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
        spark.sparkContext.hadoopConfiguration)
      Seq(tbl, idx).foreach(d => fsys.delete(new org.apache.hadoop.fs.Path(d), true))
      graft.format.GraftTable.write(
        spark.read.parquet(p).repartitionByRange(math.max(4, 4 * f), col("vec_id")),
        tbl, "overwrite")
      IvfIndex.buildForTable(spark, tbl, "vec_id", "embedding", idx, nlist = 64)
      graft.format.GraftTable.compactFiles(spark, tbl,
        targetRows = 1 << 20, maxBytesPerFile = Some(256L << 20))
      val dm = graft.format.GraftTable.loadManifest(spark, tbl)
      val dcov = graft.index.ScalarIndex.readCoverage(spark, idx).get.fragmentIds.toSet
      val (deferTrans, deferFresh) = IvfIndex.deferServing(dm, dcov)
      require(deferTrans.nonEmpty && deferTrans.forall(fr => !dcov.contains(fr.id)),
        s"defer probe x$f: rewrite must retire coverage into translatable outputs")
      require(deferFresh.isEmpty,
        s"defer probe x$f: rewrite outputs fell to the flat leg: $deferFresh")
      val q = Array.tabulate(64)(i => (math.sin(i * 0.37) * 0.5).toFloat)
      time("defer_search", f) {
        IvfIndex.searchCombined(spark, tbl, idx, "vec_id", "embedding", q,
          10, nprobes = 8).collect().length.toLong
      }
      time("defer_flat", f) {
        graft.operators.Knn.flatSearch(
            graft.format.GraftTable.read(spark, tbl), "embedding", q, 10, "l2")
          .collect().length.toLong
      }
    }

    // ---- auto late materialization on a blob table. Layout is HASH
    // clustered on a bucket column, so fragment zonemaps overlap (min/max
    // cannot exclude bucket=7) while the matches physically live in ~1 of
    // 16 fragments — exactly the regime where phase-1 address discovery
    // prunes the blob fetch and a plain scan cannot. ----
    val wantLate = onlyOps.forall(s =>
      s.contains("latemat_off") || s.contains("latemat_auto"))
    if (wantLate) {
      val extS = {
        val prevA = SparkSession.getActiveSession
        val prevD = SparkSession.getDefaultSession
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        val s = SparkSession.builder()
          .withExtensions(new graft.format.GraftExtensions).getOrCreate()
        prevD.foreach(SparkSession.setDefaultSession)
        prevA.foreach(SparkSession.setActiveSession)
        s
      }
      for (f <- docFactors) {
        val p = docsPlain(f)
        val tbl = s"$outDir/blob_x$f"
        val fsys = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir),
          spark.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(tbl), true)
        // ~8 KB of doc_id-derived sha2 hex per row: INCOMPRESSIBLE, so the
        // blob IO the two-phase plan avoids is real on disk (the corpus
        // text is 300 chars and snappy-collapses to nothing)
        graft.format.GraftTable.write(
          spark.read.parquet(p)
            .withColumn("bucket", pmod(col("doc_id"), lit(16L)))
            .withColumn("payload", expr(
              """cast(concat_ws('', transform(sequence(1, 128),
                |  i -> sha2(concat(cast(doc_id as string), '-',
                |            cast(i as string)), 256))) as binary)""".stripMargin))
            .select(col("doc_id"), col("bucket"), col("n_chars"), col("payload"))
            .repartition(16, col("bucket")),
          tbl, "overwrite")
        def run(s: SparkSession): Long =
          graft.format.GraftTable.read(s, tbl)
            .filter(col("bucket") === 7L)
            .select(col("doc_id"), col("payload"))
            .agg(count(lit(1)), sum(length(col("payload"))))
            .collect().length.toLong
        time("latemat_off", f) { run(spark) }
        time("latemat_auto", f) { run(extS) }
      }
    }

    // ---- f16 storage (r12): the SAME brute-force top-k over float32
    // vectors vs binary16-packed bytes. The packed column is half the
    // bytes at rest and on the wire; the f16 kernel decodes through a 64K
    // LUT inside the scan stage, so the expected curve is flat-factor
    // speedup from IO alone. Rows column = stored column bytes. ----
    for (f <- docFactors) {
      val p = embs(f)
      val pf16 = s"$outDir/embs_f16_x$f"
      ensure(pf16) {
        spark.read.parquet(p)
          .select(col("vec_id"),
            graft.functions.F16Functions.f16Pack(col("embedding")).as("emb"))
          .write.mode(SaveMode.Overwrite).parquet(pf16)
      }
      val q = Array.tabulate(64)(i => (math.sin(i * 0.37) * 0.5).toFloat)
      time("flat_knn_f32", f) {
        graft.operators.Knn.flatSearch(spark.read.parquet(p), "embedding",
          q, 10, "l2", Seq(col("vec_id"))).collect().length.toLong
      }
      time("flat_knn_f16", f) {
        graft.operators.Knn.flatSearchF16(spark.read.parquet(pf16), "emb",
          q, 10, "l2", Seq(col("vec_id"))).collect().length.toLong
      }
    }

    // ---- WAL commit batching (r12, MemWAL capability): 8 CONCURRENT
    // writers each appending a constant 2k-row batch `factor` times.
    // `commit_appends` pays one manifest CAS per batch — every commit
    // invalidates the other 7 writers' staged base, so they re-read and
    // retry: the contention shape that melts at high-frequency ingest.
    // `wal_appends` gives each writer its own REGION (the MemWAL sharding
    // design): batches land commit-free with zero coordination and fold in
    // 8 flush commits total instead of 8·factor contended ones. ----
    for (f <- rowFactors) {
      import graft.format.{GraftTable, WalIngest}
      val writers = 8
      val batch = Tables.orders(spark, sfDir).limit(2000)
        .select(col("o_orderkey"), col("o_totalprice")).cache()
      batch.count()
      def concurrently(body: Int => Unit): Unit = {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
        try {
          val futs = (0 until writers).map(w =>
            pool.submit(new Runnable {
              def run(): Unit = {
                SparkSession.setActiveSession(spark)
                body(w)
              }
            }))
          futs.foreach(_.get())
        } finally pool.shutdown()
      }
      val t1 = s"$outDir/walprobe_commit_x$f/t"
      time("commit_appends", f) {
        val fs = new org.apache.hadoop.fs.Path(t1)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(t1).getParent, true)
        GraftTable.write(batch, t1, "overwrite")
        concurrently { _ =>
          // client-style outer retry: the engine's bounded conflict budget
          // (20, the reference default) is a backpressure SIGNAL under
          // pathological contention — 8 writers × 64 sequential appends on
          // one commit point is exactly the shape the WAL exists for, and
          // the probe measures what that contention costs end-to-end
          for (_ <- 1 to f) {
            var done = false
            while (!done) {
              try { GraftTable.write(batch, t1, "append"); done = true }
              catch {
                case e: IllegalStateException
                    if e.getMessage != null && e.getMessage.contains("conflict") =>
              }
            }
          }
        }
        val m = GraftTable.loadManifest(spark, t1)
        require(m.liveRows == 2000L * (writers * f + 1), s"lost rows: ${m.liveRows}")
        m.version // = COMMITS MADE: 1 + 8·f contended CAS points
      }
      val t2 = s"$outDir/walprobe_wal_x$f/t"
      time("wal_appends", f) {
        val fs = new org.apache.hadoop.fs.Path(t2)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(t2).getParent, true)
        GraftTable.write(batch, t2, "overwrite")
        concurrently { w =>
          WalIngest.open(spark, t2, s"w$w", s"w$w")
          for (_ <- 1 to f) WalIngest.append(spark, t2, s"w$w", s"w$w", batch)
          WalIngest.flush(spark, t2, s"w$w", s"w$w")
        }
        val m = GraftTable.loadManifest(spark, t2)
        require(m.liveRows == 2000L * (writers * f + 1), s"lost rows: ${m.liveRows}")
        m.version // = COMMITS MADE: 1 + 8 flushes regardless of factor
      }
      batch.unpersist()
    }

    // ---- summary: exponent fitted between the two LARGEST factors, where
    // fixed job overhead is smallest relative to real work ----
    val byOp = results.groupBy(_.op).toSeq.sortBy(_._1)
    val summary = byOp.map { case (op, obs) =>
      val s = obs.sortBy(_.factor)
      val (a, b) = (s(s.length - 2), s.last)
      val alpha = math.log(b.sec / a.sec) / math.log(b.factor.toDouble / a.factor)
      val times = s.map(o => f""""x${o.factor}":${o.sec}%.3f""").mkString(",")
      f""""$op":{$times,"alpha":$alpha%.2f}"""
    }.mkString(",")
    println(s"""SCALEPROBE_JSON {"sf":"$sfDir","reps":$reps,"ops":{$summary}}""")
    spark.stop()
  }
}
