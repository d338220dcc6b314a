package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextAnalysis => TA}
import graft.functions.TextHashFunctions._

/** Text-analysis + dedup coverage over the `documents` table: token stats,
  * quality scoring, language ID, exact dedup, word-trigram jaccard,
  * MinHash-LSH near-dup (exact-verified, so the DuckDB brute-force oracle
  * matches), SimHash and fingerprinting (hash-engine-specific → rows-only
  * gate entries, no oracle).
  */
object Text {
  type Q = (SparkSession, String) => DataFrame

  /** Documents spread to cluster width before the per-row-heavy kernels
    * downstream (shingles/signatures/sketches/window hashes): the sf-scale
    * corpus is ONE parquet split, which would otherwise serialize those
    * passes onto a single core ([[TA.spreadForCompute]]; no-op at real
    * input sizes). All consumers are row-local or exact-integer aggregates,
    * so results are partitioning-invariant. */
  private def docsSpread(s: SparkSession, d: String): DataFrame =
    TA.spreadForCompute(Tables.documents(s, d), col("doc_id"))

  private def docsWithShingles(s: SparkSession, d: String): DataFrame =
    docsSpread(s, d)
      .withColumn("sh", TA.shingleSet(col("text"), 3))

  /** Deterministic pseudo-lines for [[Dedup.lineDedup]]: non-overlapping
    * 3-word windows (the corpus text carries no newlines); trailing
    * partial windows are dropped on both sides. */
  private def docsWithLines(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    docsSpread(s, d).withColumn("lines",
      when(size(toks) >= 3,
        transform(sequence(lit(0), (size(toks) / lit(3)).cast("int") - 1),
          i => concat_ws(" ", slice(toks, i * lit(3) + lit(1), lit(3)))))
        .otherwise(typedLit(Array.empty[String])))
  }

  /** One shared exact-verified minhash pair set per sfDir per JVM — the
    * real pipeline shape: LSH pairs are computed ONCE, then consumed by
    * both the pair report (q_minhash_lsh) and the component/survivor step
    * (q_dedup_components). Bench times the computation as its own
    * `build_minhash_pairs` entry, exactly like the vector/FTS index
    * builds; the checkpointed pair set is near-dup-sized (thousands of
    * rows), never corpus-sized. */
  private def freshDir(s: org.apache.spark.sql.SparkSession, name: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  private val builtPairs = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def minhashPairsFor(s: SparkSession, d: String): DataFrame =
    builtPairs.computeIfAbsent(d, _ =>
      Dedup.minhashNearDupPairs(docsWithShingles(s, d), "doc_id", "sh", 0.8)
        .localCheckpoint())

  /** One-time pair-set build, timed separately by Bench (see
    * [[graft.queries.Vector.builds]]). */
  val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "build_minhash_pairs" -> ((s, d) => { minhashPairsFor(s, d); () }))

  val queries: Map[String, Q] = Map(
    "q_token_stats" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", TA.tokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"))
        .orderBy(col("lang"))
    },

    // Tokenizer-TRUE token accounting (graft.functions.BpeTokenizer): BPE
    // merges applied in rank order, per-row, over the shared literal
    // vocabulary — the DuckDB oracle replays the SAME merges as a
    // replace() chain over a delimiter-wrapped char encoding. translate
    // strips the delimiter code points on both sides (a no-op on this
    // printable-ASCII corpus, but keeps the two replays byte-identical
    // by construction).
    "q_bpe_token_stats" -> { (s, d) =>
      val cleaned = translate(col("text"), "\u0001\u0002", "")
      Tables.documents(s, d)
        .withColumn("n_bpe", graft.functions.BpeTokenizer.bpeTokenCount(
          cleaned, graft.functions.BpeTokenizer.EnglishMerges))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe")).as("total_bpe_tokens"),
          round(avg(col("n_bpe")), 4).as("avg_bpe_tokens"))
        .orderBy(col("lang"))
    },

    // Trained-vocabulary BPE end-to-end: merges learned from a bounded
    // deterministic corpus sample, then applied per-row. The merge table
    // is corpus-dependent, so no static DuckDB oracle exists → rows-only
    // gate (same declared class as simhash); BpeSpec proves training
    // determinism, and the fixed-vocab gate (q_bpe_token_stats) hash-
    // checks the application machinery.
    "q_bpe_trained" -> { (s, d) =>
      // spread: the merge APPLICATION is per-row-heavy and the agg below is
      // count + sum(int→long) — exact, partitioning-invariant (the avg-based
      // token-stats gates stay unspread: double sums are order-sensitive)
      val docs = docsSpread(s, d)
      val merges = graft.functions.BpeTokenizer.trainOnSample(
        docs, "text", numMerges = 64)
      docs.withColumn("n_bpe",
          graft.functions.BpeTokenizer.bpeTokenCount(col("text"), merges))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("total_tokens"))
        .orderBy(col("source"))
    },

    "q_text_quality" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("q", TA.qualityScore(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), round(avg(col("q")), 4).as("avg_quality"))
        .orderBy(col("source"))
    },

    "q_lang_id" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("pred", TA.langId(col("text")))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    },

    "q_dedup_exact" -> { (s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_total"),
          min(col("doc_id")).as("min_keeper"))
    },

    "q_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(docsWithShingles(s, d), "doc_id", "sh", "source", 0.5)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },

    "q_minhash_lsh" -> { (s, d) =>
      minhashPairsFor(s, d)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Incremental (ingest-time) MinHash dedup: the corpus splits into an
    // already-indexed 80% (bucket store persisted as a graft table) and an
    // arriving 20% batch; the batch probes the store for old candidates and
    // self-joins for batch-internal ones, exact-verifies, then appends its
    // buckets in ONE commit. Oracle = exhaustive-jaccard pairs touching the
    // new slice (same recall argument as q_minhash_lsh: banding miss
    // probability at 0.8 is (1-0.64)^32 ≈ 5e-15).
    "q_minhash_incremental" -> { (s, d) =>
      import graft.format.GraftTable
      val docs = docsWithShingles(s, d).localCheckpoint()
      val old = docs.filter(col("doc_id") % 10 < 8)
      val neu = docs.filter(col("doc_id") % 10 >= 8)
      val store = freshDir(s, s"mh_store_${d.hashCode.toHexString}")
      Dedup.minhashIndexBuild(old, "doc_id", "sh", store)
      val pairs = Dedup.minhashIncremental(neu, "doc_id", "sh", old, store, 0.8)
      // the append made the batch visible to the NEXT batch: store holds
      // (old + new) docs × 32 bands. ONE fused aggregate job proves it
      // (r17, VERDICT r16 #6 — was two count jobs; both sides are
      // metadata-cheap: docs is checkpointed, the store is band rows)
      val cnt = docs.agg(count(lit(1)).as("nd"))
        .crossJoin(GraftTable.read(s, store).agg(count(lit(1)).as("ns")))
        .head()
      require(cnt.getLong(1) == cnt.getLong(0) * 32,
        s"store holds ${cnt.getLong(1)} bucket rows, want ${cnt.getLong(0) * 32}")
      pairs.select(least(col("a_id"), col("b_id")).as("a_id"),
          greatest(col("a_id"), col("b_id")).as("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Near-dup pairs → connected components → survivor groups: the step a
    // corpus-dedup pipeline runs after LSH (keep one doc per component).
    // The LSH pairs are exact-verified, so the component structure is a
    // pure function of the jaccard threshold — DuckDB reproduces it with a
    // brute-force pair join + recursive reachability closure.
    "q_dedup_components" -> { (s, d) =>
      Dedup.connectedComponents(minhashPairsFor(s, d), "a_id", "b_id")
        .select(col("a_id").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    },

    // Deterministic weighted corpus mixing (training-mix construction):
    // hash-permutation sampling keeps exactly the same rows on every run,
    // so DuckDB replays the mix with plain arithmetic.
    "q_sample_mix" -> { (s, d) =>
      TA.sampleBySource(Tables.documents(s, d), "doc_id", "source",
        Map("src0" -> 0.3, "src1" -> 0.7, "src2" -> 0.0), default = 1.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))
    },

    // Per-row weighted sampling (quality-weighted downsampling): each doc
    // kept with probability min(1, n_chars/400) by the deterministic hash
    // permutation — DuckDB replays the identical arithmetic.
    "q_sample_weight" -> { (s, d) =>
      TA.sampleByWeight(
        Tables.documents(s, d)
          .withColumn("w", least(lit(1.0), col("n_chars") / lit(400.0))),
        "doc_id", "w")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))
    },

    // Deterministic stratified split assignment: train/val/test by
    // cumulative hash-permutation ranges; stable per id as the corpus
    // grows.
    "q_split_assign" -> { (s, d) =>
      TA.assignSplits(Tables.documents(s, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))
    },

    // Gopher repetition rules (Rae et al. 2021, §A1.1): duplicate-word
    // fraction + top-bigram fraction per document — the standard
    // quality-filter signals for repetitious machine-generated text.
    "q_text_repetition" -> { (s, d) =>
      TA.repetitionStats(docsSpread(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // FULL Gopher n-gram repetition rules (Rae et al. 2021 §A1.1): top
    // n-gram char fraction (n = 2..4) + duplicate n-gram char fraction
    // (n = 5..10), per doc — a per-row sorted-array fold on the Spark
    // side, a group-by replay in DuckDB; both clamp at 1.0.
    "q_gopher_ngrams" -> { (s, d) =>
      TA.gopherNgramStats(docsSpread(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // Composed Gopher quality FILTER: per-doc keep/drop + first failing
    // rule, every rule a per-row expression with the paper's thresholds.
    // minTokens/minStopWords relaxed from the paper's web-scale defaults
    // (50 / 2) so the synthetic word-salad corpus exercises the WHOLE
    // rule chain, not just the first two gates.
    "q_quality_filter" -> { (s, d) =>
      TA.gopherQualityFilter(docsSpread(s, d), "doc_id", "text",
        minTokens = 12, minStopWords = 1)
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination (GPT-3 appendix C): flag corpus docs
    // sharing any word 8-gram with a "benchmark" slice (every 97th doc —
    // those naturally self-hit, plus any doc overlapping them). Exact
    // distinct-gram hit counts — DuckDB reproduces them from the same
    // whitespace tokenization.
    "q_decontaminate" -> { (s, d) =>
      val docs = docsSpread(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .select(col("text").as("btext"))
      Dedup.contaminationFlags(docs, "doc_id", "text", bench, "btext",
        n = 8, minHits = 1)
        .orderBy(col("doc_id"))
    },

    // CCNet perplexity filtering (Wenzek et al. 2019 §4.2): bigram LM
    // trained on the src0 slice, every document scored by cross-entropy
    // under it. Counts, smoothing, and the log-sum are exact arithmetic —
    // DuckDB replays the identical model from the same tokenization.
    "q_perplexity" -> { (s, d) =>
      TA.perplexity(Tables.documents(s, d), "doc_id", "text",
        isRef = col("source") === "src0", alpha = 0.1)
        .orderBy(col("doc_id"))
    },

    // SimHash near-dup — sketch values are engine-specific, so the gate
    // records a rows-only check (no oracle entry).
    "q_simhash_dedup" -> { (s, d) =>
      Dedup.simhashNearDupPairs(docsWithShingles(s, d), "doc_id", "sh", 3)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Corpus-level exact line dedup (RefinedWeb/CCNet boilerplate
    // removal): the synthetic corpus has no newlines, so "lines" are
    // deterministic non-overlapping 3-word windows — the oracle replays
    // the identical chunking.
    "q_line_dedup" -> { (s, d) =>
      Dedup.lineDedup(docsWithLines(s, d), "doc_id", "lines")
        .orderBy(col("doc_id"))
    },

    // Exact-substring dedup (Lee et al. 2021, arXiv:2107.06499 §4.1):
    // maximal duplicated k-token spans, oracle-replayed string-exactly
    // (the operator keys the shuffle on xxhash64; the oracle groups the
    // window strings themselves — identical spans unless a 64-bit
    // collision lands inside this corpus).
    "q_substring_dedup" -> { (s, d) =>
      Dedup.exactSubstringSpans(docsSpread(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // the scrub half (the paper's removal policy): every doc's text with
    // the flagged tokens removed, fully-duplicated docs → null
    "q_substring_scrub" -> { (s, d) =>
      Dedup.exactSubstringScrub(docsSpread(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id"))
    },

    // Content fingerprints per source — rows-only (hash-engine-specific).
    "q_fingerprint" -> { (s, d) =>
      docsWithShingles(s, d)
        .select(col("doc_id"), fingerprint64(col("sh")).as("fp"))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(countDistinct(col("fp")).as("n_distinct_fp"))
        .orderBy(col("bucket"))
    },

    // Multimodal decode — REAL codec end-to-end: executor-side PNG encode of
    // per-doc deterministic fixtures (dims + gray level derived from doc_id),
    // ImageIO decode, grid-feature extraction. The oracle replays the same
    // arithmetic without a codec, so a decode bug (wrong dims, wrong pixels,
    // dropped rows) hash-mismatches.
    "q_multimodal_decode" -> { (s, d) =>
      import s.implicits._
      import graft.operators.Multimodal
      // spread the 1-split sf corpus before the encode+decode kernels
      // (r17: safe now that Multimodal.warmProviders() pins the imageio
      // registry walk to one initializer — the r16 spread attempt without
      // it serialized 32 tasks on provider discovery)
      val media = TA.spreadForCompute(
          Tables.documents(s, d).select(col("doc_id")), col("doc_id")).as[Long]
        .map { id =>
          val w = 16 + (id % 17).toInt
          val h = 16 + (id % 13).toInt
          val c = (id % 256).toInt
          Multimodal.MediaRow(id,
            Multimodal.encodePng(w, h, (_, _) => (c << 16) | (c << 8) | c))
        }
      Multimodal.decodeImages(media).toDF()
        .withColumn("gray", round(element_at(col("features"), 1) * 255).cast("long"))
        .groupBy((col("id") % 5).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("width")).as("total_w"),
          sum(col("height")).as("total_h"), sum(col("gray")).as("total_gray"))
        .orderBy(col("bucket"))
    },

    // Real WAV decode (javax.sound.sampled) over deterministic PCM
    // fixtures: constant-amplitude clips make rms/sample-count pure
    // arithmetic, so the DuckDB oracle replays them codec-free — a decode
    // bug (wrong sample count, wrong scaling, dropped rows) hash-mismatches.
    "q_audio_features" -> { (s, d) =>
      import s.implicits._
      import graft.operators.Multimodal
      // spread before the encode+decode kernels (see q_multimodal_decode)
      val media = TA.spreadForCompute(
          Tables.documents(s, d).select(col("doc_id")), col("doc_id")).as[Long]
        .map { id =>
          val n = 200 + (id % 50).toInt
          val amp = ((id % 100) * 300).toShort // ≤ 29 700 < Short.MaxValue
          Multimodal.MediaRow(id, Multimodal.encodeWav(8000, Array.fill(n)(amp)))
        }
      Multimodal.decodeAudio(media, bins = 4).toDF()
        .withColumn("level", round(col("rms") * 32768).cast("long"))
        .groupBy((col("id") % 5).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("nSamples")).as("total_samples"),
          sum(col("level")).as("total_level"))
        .orderBy(col("bucket"))
    },

    // Real MJPEG-in-AVI frame decode: RIFF container walk + stdlib JPEG
    // codec per frame. Frame COUNT and DIMENSIONS are exact through the
    // lossy codec, so the oracle replays that arithmetic codec-free; pixel
    // accuracy is specced separately with JPEG tolerance.
    "q_video_frames" -> { (s, d) =>
      import s.implicits._
      import graft.operators.Multimodal
      // deterministic doc subset: the fixture ENCODE (3 JPEGs/doc) would
      // otherwise dominate the measurement at bench scale — 2k docs
      // exercises the full decode path at every sf
      // spread before the 3-JPEG-per-doc encode + frame decode kernels
      // (see q_multimodal_decode)
      val media = TA.spreadForCompute(
          Tables.documents(s, d).select(col("doc_id"))
            .filter(col("doc_id") < 2000), col("doc_id")).as[Long]
        .map { id =>
          val nf = 2 + (id % 3).toInt
          val w = 16 + (id % 9).toInt
          val h = 16 + (id % 7).toInt
          val g = (id % 256).toInt
          val frames = (0 until nf).map(f =>
            Multimodal.encodeJpeg(w, h, (_, _) => {
              val v = (g + f * 40) % 256; (v << 16) | (v << 8) | v
            }))
          Multimodal.MediaRow(id, Multimodal.encodeAviMjpeg(frames, w, h))
        }
      Multimodal.decodeVideoFrames(media).toDF()
        .groupBy((col("id") % 5).as("bucket"))
        .agg(count(lit(1)).as("n_frames"), sum(col("width")).as("total_w"),
          sum(col("height")).as("total_h"))
        .orderBy(col("bucket"))
    },

    // Training-shard packing: assign documents to shards by cumulative token
    // budget in doc_id order. [[TA.packShards]] is a hierarchical prefix sum
    // — per-bucket window, per-super-bucket window, metadata-sized driver
    // offset pass — in which every window is PARTITIONED (require'd on the
    // plan inside packShards); no single-partition stage at any corpus size.
    "q_pack_shards" -> { (s, d) =>
      TA.packShards(Tables.documents(s, d), "doc_id", "text",
        shardTokens = 10000L, bucketSpan = 100L)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("shard_tokens"))
        .orderBy(col("shard"))
    },

    // Fixed-length sequence packing (GPT-style packed pretraining
    // batches): docs concatenate in id order into 256-token sequences and
    // split across boundaries; every (doc, sequence) slice row travels
    // through the hash gate, so a wrong offset/length/boundary anywhere
    // in the corpus mismatches. The slice invariants (doc slices
    // reassemble docs, sequences fill to exactly 256) are spec-asserted.
    "q_pack_sequences" -> { (s, d) =>
      TA.packSequences(Tables.documents(s, d), "doc_id", "text",
        seqLen = 256L, bucketSpan = 100L)
        .orderBy(col("doc_id"), col("seq_id"))
    },

    // PII scrubbing: count and redact email/phone-shaped tokens (the
    // regex-sanitize pass every corpus pipeline runs before training).
    "q_pii_scrub" -> { (s, d) =>
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      Tables.documents(s, d)
        .withColumn("n_emails",
          size(split(col("text"), emailRe)) - 1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_emails").cast("long")).as("total_emails"),
          sum(when(col("n_emails") > 0, 1L).otherwise(0L)).as("docs_scrubbed"))
        .orderBy(col("source"))
    },

    "q_contains_tokens" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(array_contains(TA.tokens(col("text")), "vector") &&
          array_contains(TA.tokens(col("text")), "index"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }
  )

  private val stop7 = TA.Stopwords.map(s => s"'$s'").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    // replays the 3-word pseudo-line chunking, the ≥2-distinct-doc
    // boilerplate rule, and the in-order surviving-line rejoin exactly
    "q_line_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS idx, array_to_string(w[(i*3+1):(i*3+3)], ' ') AS line
        |  FROM toks, LATERAL (SELECT UNNEST(generate_series(0, CAST(len(w) // 3 AS INT) - 1)) AS i) t
        |  WHERE len(w) >= 3),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY 1),
        |flagged AS (
        |  SELECT l.doc_id, l.idx, l.line, f.nd >= 2 AS dup
        |  FROM lines l JOIN freq f USING (line))
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
        |  string_agg(CASE WHEN NOT dup THEN line END, ' ' ORDER BY idx) AS cleaned
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exact replay of the k=8 sliding-window substring dedup: windows by
    // string equality, corpus-wide count > 1 (incl. twice in one doc),
    // gaps-and-islands merge of overlapping/adjacent starts
    "q_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |wins AS (
        |  SELECT doc_id, i - 1 AS s, array_to_string(w[i:(i+7)], ' ') AS win
        |  FROM toks, LATERAL (SELECT UNNEST(generate_series(1, CAST(len(w) AS INT) - 7)) AS i) t
        |  WHERE len(w) >= 8),
        |dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) > 1),
        |hits AS (SELECT doc_id, s FROM wins JOIN dup USING (win)),
        |isl AS (
        |  SELECT doc_id, s, CASE WHEN s > coalesce(
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY s), -1000000) + 8
        |    THEN 1 ELSE 0 END AS newi
        |  FROM hits),
        |isl2 AS (SELECT doc_id, s,
        |  sum(newi) OVER (PARTITION BY doc_id ORDER BY s) AS isle FROM isl)
        |SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
        |  CAST(max(s) + 8 AS BIGINT) AS span_end
        |FROM isl2 GROUP BY doc_id, isle
        |ORDER BY doc_id, span_start""".stripMargin,
    // scrub replay: a token is cut iff some duplicated window covers it;
    // surviving tokens rejoin in order, all-cut docs go null
    "q_substring_scrub" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |wins AS (
        |  SELECT doc_id, i - 1 AS s, array_to_string(w[i:(i+7)], ' ') AS win
        |  FROM toks, LATERAL (SELECT UNNEST(generate_series(1, CAST(len(w) AS INT) - 7)) AS i) t
        |  WHERE len(w) >= 8),
        |dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) > 1),
        |hits AS (SELECT doc_id, s FROM wins JOIN dup USING (win)),
        |tok AS (
        |  SELECT doc_id, t.i - 1 AS ti, w[t.i] AS tokn
        |  FROM toks, LATERAL (SELECT UNNEST(generate_series(1, CAST(len(w) AS INT))) AS i) t),
        |flag AS (
        |  SELECT tok.doc_id, ti, tokn,
        |    EXISTS(SELECT 1 FROM hits h
        |           WHERE h.doc_id = tok.doc_id AND h.s <= ti AND ti < h.s + 8) AS cut
        |  FROM tok)
        |SELECT doc_id,
        |  CASE WHEN count(*) FILTER (WHERE NOT cut) = 0 THEN NULL
        |       ELSE string_agg(CASE WHEN NOT cut THEN tokn END, ' ' ORDER BY ti)
        |  END AS cleaned
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays the q_multimodal_decode fixture arithmetic codec-free: the
    // Spark side must round-trip the exact dims/gray through PNG encode+decode
    "q_multimodal_decode" ->
      """SELECT doc_id % 5 AS bucket, count(*) AS n,
        | CAST(sum(16 + doc_id % 17) AS BIGINT) AS total_w,
        | CAST(sum(16 + doc_id % 13) AS BIGINT) AS total_h,
        | CAST(sum(doc_id % 256) AS BIGINT) AS total_gray
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // replays the q_video_frames fixture arithmetic codec-free: every frame
    // of a doc's AVI shares the doc's (w, h); count/dims survive the lossy
    // JPEG codec exactly
    "q_video_frames" ->
      """SELECT doc_id % 5 AS bucket,
        | CAST(sum(2 + doc_id % 3) AS BIGINT) AS n_frames,
        | CAST(sum((2 + doc_id % 3) * (16 + doc_id % 9)) AS BIGINT) AS total_w,
        | CAST(sum((2 + doc_id % 3) * (16 + doc_id % 7)) AS BIGINT) AS total_h
        |FROM documents WHERE doc_id < 2000 GROUP BY 1 ORDER BY 1""".stripMargin,
    // replays the q_audio_features fixture arithmetic codec-free: constant
    // PCM amplitude a over n samples has rms exactly a/32768
    "q_audio_features" ->
      """SELECT doc_id % 5 AS bucket, count(*) AS n,
        | CAST(sum(200 + doc_id % 50) AS BIGINT) AS total_samples,
        | CAST(sum((doc_id % 100) * 300) AS BIGINT) AS total_level
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
        | round(avg(len(string_split(text,' '))),4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_bpe_token_stats" -> {
      val n = graft.functions.BpeTokenizer.oracleCountSql("text",
        graft.functions.BpeTokenizer.EnglishMerges)
      s"""SELECT lang, count(*) AS n_docs,
         | CAST(sum($n) AS BIGINT) AS total_bpe_tokens,
         | round(avg($n),4) AS avg_bpe_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q_text_quality" ->
      s"""WITH q AS (
         |  SELECT source,
         |    (least(len(string_split(text,' '))/100.0, 1.0)
         |     + least((len(list_filter(string_split(text,' '), t -> t IN ($stop7)))*1.0
         |              / len(string_split(text,' '))) * 5.0, 1.0)
         |     + 1.0 - least(((length(text) - length(regexp_replace(text,'[^A-Za-z0-9 ]','','g')))*1.0
         |              / length(text)) * 4.0, 1.0)) / 3.0 AS quality
         |  FROM documents)
         |SELECT source, count(*) AS n, round(avg(quality),4) AS avg_quality
         |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_lang_id" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is'))) AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('el','los','una','y','es'))) AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('le','les','une','et','est'))) AS s_fr,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 AS cjk
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN cjk THEN 'zh'
        |       WHEN s_en=0 AND s_de=0 AND s_es=0 AND s_fr=0 THEN 'und'
        |       WHEN s_en>=s_de AND s_en>=s_es AND s_en>=s_fr THEN 'en'
        |       WHEN s_de>=s_es AND s_de>=s_fr THEN 'de'
        |       WHEN s_es>=s_fr THEN 'es'
        |       ELSE 'fr' END AS pred,
        |  count(*) AS n
        |FROM s GROUP BY lang, pred ORDER BY lang, pred""".stripMargin,
    "q_dedup_exact" ->
      """SELECT count(*) AS n_unique, CAST(sum(n_copies) AS BIGINT) AS n_total, min(keeper) AS min_keeper
        |FROM (SELECT min(doc_id) AS keeper, count(*) AS n_copies
        |      FROM documents GROUP BY text)""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(toks[i:i+2],' ')
        |                   for i in generate_series(1, len(toks)-2)]) AS sh
        |  FROM (SELECT doc_id, source, string_split(text,' ') AS toks FROM documents))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.sh,b.sh))*1.0
        |        / len(list_distinct(list_concat(a.sh,b.sh))),4) AS jaccard
        |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh,b.sh))*1.0
        |      / len(list_distinct(list_concat(a.sh,b.sh))) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_components" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2],' ')
        |                   for i in generate_series(1, len(toks)-2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sh,b.sh))*1.0
        |        / len(list_distinct(list_concat(a.sh,b.sh))) >= 0.8),
        |e AS (SELECT a_id AS u, b_id AS v FROM p
        |      UNION ALL SELECT b_id, a_id FROM p),
        |reach(u, lbl) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
        |  UNION
        |  SELECT e.u, r.lbl FROM e JOIN reach r ON e.v = r.u)
        |SELECT u AS doc_id, min(lbl) AS component
        |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,
    "q_sample_mix" ->
      """SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |WHERE ((doc_id % 10000) * 7919) % 10000 <
        |      (CASE source WHEN 'src0' THEN 0.3 WHEN 'src1' THEN 0.7
        |                   WHEN 'src2' THEN 0.0 ELSE 1.0 END) * 10000
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_weight" ->
      """SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |WHERE ((doc_id % 10000) * 7919) % 10000 <
        |      least(1.0, n_chars / 400.0) * 10000
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_split_assign" ->
      """SELECT CASE WHEN ((doc_id % 10000) * 7919) % 10000 < 8000.0 THEN 'train'
        |            WHEN ((doc_id % 10000) * 7919) % 10000 < 9000.0 THEN 'val'
        |            WHEN ((doc_id % 10000) * 7919) % 10000 < 10000.0 THEN 'test'
        |            ELSE 'train' END AS split,
        |  count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |b AS (SELECT doc_id,
        |        round(1.0 - len(list_distinct(toks))*1.0/len(toks), 4) AS dup_word_frac,
        |        unnest([array_to_string(toks[i:i+1],' ')
        |                for i in generate_series(1, len(toks)-1)]) AS bg
        |      FROM w WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, dup_word_frac, bg, count(*) AS cnt
        |      FROM b GROUP BY 1, 2, 3)
        |SELECT doc_id, dup_word_frac,
        |       round(max(cnt)*1.0/sum(cnt), 4) AS top_bigram_frac
        |FROM c GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    // Generated replay of gopherNgramStats: one (grams → counts → top/dup)
    // CTE chain per n, joined back per doc. Tie rule (ORDER BY c DESC,
    // g ASC) matches the fold's first-run-in-sorted-order tie-break.
    "q_gopher_ngrams" -> {
      val topNs = Seq(2, 3, 4); val dupNs = Seq(5, 6, 7, 8, 9, 10)
      val ns = (topNs ++ dupNs).distinct.sorted
      val ctes = ns.map { n =>
        s"""g$n AS (
           |  SELECT doc_id, g, count(*) AS c
           |  FROM (SELECT doc_id, unnest(CASE WHEN len(t) >= $n
           |          THEN list_transform(range(1, len(t) - $n + 2),
           |                 i -> array_to_string(t[i:i+${n - 1}], ' '))
           |          ELSE CAST([] AS VARCHAR[]) END) AS g
           |        FROM toks)
           |  GROUP BY doc_id, g),
           |a$n AS (
           |  SELECT doc_id, CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END AS topchars,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn,
           |    sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)
           |      OVER (PARTITION BY doc_id) AS dupchars
           |  FROM g$n),
           |p$n AS (SELECT doc_id, topchars, dupchars FROM a$n WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val cols =
        topNs.map(n => s"round(least(1.0, coalesce(p$n.topchars, 0) * 1.0 " +
          s"/ length(d.text)), 4) AS top_${n}gram_char_frac") ++
        dupNs.map(n => s"round(least(1.0, coalesce(p$n.dupchars, 0) * 1.0 " +
          s"/ length(d.text)), 4) AS dup_${n}gram_char_frac")
      val joins = ns.map(n => s"LEFT JOIN p$n USING(doc_id)").mkString(" ")
      s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t
         |  FROM documents),
         |$ctes
         |SELECT d.doc_id, ${cols.mkString(",\n  ")}
         |FROM documents d $joins ORDER BY d.doc_id""".stripMargin
    },
    // DuckDB replay of gopherQualityFilter: same per-row statistics, same
    // CASE order, same paper thresholds. The n-gram CTEs mirror
    // q_gopher_ngrams' generator but feed UNROUNDED clamped fractions
    // into the threshold comparisons (ratios of small exact integers —
    // bit-identical IEEE division on both engines).
    "q_quality_filter" -> {
      val ns = Seq(2, 3, 4, 5, 6, 7, 8, 9, 10)
      val ctes = ns.map { n =>
        s"""g$n AS (
           |  SELECT doc_id, g, count(*) AS c
           |  FROM (SELECT doc_id, unnest(CASE WHEN len(t) >= $n
           |          THEN list_transform(range(1, len(t) - $n + 2),
           |                 i -> array_to_string(t[i:i+${n - 1}], ' '))
           |          ELSE CAST([] AS VARCHAR[]) END) AS g
           |        FROM toks)
           |  GROUP BY doc_id, g),
           |a$n AS (
           |  SELECT doc_id, CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END AS topchars,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn,
           |    sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)
           |      OVER (PARTITION BY doc_id) AS dupchars
           |  FROM g$n),
           |p$n AS (SELECT doc_id, topchars, dupchars FROM a$n WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val joins = ns.map(n => s"LEFT JOIN p$n USING(doc_id)").mkString(" ")
      def topv(n: Int) =
        s"least(1.0, coalesce(p$n.topchars, 0) * 1.0 / length(d.text))"
      def dupv(n: Int) =
        s"least(1.0, coalesce(p$n.dupchars, 0) * 1.0 / length(d.text))"
      val stops = graft.operators.TextAnalysis.GopherStopWords
        .map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t
         |  FROM documents),
         |$ctes,
         |base AS (
         |  SELECT doc_id, text, len(t) * 1.0 AS n,
         |    list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t) AS meanlen,
         |    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0
         |      / len(t) AS alphafrac,
         |    len(list_intersect(list_distinct(list_transform(t, x -> lower(x))),
         |        $stops)) AS stopcount,
         |    (length(text) - length(replace(text, '#', ''))) * 1.0 AS hashes,
         |    (length(text) - length(replace(text, '...', ''))) / 3.0 AS ellipses
         |  FROM toks),
         |r AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.n < 12 THEN 'too_few_tokens'
         |         WHEN d.n > 100000 THEN 'too_many_tokens'
         |         WHEN d.meanlen < 3.0 OR d.meanlen > 10.0 THEN 'mean_word_length'
         |         WHEN d.hashes / d.n > 0.1 OR d.ellipses / d.n > 0.1
         |           THEN 'symbol_ratio'
         |         WHEN d.alphafrac < 0.8 THEN 'alpha_words'
         |         WHEN d.stopcount < 1 THEN 'stop_words'
         |         WHEN ${topv(2)} > 0.20 THEN 'top_2gram'
         |         WHEN ${topv(3)} > 0.18 THEN 'top_3gram'
         |         WHEN ${topv(4)} > 0.16 THEN 'top_4gram'
         |         WHEN ${dupv(5)} > 0.15 THEN 'dup_5gram'
         |         WHEN ${dupv(6)} > 0.14 THEN 'dup_6gram'
         |         WHEN ${dupv(7)} > 0.13 THEN 'dup_7gram'
         |         WHEN ${dupv(8)} > 0.12 THEN 'dup_8gram'
         |         WHEN ${dupv(9)} > 0.11 THEN 'dup_9gram'
         |         WHEN ${dupv(10)} > 0.10 THEN 'dup_10gram'
         |         ELSE NULL END AS reason
         |  FROM (SELECT dd.*, b.n, b.meanlen, b.alphafrac, b.stopcount,
         |          b.hashes, b.ellipses
         |        FROM documents dd JOIN base b USING(doc_id)) d $joins)
         |SELECT doc_id, reason IS NULL AS kept, reason
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "q_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+7],' ')
        |                   for i in generate_series(1, len(w)-7)]) AS g
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM documents)),
        |bg AS (SELECT DISTINCT unnest(g) AS gram FROM t WHERE doc_id % 97 = 0),
        |dg AS (SELECT doc_id, unnest(g) AS gram FROM t)
        |SELECT dg.doc_id, count(DISTINCT dg.gram) AS n_hits
        |FROM dg JOIN bg ON dg.gram = bg.gram
        |GROUP BY dg.doc_id
        |HAVING count(DISTINCT dg.gram) >= 1
        |ORDER BY doc_id""".stripMargin,
    "q_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2],' ')
        |                   for i in generate_series(1, len(toks)-2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.sh,b.sh))*1.0
        |        / len(list_distinct(list_concat(a.sh,b.sh))),4) AS jaccard
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh,b.sh))*1.0
        |      / len(list_distinct(list_concat(a.sh,b.sh))) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    // same exhaustive replay, restricted to pairs touching the new slice
    "q_minhash_incremental" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2],' ')
        |                   for i in generate_series(1, len(toks)-2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.sh,b.sh))*1.0
        |        / len(list_distinct(list_concat(a.sh,b.sh))),4) AS jaccard
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh,b.sh))*1.0
        |      / len(list_distinct(list_concat(a.sh,b.sh))) >= 0.8
        |  AND (a.doc_id % 10 >= 8 OR b.doc_id % 10 >= 8)
        |ORDER BY a_id, b_id""".stripMargin,
    "q_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |gr AS (
        |  SELECT doc_id, source,
        |    unnest([w[i] || ' ' || w[i+1]
        |            for i in generate_series(1, len(w)-1)]) AS g
        |  FROM tok),
        |db AS (SELECT doc_id, g, count(*) AS c FROM gr GROUP BY 1, 2),
        |rb AS (SELECT g, count(*) AS cb FROM gr WHERE source = 'src0' GROUP BY 1),
        |rh AS (SELECT string_split(g,' ')[1] AS w1, sum(cb) AS ch
        |       FROM rb GROUP BY 1),
        |v AS (SELECT count(DISTINCT u.t) AS vsz
        |      FROM (SELECT unnest(w) AS t FROM tok WHERE source = 'src0') u)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
        |  round(exp(-sum(db.c * ln((coalesce(rb.cb,0) + 0.1)
        |                           / (coalesce(rh.ch,0) + 0.1 * v.vsz)))
        |            / sum(db.c)), 4) AS ppl
        |FROM db
        |LEFT JOIN rb ON db.g = rb.g
        |LEFT JOIN rh ON string_split(db.g,' ')[1] = rh.w1
        |CROSS JOIN v
        |GROUP BY db.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_pack_shards" ->
      """WITH t AS (SELECT doc_id, len(string_split(text,' ')) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prior
        |      FROM t)
        |SELECT CAST(floor(prior / 10000) AS BIGINT) AS shard,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        |FROM c GROUP BY shard ORDER BY shard""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, len(string_split(text,' ')) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |          AS BIGINT) AS prior
        |      FROM t WHERE n_tokens > 0),
        |s AS (SELECT doc_id, n_tokens, prior,
        |        unnest(generate_series(CAST(floor(prior / 256) AS BIGINT),
        |          CAST(floor((prior + n_tokens - 1) / 256) AS BIGINT))) AS seq_id
        |      FROM c)
        |SELECT doc_id, seq_id,
        |  greatest(prior - seq_id * 256, 0) AS seq_begin,
        |  greatest(seq_id * 256 - prior, 0) AS doc_begin,
        |  least(prior + n_tokens, (seq_id + 1) * 256)
        |    - greatest(prior, seq_id * 256) AS len
        |FROM s ORDER BY doc_id, seq_id""".stripMargin,
    "q_pii_scrub" ->
      """SELECT source, count(*) AS n,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))) AS BIGINT) AS total_emails,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_scrubbed
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_contains_tokens" ->
      """SELECT doc_id, lang FROM documents
        |WHERE list_contains(string_split(text,' '), 'vector')
        |  AND list_contains(string_split(text,' '), 'index')
        |ORDER BY doc_id""".stripMargin
  )
}
