package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristic.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * primitives (split/transform/array ops) so the whole pipeline stays inside
  * whole-stage codegen — no UDFs. Formulas are chosen to be expressible in
  * ANSI SQL so the DuckDB oracle can replicate them exactly.
  */
object TextAnalysis {

  /** Spread a narrow scan across the cluster before per-row-heavy kernels
    * (r16, guide §2.5 "input skew — one huge unsplittable file …
    * repartition immediately after the read"): when the plan's scan
    * parallelism is below the cluster's — a single small input file is the
    * degenerate case — redistribute deterministically by `key` so the
    * shingle/signature/sketch passes use every core. At real corpus sizes
    * the scan already has >= cluster-width splits and the branch adds NO
    * shuffle. Row-local results are partitioning-invariant, so callers'
    * outputs are unchanged; do NOT use under order-sensitive float
    * aggregations. */
  def spreadForCompute(df: DataFrame, key: Column): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // ADVICE r16: under AQE, touching .rdd on a shuffle-bearing plan
    // materializes its upstream query stages (real jobs) just to read a
    // partition count. A plan that already shuffles is already
    // cluster-wide — only shuffle-free (scan/narrow) plans can be
    // degenerate-narrow, and on those .rdd is metadata-only (builds the
    // scan RDD, runs no job). AdaptiveSparkPlanExec only wraps plans with
    // exchanges or subqueries, so its presence alone means "not narrow".
    val shuffled = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => true
      case _ => false
    }
    if (shuffled) df
    else if (df.rdd.getNumPartitions >= parallelism) df
    else df.repartition(parallelism, key)
  }

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles over a token array (n consecutive tokens joined by
    * a space). Empty when the doc has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(typedLit(Array.empty[String]))

  /** Distinct word-n-gram set (the unit for jaccard similarity). */
  def shingleSet(text: Column, n: Int = 3): Column = array_distinct(shingles(tokens(text), n))

  /** Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Per-document duplicate-word fraction (Gopher quality rules, Rae et
    * al. 2021 arXiv:2112.11446 §A1.1 — repetitious documents are low
    * quality): 1 − distinct/total tokens. Pure per-row codegen'd
    * expression — no shuffle at any corpus size. */
  def dupWordFraction(toks: Column): Column =
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Per-document top-bigram fraction (the Gopher "fraction of characters
    * in the most common n-gram" family, computed over occurrence counts):
    * occurrences of the most frequent word bigram ÷ total bigrams.
    * Returns (idCol, dup_word_frac, top_bigram_frac) for every document
    * with ≥2 tokens.
    *
    * Shape: ZERO shuffles — the statistic is per-document, so it computes
    * inside the scan stage: sort the doc's bigram array (equal bigrams
    * become adjacent) and take the longest run with one `aggregate` fold.
    * O(d log d) per document, entirely codegen. The previous formulation
    * exploded every bigram through two keyed shuffles — corpus-token-sized
    * network traffic for a row-local statistic. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val bg = array_sort(shingles(toks, 2))
    val init = struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"))
    val topCount = aggregate(bg, init,
      (s, x) => {
        val run = when(x === s.getField("prev"), s.getField("run") + 1).otherwise(1)
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))
    // bigram count = token count − 1 for the ≥2-token rows kept here; a
    // size(bg) denominator would re-evaluate the whole sort+shingle tree
    df.filter(size(toks) >= 2)
      .select(col(idCol),
        round(dupWordFraction(toks), 4).as("dup_word_frac"),
        round(topCount.cast("double") / (size(toks) - 1).cast("double"), 4)
          .as("top_bigram_frac"))
  }

  /** FULL Gopher n-gram repetition rule set (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1): per document,
    *  - `top_{n}gram_char_frac` (n ∈ topNs, paper: 2..4) — characters
    *    covered by ALL occurrences of the doc's most frequent word
    *    n-gram, over the doc's characters (ties → lexicographically
    *    smallest n-gram, deterministic);
    *  - `dup_{n}gram_char_frac` (n ∈ dupNs, paper: 5..10) — characters
    *    covered by every occurrence of n-grams appearing ≥ 2 times,
    *    over the doc's characters.
    *
    * Same spirit as [[repetitionStats]]'s r10 rework: each statistic is
    * ONE per-row hash-count pass ([[graft.functions.NgramRepetition]]) —
    * a pure per-row expression, NO shuffle at any corpus size (the
    * n-grams of one doc never leave their row). Ties on the top count
    * resolve to the lexicographically smallest gram (explicit compareTo
    * in the expression), and `count·len` char accounting per
    * top/duplicated gram — both exactly replayable in the DuckDB
    * oracle's group-by formulation (q_gopher_ngrams). */
  def gopherNgramStats(df: DataFrame, idCol: String, textCol: String,
                       topNs: Seq[Int] = Seq(2, 3, 4),
                       dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): DataFrame = {
    val ns = (topNs ++ dupNs).distinct.sorted
    // stage 0 tokenizes ONCE (codegen CSE across 9 identical split()
    // subtrees is not guaranteed); stage 1 materializes each n's
    // [topChars, dupChars] pair ONCE; the frac projections then read the
    // pair twice without re-counting
    val toksStaged = df.select(col(idCol),
      length(col(textCol)).cast("double").as("__len"),
      tokens(col(textCol)).as("__toks"))
    val staged = toksStaged.select(col(idCol) +: col("__len") +:
      ns.map(n => ngramRep(col("__toks"), n).as(s"__rep$n")): _*)
    staged.select(col(idCol) +:
      (topNs.map(n => round(clampFrac(element_at(col(s"__rep$n"), 1),
        col("__len")), 4).as(s"top_${n}gram_char_frac")) ++
        dupNs.map(n => round(clampFrac(element_at(col(s"__rep$n"), 2),
          col("__len")), 4).as(s"dup_${n}gram_char_frac"))): _*)
  }

  /** `[topChars, dupChars]` of the doc's word n-grams — ONE per-row
    * hash-count pass ([[graft.functions.NgramRepetition]]); shared by
    * [[gopherNgramStats]] and [[gopherQualityFilter]].
    *
    * Overlapping occurrences can over-count characters, so consumers
    * clamp the fraction at 1 (Gopher's coverage metric caps naturally —
    * this is the documented occurrence-count variant). A top n-gram
    * occurring ONCE contributes 0 (not repetition; otherwise every short
    * doc's single top 4-gram trips the filter — the standard
    * reproduction behavior). */
  private def ngramRep(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.NgramRepetition(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(toks), n))

  private def clampFrac(chars: Column, len: Column): Column =
    when(len > 0, least(lit(1.0), chars.cast("double") / len))
      .otherwise(lit(0.0))

  /** Gopher's stop-word list for the "document coherence" rule (Rae et
    * al. 2021 §A1.1: a document must contain ≥ 2 of these). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality FILTER (Rae et al. 2021 §A1.1) — the
    * composed keep/drop decision a pipeline actually runs, per doc:
    * (id, kept, reason) where `reason` names the FIRST failing rule in
    * the paper's order (null = kept). Every rule is a per-row codegen'd
    * expression — no shuffle — and every threshold is the paper's:
    *
    *  1. `too_few_tokens` / `too_many_tokens` — word count outside
    *     [minTokens, maxTokens] (paper: 50 / 100k);
    *  2. `mean_word_length` — mean token chars outside [3, 10];
    *  3. `symbol_ratio` — '#'-to-word or '...'-to-word ratio > 0.1;
    *  4. `alpha_words` — < 80% of words contain an alphabetic char;
    *  5. `stop_words` — fewer than 2 distinct Gopher stop words;
    *  6. `top_{2,3,4}gram` — top n-gram char fraction > 0.20/0.18/0.16;
    *  7. `dup_{5..10}gram` — duplicate n-gram char fraction >
    *     0.15/0.14/0.13/0.12/0.11/0.10.
    *
    * (The paper's duplicate line/paragraph rules live in
    * [[graft.operators.Dedup.lineDedup]] — they need corpus context,
    * not a per-row pass.) */
  def gopherQualityFilter(df: DataFrame, idCol: String, textCol: String,
                          minTokens: Int = 50,
                          maxTokens: Int = 100000,
                          minStopWords: Int = 2): DataFrame = {
    val topThresh = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupThresh = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
      9 -> 0.11, 10 -> 0.10)
    val ns = (topThresh.map(_._1) ++ dupThresh.map(_._1)).distinct
    // stage 0 tokenizes ONCE — the scalar rules below each consume the
    // staged array instead of re-splitting the text per rule; stage 1
    // materializes each n's repetition pair ONCE (the dominant cost);
    // stage 2 composes the cheap scalar rules and the reason chain
    val toksStaged = df.select(col(idCol), col(textCol),
      tokens(col(textCol)).as("__toks"),
      length(col(textCol)).cast("double").as("__len"))
    val staged = toksStaged.select(Seq(col(idCol), col(textCol),
      col("__toks"), col("__len")) ++
        ns.map(g => ngramRep(col("__toks"), g).as(s"__rep$g")): _*)
    val toks = col("__toks")
    val n = size(toks).cast("double")
    val len = col("__len")
    val meanLen =
      length(array_join(toks, "")).cast("double") / n
    val alphaFrac =
      size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("double") / n
    val stopCount = size(array_intersect(
      array_distinct(transform(toks, x => lower(x))),
      typedLit(GopherStopWords)))
    def occurrences(lit0: String): Column =
      (length(col(textCol)) -
        length(replace(col(textCol), lit(lit0), lit("")))) / lit0.length
    val rules: Seq[(Column, String)] =
      Seq(
        (n < minTokens, "too_few_tokens"),
        (n > maxTokens, "too_many_tokens"),
        (meanLen < 3.0 || meanLen > 10.0, "mean_word_length"),
        (occurrences("#").cast("double") / n > 0.1 ||
          occurrences("...").cast("double") / n > 0.1, "symbol_ratio"),
        (alphaFrac < 0.8, "alpha_words"),
        (stopCount < minStopWords, "stop_words")) ++
        topThresh.map { case (g, t) =>
          (clampFrac(element_at(col(s"__rep$g"), 1), len) > t,
            s"top_${g}gram") } ++
        dupThresh.map { case (g, t) =>
          (clampFrac(element_at(col(s"__rep$g"), 2), len) > t,
            s"dup_${g}gram") }
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((cond, name), acc) => when(cond, lit(name)).otherwise(acc)
    }
    staged.select(col(idCol), reason.as("reason"))
      .withColumn("kept", col("reason").isNull)
      .select(col(idCol), col("kept"), col("reason"))
  }

  /** Deterministic weighted corpus mixing — the training-mix construction
    * step ("30% web, 40% books, …"): keep each row with its source's
    * probability, decided by a multiplicative-hash permutation of the id
    * (7919 is coprime to 10000, so residues permute uniformly). No RNG
    * state: the SAME rows are kept on every run, partitioning, and engine —
    * reproducible mixes and an exactly-expressible oracle. Sources absent
    * from `weights` keep `default` (1.0 = pass through). Pure per-row
    * codegen'd filter — scales to any corpus. */
  def sampleBySource(df: DataFrame, idCol: String, sourceCol: String,
                     weights: Map[String, Double],
                     default: Double = 1.0): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be in [0,1]: $weights")
    require(default >= 0.0 && default <= 1.0, s"default must be in [0,1]: $default")
    // the permutation hash is integer arithmetic; a non-integral id would
    // cast to null and the null predicate would SILENTLY drop every row
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"sampleBySource needs an integral id column; $idCol is ${idType.simpleString}" +
        " (hash a string id into a long first)")
    val frac = coalesce(element_at(typedLit(weights), col(sourceCol)), lit(default))
    val bucket = pmod(pmod(col(idCol).cast("long"), lit(10000L)) * lit(7919L), lit(10000L))
    df.filter(bucket < frac * lit(10000L))
  }

  /** Deterministic PER-ROW weighted sampling — quality-weighted
    * downsampling (keep each row with its own probability, e.g. a quality
    * or perplexity-derived weight in [0,1]): the same multiplicative-hash
    * permutation as [[sampleBySource]] decides each row, so the kept set
    * is identical on every run, partitioning, and engine — reproducible
    * corpora and an exactly-expressible oracle. Pure per-row codegen'd
    * filter. Weights outside [0,1] fail fast (a silent clamp would skew
    * the mix). */
  def sampleByWeight(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"sampleByWeight needs an integral id column; $idCol is ${idType.simpleString}" +
        " (hash a string id into a long first)")
    val w = col(weightCol).cast("double")
    val bucket = pmod(pmod(col(idCol).cast("long"), lit(10000L)) * lit(7919L), lit(10000L))
    df.filter(
      when(w.isNull || w < 0.0 || w > 1.0,
        raise_error(concat(lit(s"sampleByWeight: $weightCol out of [0,1]: "),
          col(weightCol).cast("string"))))
        .otherwise(bucket < w * lit(10000L)))
  }

  /** Deterministic stratified split assignment (train/val/test …): each
    * row gets a `split` label from cumulative ranges of the SAME hash
    * permutation — disjoint by construction, stable across runs/engines,
    * and a row keeps its split as the corpus grows (the permutation is a
    * pure function of the id). `splits` are (name, fraction) in priority
    * order; ids landing past the cumulative sum get `defaultName`.
    * Per-row codegen'd expression — no shuffle, no RNG state. */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)],
                   defaultName: String = "train"): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one named split")
    require(splits.forall(_._2 >= 0.0), s"split fractions must be >= 0: $splits")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions must sum to <= 1: $splits")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"assignSplits needs an integral id column; $idCol is ${idType.simpleString}")
    val bucket = pmod(pmod(col(idCol).cast("long"), lit(10000L)) * lit(7919L), lit(10000L))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val label = splits.zip(cum).foldRight(lit(defaultName)) {
      case (((name, _), c), acc) =>
        when(bucket < lit(c * 10000.0), lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(toks: Column): Column =
    size(array_intersect_count(toks)).cast("double") / size(toks).cast("double")

  // count of stopword occurrences (with repeats) — filter keeps duplicates
  private def array_intersect_count(toks: Column): Column =
    filter(toks, t => t.isin(Stopwords: _*))

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double") /
      length(text).cast("double")

  /** Mean token length. */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")

  /** Composite quality score in [0,1]: rewards moderate length, low
    * punctuation, presence of stopwords (fluent-text signal). Deterministic,
    * SQL-replicable.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(size(toks).cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(stopwordRatio(toks) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    (lenScore + stopScore + punctScore) / 3.0
  }

  /** Per-language marker-word lists for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "una", "y", "es"),
    "fr" -> Seq("le", "les", "une", "et", "est"),
    "zh" -> Seq.empty // handled by CJK char presence
  )

  /** Language-ID heuristic: argmax of marker-token hit counts, CJK override
    * for zh; ties resolved in LangMarkers order; no hits → "und".
    * The same decision tree is expressible in SQL (nested CASE).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    def score(markers: Seq[String]): Column =
      if (markers.isEmpty) lit(0) else size(filter(toks, t => t.isin(markers: _*)))
    val scores = LangMarkers.filter(_._2.nonEmpty).map { case (l, m) => (l, score(m)) }
    val hasCjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    val best = scores.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(hasCjk, lit("zh")).otherwise(best._1)
  }

  /** Training-shard packing: assign documents to shards by cumulative token
    * budget in `idCol` order — a hierarchical prefix sum in which EVERY
    * window is partitioned and bounded (the naive formulation is a global
    * unpartitioned window, which Spark executes on ONE partition regardless
    * of cluster size):
    *   level 0: per-bucket running sum over ≤`bucketSpan` docs
    *            (partitioned window);
    *   level 1: per-super-bucket running sum over ≤`superSpan` buckets
    *            (partitioned window);
    *   level 2: super-bucket offsets — n_buckets/superSpan totals collected
    *            to the driver for a metadata-sized prefix sum, broadcast
    *            back (at 10^11 docs: 10^9 buckets → ~244k super rows).
    * The bucket-offset join is corpus/bucketSpan-sized and left to AQE —
    * never a forced broadcast of a corpus-proportional side. Returns
    * (`idCol`, n_tokens, shard); [[requirePartitionedWindows]] rejects any
    * unpartitioned Window slipping back into the plan. */
  def packShards(df: DataFrame, idCol: String, textCol: String,
                 shardTokens: Long, bucketSpan: Long = 100L,
                 superSpan: Long = 4096L,
                 tokenCounts: Option[Column] = None): DataFrame =
    tokenOffsets(df, idCol, textCol, bucketSpan, superSpan, tokenCounts,
      "packShards") { off =>
      off.select(col(idCol), col("n_tokens"),
        floor(col("prior") / lit(shardTokens)).as("shard"))
    }

  /** Each document's PRIOR-token offset in the id-ordered corpus — the
    * hierarchical prefix sum shared by [[packShards]] and
    * [[packSequences]]: per-bucket window → per-super-bucket window →
    * metadata-sized driver offset pass broadcast back; every window
    * PARTITIONED and bounded (require'd on the optimized plan of the
    * finished frame), no corpus-sized single-partition stage anywhere.
    * `finish` shapes (idCol, n_tokens, prior) into the operator's output
    * BEFORE the localCheckpoint that releases the shared bucket agg. */
  private def tokenOffsets(df: DataFrame, idCol: String, textCol: String,
                           bucketSpan: Long, superSpan: Long,
                           tokenCounts: Option[Column], op: String)(
      finish: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // an id column named like an internal/output column would be silently
    // clobbered by the withColumns below (document identity lost) — fail
    // fast instead
    val internal = Seq("n_tokens", "bucket", "sup", "cum_in_bucket",
      "bk_offset", "prior", "shard", "seq_id", "seq_begin", "doc_begin", "len")
    require(!internal.contains(idCol),
      s"$op: id column '$idCol' collides with an internal/output name " +
        s"(${internal.mkString(", ")}) — rename it first")
    // budgets default to whitespace tokens; pass `tokenCounts` (e.g.
    // BpeTokenizer.bpeTokenCount over a real vocabulary) to pack by
    // tokenizer-true counts — what a training pipeline actually bills
    val docs = df.select(col(idCol),
      tokenCounts.getOrElse(tokenCount(col(textCol))).as("n_tokens"))
      .withColumn("bucket", floor(col(idCol) / lit(bucketSpan)))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bk = docs.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).cast("long").as("bk_tokens"))
      .withColumn("sup", floor(col("bucket") / lit(superSpan)))
      .persist()
    val wSup = Window.partitionBy(col("sup")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val supTotals = bk.groupBy(col("sup")).agg(sum(col("bk_tokens")).as("t"))
      .orderBy(col("sup")).collect()
    var acc = 0L
    val supOffsets = supTotals.map { r =>
      val o = acc; acc += r.getLong(1); (r.getLong(0), o)
    }.toSeq
    val offsets = bk
      .withColumn("cum_sup", sum(col("bk_tokens")).over(wSup))
      .join(broadcast(supOffsets.toDF("sup", "sup_offset")), "sup")
      .withColumn("bk_offset", col("sup_offset") + col("cum_sup") - col("bk_tokens"))
      .select(col("bucket"), col("bk_offset"))
    val out = finish(docs
      .withColumn("cum_in_bucket", sum(col("n_tokens")).over(wIn))
      .join(offsets, "bucket")
      .withColumn("prior", col("bk_offset") + col("cum_in_bucket") - col("n_tokens")))
    requirePartitionedWindows(out, op)
    // materialize before releasing the shared bucket aggregate
    val res = out.localCheckpoint()
    bk.unpersist()
    res
  }

  /** Fixed-length SEQUENCE packing — the LLM-pretraining data-prep step
    * [[packShards]] does not cover: documents concatenate in id order into
    * `seqLen`-token training sequences and SPLIT across sequence
    * boundaries (GPT-style packed batches), instead of binning whole docs
    * to shard budgets. One output row per (document, sequence) overlap:
    *
    *   seq_id    — the sequence this slice lands in
    *   seq_begin — the slice's start offset WITHIN the sequence
    *   doc_begin — the slice's start offset WITHIN the document
    *   len       — slice length in tokens
    *
    * so a loader can assemble any sequence from document slices (and a
    * document's slices reassemble the document). Scale shape: the prior
    * offsets are the shared hierarchical prefix sum; the per-doc explode
    * emits ≤ n_tokens/seqLen + 2 rows — output-proportional, no window
    * over the corpus, deterministic and exactly SQL-replayable. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Long, bucketSpan: Long = 100L,
                    superSpan: Long = 4096L,
                    tokenCounts: Option[Column] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    tokenOffsets(df, idCol, textCol, bucketSpan, superSpan, tokenCounts,
      "packSequences") { off =>
      val end = col("prior") + col("n_tokens") // exclusive
      val seqStart = col("seq_id") * lit(seqLen)
      off.filter(col("n_tokens") > 0)
        .withColumn("seq_id", explode(sequence(
          floor(col("prior") / lit(seqLen)),
          floor((end - 1) / lit(seqLen)))))
        .select(col(idCol),
          col("seq_id"),
          greatest(col("prior") - seqStart, lit(0L)).as("seq_begin"),
          greatest(seqStart - col("prior"), lit(0L)).as("doc_begin"),
          (least(end, seqStart + lit(seqLen)) -
            greatest(col("prior"), seqStart)).as("len"))
    }
  }

  /** CCNet-style n-gram LM perplexity scoring (Wenzek et al. 2019,
    * arXiv:1911.00359 §4.2 — the filtering stage that keeps the
    * "Wikipedia-like" slice of a crawl): train an add-alpha-smoothed
    * bigram LM on the reference slice (`isRef` rows), then score EVERY
    * document by per-bigram cross-entropy under it. Low perplexity ≈
    * fluent/in-domain; pipelines keep the head/middle of the per-language
    * perplexity distribution.
    *
    * Returns (idCol, n_bigrams, ppl) for every document with ≥2 tokens,
    * ppl rounded to 4 decimals:
    * `P(w2|w1) = (c_ref(w1 w2) + α) / (c_ref(w1 ·) + α·V)`,
    * `ppl(doc) = exp(−Σ log P / n_bigrams)` — V = reference vocabulary
    * size (distinct unigrams).
    *
    * Scale shape: the LM "tables" are plain aggregates of ONE exploded
    * bigram pass over the reference slice (map-side combined, pruned at
    * the scan when `isRef` is a pushable predicate); scoring is the
    * standard count-join plan — per-doc bigram counts (map-side combined)
    * joined to the model by gram key and by history key, two
    * gram-partitioned shuffle joins that AQE broadcasts when the model is
    * small. Nothing is quadratic and nothing funnels through one task; V
    * is the only driver-side value (a single long). */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
                 isRef: Column, alpha: Double = 0.1): DataFrame = {
    val bigr = df
      .select(col(idCol), isRef.as("is_ref"), tokens(col(textCol)).as("w"))
      .select(col(idCol), col("is_ref"), explode(shingles(col("w"), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val refB = bigr.filter(col("is_ref"))
      .groupBy(col("g")).agg(count(lit(1)).as("cb"),
        first(col("w1")).as("bw1"))
    val refH = refB.groupBy(col("bw1").as("w1")).agg(sum(col("cb")).as("ch"))
    // reference vocabulary size — a single driver-side long (metadata-sized)
    val vocab = df.filter(isRef)
      .select(explode(tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    val docB = bigr.groupBy(col(idCol), col("g"), col("w1"))
      .agg(count(lit(1)).as("c"))
    docB
      .join(refB.select(col("g"), col("cb")), Seq("g"), "left")
      .join(refH, Seq("w1"), "left")
      .withColumn("lp", col("c") * log(
        (coalesce(col("cb"), lit(0L)) + lit(alpha)) /
          (coalesce(col("ch"), lit(0L)) + lit(alpha * vocab))))
      .groupBy(col(idCol))
      .agg(sum(col("c")).cast("long").as("n_bigrams"),
        round(exp(-sum(col("lp")) / sum(col("c"))), 4).as("ppl"))
  }

  /** Every Window in the optimized plan must be partitioned: an
    * unpartitioned window funnels its whole input through ONE task, however
    * large the cluster — the exact anti-pattern Spark's own
    * `WARN WindowExec: No Partition Defined` flags. */
  def requirePartitionedWindows(df: DataFrame, tag: String): Unit = {
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    require(bad.isEmpty,
      s"$tag: ${bad.size} unpartitioned Window(s) in the plan — " +
        "single-partition execution at scale")
  }
}
