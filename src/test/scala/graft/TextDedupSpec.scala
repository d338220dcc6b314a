package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis => TA}
import graft.functions.TextHashFunctions._

class TextDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy cat", "a"), // near-dup of 1
    (3L, "completely different content about spark engines here", "a"),
    (4L, "the quick brown fox jumps over the lazy dog", "b")  // exact dup of 1
  ).toDF("doc_id", "text", "src")

  test("shingleSet produces distinct word trigrams") {
    val sh = docs.filter($"doc_id" === 1L)
      .select(TA.shingleSet($"text", 3)).as[Seq[String]].head()
    assert(sh.contains("the quick brown"))
    assert(sh.size == 7) // 9 tokens -> 7 trigrams, all distinct
  }

  test("shingleSet on short text is empty, not an error") {
    val sh = Seq((1L, "one two")).toDF("id", "text")
      .select(TA.shingleSet($"text", 3)).as[Seq[String]].head()
    assert(sh.isEmpty)
  }

  test("exact dedup groups identical content") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dupGroup = out.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 1L) // keeper = min id
  }

  test("minhash LSH finds the near-dup pair and not the distinct doc") {
    val withSh = docs.withColumn("sh", TA.shingleSet($"text", 3))
    val pairs = Dedup.minhashNearDupPairs(withSh, "doc_id", "sh", 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // jaccard(1,2) = 6/8 = 0.75
    assert(pairs.contains((1L, 4L))) // identical
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash of identical docs is identical; near-dups within distance") {
    val withSh = docs.withColumn("sh", TA.shingleSet($"text", 3))
    val sims = withSh.select($"doc_id", simhash64($"sh")).as[(Long, Long)]
      .collect().toMap
    assert(sims(1L) == sims(4L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) > 10)
  }

  test("jaccard formula") {
    val j = docs.filter($"doc_id".isin(1L, 2L))
      .agg(collect_list(TA.shingleSet($"text", 3)))
      .as[Seq[Seq[String]]].head()
    val (a, b) = (j(0).toSet, j(1).toSet)
    val expected = a.intersect(b).size.toDouble / a.union(b).size.toDouble
    assert(math.abs(expected - 0.75) < 1e-9)
  }

  test("langId picks marker language, first-max tie-break") {
    val out = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "le chat et les chiens est une"),
      (3L, "xyzzy plugh")
    ).toDF("id", "text")
      .select($"id", TA.langId($"text")).as[(Long, String)].collect().toMap
    assert(out(1L) == "de")
    assert(out(2L) == "fr")
    assert(out(3L) == "und")
  }

  test("quality score is in [0,1] and higher for fluent text") {
    val out = Seq(
      (1L, ("the cat sat on the mat and looked at the dog " * 10).trim),
      (2L, "@@@@ #### !!!! %%%% ^^^^")
    ).toDF("id", "text")
      .select($"id", TA.qualityScore($"text")).as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.8)
    assert(out(2L) < 0.5)
    out.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("fingerprint64 deterministic and content-sensitive") {
    val withSh = docs.withColumn("sh", TA.shingleSet($"text", 3))
    val fps = withSh.select($"doc_id", fingerprint64($"sh")).as[(Long, Long)]
      .collect().toMap
    assert(fps(1L) == fps(4L))
    assert(fps(1L) != fps(3L))
  }

  test("sampleBySource: deterministic weights, zero drops all, default passes") {
    val d = spark.range(0, 1000).toDF("doc_id")
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(4))))
    val got = TA.sampleBySource(d, "doc_id", "source",
      Map("s0" -> 0.5, "s1" -> 0.0), default = 1.0)
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("s1"), "weight 0 drops the source entirely")
    assert(bySrc("s2") == 250L && bySrc("s3") == 250L, "default 1.0 passes through")
    val s0 = bySrc("s0").toDouble
    assert(s0 > 250 * 0.35 && s0 < 250 * 0.65, s"~half of s0 kept: $s0")
    // deterministic: identical row set on a re-run with different partitioning
    val again = TA.sampleBySource(d.repartition(7), "doc_id", "source",
      Map("s0" -> 0.5, "s1" -> 0.0), default = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("sampleByWeight: per-row probability, deterministic, bounds enforced") {
    val d = spark.range(0, 10000).toDF("doc_id")
      .withColumn("w", when(pmod(col("doc_id"), lit(2)) === 0, 0.9).otherwise(0.1))
    val kept = TA.sampleByWeight(d, "doc_id", "w")
    val byW = kept.groupBy("w").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byW(0.9) > 4000 && byW(0.9) < 5000, byW.toString)
    assert(byW(0.1) > 300 && byW(0.1) < 700, byW.toString)
    // deterministic under repartitioning
    val again = TA.sampleByWeight(d.repartition(7), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
    // out-of-range weights fail fast, never silently clamp
    val bad = d.withColumn("w", lit(1.5))
    intercept[Exception] { TA.sampleByWeight(bad, "doc_id", "w").count() }
  }

  test("assignSplits: disjoint stable strata, remainder to default") {
    val d = spark.range(0, 10000).toDF("doc_id")
    val out = TA.assignSplits(d, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"), byS.toString)
    assert(byS("train") > 7500 && byS("train") < 8500, byS.toString)
    assert(byS("val") > 700 && byS("val") < 1300, byS.toString)
    // a row keeps its split as the corpus grows: the first 10k ids get
    // identical labels inside a 20k corpus
    val bigger = TA.assignSplits(spark.range(0, 20000).toDF("doc_id"),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("doc_id") < 10000)
    val a = out.orderBy("doc_id").select("split").as[String].collect().toSeq
    val b = bigger.orderBy("doc_id").select("split").as[String].collect().toSeq
    assert(a == b, "labels must be a pure function of the id")
    intercept[IllegalArgumentException] {
      TA.assignSplits(d, "doc_id", Seq("a" -> 0.7, "b" -> 0.5))
    }
  }

  test("repetitionStats: Gopher dup-word and top-bigram fractions") {
    val d = Seq(
      (1L, "a a a a"),  // 1 distinct of 4 tokens; bigram "a a" ×3 of 3
      (2L, "a b c d"),  // no repetition; 3 distinct bigrams
      (3L, "x")         // <2 tokens → absent from the result
    ).toDF("doc_id", "text")
    val got = TA.repetitionStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((0.75, 1.0)), got.toString)
    assert(got(2L) == ((0.0, 0.3333)), got.toString)
  }

  test("gopherNgramStats: top/dup n-gram char fractions, ties, clamp, short docs") {
    val d = Seq(
      // 11 chars; bigrams "a b"×2, "b a"×2, "a c"×1 — tie → smallest
      // "a b": top2 = 2·3/11; dup2 = (2·3 + 2·3)/11 clamps at 1.0
      (1L, "a b a b a c"),
      // 7 chars; bigram "a a"×3: top2 = min(1, 3·3/7) = 1.0
      (2L, "a a a a"),
      (3L, "x y z"), // no repeated bigram: top2 = 0 (count-1 top ignored)
      (4L, "w")      // < n tokens for every n → all zeros
    ).toDF("doc_id", "text")
    val got = TA.gopherNgramStats(d, "doc_id", "text",
        topNs = Seq(2), dupNs = Seq(2, 5))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((0.5455, 1.0, 0.0)), got.toString)
    assert(got(2L) == ((1.0, 1.0, 0.0)), got.toString)
    assert(got(3L) == ((0.0, 0.0, 0.0)), got.toString)
    assert(got(4L) == ((0.0, 0.0, 0.0)), got.toString)
  }

  test("gopherQualityFilter: first-failing-rule reasons in paper order") {
    val good = (("the data " * 10) + "model of things and more words here").trim
    val d = Seq(
      (1L, good),                        // passes every rule… except top_2gram
      (2L, "a b"),                       // too few tokens
      (3L, ("x " * 30).trim),            // 1-char mean word length
      (4L, ("then off #tags " * 10).trim + " #### ## ## ### morex"), // symbol ratio
      (5L, ("1234 5678 9012 3456 the offer " * 5).trim), // <80% alpha words
      (6L, ("zebra quartz " * 10).trim)  // no stop words
    ).toDF("doc_id", "text")
    val got = TA.gopherQualityFilter(d, "doc_id", "text",
        minTokens = 3, minStopWords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)).orNull))).toMap
    assert(got(2L) == ((false, "too_few_tokens")), got.toString)
    assert(got(3L) == ((false, "mean_word_length")), got.toString)
    assert(got(4L) == ((false, "symbol_ratio")), got.toString)
    assert(got(5L) == ((false, "alpha_words")), got.toString)
    assert(got(6L) == ((false, "stop_words")), got.toString)
    // doc 1: "the data" ×10 → top-2-gram chars 8·10 = 80 of 125 > 0.20
    assert(got(1L) == ((false, "top_2gram")), got.toString)
    // and a genuinely clean doc passes
    val clean = Seq((9L, "the quick brown fox jumps over that lazy dog " +
      "while many other animals of various kinds watch with great interest"))
      .toDF("doc_id", "text")
    val keep = TA.gopherQualityFilter(clean, "doc_id", "text",
        minTokens = 3, minStopWords = 2).collect().head
    assert(keep.getBoolean(1) && keep.isNullAt(2), keep.toString)
  }

  test("contaminationFlags counts distinct shared word n-grams vs a benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta other words entirely"),
      (4L, "nothing in common at all here")).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("btext")
    val got = Dedup.contaminationFlags(corpus, "doc_id", "text", bench, "btext",
      n = 4, minHits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares both 4-grams of the benchmark sentence; doc 3 shares one
    assert(got == Map(1L -> 2L, 3L -> 1L), got.toString)
    // minHits filters the single-gram overlap
    val strict = Dedup.contaminationFlags(corpus, "doc_id", "text", bench, "btext",
      n = 4, minHits = 2)
    assert(strict.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // n longer than every sentence → nothing flagged, no error
    assert(Dedup.contaminationFlags(corpus, "doc_id", "text", bench, "btext",
      n = 30).count() == 0L)
  }

  test("connectedComponents: chain, separate component, min-id labels") {
    // 1-2-3-4 is a CHAIN (diameter 3, needs >1 propagation round); 10-11
    // is a separate component; 20 has no edges and must not appear
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L), s"got $comp")
  }

  test("connectedComponents converges on a long chain (path halving)") {
    // diameter-59 chain: pure neighbor propagation needs 59 rounds and
    // would abort at the round cap; the label-of-label shortcut converges
    // in O(log d)
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L), s"one component labeled 1, got $comp")
    assert(comp.keySet == (1L to 60L).toSet)
  }

  test("1000-node chain converges in <= ceil(log2 d) + 1 rounds (VERDICT r12 #6)") {
    // the adversarial shape for label propagation: one path graph,
    // diameter 999. Per round, neighbor-min + the label-of-label shortcut
    // double the distance a label travels (reach after k rounds = 2^k-1),
    // so convergence is ceil(log2 999) = 10 propagation rounds + 1
    // verification round — not 999 driver-looped jobs.
    val d = 999
    val pairs = (1L to d.toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id", maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
    assert(comp.keySet == (1L to 1000L).toSet)
    val rounds = Dedup.lastConvergenceRounds.get()
    val bound = (math.log(d) / math.log(2)).ceil.toInt + 1
    assert(rounds <= bound, s"$rounds rounds for diameter $d, bound $bound")
  }

  test("connectedComponents on LSH pairs groups duplicates of one source") {
    val sh = docs.withColumn("sh", TA.shingleSet($"text", 3))
    val pairs = Dedup.minhashNearDupPairs(sh, "doc_id", "sh", 0.5)
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    // 1, 2, 4 are one near-dup family; 3 pairs with nothing
    assert(comp == Map(1L -> 1L, 2L -> 1L, 4L -> 1L), s"got $comp")
  }

  test("lineDedup removes corpus-duplicated lines, keeps order, nulls empty docs") {
    // "nav" is boilerplate shared by docs 1/2/3; "foot" by 1/2; each doc
    // also has unique lines except doc 3, which is ALL boilerplate
    val df = Seq(
      (1L, Seq("nav bar", "alpha body one", "foot note", "alpha body two")),
      (2L, Seq("nav bar", "beta body", "foot note")),
      (3L, Seq("nav bar", "foot note")),
      (4L, Seq("gamma body", "gamma tail"))
    ).toDF("doc_id", "lines")
    val got = Dedup.lineDedup(df, "doc_id", "lines")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, Some("alpha body one alpha body two")),
      (2L, 3L, 2L, Some("beta body")),
      (3L, 2L, 2L, None),
      (4L, 2L, 0L, Some("gamma body gamma tail"))), got.toString)
    // a line repeated WITHIN one doc is not corpus-boilerplate (distinct
    // docs, not occurrences, drive the rule)
    val solo = Seq((9L, Seq("same line", "same line", "tail"))).toDF("doc_id", "lines")
    val r = Dedup.lineDedup(solo, "doc_id", "lines")
      .as[(Long, Long, Long, Option[String])].head()
    assert(r == ((9L, 3L, 0L, Some("same line same line tail"))), r.toString)
    // partitioning-invariant: same result from a different layout
    val got8 = Dedup.lineDedup(df.repartition(8), "doc_id", "lines")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got8 == got)
  }

  test("perplexity: bigram LM cross-entropy matches hand arithmetic") {
    // reference slice = src "a"; its bigram counts:
    //   "x y": 2, "y x": 1, "y z": 1 → history c("x ·")=2, c("y ·")=2, V=3
    val corpus = Seq(
      (1L, "x y x y z", "a"),
      (2L, "x y", "b"),   // in-domain: the LM's most likely bigram
      (3L, "q r", "b"),   // out-of-domain: every bigram unseen
      (4L, "x", "b")      // <2 tokens → no bigrams → absent from output
    ).toDF("doc_id", "text", "src")
    val out = TA.perplexity(corpus, "doc_id", "text", $"src" === "a",
      alpha = 0.5).orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val v = 3.0
    def p(cb: Double, ch: Double) = (cb + 0.5) / (ch + 0.5 * v)
    def ppl(ps: Seq[Double]) =
      BigDecimal(math.exp(-ps.map(math.log).sum / ps.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Seq(
      (1L, 4L, ppl(Seq(p(2, 2), p(1, 2), p(2, 2), p(1, 2)))),
      (2L, 1L, ppl(Seq(p(2, 2)))),
      (3L, 1L, ppl(Seq(p(0, 0)))))
    assert(out == exp, s"got $out expected $exp")
    // the in-domain doc scores strictly lower perplexity than the unseen one
    assert(out(1)._3 < out(2)._3)
    // partitioning-invariant
    val out8 = TA.perplexity(corpus.repartition(8), "doc_id", "text",
      $"src" === "a", alpha = 0.5).orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out8 == out)
  }

  test("packSequences: slices reassemble docs, sequences fill to seqLen, boundaries split") {
    // deterministic corpus: doc i has (i % 7) + 1 tokens, 200 docs — token
    // offsets cross many 16-token sequence boundaries
    val docs = spark.range(0, 200).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), pmod(col("doc_id"), lit(7)).cast("int")),
          i => concat(lit("w"), i))))
    val L = 16L
    val out = TA.packSequences(docs, "doc_id", "text", seqLen = L,
        bucketSpan = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val nTok = (i: Long) => (i % 7) + 1
    val total = (0L until 200L).map(nTok).sum
    // per-doc: slices cover [0, n) contiguously in doc_begin order
    out.groupBy(_._1).foreach { case (id, slices) =>
      val s = slices.sortBy(_._4)
      assert(s.head._4 == 0L && s.map(_._5).sum == nTok(id), s"$id: $s")
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 + a._5 == b._4, s"doc $id slices not contiguous: $s")
          assert(a._2 + 1 == b._2, s"doc $id spans non-adjacent seqs: $s")
        case _ =>
      }
    }
    // per-sequence: every sequence except the last holds exactly L tokens,
    // contiguously in seq_begin order
    val bySeq = out.groupBy(_._2).toSeq.sortBy(_._1)
    bySeq.foreach { case (seq, slices) =>
      val s = slices.sortBy(_._3)
      assert(s.head._3 == 0L, s"seq $seq starts at ${s.head._3}")
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._5 == b._3, s"seq $seq gap: $s")
        case _ =>
      }
      val fill = s.map(_._5).sum
      if (seq < bySeq.last._1) assert(fill == L, s"seq $seq fill $fill")
      else assert(fill == total - seq * L, s"last seq fill $fill")
    }
    // a doc longer than L splits across >= 2 sequences when straddling
    assert(out.groupBy(_._1).values.exists(_.size >= 2),
      "no doc straddles a boundary — the test corpus is degenerate")
    // partitioning-invariant
    val out8 = TA.packSequences(docs.repartition(8), "doc_id", "text",
        seqLen = L, bucketSpan = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(out8 == out)
  }

  test("exactSubstringSpans: corpus-duplicated k-windows merge to maximal spans") {
    // docs 10 and 11 share the 10-token run "a b c d e f g h i j" (tokens
    // 2..11 of doc 10, 0..9 of doc 11); doc 12 repeats a 4-window TWICE
    // WITHIN itself; doc 13 is clean
    val corpus = Seq(
      (10L, "x y a b c d e f g h i j z"),
      (11L, "a b c d e f g h i j q r"),
      (12L, "p q r s t u m m p q r s t u m m"),
      (13L, "totally unique words nothing shared at all here")
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(corpus, "doc_id", "text", k = 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // 10-token shared run -> ONE maximal span per doc (7 overlapping
    // 4-windows merged); doc 12's repeated 8-token half -> one span
    // covering the whole doc (the second copy's windows overlap the
    // straddling windows); doc 13 absent
    assert(spans.filter(_._1 == 10L) == Seq((10L, 2L, 12L)))
    assert(spans.filter(_._1 == 11L) == Seq((11L, 0L, 10L)))
    assert(spans.filter(_._1 == 12L) == Seq((12L, 0L, 16L)))
    assert(!spans.exists(_._1 == 13L))
    // partitioning-invariant
    val spans8 = Dedup.exactSubstringSpans(corpus.repartition(8),
        "doc_id", "text", k = 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(spans8 == spans)
  }

  test("incremental minhash == batch pairs touching the new slice; store accretes") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "the quick brown fox jumps over the lazy dog tonight too"), // near-dup of 1
      (3L, "completely different content about spark engines here today"),
      (11L, "the quick brown fox jumps over the lazy dog tonight again"), // new: dup of 1 & 2
      (12L, "some fresh unrelated new-batch text with no duplicates at all"),
      (13L, "some fresh unrelated new-batch text with no duplicates here")  // new-new near-dup of 12
    ).toDF("doc_id", "text").withColumn("sh", TA.shingleSet($"text", 3))
    val old = corpus.filter($"doc_id" < 10L)
    val neu = corpus.filter($"doc_id" >= 10L)
    val store = java.nio.file.Files.createTempDirectory("mh_inc_").toString + "/store"
    Dedup.minhashIndexBuild(old, "doc_id", "sh", store)
    val inc = Dedup.minhashIncremental(neu, "doc_id", "sh", old, store, 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val batch = Dedup.minhashNearDupPairs(corpus, "doc_id", "sh", 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      .filter(p => p._1 >= 10L || p._2 >= 10L)
    assert(inc == batch, s"incremental $inc != batch-restricted $batch")
    assert(inc.contains((1L, 11L)) && inc.contains((2L, 11L)) &&
      inc.contains((12L, 13L)))
    // the NEXT batch sees this one through the store: a late duplicate of
    // doc 12 pairs with it without doc 12 being passed as oldDocs shingles
    // from anywhere but the verify union
    val late = Seq((21L, "some fresh unrelated new-batch text with no duplicates at all"))
      .toDF("doc_id", "text").withColumn("sh", TA.shingleSet($"text", 3))
    val inc2 = Dedup.minhashIncremental(late, "doc_id", "sh", neu.unionByName(old),
        store, 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(inc2.contains((12L, 21L)))
    val stored = graft.format.GraftTable.read(spark, store).count()
    assert(stored == 7L * 32, s"store holds $stored rows") // 7 docs x 32 bands
  }

  test("degenerate corpus: 10k exact duplicates — grouped before banding, candidates = output pairs") {
    // VERDICT r13 #1: N docs with one shared signature used to collide in
    // EVERY band, so the bucket self-join emitted N² rows × 32 bands before
    // anything could prune. Grouping identical signatures first collapses
    // them to ONE banded representative: the LSH join sees one row per band,
    // and the N·(N-1)/2 pairs appear only as the (real) output expansion.
    val n = 10000
    val dup = spark.range(n).select($"id".as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and again tonight").as("text"))
      .withColumn("sh", TA.shingleSet($"text", 3))
    val cands = Dedup.minhashCandidates(dup, "doc_id", "sh")
    assert(cands.count() == n.toLong * (n - 1) / 2)
    // and with one distinct outsider mixed in, the outsider still pairs with
    // nothing while the duplicate family is complete
    val mixed = dup.unionByName(
      Seq((500000L, "completely different content about spark engines here today"))
        .toDF("doc_id", "text").withColumn("sh", TA.shingleSet($"text", 3)))
    val withOutsider = Dedup.minhashCandidates(mixed, "doc_id", "sh")
    assert(withOutsider.filter($"a_id" === 500000L || $"b_id" === 500000L).count() == 0)
  }

  test("bucket cap skips over-cap DISTINCT-signature buckets but never identical-signature groups") {
    val sh = docs.withColumn("sh", TA.shingleSet($"text", 3))
    // maxBucket = 1: any bucket shared by two DISTINCT signatures is
    // skipped, so the near-dup pair (1,2) vanishes; the exact-dup pair
    // (1,4) survives — identical signatures group before banding and are
    // certain candidates regardless of the cap
    val capped = Dedup.minhashNearDupPairs(sh, "doc_id", "sh", 0.5, maxBucket = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 4L)), s"got $capped")
    // default cap: unchanged result
    val full = Dedup.minhashNearDupPairs(sh, "doc_id", "sh", 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(full == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"got $full")
  }

  test("incremental minhash: re-ingested id yields no self-pair and no duplicate pairs (ADVICE r13)") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "the quick brown fox jumps over the lazy dog tonight too")
    ).toDF("doc_id", "text").withColumn("sh", TA.shingleSet($"text", 3))
    val store = java.nio.file.Files.createTempDirectory("mh_reing_").toString + "/store"
    Dedup.minhashIndexBuild(corpus, "doc_id", "sh", store)
    // the batch re-ingests doc 1 (same id, same content) and adds a fresh
    // near-dup; oldDocs deliberately overlaps the batch on id 1
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (3L, "the quick brown fox jumps over the lazy dog tonight also")
    ).toDF("doc_id", "text").withColumn("sh", TA.shingleSet($"text", 3))
    val out = Dedup.minhashIncremental(batch, "doc_id", "sh", corpus, store, 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    assert(!out.contains((1L, 1L)), s"self-pair emitted: $out")
    assert(out.size == out.toSet.size, s"duplicate pairs emitted: $out")
    val norm = out.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    // store-leg (1,batch-1) suppressed; (2,1) via store only once even though
    // id 1 sits in both oldDocs and the batch; 3 pairs with both 1 and 2
    assert(norm == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $norm")
  }

  test("incremental minhash: over-cap store bucket SAMPLES, never skips — a new copy still pairs with history (r14 review)") {
    // 5 historical exact copies of one page, maxBucket = 2: every store
    // bucket holds 5 rows (> cap). A skip would make the 6th copy pass
    // dedup as unique; the bounded sample must still pair it with the
    // 2 lowest-id historical copies per band.
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val old = (1L to 5L).map(i => (i, text)).toDF("doc_id", "text")
      .withColumn("sh", TA.shingleSet($"text", 3))
    val store = java.nio.file.Files.createTempDirectory("mh_cap_").toString + "/store"
    Dedup.minhashIndexBuild(old, "doc_id", "sh", store)
    val batch = Seq((100L, text)).toDF("doc_id", "text")
      .withColumn("sh", TA.shingleSet($"text", 3))
    val pairs = Dedup.minhashIncremental(batch, "doc_id", "sh", old, store,
        0.8, maxBucket = 2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // candidates bounded (≤ maxBucket old partners), but NEVER empty —
    // connectivity to the duplicate family is preserved
    assert(pairs.nonEmpty, "new copy lost its link to history under the cap")
    assert(pairs.forall(_._2 == 100L), pairs.toString)
    assert(pairs.map(_._1).subsetOf(Set(1L, 2L)), s"lowest-id sample expected: $pairs")
  }

  test("exactSubstringScrub removes exactly the flagged tokens") {
    val corpus = Seq(
      (10L, "x y a b c d e f g h i j z"),
      (11L, "a b c d e f g h i j q r"),
      (13L, "totally unique words nothing shared at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringScrub(corpus, "doc_id", "text", k = 4)
      .as[(Long, String)].collect().toMap
    assert(out(10L) == "x y z")
    assert(out(11L) == "q r")
    assert(out(13L) == "totally unique words nothing shared at all here")
    // a fully-duplicated doc scrubs to null, not empty string
    val twins = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val scrubbed = Dedup.exactSubstringScrub(twins, "doc_id", "text", k = 4)
      .as[(Long, Option[String])].collect().toMap
    assert(scrubbed(1L).isEmpty && scrubbed(2L).isEmpty)
  }

  test("simhash dense chunk bucket is capped; sparse-bucket recall survives") {
    // 200 distinct decoy sketches i*(2^16+2^32+2^48): all share chunk-0
    // key 0 (one dense bucket), chunks 1-3 are i (distinct). Pairwise
    // hamming is large, but UNCAPPED the chunk-0 bucket alone yields
    // C(200,2)=19900 candidate comparisons. Plus one genuine near-dup
    // sketch pair (hamming 1) colliding only in SPARSE buckets, and two
    // docs sharing one sketch (hamming 0, must never ride the chunk join).
    val mul = (1L << 16) | (1L << 32) | (1L << 48)
    val base = 0x5a5a00000000L | 0x1111L // chunk0 = 0x1111, outside the dense bucket
    val rows =
      (1 to 200).map(i => (i.toLong, i * mul)) ++
      Seq((500L, base), (501L, base ^ (1L << 31)), // hamming 1 (chunk-1 bit above the decoy key range), chunks 0/2/3 shared
          (600L, 0x7777777777777777L), (601L, 0x7777777777777777L)) // identical
    val sh = rows.toDF("doc_id", "sim")
    val capped = Dedup.simhashSketchCandidates(
      sh.select($"sim").distinct(), maxBucket = 100)
    // the 200-sketch chunk-0 bucket is skipped; the only surviving
    // candidate is the genuine pair via its sparse (size-2) buckets
    assert(capped.count() == 1)
    val pairs = Dedup.simhashPairsFromSketches(sh, "doc_id", maxDist = 3,
      maxBucket = 100).as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((500L, 501L, 1)))
    assert(pairs.contains((600L, 601L, 0))) // identical-sketch pair: cap-immune
    assert(pairs.forall(p => p._1 >= 500L)) // no decoy pair leaks through
    // uncapped control: the same corpus produces the quadratic candidate set
    val uncapped = Dedup.simhashSketchCandidates(
      sh.select($"sim").distinct(), maxBucket = Dedup.DefaultMaxBucket)
    assert(uncapped.count() >= 19900L)
  }

  test("embeddingNearDupPairs refuses a block over maxBlock, points at scale paths") {
    val vecs = (1 to 8).map(i =>
      (i.toLong, "blk", Array.fill(4)(i.toFloat))).toDF("id", "b", "v")
    val err = intercept[Exception] {
      Dedup.embeddingNearDupPairs(vecs, "id", "v", "b", 0.5, maxBlock = 4).count()
    }
    assert(err.getMessage.contains("semanticDedup") ||
      Option(err.getCause).exists(_.getMessage.contains("semanticDedup")))
    // under the cap the same corpus pairs normally
    val ok = Dedup.embeddingNearDupPairs(vecs, "id", "v", "b", 0.5, maxBlock = 8)
    assert(ok.count() > 0)
  }
}
