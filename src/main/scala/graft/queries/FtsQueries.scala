package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Fts

/** FTS coverage: build a real inverted index over `documents`, then run
  * Match / Phrase / Boolean BM25 queries against it. The DuckDB oracle
  * recomputes the identical BM25 formula (k1=1.2, b=0.75, idf =
  * ln(1+(N-df+0.5)/(df+0.5))) from first principles with the same regex
  * tokenizer — scores must hash-match after round(4).
  */
object FtsQueries {
  type Q = (SparkSession, String) => DataFrame

  // one shared index per sfDir per JVM — match/phrase/boolean reuse it
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def indexFor(s: SparkSession, d: String, name: String): String =
    built.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/fts_${d.hashCode.toHexString}"
      val p = new Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      Fts.buildIndex(Tables.documents(s, d), "doc_id", "text", dir)
      dir
    })

  /** One-time index builds, timed separately by Bench (see
    * [[graft.queries.Vector.builds]]). */
  val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "build_fts" -> ((s, d) => { indexFor(s, d, "bench"); () }),
    "build_fts_title" -> ((s, d) => { titleIndexFor(s, d); () }),
    "build_fts_stemmed" -> ((s, d) => { stemmedIndexFor(s, d); () }),
    "build_fts_stemmed_de" -> ((s, d) => { stemmedDeIndexFor(s, d); () }),
    "build_fts_stemmed_fi" -> ((s, d) => { stemmedFiIndexFor(s, d); () }),
    "build_fts_stoppkg" -> ((s, d) => { packagedStopIndexFor(s, d); () }),
    "build_fts_stopword" -> ((s, d) => { stopwordIndexFor(s, d); () }),
    "build_fts_nopos" -> ((s, d) => { noPosIndexFor(s, d); () }),
    "build_fts_ja" -> ((s, d) => { jaIndexFor(s, d); () })
  )

  private val builtStemmed = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val builtStopword = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def configuredIndexFor(s: SparkSession, d: String, tag: String,
                                 cache: java.util.concurrent.ConcurrentHashMap[String, String],
                                 cfg: graft.operators.FtsConfig): String =
    cache.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/fts_${tag}_${d.hashCode.toHexString}"
      val p = new Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      Fts.buildIndex(Tables.documents(s, d), "doc_id", "text", dir, config = cfg)
      dir
    })

  private def stemmedIndexFor(s: SparkSession, d: String): String =
    configuredIndexFor(s, d, "stem", builtStemmed,
      graft.operators.FtsConfig(stemming = true))

  private def stopwordIndexFor(s: SparkSession, d: String): String =
    configuredIndexFor(s, d, "stop", builtStopword,
      graft.operators.FtsConfig(stopWords = Seq("the", "a")))

  private val builtStemmedDe = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stemmedDeIndexFor(s: SparkSession, d: String): String =
    configuredIndexFor(s, d, "stemde", builtStemmedDe,
      graft.operators.FtsConfig(stemming = true, language = "german"))

  private val builtStemmedFi = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stemmedFiIndexFor(s: SparkSession, d: String): String =
    configuredIndexFor(s, d, "stemfi", builtStemmedFi,
      graft.operators.FtsConfig(stemming = true, language = "finnish"))

  private val builtStopPackaged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def packagedStopIndexFor(s: SparkSession, d: String): String =
    configuredIndexFor(s, d, "stoppkg", builtStopPackaged,
      graft.operators.FtsConfig(removeStopWords = true, language = "english"))

  private val builtNoPos = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def noPosIndexFor(s: SparkSession, d: String): String =
    configuredIndexFor(s, d, "nopos", builtNoPos,
      graft.operators.FtsConfig(storePositions = false))

  /** EN→JA closed vocabulary for q_fts_cjk_ja: the gate builds Japanese
    * text by mapping corpus tokens through this table and concatenating
    * WITHOUT separators — so the `morph` segmenter must recover exactly
    * the word list the oracle derives from the mapping directly. Any
    * wrong split changes tf/df/dl on the Spark side only and fails the
    * hash compare: the segmenter itself is what this gate gates. */
  private val JaMap = Seq(
    "join" -> "結合", "hash" -> "ハッシュ", "scan" -> "走査",
    "table" -> "表", "vector" -> "ベクトル", "data" -> "データ")

  /** IPADIC-style fixture lexicon (surface:cost:pos) for the gate corpus. */
  private val JaLexicon = Seq("結合:3000:n", "ハッシュ:3000:n", "走査:3000:n",
    "表:4000:n", "ベクトル:3000:n", "データ:3000:n")

  private val builtJa = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def jaIndexFor(s: SparkSession, d: String): String =
    builtJa.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/fts_ja_${d.hashCode.toHexString}"
      val p = new Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      val jaWord = (t: org.apache.spark.sql.Column) =>
        JaMap.foldLeft(lit("")) { case (acc, (en, ja)) =>
          when(t === en, ja).otherwise(acc)
        }
      val corpus = Tables.documents(s, d)
        .withColumn("ja_text",
          concat_ws("", transform(Fts.tokenize(col("text")), jaWord)))
        .filter(length(col("ja_text")) > 0)
        .select(col("doc_id"), col("ja_text"))
      // the lexicon reaches the index THROUGH the real-format loader (r14):
      // the gate writes the fixture as a MeCab-shaped CSV, loads it with
      // DictLoader, and requires the loaded entries to equal the committed
      // fixture — so a loader regression fails the gate, not just a spec
      val csv = new Path(dir + "_lex.csv")
      val out = fs.create(csv, true)
      try out.write(JaLexicon.map { e =>
        val Array(surf, cost, pos) = e.split(":")
        val jpPos = pos match { case "n" => "名詞"; case other => other }
        s"$surf,1,1,$cost,$jpPos,一般,*,*,*,*,$surf,*,*"
      }.mkString("\n").getBytes("UTF-8")) finally out.close()
      val loaded = graft.operators.DictLoader.loadMeCabLexicon(s, csv.toString)
      require(loaded.toSet == JaLexicon.toSet,
        s"DictLoader round-trip drifted from the fixture: $loaded vs $JaLexicon")
      Fts.buildIndex(corpus, "doc_id", "ja_text", dir,
        config = graft.operators.FtsConfig(baseTokenizer = "cjk",
          cjkSegmenter = "morph", cjkDictionary = loaded))
      dir
    })

  val queries: Map[String, Q] = Map(
    "q_fts_match" -> { (s, d) =>
      val idx = indexFor(s, d, "match")
      Fts.matchQuery(s, idx, Seq("spark", "vector"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // positionless postings (reference with_position=false): BM25 scoring
    // never touches positions, so the smaller layout must produce the
    // EXACT q_fts_match result — and the gate proves the layout actually
    // differs (no positions column on disk)
    "q_fts_nopos" -> { (s, d) =>
      val idx = noPosIndexFor(s, d)
      require(!s.read.parquet(s"$idx/postings").columns.contains("positions"),
        "q_fts_nopos: index must not store positions")
      Fts.matchQuery(s, idx, Seq("spark", "vector"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // block-max WAND: identical top-k to q_fts_match via the pruned path
    "q_fts_wand" -> { (s, d) =>
      val idx = indexFor(s, d, "wand")
      Fts.matchQueryWand(s, idx, Seq("spark", "vector"), 20, seedBlocks = 4)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    "q_fts_phrase" -> { (s, d) =>
      val idx = indexFor(s, d, "phrase")
      Fts.phraseQuery(s, idx, Seq("hash", "join")).orderBy(col("doc_id"))
    },

    "q_fts_boolean" -> { (s, d) =>
      val idx = indexFor(s, d, "boolean")
      Fts.booleanQuery(s, idx,
          must = Seq("table"), should = Seq("vector"), mustNot = Seq("slow"), k = 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    "q_fts_boost" -> { (s, d) =>
      val idx = indexFor(s, d, "boost")
      Fts.boostQuery(s, idx,
          positive = Seq("spark"), negative = Seq("slow"), negativeBoost = 0.5, k = 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Fuzzy match (reference MatchQuery fuzziness/prefix_length): the
    // misspelled term expands against the term dictionary (prefix-pruned,
    // edit distance <= 1) and scores through the normal BM25 path — the
    // oracle replays the expansion with levenshtein().
    "q_fts_fuzzy" -> { (s, d) =>
      val idx = indexFor(s, d, "fuzzy")
      Fts.fuzzyQuery(s, idx, Seq("vectr"), fuzziness = 1, prefixLength = 4, k = 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Stop-word tokenizer config: 'the'/'a' are dropped at build, changing
    // dl/avgdl/df — the oracle recomputes BM25 with the same filtered
    // tokenizer, so the whole config plumbing is hash-gated.
    "q_fts_stopword" -> { (s, d) =>
      val idx = stopwordIndexFor(s, d)
      Fts.matchQuery(s, idx, Seq("table", "vector"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Porter-stemmed index: 'tables' analyzes to 'tabl' and matches the
    // stemmed corpus. The oracle replays the stem as a closed-vocabulary
    // CASE mapping (DuckDB's stem() lives in a non-loadable extension), so
    // the gate first PROVES the mapping complete: every corpus token the
    // stemmer rewrites must be in the CASE — a corpus vocabulary change
    // fails loudly here instead of silently skewing df/tf on one side only
    // (ADVICE r3). Stemmer correctness beyond this vocabulary is spec-gated
    // on Porter's published sample vocabulary (FtsSpec).
    "q_fts_stemmed" -> { (s, d) =>
      val idx = stemmedIndexFor(s, d)
      val mapped = Set("customer", "key", "merge", "query", "table", "value")
      val changed = Tables.documents(s, d)
        .select(explode(Fts.tokenize(col("text"))).as("t")).distinct()
        .collect().iterator.map(_.getString(0))
        .filter(t => graft.functions.PorterStemmer.stem(t) != t).toSet
      require(changed.subsetOf(mapped),
        s"stemCase oracle mapping is stale for this corpus; unmapped rewritten tokens: ${changed.diff(mapped)}")
      Fts.matchQuery(s, idx, Seq("tables"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Snowball German index (r14, VERDICT r13 #4): same closed-vocabulary
    // discipline as q_fts_stemmed — the gate first PROVES the oracle CASE
    // mapping complete against the German stemmer over the live corpus
    // vocabulary, then matches 'tables' (→tabl) and 'orders' (→ord, the
    // s-then-er two-step that distinguishes the German rules from Porter,
    // which stops at 'order'). Stemmer correctness beyond this vocabulary
    // is spec-gated on traced Snowball vocabulary cases (FtsSpec).
    "q_fts_stemmed_de" -> { (s, d) =>
      val idx = stemmedDeIndexFor(s, d)
      val mapped = Set("customer", "filter", "line", "merge", "order",
        "table", "value")
      val changed = Tables.documents(s, d)
        .select(explode(Fts.tokenize(col("text"))).as("t")).distinct()
        .collect().iterator.map(_.getString(0))
        .filter(t => graft.functions.SnowballStemmer.german(t) != t).toSet
      require(changed.subsetOf(mapped),
        s"stemCaseDe oracle mapping is stale for this corpus; unmapped rewritten tokens: ${changed.diff(mapped)}")
      Fts.matchQuery(s, idx, Seq("tables", "orders"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Driver-local serving, ORACLE-gated (r15, VERDICT r14 #4): the gate
    // answers the same match query through Fts.serveLocal — dictionary +
    // postings resident on the driver, zero Spark jobs once warm — and
    // the DuckDB BM25 oracle (identical to q_fts_match's) must hash-match
    // the result, certifying the driver-side scorer end-to-end, not just
    // against the batched twin.
    "q_fts_serve_match" -> { (s, d) =>
      val idx = indexFor(s, d, "bench")
      val served = Fts.serveLocal(s, idx, Seq("spark", "vector"), 20)
      import s.implicits._
      served.toDF("doc_id", "_score")
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Phrase serving, oracle-gated with q_fts_phrase's consecutive-pair
    // oracle: the positioned-postings walk runs entirely driver-side.
    "q_fts_serve_phrase" -> { (s, d) =>
      val idx = indexFor(s, d, "bench")
      import s.implicits._
      Fts.servePhrase(s, idx, Seq("hash", "join")).toDF("doc_id")
    },

    // Boolean serving, oracle-gated (r16, VERDICT r15 #3): must/must_not
    // replayed by the oracle as set algebra over the BM25 formula — the
    // driver-side intersection/exclusion is certified by DuckDB directly,
    // not only by the batched twin (FtsServeSpec keeps the twin parity).
    "q_fts_serve_boolean" -> { (s, d) =>
      val idx = indexFor(s, d, "bench")
      import s.implicits._
      Fts.serveBoolean(s, idx,
          must = Seq("table"), should = Seq("vector"), mustNot = Seq("slow"), k = 20)
        .toDF("doc_id", "_score")
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Fuzzy serving, oracle-gated (r16, VERDICT r15 #3): the oracle
    // replays the resident-dictionary expansion with levenshtein() over
    // the term dictionary — prefix gate and edit bound included — so the
    // driver-side expansion set itself is DuckDB-certified.
    "q_fts_serve_fuzzy" -> { (s, d) =>
      val idx = indexFor(s, d, "bench")
      import s.implicits._
      Fts.serveFuzzy(s, idx, Seq("vectr"), fuzziness = 1, prefixLength = 4, k = 20)
        .toDF("doc_id", "_score")
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Packaged per-language stop-word list (r15, VERDICT r14 #3:
    // reference `StopWordFilter::new(language)`, tokenizer.rs:256-262):
    // the index is built with removeStopWords = true and NO caller list;
    // the oracle replays the SAME packaged English list literally, so
    // df/dl — and the BM25 scores — only match if build and query sides
    // both derived the packaged set from the round-tripped config.
    "q_fts_stopword_packaged" -> { (s, d) =>
      val idx = packagedStopIndexFor(s, d)
      Fts.matchQuery(s, idx, Seq("table", "vector"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Snowball Finnish index (r15, VERDICT r14 #3): closed-vocabulary
    // discipline as the de gate. The query terms are INFLECTED Finnish
    // case forms of corpus words — 'tablen' (genitive -n) and 'datassa'
    // (inessive -ssa) — which only match because the Finnish case-removal
    // steps strip them back to the corpus stems (tabl, dat); Porter or the
    // German rules leave both unchanged, so this gates the Finnish steps
    // specifically. Stemmer correctness beyond this vocabulary is
    // spec-gated on traced Snowball vocabulary cases (FtsSpec).
    "q_fts_stemmed_fi" -> { (s, d) =>
      val idx = stemmedFiIndexFor(s, d)
      val mapped = Set("agg", "column", "data", "line", "merge", "small",
        "table")
      val changed = Tables.documents(s, d)
        .select(explode(Fts.tokenize(col("text"))).as("t")).distinct()
        .collect().iterator.map(_.getString(0))
        .filter(t => graft.functions.SnowballStemmer.finnish(t) != t).toSet
      require(changed.subsetOf(mapped),
        s"stemCaseFi oracle mapping is stale for this corpus; unmapped rewritten tokens: ${changed.diff(mapped)}")
      // prove the query-term derivation the comment claims: the inflected
      // forms reach the corpus stems through the Finnish steps
      require(graft.functions.SnowballStemmer.finnish("tablen") == "tabl" &&
        graft.functions.SnowballStemmer.finnish("datassa") == "dat",
        "Finnish case-removal drifted: tablen/datassa no longer reach tabl/dat")
      Fts.matchQuery(s, idx, Seq("tablen", "datassa"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // Japanese morphological segmentation (Lindera/MeCab parity,
    // reference tokenizer.rs:317-325): the corpus is corpus tokens mapped
    // to Japanese words and concatenated WITHOUT separators; the index
    // must Viterbi-segment the words back out (see JaMap) for tf/df/dl —
    // and therefore BM25 scores — to match the oracle, which derives the
    // token lists from the mapping directly and never segments.
    "q_fts_cjk_ja" -> { (s, d) =>
      val idx = jaIndexFor(s, d)
      Fts.matchQuery(s, idx, Seq("ベクトル", "結合"), 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    },

    // MultiMatch across two indexed fields: full text (boost 1) and a
    // derived "title" field = first 10 tokens (boost 2), max-combined.
    "q_fts_multimatch" -> { (s, d) =>
      val fullIdx = indexFor(s, d, "mm_full")
      val titleIdx = titleIndexFor(s, d)
      Fts.multiMatch(s, Seq((titleIdx, 2.0), (fullIdx, 1.0)),
          terms = Seq("spark", "vector"), k = 20)
        .select(col("doc_id"), round(col("_score"), 4).as("_score"))
    }
  )

  private val builtTitle = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def titleIndexFor(s: SparkSession, d: String): String =
    builtTitle.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/fts_title_${d.hashCode.toHexString}"
      val p = new Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      val withTitle = Tables.documents(s, d)
        .withColumn("title", concat_ws(" ", slice(split(col("text"), " "), 1, 10)))
      Fts.buildIndex(withTitle, "doc_id", "title", dir)
      dir
    })

  private val defaultTokExpr =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t <> '')"

  private def tokCteWith(tokExpr: String) =
    s"""toks AS (SELECT doc_id,
       |  $tokExpr AS tk
       |  FROM documents),
       |docs AS (SELECT doc_id, len(tk)*1.0 AS dl FROM toks),
       |meta AS (SELECT count(*)*1.0 AS n, avg(dl) AS avgdl FROM docs),
       |tf AS (SELECT doc_id, t AS token, count(*)*1.0 AS tf
       |       FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY doc_id, t),
       |st AS (SELECT token, count(*)*1.0 AS df FROM tf GROUP BY token)""".stripMargin

  private val tokCte = tokCteWith(defaultTokExpr)

  private def bm25SelectWith(tokExpr: String, termsIn: String, extra: String) =
    s"""WITH ${tokCteWith(tokExpr)}
       |SELECT f.doc_id,
       |  round(sum(ln(1+(m.n-s.df+0.5)/(s.df+0.5))
       |        * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl))),4) AS _score
       |FROM tf f JOIN st s ON f.token = s.token
       | JOIN docs d ON f.doc_id = d.doc_id CROSS JOIN meta m
       |WHERE f.token IN ($termsIn) $extra
       |GROUP BY f.doc_id
       |ORDER BY sum(ln(1+(m.n-s.df+0.5)/(s.df+0.5))
       |        * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl))) DESC, f.doc_id
       |LIMIT 20""".stripMargin

  private def bm25Select(termsIn: String, extra: String) =
    bm25SelectWith(defaultTokExpr, termsIn, extra)

  /** Closed-vocabulary Porter mapping for the synthetic corpus (the only
    * tokens the stemmer rewrites; see q_fts_stemmed comment). */
  private val stemCase =
    """CASE t WHEN 'customer' THEN 'custom' WHEN 'key' THEN 'kei'
      | WHEN 'merge' THEN 'merg' WHEN 'query' THEN 'queri'
      | WHEN 'table' THEN 'tabl' WHEN 'value' THEN 'valu' ELSE t END""".stripMargin

  /** Closed-vocabulary Snowball-German mapping for the synthetic corpus
    * (the only tokens the German stemmer rewrites; completeness proved
    * in-gate, see q_fts_stemmed_de). */
  private val stemCaseDe =
    """CASE t WHEN 'customer' THEN 'custom' WHEN 'filter' THEN 'filt'
      | WHEN 'line' THEN 'lin' WHEN 'merge' THEN 'merg'
      | WHEN 'order' THEN 'ord' WHEN 'table' THEN 'tabl'
      | WHEN 'value' THEN 'valu' ELSE t END""".stripMargin

  /** Closed-vocabulary Snowball-Finnish mapping for the synthetic corpus
    * (completeness proved in-gate, see q_fts_stemmed_fi). */
  private val stemCaseFi =
    """CASE t WHEN 'agg' THEN 'ag' WHEN 'column' THEN 'colum'
      | WHEN 'data' THEN 'dat' WHEN 'line' THEN 'lin'
      | WHEN 'merge' THEN 'merg' WHEN 'small' THEN 'smal'
      | WHEN 'table' THEN 'tabl' ELSE t END""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // toks: replay the EN→JA mapping directly (never segments — the
    // Spark side must SEGMENT the separator-free text back to this list)
    "q_fts_cjk_ja" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(list_transform(
        |    list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t <> ''),
        |    t -> CASE t WHEN 'join' THEN '結合' WHEN 'hash' THEN 'ハッシュ'
        |           WHEN 'scan' THEN '走査' WHEN 'table' THEN '表'
        |           WHEN 'vector' THEN 'ベクトル' WHEN 'data' THEN 'データ'
        |           ELSE NULL END),
        |    t -> t IS NOT NULL) AS tk
        |  FROM documents),
        |toksf AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
        |docs AS (SELECT doc_id, len(tk)*1.0 AS dl FROM toksf),
        |meta AS (SELECT count(*)*1.0 AS n, avg(dl) AS avgdl FROM docs),
        |tf AS (SELECT doc_id, t AS token, count(*)*1.0 AS tf
        |       FROM (SELECT doc_id, unnest(tk) AS t FROM toksf) GROUP BY doc_id, t),
        |st AS (SELECT token, count(*)*1.0 AS df FROM tf GROUP BY token)
        |SELECT f.doc_id,
        |  round(sum(ln(1+(m.n-s.df+0.5)/(s.df+0.5))
        |        * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl))),4) AS _score
        |FROM tf f JOIN st s ON f.token = s.token
        | JOIN docs d ON f.doc_id = d.doc_id CROSS JOIN meta m
        |WHERE f.token IN ('ベクトル','結合')
        |GROUP BY f.doc_id
        |ORDER BY sum(ln(1+(m.n-s.df+0.5)/(s.df+0.5))
        |        * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl))) DESC, f.doc_id
        |LIMIT 20""".stripMargin,

    "q_fts_match" -> bm25Select("'spark','vector'", ""),
    // driver-local serving legs: same oracles as their batched gates —
    // DuckDB certifies the serve scorer/phrase walk directly
    "q_fts_serve_match" -> bm25Select("'spark','vector'", ""),
    "q_fts_nopos" -> bm25Select("'spark','vector'", ""),
    "q_fts_wand" -> bm25Select("'spark','vector'", ""),
    "q_fts_fuzzy" -> bm25Select(
      "SELECT token FROM st WHERE token LIKE 'vect%' AND levenshtein(token, 'vectr') <= 1", ""),
    "q_fts_stopword" -> bm25SelectWith(
      "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t <> '' AND t NOT IN ('the','a'))",
      "'table','vector'", ""),
    "q_fts_stopword_packaged" -> bm25SelectWith(
      "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), " +
        s"t -> t <> '' AND t NOT IN (${graft.functions.StopWords.english.toSeq.sorted.map(w => s"'$w'").mkString(",")}))",
      "'table','vector'", ""),
    "q_fts_stemmed" -> bm25SelectWith(
      s"list_transform($defaultTokExpr, t -> $stemCase)",
      "'tabl'", ""),
    "q_fts_stemmed_de" -> bm25SelectWith(
      s"list_transform($defaultTokExpr, t -> $stemCaseDe)",
      "'tabl','ord'", ""),
    // query side: 'tablen'/'datassa' stem to 'tabl'/'dat' (asserted
    // in-gate), so the oracle queries the stemmed forms directly
    "q_fts_stemmed_fi" -> bm25SelectWith(
      s"list_transform($defaultTokExpr, t -> $stemCaseFi)",
      "'tabl','dat'", ""),
    "q_fts_phrase" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t <> '') AS tk
        |  FROM documents)
        |SELECT doc_id FROM toks
        |WHERE len(list_filter(tk, (t,i) -> t = 'hash' AND i < len(tk) AND tk[i+1] = 'join')) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_fts_serve_phrase" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t <> '') AS tk
        |  FROM documents)
        |SELECT doc_id FROM toks
        |WHERE len(list_filter(tk, (t,i) -> t = 'hash' AND i < len(tk) AND tk[i+1] = 'join')) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_fts_boolean" -> bm25Select("'table','vector'",
      """AND f.doc_id IN (SELECT doc_id FROM tf WHERE token = 'table')
        |AND f.doc_id NOT IN (SELECT doc_id FROM tf WHERE token = 'slow')""".stripMargin),
    // serve legs (r16): identical oracles to their batched gates
    "q_fts_serve_boolean" -> bm25Select("'table','vector'",
      """AND f.doc_id IN (SELECT doc_id FROM tf WHERE token = 'table')
        |AND f.doc_id NOT IN (SELECT doc_id FROM tf WHERE token = 'slow')""".stripMargin),
    "q_fts_serve_fuzzy" -> bm25Select(
      "SELECT token FROM st WHERE token LIKE 'vect%' AND levenshtein(token, 'vectr') <= 1", ""),
    "q_fts_multimatch" ->
      """WITH fdocs AS (SELECT doc_id, text, array_to_string((string_split(text,' '))[1:10],' ') AS title FROM documents),
        |ftoks AS (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t <> '') AS tk FROM fdocs),
        |fdl AS (SELECT doc_id, len(tk)*1.0 AS dl FROM ftoks),
        |fmeta AS (SELECT count(*)*1.0 AS n, avg(dl) AS avgdl FROM fdl),
        |ftf AS (SELECT doc_id, t AS token, count(*)*1.0 AS tf
        |        FROM (SELECT doc_id, unnest(tk) AS t FROM ftoks) GROUP BY doc_id, t),
        |fst AS (SELECT token, count(*)*1.0 AS df FROM ftf GROUP BY token),
        |fscore AS (SELECT f.doc_id, sum(ln(1+(m.n-s.df+0.5)/(s.df+0.5))
        |             * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl))) * 1.0 AS sc
        |           FROM ftf f JOIN fst s ON f.token=s.token
        |            JOIN fdl d ON f.doc_id=d.doc_id CROSS JOIN fmeta m
        |           WHERE f.token IN ('spark','vector') GROUP BY f.doc_id),
        |ttoks AS (SELECT doc_id, list_filter(string_split_regex(lower(title),'[^a-z0-9]+'), t -> t <> '') AS tk FROM fdocs),
        |tdl AS (SELECT doc_id, len(tk)*1.0 AS dl FROM ttoks),
        |tmeta AS (SELECT count(*)*1.0 AS n, avg(dl) AS avgdl FROM tdl),
        |ttf AS (SELECT doc_id, t AS token, count(*)*1.0 AS tf
        |        FROM (SELECT doc_id, unnest(tk) AS t FROM ttoks) GROUP BY doc_id, t),
        |tst AS (SELECT token, count(*)*1.0 AS df FROM ttf GROUP BY token),
        |tscore AS (SELECT f.doc_id, sum(ln(1+(m.n-s.df+0.5)/(s.df+0.5))
        |             * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl))) * 2.0 AS sc
        |           FROM ttf f JOIN tst s ON f.token=s.token
        |            JOIN tdl d ON f.doc_id=d.doc_id CROSS JOIN tmeta m
        |           WHERE f.token IN ('spark','vector') GROUP BY f.doc_id)
        |SELECT doc_id, round(max(sc),4) AS _score
        |FROM (SELECT * FROM tscore UNION ALL SELECT * FROM fscore)
        |GROUP BY doc_id ORDER BY max(sc) DESC, doc_id LIMIT 20""".stripMargin,
    "q_fts_boost" ->
      s"""WITH $tokCte,
         |scores AS (
         |  SELECT f.doc_id, f.token,
         |    ln(1+(m.n-s.df+0.5)/(s.df+0.5))
         |      * f.tf*(1.2+1)/(f.tf+1.2*(1-0.75+0.75*d.dl/m.avgdl)) AS ts
         |  FROM tf f JOIN st s ON f.token = s.token
         |   JOIN docs d ON f.doc_id = d.doc_id CROSS JOIN meta m),
         |pos AS (SELECT doc_id, sum(ts) AS p FROM scores WHERE token IN ('spark') GROUP BY doc_id),
         |neg AS (SELECT doc_id, sum(ts) AS ng FROM scores WHERE token IN ('slow') GROUP BY doc_id)
         |SELECT pos.doc_id, round(pos.p - 0.5 * coalesce(neg.ng, 0),4) AS _score
         |FROM pos LEFT JOIN neg ON pos.doc_id = neg.doc_id
         |ORDER BY pos.p - 0.5 * coalesce(neg.ng, 0) DESC, pos.doc_id
         |LIMIT 20""".stripMargin
  )
}
