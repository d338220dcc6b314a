package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization as a per-row expression over a
  * broadcast merge table — tokenizer-TRUE token counts for shard
  * budgeting and token accounting, replacing whitespace counts (a
  * training pipeline packs shards by real tokenizer tokens; the BPE
  * procedure is public knowledge: Sennrich et al. 2016, arXiv:1508.07909,
  * and the byte-level variant of GPT-2's published encoder).
  *
  * Semantics — chosen so an independent engine can replay them exactly:
  * the text splits into single characters (code points), then each merge
  * `(x, y) → xy` is applied IN RANK ORDER as one left-to-right
  * non-overlapping pass over adjacent token pairs. For any table produced
  * by BPE training this equals the classic "repeatedly merge the
  * best-ranked pair present" algorithm (a merge creating symbol X always
  * precedes every merge consuming X, and no later merge can create an
  * earlier merge's pair), and each pass is exactly SQL `replace()` over a
  * delimiter-wrapped encoding — [[BpeTokenizer.oracleSql]] emits that
  * replay for DuckDB, which the q_bpe_token_stats gate hash-checks.
  *
  * Scale shape: the merge table is a driver-side constant (a vocabulary
  * is KB-sized) shipped inside the expression; application is one linear
  * per-row pass, O(len · merges) worst case, no shuffle. Training
  * ([[BpeTokenizer.train]]) collects a BOUNDED character sample (the same
  * bounded-sample trick as IVF training) and runs locally — constant in
  * corpus size.
  */
object BpeTokenizer {

  /** One left-to-right non-overlapping merge pass (== SQL replace). */
  private def mergePass(toks: ArrayBuffer[String], x: String, y: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        out += x + y; i += 2
      } else { out += toks(i); i += 1 }
    }
    out
  }

  /** Tokenize `text` under `merges` (applied in rank order). Code-point
    * splitting matches the oracle's regex `([\s\S])` per-codepoint wrap. */
  def tokens(text: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks = new ArrayBuffer[String](text.length)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      toks += text.substring(i, i + n)
      i += n
    }
    merges.foreach { case (x, y) => toks = mergePass(toks, x, y) }
    toks.toSeq
  }

  def count(text: String, merges: Seq[(String, String)]): Int =
    tokens(text, merges).length

  /** Deterministic BPE training over a character corpus: `numMerges`
    * rounds of "merge the most frequent adjacent pair", ties broken by
    * the lexicographically smallest (x, y). Train on a BOUNDED sample —
    * see [[trainOnSample]] for the DataFrame face. */
  def train(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var docs = corpus.map(t => tokens(t, Nil).toArray).toArray
    val merges = Seq.newBuilder[(String, String)]
    // Each round's pair count and merge pass are per-doc independent, so
    // they run in parallel chunks (r16 — the rounds were a single-threaded
    // driver loop dominating the trained-BPE gate). Determinism is
    // untouched: per-chunk counts are exact Long sums merged into one map
    // (addition is associative — the lloydStep device) and the argmin
    // tie-break is evaluated over the merged map exactly as before.
    val nChunks = math.max(1, math.min(
      Runtime.getRuntime.availableProcessors(), docs.length / 64))
    def chunkRange(ci: Int): (Int, Int) = {
      val size = (docs.length + nChunks - 1) / nChunks
      (ci * size, math.min(docs.length, ci * size + size))
    }
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val chunkCounts = Array.fill(nChunks)(new java.util.HashMap[(String, String), Long]())
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
        val m = chunkCounts(ci)
        val (from, until) = chunkRange(ci)
        var di = from
        while (di < until) {
          val d = docs(di)
          var i = 0
          while (i + 1 < d.length) {
            m.merge((d(i), d(i + 1)), 1L, java.lang.Long.sum _)
            i += 1
          }
          di += 1
        }
      }
      val counts = chunkCounts.reduceLeft { (a, b) =>
        b.forEach((p, c) => { a.merge(p, c, java.lang.Long.sum _); () }); a
      }
      if (counts.isEmpty) done = true
      else {
        import scala.jdk.CollectionConverters._
        val (best, n) = counts.asScala.minBy { case ((x, y), c) => (-c, x, y) }
        if (n < 2) done = true // nothing repeats — further merges are noise
        else {
          merges += best
          val next = new Array[Array[String]](docs.length)
          val src = docs
          java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
            val (from, until) = chunkRange(ci)
            var di = from
            while (di < until) {
              next(di) = mergePass(ArrayBuffer.from(src(di)), best._1, best._2).toArray
              di += 1
            }
          }
          docs = next
          k += 1
        }
      }
    }
    merges.result()
  }

  /** Train on a bounded, deterministic sample of a text column: one
    * hash-ordered TakeOrdered job caps the sample (corpus-size-constant,
    * like IVF's trainer), local rounds produce the merge table. */
  def trainOnSample(df: org.apache.spark.sql.DataFrame, textCol: String,
                    numMerges: Int, sampleDocs: Int = 2048,
                    maxCharsPerDoc: Int = 4096): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val sample = df.select(substring(col(textCol), 1, maxCharsPerDoc).as("t"))
      .orderBy(xxhash64(col("t")), col("t")).limit(sampleDocs)
      .collect().map(_.getString(0)).toSeq
    train(sample, numMerges)
  }

  /** A fixed, corpus-independent English merge table (common letter
    * bigrams/trigrams — every pair's constituents are produced by earlier
    * ranks, the BPE-training invariant the rank-order pass relies on).
    * Used by the driver gate so the Spark side and the DuckDB oracle
    * share ONE literal vocabulary. */
  val EnglishMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("t", "i"), ("s", "t"), ("a", "r"), ("o", "u"),
    ("an", "d"), ("in", "g"), ("ti", "on"), ("e", "d"), ("i", "s"),
    ("i", "t"), ("a", "l"), ("l", "e"), ("o", "f"), ("t", "o"),
    ("c", "h"), ("s", "e"), ("m", "e"), ("d", "e"), ("w", "h"))

  /** DuckDB SQL expression replaying [[tokens]] exactly: wrap every
    * code point as `\x01 c \x02`, apply the merges as a replace() chain
    * in rank order, count the `\x01` markers. `textExpr` is any SQL
    * string expression. */
  def oracleCountSql(textExpr: String, merges: Seq[(String, String)]): String = {
    def tok(s: String) =
      "chr(1) || '" + s.replace("'", "''") + "' || chr(2)"
    val base = s"regexp_replace(replace(replace($textExpr, chr(1), ''), " +
      s"chr(2), ''), '([\\s\\S])', chr(1) || '\\1' || chr(2), 'g')"
    val chained = merges.foldLeft(base) { case (acc, (x, y)) =>
      s"replace($acc, ${tok(x)} || ${tok(y)}, ${tok(x + y)})"
    }
    s"(length($chained) - length(replace($chained, chr(1), '')))"
  }

  /** Column face: BPE token count of a string column under `merges`. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), merges))
}

/** Per-row BPE token count (see [[BpeTokenizer]]). Eval-mode expression
  * (CodegenFallback): the O(len · merges) string loop dominates any
  * virtual-call overhead, matching the TextHashes precedent. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.count(input.asInstanceOf[UTF8String].toString, merges)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
