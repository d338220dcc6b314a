package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeTokenizer

/** Tokenizer-true BPE token counts (BpeTokenizer): rank-order merge
  * semantics, deterministic training, and the packShards token-count
  * hook. */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("rank-order merge passes: hand-computed tokenizations") {
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"))
    assert(BpeTokenizer.tokens("the theatre", merges) ==
      Seq("the", " ", "the", "a", "t", "r", "e"))
    // leftmost non-overlapping within one pass: "ththth" -> th th th
    assert(BpeTokenizer.tokens("ththth", Seq(("t", "h"))) ==
      Seq("th", "th", "th"))
    // "aaa" with (a,a): leftmost pair merges, the tail 'a' survives
    assert(BpeTokenizer.tokens("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(BpeTokenizer.tokens("", merges) == Seq.empty)
    assert(BpeTokenizer.count("thin the", merges) == 4) // th, in, ' ', the
  }

  test("expression over a corpus == the driver-side definition") {
    val docs = Seq("the rain in spain", "thththe", "a", "").toDF("text")
    val got = docs.select(BpeTokenizer.bpeTokenCount(col("text"),
        BpeTokenizer.EnglishMerges).as("n"))
      .as[Int].collect().toSeq
    val exp = Seq("the rain in spain", "thththe", "a", "")
      .map(t => BpeTokenizer.count(t, BpeTokenizer.EnglishMerges))
    assert(got == exp, s"got=$got exp=$exp")
  }

  test("training: most-frequent pair first, deterministic ties, invariant holds") {
    // 'ab' dominates, then 'abc' (constituents precede consumers)
    val merges = BpeTokenizer.train(Seq("abcabcabc", "abab"), 2)
    assert(merges.head == ("a", "b"), merges.toString)
    assert(merges(1) == ("ab", "c"), merges.toString)
    // every merge's constituents are single chars or earlier outputs
    val m30 = BpeTokenizer.EnglishMerges
    val produced = scala.collection.mutable.Set[String]()
    m30.foreach { case (x, y) =>
      assert(x.length == 1 || produced.contains(x), s"$x not yet produced")
      assert(y.length == 1 || produced.contains(y), s"$y not yet produced")
      produced += x + y
    }
    // bounded-sample DataFrame face is deterministic across invocations
    val df = (0 until 200).map(i => s"the cat $i sat on the mat").toDF("text")
    val a = BpeTokenizer.trainOnSample(df, "text", 10)
    val b = BpeTokenizer.trainOnSample(df, "text", 10)
    assert(a == b && a.length == 10, a.toString)
  }

  test("packShards accepts tokenizer-true counts: budgets follow BPE tokens") {
    import graft.operators.TextAnalysis
    val docs = (0L until 500L)
      .map(i => (i, ("the " * (i % 5 + 1).toInt).trim)).toDF("doc_id", "text")
    val bpe = BpeTokenizer.bpeTokenCount(col("text"), BpeTokenizer.EnglishMerges)
    val out = TextAnalysis.packShards(docs, "doc_id", "text",
        shardTokens = 40L, bucketSpan = 10L, superSpan = 8L,
        tokenCounts = Some(bpe))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    var cum = 0L
    val exp = (0L until 500L).map { i =>
      val n = BpeTokenizer.count(("the " * (i % 5 + 1).toInt).trim,
        BpeTokenizer.EnglishMerges).toLong
      val shard = cum / 40L; cum += n; (i, shard)
    }
    assert(out.toSeq == exp, "shard ids must replay the BPE prefix sum")
  }
}
