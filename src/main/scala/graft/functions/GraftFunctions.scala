package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration of the graft expression kernels (reference registers
  * its UDFs into DataFusion the same way — `rust/lance-datafusion/src/
  * udf.rs`): injected by `GraftExtensions`, so ANY session with the
  * extensions can call them from SQL without touching the Scala API —
  * `SELECT l2_distance(a.vec, b.vec)`, `bpe_token_count(text)`,
  * `simhash64(shingles)`, … Every function resolves to a native Catalyst
  * expression (codegen'd where the kernel is), never a Scala UDF.
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** (name, builder) for every SQL-exposed kernel. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> (es => L2Distance(es(0), es(1))),
    "cosine_distance" -> (es => CosineDistance(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "hamming_distance" -> (es => HammingDistance(es(0), es(1))),
    "pack_sign_bits" -> (es => graft.operators.PackSignBits(es(0))),
    // text kernels: BPE counting under the built-in English merge table,
    // n-gram repetition pair, and the dedup sketches
    "bpe_token_count" -> (es =>
      BpeTokenCount(es(0), BpeTokenizer.EnglishMerges)),
    "ngram_repetition" -> (es => NgramRepetition(es(0),
      litInt(es(1), "ngram_repetition", "n"))),
    "minhash_signature" -> (es => MinHashSignature(es(0),
      litInt(es(1), "minhash_signature", "k"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "fingerprint64" -> (es => Fingerprint64(es(0))))

  /** Called from GraftExtensions.apply. */
  def inject(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), b))
    }
}
