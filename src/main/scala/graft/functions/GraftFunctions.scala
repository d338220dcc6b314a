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

  private def arity(fn: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument${if (n == 1) "" else "s"}, got ${es.length}")
      b(es)
    }

  /** (name, builder) for every SQL-exposed kernel. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> arity("l2_distance", 2)(es => L2Distance(es(0), es(1))),
    "cosine_distance" -> arity("cosine_distance", 2)(es =>
      CosineDistance(es(0), es(1))),
    "dot_product" -> arity("dot_product", 2)(es => DotProduct(es(0), es(1))),
    "hamming_distance" -> arity("hamming_distance", 2)(es =>
      HammingDistance(es(0), es(1))),
    "pack_sign_bits" -> arity("pack_sign_bits", 1)(es =>
      graft.operators.PackSignBits(es(0))),
    // half-precision vectors (reference `_cast_list_f16` + f16 kernels):
    // packed BINARY at rest, distances computed through the packed bytes
    "f16_pack" -> arity("f16_pack", 1)(es => PackF16(es(0))),
    "f16_unpack" -> arity("f16_unpack", 1)(es => UnpackF16(es(0))),
    "l2_distance_f16" -> arity("l2_distance_f16", 2)(es =>
      F16L2Distance(es(0), es(1))),
    "dot_product_f16" -> arity("dot_product_f16", 2)(es =>
      F16DotProduct(es(0), es(1))),
    "cosine_distance_f16" -> arity("cosine_distance_f16", 2)(es =>
      F16CosineDistance(es(0), es(1))),
    // bfloat16 (reference lance.arrow.BFloat16Array + bf16 kernels): same
    // 2-byte packed BINARY, f32's exponent range, shift-only decode
    "bf16_pack" -> arity("bf16_pack", 1)(es => PackBf16(es(0))),
    "bf16_unpack" -> arity("bf16_unpack", 1)(es => UnpackBf16(es(0))),
    "l2_distance_bf16" -> arity("l2_distance_bf16", 2)(es =>
      Bf16L2Distance(es(0), es(1))),
    "dot_product_bf16" -> arity("dot_product_bf16", 2)(es =>
      Bf16DotProduct(es(0), es(1))),
    "cosine_distance_bf16" -> arity("cosine_distance_bf16", 2)(es =>
      Bf16CosineDistance(es(0), es(1))),
    // text kernels: BPE counting under the built-in English merge table,
    // n-gram repetition pair, and the dedup sketches
    "bpe_token_count" -> arity("bpe_token_count", 1)(es =>
      BpeTokenCount(es(0), BpeTokenizer.EnglishMerges)),
    "ngram_repetition" -> arity("ngram_repetition", 2)(es =>
      NgramRepetition(es(0), litInt(es(1), "ngram_repetition", "n"))),
    "minhash_signature" -> arity("minhash_signature", 2)(es =>
      MinHashSignature(es(0), litInt(es(1), "minhash_signature", "k"))),
    "simhash64" -> arity("simhash64", 1)(es => SimHash64(es(0))),
    "fingerprint64" -> arity("fingerprint64", 1)(es => Fingerprint64(es(0))),
    // URL curation (r16): canonicalization / host / registered domain as
    // SQL-callable compositions of built-in string expressions — the
    // web-pipeline stages reachable from pure SQL like every other kernel
    "url_normalize" -> arity("url_normalize", 1)(es =>
      urlExpr(es(0), graft.operators.UrlCuration.normalizeUrl)),
    "url_host" -> arity("url_host", 1)(es =>
      urlExpr(es(0), graft.operators.UrlCuration.hostOf)),
    "url_registered_domain" -> arity("url_registered_domain", 1)(es =>
      urlExpr(es(0), c => graft.operators.UrlCuration.registeredDomain(c))))

  private def urlExpr(e: Expression,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Expression = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.resolvableExpression(f(ColumnBridge.column(e)))
  }

  /** Called from GraftExtensions.apply. */
  def inject(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), b))
    }
}
