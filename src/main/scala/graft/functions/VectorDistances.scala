package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Vector distance kernels as native Catalyst expressions.
  *
  * Capability mirror of the reference's SIMD distance kernels
  * (`rust/lance-linalg/src/distance.rs:36-43` — L2 | Cosine | Dot | Hamming)
  * re-expressed Spark-first: whole-stage-codegen'd tight loops over
  * `ArrayType(Float|Double)` columns, so `withColumn("_distance", ...)` stays
  * inside one codegen stage with the scan and the top-k
  * (`TakeOrderedAndProject`) — the Spark-native shape of the reference's
  * `KNNVectorDistanceExec` + `SortExec.with_fetch(k)`
  * (`rust/lance/src/io/exec/knn.rs:110`, `scanner.rs:3385-3406`).
  *
  * All metrics accumulate in double regardless of element width (float32
  * vectors upcast per element) — deterministic and oracle-matchable.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  protected def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _))
      if (a == FloatType || a == DoubleType) && (b == FloatType || b == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @inline protected final def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** java source: element i of `arr` (child ordinal 0=left, 1=right) as double */
  protected final def jGet(arr: String, child: Expression, i: String): String =
    child.dataType match {
      case ArrayType(FloatType, _) => s"((double) $arr.getFloat($i))"
      case _ => s"$arr.getDouble($i)"
    }
}

/** Euclidean (sqrt of sum of squared diffs). Reference metric `L2`
  * (`rust/lance-linalg/src/distance/l2.rs`). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (left.dataType.asInstanceOf[ArrayType].elementType,
      right.dataType.asInstanceOf[ArrayType].elementType)
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { val d = get(a, ta, i) - get(b, tb, i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${jGet(a, left, i)} - ${jGet(b, right, i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product. Reference metric `Dot`. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (left.dataType.asInstanceOf[ArrayType].elementType,
      right.dataType.asInstanceOf[ArrayType].elementType)
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { acc += get(a, ta, i) * get(b, tb, i); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${jGet(a, left, i)} * ${jGet(b, right, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance = 1 - cos similarity. Reference metric `Cosine`
  * (computed, like the reference, in one fused pass). */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_distance"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (left.dataType.asInstanceOf[ArrayType].elementType,
      right.dataType.asInstanceOf[ArrayType].elementType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - dot / math.sqrt(na * nb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${jGet(a, left, i)};
         |  double $y = ${jGet(b, right, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = 1.0 - $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance over packed binary vectors (BinaryType): popcount(xor).
  * Reference metric `Hamming` (`rust/lance-linalg/src/distance/hamming.rs`). */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two binary arguments")
  override def nullSafeEval(l: Any, r: Any): Any =
    HammingDistance.compute(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = $acc + (java.lang.Math.max($a.length, $b.length) - $n) * 8L;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HammingDistance {
  /** THE hamming definition — eval, codegen, and every driver-side use
    * (k-majority training, centroid ranking) share it so padding semantics
    * can never diverge. Length mismatch: extra bytes count fully (same as
    * reference padding). */
  def compute(a: Array[Byte], b: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    acc + (math.max(a.length, b.length) - n) * 8L
  }
}

/** Column-API + SQL registration for the vector kernels. */
object VectorFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expression(col)

  def l2Distance(a: Column, b: Column): Column = c(L2Distance(x(a), x(b)))
  def cosineDistance(a: Column, b: Column): Column = c(CosineDistance(x(a), x(b)))
  def dotProduct(a: Column, b: Column): Column = c(DotProduct(x(a), x(b)))
  def hammingDistance(a: Column, b: Column): Column = c(HammingDistance(x(a), x(b)))

  /** A float32 vector literal (matches parquet list<float> columns). */
  def vectorLit(v: Array[Float]): Column =
    c(Literal.create(v, ArrayType(FloatType, containsNull = false)))

  def packSignBits(v: Column): Column = c(graft.operators.PackSignBits(x(v)))

  /** Register l2_distance / cosine_distance / dot_product / hamming_distance
    * / pack_sign_bits for SQL use (reference registers its distance UDFs
    * into DataFusion the same way — `rust/lance-datafusion/src/udf.rs`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_distance", es => CosineDistance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_distance", es => HammingDistance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("pack_sign_bits", es => graft.operators.PackSignBits(es(0)), "scala_udf")
  }
}
