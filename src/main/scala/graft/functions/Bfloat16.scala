package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** bfloat16 vector storage + kernels — the f16 family's ML-native twin.
  *
  * Capability mirror of the reference's bfloat16 support: the
  * `lance.arrow.BFloat16Array` extension type (`python/lance/arrow.py:13-19`,
  * `bfloat16_array`) and the bf16 distance kernels in `rust/lance-linalg/`
  * (`distance/l2.rs`, `dot.rs`, `cosine.rs` are generic over bf16).
  * Same packed-BINARY representation as [[Float16]] (2 bytes/element,
  * little-endian bit pattern — half the IO of `array<float>`), different
  * trade: bf16 keeps f32's 8-bit exponent RANGE and spends the savings on
  * mantissa (8 vs 11 bits), which is why ML stacks store embeddings and
  * activations in bf16 — no overflow at |x| > 65504 and conversion is a
  * truncation, not a re-bias.
  *
  * Layout contract: byte `2i` = low byte, `2i+1` = high byte of the bf16
  * value of element `i`. f32 → bf16 is round-to-nearest-even on the dropped
  * 16 mantissa bits (the standard `(bits + 0x7fff + lsb) >>> 16` trick);
  * bf16 → f32 is EXACT (`bits << 16`) — no lookup table needed, the decode
  * is one shift.
  *
  * CAVEAT (documented contract, not inference): packed f16 and packed bf16
  * are both BINARY columns — the engine cannot tell them apart by type, and
  * the IVF families auto-dispatch binary vector columns to the f16 kernels.
  * Serve bf16 columns with the `*_bf16` kernels / [[graft.operators.Knn]]
  * flat search over them, and build ANN indexes over `bf16_unpack(col)`
  * (the same decode-at-the-boundary pattern the quantized families use for
  * f16); the TABLE keeps the 2-byte storage either way.
  */
object Bfloat16 {

  /** f32 → bf16 bits, round-to-nearest-even (NaN → quiet NaN). */
  def toBf16(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    if ((bits & 0x7fffffff) > 0x7f800000) // NaN: keep quiet, drop payload
      return (((bits >>> 16) & 0x8000) | 0x7fc0).toShort
    // RNE: add half of the dropped range plus the LSB of the kept part
    ((bits + 0x7fff + ((bits >>> 16) & 1)) >>> 16).toShort
  }

  /** bf16 bits → f32 (exact). */
  def bf16ToFloat(h: Short): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)

  /** Decoded element `i` of a packed-bf16 byte array. */
  def get(a: Array[Byte], i: Int): Float =
    java.lang.Float.intBitsToFloat(
      ((a(2 * i) & 0xff) | ((a(2 * i + 1) & 0xff) << 8)) << 16)

  def pack(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](2 * v.length)
    var i = 0
    while (i < v.length) {
      val h = toBf16(v(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def unpack(a: Array[Byte]): Array[Float] = {
    val n = a.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = get(a, i); i += 1 }
    out
  }
}

/** `bf16_pack(array<float|double>) -> binary` — the write-side cast
  * (reference `bfloat16_array`). Codegen'd. */
case class PackBf16(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bf16_pack"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.catalogString}")
  }
  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val h = Bfloat16.toBf16(if (isFloat) arr.getFloat(i) else arr.getDouble(i).toFloat)
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val h = ctx.freshName("h")
      val getF = if (isFloat) s"$a.getFloat($i)" else s"(float) $a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[2 * $n];
         |for (int $i = 0; $i < $n; $i++) {
         |  short $h = graft.functions.Bfloat16.toBf16($getF);
         |  $out[2 * $i] = (byte)($h & 0xff);
         |  $out[2 * $i + 1] = (byte)(($h >> 8) & 0xff);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `bf16_unpack(binary) -> array<float>` — the read-side cast (exact). */
case class UnpackBf16(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bf16_unpack"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Bfloat16.unpack(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.Bfloat16.unpack($a));
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distance kernels over PACKED bf16 vectors (reference bf16 kernels,
  * `rust/lance-linalg/src/distance/`): decode is one shift per element,
  * accumulate in double — the same accumulation contract as the f32/f16
  * kernels, so a bf16 search refined with exact f32 distances is
  * oracle-matchable. */
abstract class Bf16BinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary (packed bf16) arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
}

case class Bf16L2Distance(left: Expression, right: Expression) extends Bf16BinaryExpression {
  override def prettyName: String = "l2_distance_bf16"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    var acc = 0.0; var i = 0; val n = math.min(a.length, b.length) / 2
    while (i < n) {
      val d = Bfloat16.get(a, i).toDouble - Bfloat16.get(b, i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length) / 2;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) graft.functions.Bfloat16.get($a, $i)
         |            - (double) graft.functions.Bfloat16.get($b, $i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Bf16DotProduct(left: Expression, right: Expression) extends Bf16BinaryExpression {
  override def prettyName: String = "dot_product_bf16"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    var acc = 0.0; var i = 0; val n = math.min(a.length, b.length) / 2
    while (i < n) {
      acc += Bfloat16.get(a, i).toDouble * Bfloat16.get(b, i).toDouble; i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length) / 2;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) graft.functions.Bfloat16.get($a, $i)
         |        * (double) graft.functions.Bfloat16.get($b, $i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Bf16CosineDistance(left: Expression, right: Expression) extends Bf16BinaryExpression {
  override def prettyName: String = "cosine_distance_bf16"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length) / 2
    while (i < n) {
      val x = Bfloat16.get(a, i).toDouble; val y = Bfloat16.get(b, i).toDouble
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
         |int $n = java.lang.Math.min($a.length, $b.length) / 2;
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) graft.functions.Bfloat16.get($a, $i);
         |  double $y = (double) graft.functions.Bfloat16.get($b, $i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = 1.0 - $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API helpers for the bf16 family (SQL names register through
  * [[GraftFunctions.builders]] like every other kernel). */
object Bf16Functions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expression(col)

  def bf16Pack(v: Column): Column = c(PackBf16(x(v)))
  def bf16Unpack(v: Column): Column = c(UnpackBf16(x(v)))
  def l2DistanceBf16(a: Column, b: Column): Column = c(Bf16L2Distance(x(a), x(b)))
  def dotProductBf16(a: Column, b: Column): Column = c(Bf16DotProduct(x(a), x(b)))
  def cosineDistanceBf16(a: Column, b: Column): Column = c(Bf16CosineDistance(x(a), x(b)))

  /** A packed-bf16 literal from a float query vector. */
  def bf16Lit(v: Array[Float]): Column =
    c(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Bfloat16.pack(v), BinaryType))
}
