package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Half-precision (IEEE 754 binary16) vector storage + kernels.
  *
  * Capability mirror of the reference's f16 support: the `_cast_list_f16`
  * UDF that casts `list<float>` to half-precision at write
  * (`rust/lance-datafusion/src/planner.rs:77-214`) and the f16 distance
  * kernels in `rust/lance-linalg/` — re-expressed Spark-first. Spark has no
  * native half type, so an f16 vector is a packed BINARY column (2 bytes
  * per element, little-endian bit pattern): **half the bytes at rest and on
  * the wire vs `array<float>`**, which at 100 TB is 2× less IO on the
  * hottest column of an embedding corpus.
  *
  * Layout contract: byte `2i` = low byte, byte `2i+1` = high byte of the
  * binary16 value of element `i`; dimension = length/2. Conversions are
  * IEEE round-to-nearest-even (matching `java.lang.Float.floatToFloat16`,
  * JDK 20+ — reimplemented here for the JDK 17 toolchain).
  *
  * The distance kernels decode THROUGH the packed bytes (f16→f32 by 64K
  * lookup table, accumulate in double like the f32 kernels) — a flat f16
  * search never materializes a float array per row. Index builds compose:
  * `f16_unpack` the column and feed any ANN family; storage stays f16.
  */
object Float16 {

  /** f32 → binary16 bits, IEEE round-to-nearest-even. */
  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val abs = bits & 0x7fffffff
    if (abs >= 0x7f800000) // inf or NaN (NaN → quiet NaN, payload dropped)
      return (if (abs > 0x7f800000) sign | 0x7e00 else sign | 0x7c00).toShort
    val exp = abs >>> 23 // f32 biased exponent
    if (exp == 0) return sign.toShort // f32 subnormal ≪ f16 subnormal min
    val mant = (abs & 0x7fffff) | 0x800000 // 24-bit significand
    val halfExp = exp - 112 // rebias 127 → 15
    if (halfExp >= 0x1f) return (sign | 0x7c00).toShort // overflow → inf
    // normal halves drop 13 bits; subnormal halves drop more
    val shift = if (halfExp > 0) 13 else 13 + 1 - halfExp
    if (shift > 24) return sign.toShort // below half of min subnormal → ±0
    var res = mant >>> shift
    // round-to-nearest-even on the dropped bits
    val roundBit = (mant >>> (shift - 1)) & 1
    val sticky = (mant & ((1 << (shift - 1)) - 1)) != 0
    if (roundBit == 1 && (sticky || (res & 1) == 1)) res += 1
    val out =
      if (halfExp > 0) (halfExp << 10) + (res - 0x400) // carry bumps the exponent
      else res // subnormal; res=0x400 becomes the min normal naturally
    (sign | out).toShort // out=0x7c00 after carry = inf, also correct
  }

  /** binary16 bits → f32 (exact — every half is representable). */
  def halfToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val e = (bits >>> 10) & 0x1f
    val m = bits & 0x3ff
    if (e == 0x1f)
      return java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (m << 13))
    if (e == 0) {
      if (m == 0) return java.lang.Float.intBitsToFloat(sign) // ±0
      var e32 = 112 // subnormal: normalize the significand
      var mm = m << 1
      while ((mm & 0x400) == 0) { mm <<= 1; e32 -= 1 }
      return java.lang.Float.intBitsToFloat(sign | (e32 << 23) | ((mm & 0x3ff) << 13))
    }
    java.lang.Float.intBitsToFloat(sign | ((e + 112) << 23) | (m << 13))
  }

  // 64K-entry decode table (256 KiB once per JVM): the hot-loop decode is
  // one array load instead of branchy bit math
  private val decodeTable: Array[Float] =
    Array.tabulate(65536)(i => halfToFloat(i.toShort))

  /** Decoded element `i` of a packed-f16 byte array (little-endian pairs). */
  def get(a: Array[Byte], i: Int): Float =
    decodeTable((a(2 * i) & 0xff) | ((a(2 * i + 1) & 0xff) << 8))

  /** Pack a float array to f16 bytes (the write-side cast). */
  def pack(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](2 * v.length)
    var i = 0
    while (i < v.length) {
      val h = toHalf(v(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Unpack f16 bytes to a float array. */
  def unpack(a: Array[Byte]): Array[Float] = {
    val n = a.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = get(a, i); i += 1 }
    out
  }
}

/** `f16_pack(array<float|double>) -> binary` — the write-side cast
  * (reference `_cast_list_f16`). Codegen'd: one tight loop, no boxing. */
case class PackF16(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "f16_pack"
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
      val h = Float16.toHalf(if (isFloat) arr.getFloat(i) else arr.getDouble(i).toFloat)
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
         |  short $h = graft.functions.Float16.toHalf($getF);
         |  $out[2 * $i] = (byte)($h & 0xff);
         |  $out[2 * $i + 1] = (byte)(($h >> 8) & 0xff);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `f16_unpack(binary) -> array<float>` — the read-side cast. */
case class UnpackF16(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "f16_unpack"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Float16.unpack(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.Float16.unpack($a));
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distance kernels over PACKED f16 binary vectors (reference f16 kernels,
  * `rust/lance-linalg/src/distance.rs`): decode-in-the-loop via the 64K
  * table, accumulate in double — same accumulation contract as the f32
  * kernels, so an f16 search refined with exact f32 distances is
  * oracle-matchable. Both sides packed binary; dimension = min length/2. */
abstract class F16BinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary (packed f16) arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  @inline protected final def dim(a: Array[Byte], b: Array[Byte]): Int =
    math.min(a.length, b.length) / 2
}

case class F16L2Distance(left: Expression, right: Expression) extends F16BinaryExpression {
  override def prettyName: String = "l2_distance_f16"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    var acc = 0.0; var i = 0; val n = dim(a, b)
    while (i < n) {
      val d = Float16.get(a, i).toDouble - Float16.get(b, i).toDouble
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
         |  double $d = (double) graft.functions.Float16.get($a, $i)
         |            - (double) graft.functions.Float16.get($b, $i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class F16DotProduct(left: Expression, right: Expression) extends F16BinaryExpression {
  override def prettyName: String = "dot_product_f16"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    var acc = 0.0; var i = 0; val n = dim(a, b)
    while (i < n) {
      acc += Float16.get(a, i).toDouble * Float16.get(b, i).toDouble; i += 1
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
         |  $acc += (double) graft.functions.Float16.get($a, $i)
         |        * (double) graft.functions.Float16.get($b, $i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class F16CosineDistance(left: Expression, right: Expression) extends F16BinaryExpression {
  override def prettyName: String = "cosine_distance_f16"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = dim(a, b)
    while (i < n) {
      val x = Float16.get(a, i).toDouble; val y = Float16.get(b, i).toDouble
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
         |  double $x = (double) graft.functions.Float16.get($a, $i);
         |  double $y = (double) graft.functions.Float16.get($b, $i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = 1.0 - $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API + SQL registration for the f16 family. */
object F16Functions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expression(col)

  def f16Pack(v: Column): Column = c(PackF16(x(v)))
  def f16Unpack(v: Column): Column = c(UnpackF16(x(v)))
  def l2DistanceF16(a: Column, b: Column): Column = c(F16L2Distance(x(a), x(b)))
  def dotProductF16(a: Column, b: Column): Column = c(F16DotProduct(x(a), x(b)))
  def cosineDistanceF16(a: Column, b: Column): Column = c(F16CosineDistance(x(a), x(b)))

  /** A packed-f16 literal from a float query vector. */
  def f16Lit(v: Array[Float]): Column =
    c(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Float16.pack(v), BinaryType))

  /** Per-session registration of the f16 SQL functions for sessions
    * WITHOUT GraftExtensions — resolves through the SAME builders the
    * extension injects, so the two registration paths cannot drift. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftFunctions.builders
      .filter(_._1.contains("f16"))
      .foreach { case (name, b) =>
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
      }
  }
}
