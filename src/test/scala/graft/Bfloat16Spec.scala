package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bfloat16, Bf16Functions}
import graft.operators.Knn

/** bfloat16 storage + kernels (reference `lance.arrow.BFloat16Array`,
  * `python/lance/arrow.py:13-19`; bf16 kernels `rust/lance-linalg/src/
  * distance/`): 2-byte packed BINARY with f32's exponent range —
  * conversions exact on the way out (shift), round-to-nearest-even on the
  * way in, kernels decoding through the packed bytes.
  */
class Bfloat16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bf16 -> f32 is exact and pack(unpack) is idempotent on every non-NaN pattern") {
    var bits = 0
    while (bits < 65536) {
      val h = bits.toShort
      val f = Bfloat16.bf16ToFloat(h)
      if (!f.isNaN) {
        // decode is the exact f32 with the low 16 bits zero
        assert(java.lang.Float.floatToRawIntBits(f) == (bits << 16),
          s"pattern $bits decoded to ${java.lang.Float.floatToRawIntBits(f)}")
        // a representable value re-encodes to itself (RNE of an exact value)
        assert(Bfloat16.toBf16(f) == h, s"pattern $bits not idempotent")
      } else {
        // NaN payloads normalize to the quiet NaN, sign preserved
        val re = Bfloat16.toBf16(f) & 0xffff
        assert((re & 0x7fff) == 0x7fc0)
      }
      bits += 1
    }
  }

  test("f32 -> bf16 is round-to-nearest-even (checked against exhaustive candidates)") {
    val rnd = new scala.util.Random(7)
    var i = 0
    while (i < 200000) {
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN && !f.isInfinite) {
        val got = Bfloat16.toBf16(f) & 0xffff
        // nearest representable: the two candidates around f
        val bits = java.lang.Float.floatToIntBits(f)
        val lo = bits & 0xffff0000
        val hi = lo + 0x10000 // may wrap into inf — still a valid candidate
        val fl = java.lang.Float.intBitsToFloat(lo)
        val fh = java.lang.Float.intBitsToFloat(hi)
        // a candidate that wraps into ±inf stands for ±2^128 in the IEEE
        // overflow-midpoint rule (round to inf iff beyond the midpoint of
        // max-finite and the next power of two)
        def mag(x: Float): Double =
          if (x.isInfinite) math.pow(2, 128) * math.signum(x) else x.toDouble
        val dl = math.abs(f.toDouble - mag(fl))
        val dh = math.abs(mag(fh) - f.toDouble)
        val want =
          if (dl < dh) lo >>> 16
          else if (dh < dl) hi >>> 16
          else if (((lo >>> 16) & 1) == 0) lo >>> 16 else hi >>> 16 // tie → even
        assert(got == want,
          s"$f: got ${got.toHexString}, want ${want.toHexString}")
      }
      i += 1
    }
  }

  test("kernels through packed bytes == kernels on unpacked floats") {
    val a = Array(1.5f, -2.25f, 3.75f, 0.5f)
    val b = Array(0.25f, 1.0f, -1.5f, 2.0f)
    val (pa, pb) = (Bfloat16.pack(a), Bfloat16.pack(b))
    val row = Seq((pa, pb)).toDF("a", "b")
    val l2 = row.select(Bf16Functions.l2DistanceBf16(col("a"), col("b"))).head().getDouble(0)
    val dot = row.select(Bf16Functions.dotProductBf16(col("a"), col("b"))).head().getDouble(0)
    // these values are bf16-exact, so the kernel must be exact too
    val ua = Bfloat16.unpack(pa); val ub = Bfloat16.unpack(pb)
    assert(ua.sameElements(a) && ub.sameElements(b))
    val wantL2 = math.sqrt(a.zip(b).map { case (x, y) => val d = x - y; d.toDouble * d }.sum)
    val wantDot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(l2 - wantL2) < 1e-12)
    assert(math.abs(dot - wantDot) < 1e-12)
  }

  test("flatSearchBf16 with f32 refine recovers the exact top-k") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq))
    val df = rows.toDF("id", "v")
      .withColumn("v_bf16", Bf16Functions.bf16Pack(col("v")))
    val q = rows(7)._2.toArray.map(x => x + 0.01f)
    val got = Knn.flatSearchBf16(df, "v_bf16", q, 10, "l2",
        tieBreakers = Seq(col("id")), refineWith = Some("v"), refineFactor = 8)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    val want = Knn.flatSearch(rows.toDF("id", "v"), "v", q, 10, "l2",
        tieBreakers = Seq(col("id")))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // bf16 keeps f32's range: values beyond f16's 65504 max survive packing
    val big = Array(1.0e20f, -3.0e30f)
    assert(Bfloat16.unpack(Bfloat16.pack(big)).forall(x => !x.isInfinite))
  }

  test("SQL surface: bf16_pack / l2_distance_bf16 resolve via the shared builders") {
    val s2 = TestSpark.spark
    // same registration path GraftExtensions injects ("f16" filter matches
    // the bf16 family names too — one builder table, no drift)
    graft.functions.F16Functions.register(s2)
    val out = s2.sql(
      "SELECT l2_distance_bf16(bf16_pack(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))), " +
        "bf16_pack(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))))").head().getDouble(0)
    assert(math.abs(out - 2.0) < 1e-12)
  }
}
