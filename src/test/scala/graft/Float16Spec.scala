package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{F16Functions, Float16}

/** IEEE 754 binary16 conversions + the packed-f16 kernels. The conversion
  * semantics are pinned to `java.lang.Float.floatToFloat16` (JDK 20+) via
  * hand-checked known values, since the toolchain is JDK 17. */
class Float16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (float, expected binary16 bits) — standard IEEE test vectors
  private val known: Seq[(Float, Int)] = Seq(
    0.0f -> 0x0000,
    -0.0f -> 0x8000,
    1.0f -> 0x3c00,
    -1.0f -> 0xbc00,
    2.0f -> 0x4000,
    -2.5f -> 0xc100,
    0.5f -> 0x3800,
    65504.0f -> 0x7bff, // max normal
    -65504.0f -> 0xfbff,
    6.103515625e-5f -> 0x0400, // min normal 2^-14
    5.9604645e-8f -> 0x0001, // min subnormal 2^-24
    3.0517578e-5f -> 0x0200, // subnormal 2^-15
    Float.PositiveInfinity -> 0x7c00,
    Float.NegativeInfinity -> 0xfc00,
    0.333251953125f -> 0x3555 // nearest half to 1/3
  )

  test("known-value conversions both ways") {
    for ((f, bits) <- known) {
      assert((Float16.toHalf(f) & 0xffff) == bits,
        f"toHalf($f) = 0x${Float16.toHalf(f) & 0xffff}%04x, want 0x$bits%04x")
      assert(Float16.halfToFloat(bits.toShort) == f ||
        (f == 0.0f && Float16.halfToFloat(bits.toShort) == f), // -0.0 == 0.0 in ==
        f"halfToFloat(0x$bits%04x) = ${Float16.halfToFloat(bits.toShort)}, want $f")
    }
    // NaN maps to a half NaN and back to a float NaN
    assert((Float16.toHalf(Float.NaN) & 0x7c00) == 0x7c00 &&
      (Float16.toHalf(Float.NaN) & 0x3ff) != 0)
    assert(Float16.halfToFloat(0x7e00.toShort).isNaN)
  }

  test("rounding: nearest, ties to even; overflow to inf; tiny to zero") {
    // 1 + 2^-11 is exactly halfway between 1.0 (even) and 1+2^-10 → 1.0
    assert((Float16.toHalf(1.0f + math.pow(2, -11).toFloat) & 0xffff) == 0x3c00)
    // 1 + 3·2^-11 is halfway between 1+2^-10 (odd) and 1+2^-9 (even) → up
    assert((Float16.toHalf(1.0f + 3 * math.pow(2, -11).toFloat) & 0xffff) == 0x3c02)
    // just above halfway rounds up
    assert((Float16.toHalf(1.0f + 1.1f * math.pow(2, -11).toFloat) & 0xffff) == 0x3c01)
    // 65520 = halfway between 65504 and 2^16 → rounds to even = inf
    assert((Float16.toHalf(65520.0f) & 0xffff) == 0x7c00)
    assert((Float16.toHalf(65519.9f) & 0xffff) == 0x7bff)
    // below half of min subnormal → zero (2^-25 ties to even = 0)
    assert((Float16.toHalf(2.9802322e-8f) & 0xffff) == 0x0000)
    assert((Float16.toHalf(3.1e-8f) & 0xffff) == 0x0001) // just above → min sub
  }

  test("roundtrip: every binary16 value survives f16→f32→f16 bit-exact") {
    var i = 0
    while (i < 65536) {
      val h = i.toShort
      val f = Float16.halfToFloat(h)
      val back = Float16.toHalf(f)
      if (!f.isNaN) assert(back == h,
        f"0x$i%04x → $f → 0x${back & 0xffff}%04x")
      else assert((back & 0x7c00) == 0x7c00 && (back & 0x3ff) != 0)
      i += 1
    }
  }

  test("nearest-half property: toHalf picks the closest representable half, ties to even") {
    // For any finite float in half range, the chosen half must be at least
    // as close as BOTH neighboring halves; at exact ties the even mantissa
    // wins. This is the complete definition of RNE — checked against 200k
    // deterministic pseudo-random floats plus every half-boundary midpoint.
    def check(f: Float): Unit = {
      val h = Float16.toHalf(f)
      if (f.isNaN) return
      val fh = Float16.halfToFloat(h)
      if (fh.isInfinite) return // overflow rounding checked separately
      val d = math.abs(f.toDouble - fh)
      for (nb <- Seq((h + 1).toShort, (h - 1).toShort)) {
        val fn = Float16.halfToFloat(nb)
        if (!fn.isNaN && !fn.isInfinite && ((fn >= 0) == (fh >= 0))) {
          val dn = math.abs(f.toDouble - fn)
          assert(d < dn || (d == dn && (h & 1) == 0),
            f"$f: chose 0x${h & 0xffff}%04x ($fh, err $d) over " +
              f"0x${nb & 0xffff}%04x ($fn, err $dn)")
        }
      }
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200000) {
      // log-uniform magnitude across the full half range incl. subnormals
      val mag = math.pow(2.0, rnd.nextDouble() * 40 - 25)
      check(((if (rnd.nextBoolean()) 1 else -1) * mag).toFloat)
    }
    // every midpoint between consecutive halves is an exact tie → even
    var h = 0x0001
    while (h < 0x7bff) {
      val lo = Float16.halfToFloat(h.toShort)
      val hi = Float16.halfToFloat((h + 1).toShort)
      val mid = ((lo.toDouble + hi) / 2).toFloat
      if (mid.toDouble == (lo.toDouble + hi) / 2) { // midpoint exact in f32
        val got = Float16.toHalf(mid) & 0xffff
        val even = if ((h & 1) == 0) h else h + 1
        assert(got == even,
          f"tie at $mid between 0x$h%04x and 0x${h + 1}%04x → 0x$got%04x, want 0x$even%04x")
      }
      h += 17 // stride: 0x7bff/17 ≈ 1.9k midpoints, all regions covered
    }
  }

  test("pack/unpack arrays and the SQL surface") {
    val v = Array(0.1f, -2.5f, 1e-6f, 12345.6f, 0f)
    val packed = Float16.pack(v)
    assert(packed.length == 10)
    val un = Float16.unpack(packed)
    for (i <- v.indices)
      assert(math.abs(un(i) - v(i)) <= math.max(math.abs(v(i)) * 1e-3, 1e-7),
        s"elem $i: ${un(i)} vs ${v(i)}")
    // SQL surface (registered per-session; GraftExtensions injects the same)
    F16Functions.register(spark)
    val row = spark.sql(
      "SELECT f16_unpack(f16_pack(array(1.0F, -2.5F))) AS u, " +
        "l2_distance_f16(f16_pack(array(0F,0F)), f16_pack(array(3F,4F))) AS d")
      .head()
    assert(row.getSeq[Float](0) == Seq(1.0f, -2.5f))
    assert(row.getDouble(1) == 5.0)
  }

  test("f16 kernels agree with f32 kernels within the quantization bound") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "vec")
      .withColumn("p", F16Functions.f16Pack(col("vec")))
    val q = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    val qf = graft.functions.VectorFunctions.vectorLit(q)
    val qp = F16Functions.f16Lit(q)
    val stats = df.select(
      max(abs(F16Functions.l2DistanceF16(col("p"), qp) -
        graft.functions.VectorFunctions.l2Distance(col("vec"), qf))).as("dl2"),
      max(abs(F16Functions.cosineDistanceF16(col("p"), qp) -
        graft.functions.VectorFunctions.cosineDistance(col("vec"), qf))).as("dcos"),
      max(abs(F16Functions.dotProductF16(col("p"), qp) -
        graft.functions.VectorFunctions.dotProduct(col("vec"), qf))).as("ddot"))
      .head()
    assert(stats.getDouble(0) < 0.01, s"l2 drift ${stats.getDouble(0)}")
    assert(stats.getDouble(1) < 0.01, s"cos drift ${stats.getDouble(1)}")
    assert(stats.getDouble(2) < 0.05, s"dot drift ${stats.getDouble(2)}")
  }

  test("quantized index families accept packed f16 table columns") {
    import java.nio.file.Files
    import graft.format.GraftTable
    import graft.operators.{Knn, PqIndex, SqIndex, RqIndex, HnswIndex}
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val packed = emb.select(col("vec_id"),
      F16Functions.f16Pack(col("embedding")).as("emb"))
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    // truth over the SAME f16-decoded values — quantized refine legs must
    // reproduce it exactly at full probes + large refine
    val flat = Knn.flatSearchF16(packed, "emb", q, 10, "l2", Seq(col("vec_id")))
      .select("vec_id").as[Long].collect().toSeq
    val t = Files.createTempDirectory("f16_fam_tbl_").toString + "/t"
    GraftTable.write(packed.repartitionByRange(2, col("vec_id")), t, "overwrite")
    val pqDir = Files.createTempDirectory("f16_pq_").toString
    PqIndex.buildForTable(spark, t, "vec_id", "emb", pqDir, nlist = 8, m = 8, k = 16)
    val viaPq = PqIndex.searchCombined(spark, t, pqDir, "vec_id", "emb", q,
        10, nprobes = 8, refineFactor = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaPq == flat, s"PQ over f16: $viaPq != $flat")
    val sqDir = Files.createTempDirectory("f16_sq_").toString
    SqIndex.buildForTable(spark, t, "vec_id", "emb", sqDir, nlist = 8)
    val viaSq = SqIndex.searchCombined(spark, t, sqDir, "vec_id", "emb", q,
        10, nprobes = 8, refineFactor = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaSq == flat, s"SQ over f16: $viaSq != $flat")
    val rqDir = Files.createTempDirectory("f16_rq_").toString
    RqIndex.buildForTable(spark, t, "vec_id", "emb", rqDir, nlist = 8)
    val viaRq = RqIndex.searchCombined(spark, t, rqDir, "vec_id", "emb", q,
        10, nprobes = 8, refineFactor = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaRq == flat, s"RQ over f16: $viaRq != $flat")
    val hDir = Files.createTempDirectory("f16_hnsw_").toString
    HnswIndex.buildForTable(spark, t, "vec_id", "emb", hDir,
      nlist = 4, m = 16, efConstruction = 64)
    val viaH = HnswIndex.searchCombined(spark, t, hDir, "vec_id", "emb", q,
        10, nprobes = 4, ef = 500)
      .select("vec_id").as[Long].collect().toSeq
    // HNSW is approximate: recall check, not exact equality
    assert(flat.toSet.intersect(viaH.toSet).size >= 8,
      s"HNSW over f16 recall too low: $viaH vs $flat")
  }

  test("flatSearchF16 with f32 refine equals exact flat search") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "vec")
      .withColumn("p", F16Functions.f16Pack(col("vec")))
    val q = Array.fill(16)(rnd.nextFloat())
    val exact = graft.operators.Knn.flatSearch(df, "vec", q, 10, "l2",
      tieBreakers = Seq(col("id"))).select("id").as[Long].collect().toSeq
    val viaF16 = graft.operators.Knn.flatSearchF16(df, "p", q, 10, "l2",
      tieBreakers = Seq(col("id")), refineWith = Some("vec"), refineFactor = 4)
      .select("id").as[Long].collect().toSeq
    assert(viaF16 == exact)
    // and the unrefined f16 ranking is a close approximation (top-1 agrees)
    val raw = graft.operators.Knn.flatSearchF16(df, "p", q, 10, "l2",
      tieBreakers = Seq(col("id"))).select("id").as[Long].collect().toSeq
    assert(raw.head == exact.head)
  }
}
