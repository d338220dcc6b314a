package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._
import graft.operators.Knn

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class VectorDistancesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(4.0f, 6.0f, 8.0f)),
    (3L, Array(-1.0f, -2.0f, -3.0f))
  ).toDF("id", "v")

  test("l2_distance codegen matches hand computation") {
    val q = Array(1.0f, 2.0f, 3.0f)
    val got = df.withColumn("d", l2Distance($"v", vectorLit(q)))
      .orderBy($"id").select("d").as[Double].collect()
    assert(got(0) === 0.0)
    assert(math.abs(got(1) - math.sqrt(9.0 + 16.0 + 25.0)) < 1e-12)
  }

  test("cosine_distance: parallel=0, antiparallel=2") {
    val q = Array(1.0f, 2.0f, 3.0f)
    val got = df.withColumn("d", cosineDistance($"v", vectorLit(q)))
      .orderBy($"id").select("d").as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(2) - 2.0) < 1e-12)
  }

  test("dot_product") {
    val q = Array(1.0f, 1.0f, 1.0f)
    val got = df.withColumn("d", dotProduct($"v", vectorLit(q)))
      .orderBy($"id").select("d").as[Double].collect()
    assert(got.toSeq == Seq(6.0, 18.0, -6.0))
  }

  test("hamming_distance over binary") {
    val b = Seq((1L, Array[Byte](0x0f, 0x00), Array[Byte](0x00, 0x00)))
      .toDF("id", "a", "b")
    val got = b.select(hammingDistance($"a", $"b")).as[Long].head()
    assert(got == 4L)
  }

  test("null input yields null (nullIntolerant)") {
    val withNull = Seq((1L, Option.empty[Array[Float]])).toDF("id", "v")
    val got = withNull.select(l2Distance($"v", vectorLit(Array(1.0f)))).collect()
    assert(got(0).isNullAt(0))
  }

  test("interpreted eval matches codegen (expression used in filter)") {
    // filters exercise the non-codegen path in some plan shapes; compare both
    val q = Array(0.0f, 0.0f, 0.0f)
    val viaFilter = df.filter(l2Distance($"v", vectorLit(q)) < 4.0)
      .select("id").as[Long].collect().toSet
    assert(viaFilter == Set(1L, 3L)) // |v1|=3.74, |v2|=10.77, |v3|=3.74
  }

  test("SQL registration: l2_distance usable in spark.sql") {
    register(spark)
    df.createOrReplaceTempView("vecs")
    val n = spark.sql(
      "SELECT id FROM vecs WHERE l2_distance(v, array(1.0F, 2.0F, 3.0F)) < 0.001")
      .as[Long].collect()
    assert(n.toSeq == Seq(1L))
  }

  test("SQL registration: pack_sign_bits + hamming_distance compose in spark.sql") {
    register(spark)
    df.createOrReplaceTempView("vecs")
    // pack each vector's sign bits, distance to an all-positive query = 0
    // for all-positive vectors
    val n = spark.sql(
      "SELECT id FROM vecs WHERE hamming_distance(pack_sign_bits(v), " +
        "pack_sign_bits(array(1.0F, 1.0F, 1.0F))) = 0")
      .as[Long].collect()
    assert(n.nonEmpty && n.forall(Seq(1L, 2L, 3L).contains))
  }

  test("Knn.flatSearch returns k nearest in order") {
    // d(id1)=0, d(id2)=sqrt(50)≈7.07, d(id3)=sqrt(56)≈7.48
    val got = Knn.flatSearch(df, "v", Array(1.0f, 2.0f, 3.0f), 2, "l2",
      tieBreakers = Seq($"id")).select("id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L))
  }
}
