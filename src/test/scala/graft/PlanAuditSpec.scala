package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.Knn

/** Physical-plan audits: the properties that make plans survive a 100×
  * scale-up, asserted on the plans themselves (not just on results) —
  * filters and projections must reach the parquet scan, aggregations must
  * stay inside whole-stage codegen, top-k must never globally sort, and a
  * small dimension join must broadcast.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private lazy val table: String = {
    val t = Files.createTempDirectory("graft_plan_").toString + "/t"
    GraftTable.write(
      spark.range(0, 5000).toDF("id")
        .withColumn("grp", pmod(col("id"), lit(7)))
        .withColumn("price", col("id").cast("double") * 1.5)
        .withColumn("wide", concat(lit("padding-"), col("id"))),
      t, "overwrite")
    t
  }

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val df = GraftTable.read(spark, table)
      .filter(col("price") > 100.0).select("id", "price")
    val plan = df.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(price,100\\.0\\)".r
        .findFirstIn(plan).isDefined,
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,price:double>"),
      s"scan must read ONLY the projected columns (no 'wide'):\n$plan")
  }

  test("aggregation stays inside whole-stage codegen") {
    val df = GraftTable.read(spark, table)
      .groupBy(col("grp")).agg(sum(col("price")), count(lit(1)))
    df.collect()
    // whole-stage codegen renders as the `*(n)` stage prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(!plan.contains("BatchEvalPython"), "no interpreted UDFs in the hot path")
  }

  test("flat KNN is TakeOrderedAndProject — never a global sort") {
    val vecs = spark.range(0, 2000).toDF("vid")
      .withColumn("vec", array(col("vid").cast("float"), lit(1.0f)))
    val df = Knn.flatSearch(vecs, "vec", Array(3.0f, 1.0f), 10, "l2",
      tieBreakers = Seq(col("vid")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject:\n$plan")
    // a global Sort would shuffle the whole corpus to rank k rows
    assert(!plan.contains("Sort ["), s"no full sort for top-k:\n$plan")
  }

  test("a small dimension join broadcasts (no shuffle of the fact side)") {
    val dim = (0L until 7L).map(i => i -> s"g$i").toDF("grp", "name")
    val df = GraftTable.read(spark, table).join(dim, "grp")
      .groupBy(col("name")).count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge for a 7-row dim:\n$plan")
  }

  test("shard packing: hierarchical prefix sum, every window partitioned") {
    import graft.operators.TextAnalysis
    // small spans force all three levels (many buckets AND many supers)
    val docs = (0L until 3000L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    // packShards require's zero unpartitioned Windows on its own plan
    val out = TextAnalysis.packShards(docs, "doc_id", "text",
      shardTokens = 50L, bucketSpan = 10L, superSpan = 8L)
    val got = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    var cum = 0L
    val exp = (0L until 3000L).map { i =>
      val n = i % 7 + 1; val shard = cum / 50L; cum += n; (i, shard)
    }
    assert(got == exp, "hierarchical cumsum must equal the sequential prefix sum")
    // and the audit itself rejects the single-partition anti-pattern
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val bad = docs.withColumn("c", sum(lit(1)).over(w))
    intercept[IllegalArgumentException] {
      TextAnalysis.requirePartitionedWindows(bad, "bad")
    }
  }

  test("f16 kernels stay inside whole-stage codegen; f16 top-k is TakeOrderedAndProject") {
    import graft.functions.F16Functions
    val vecs = spark.range(0, 2000).toDF("vid")
      .withColumn("p", F16Functions.f16Pack(
        array(col("vid").cast("float"), lit(1.0f))))
    // pack renders as a codegen'd projection stage (the write-side cast
    // runs once per corpus row)
    val packPlan = vecs.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project.*f16_pack".r.findFirstIn(packPlan).isDefined,
      s"f16_pack must be whole-stage-codegen'd:\n$packPlan")
    // the search: distance fused into the scan stage, top-k merged per
    // partition — same plan shape as the f32 path
    val df = Knn.flatSearchF16(vecs, "p", Array(3.0f, 1.0f), 10, "l2",
      tieBreakers = Seq(col("vid")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"f16 top-k must be TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Sort ["), s"no full sort for f16 top-k:\n$plan")
    assert("\\*\\(\\d+\\) Project.*l2_distance_f16".r.findFirstIn(plan).isDefined,
      s"the f16 distance must sit inside a codegen stage:\n$plan")
  }

  test("binary-vector kernels stay inside whole-stage codegen") {
    import graft.operators.{BinaryIvfAssign, PackSignBits}
    import org.apache.spark.sql.graftshim.ColumnBridge
    val vecs = spark.range(0, 512).toDF("vid")
      .withColumn("vec", array((0 until 16).map(j =>
        (pmod(col("vid") + lit(j), lit(5)) - lit(2)).cast("float")): _*))
    val centroids = Array(Array.fill[Byte](2)(0), Array.fill[Byte](2)(-1))
    val assigned = ColumnBridge.column(BinaryIvfAssign(
      ColumnBridge.expression(ColumnBridge.column(
        PackSignBits(ColumnBridge.expression(col("vec"))))), centroids))
    val df = vecs.select(col("vid"), assigned.as("pid"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the projection carrying pack+assign must render as a `*(n)` stage —
    // the corpus-sized assignment pass is the hamming family's hot path
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project.*binary_ivf_assign".r.findFirstIn(plan).isDefined,
      s"pack/assign must be whole-stage-codegen'd:\n$plan")
    // codegen result == the interpreted definition, replayed in Scala
    val vecRows = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecRows.foreach { case (vid, v) =>
      val packed = graft.operators.BinaryIvfIndex.packQuery(v)
      val exp = centroids.zipWithIndex.minBy { case (c, i) =>
        (graft.functions.HammingDistance.compute(packed, c), i) }._2
      assert(rows(vid) == exp, s"vid=$vid")
    }
  }
}
