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
}
