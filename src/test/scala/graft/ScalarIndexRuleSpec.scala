package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.index.ScalarIndex

class ScalarIndexRuleSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // reuse the extension session machinery from GraftExtensionsSpec
  private lazy val extSpark = {
    TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-idxrule-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.format.GraftExtensions)
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(TestSpark.spark)
    org.apache.spark.sql.SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  private def freshIndexed(): String = {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    val df = TestSpark.spark.range(0, 500).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10)))
    GraftTable.write(df, t, "overwrite")
    ScalarIndex.buildBtree(TestSpark.spark, t, "id", s"$t/_indices")
    t
  }

  test("fresh index: filter is rewritten to mask semi-join, result exact") {
    val t = freshIndexed()
    val q = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan) // mask applied
    assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == (100L to 110L))
  }

  test("stale index (table changed after build): rule does not apply") {
    val t = freshIndexed()
    GraftTable.write(TestSpark.spark.range(500, 600).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10))), t, "append")
    val q = GraftTable.read(extSpark, t).filter(col("id") >= 550)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LeftSemi"), plan) // no mask — stale
    assert(q.count() == 50) // and the appended rows are NOT lost
  }

  test("non-sargable filter untouched") {
    val t = freshIndexed()
    val q = GraftTable.read(extSpark, t).filter(col("id") + col("grp") > 100)
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.count() == GraftTable.read(TestSpark.spark, t)
      .filter(col("id") + col("grp") > 100).count())
  }

  test("refine keeps conjuncts the index does not cover") {
    val t = freshIndexed()
    val q = GraftTable.read(extSpark, t)
      .filter(col("id").between(100, 120) && col("grp") === 5)
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(105L, 115L))
  }
}
