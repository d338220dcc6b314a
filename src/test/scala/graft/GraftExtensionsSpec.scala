package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{GraftExtensions, GraftTable}

class GraftExtensionsSpec extends AnyFunSuite {

  // a dedicated session with the extensions installed (shares the context)
  private lazy val extSpark: SparkSession = {
    TestSpark.spark // ensure a context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  private def freshTable(): String = {
    val t = Files.createTempDirectory("graft_ext_").toString + "/t"
    import TestSpark.spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v")
    GraftTable.write(df, t)
    GraftTable.delete(TestSpark.spark, t, "id IN (2, 4)")
    t
  }

  test("without extensions, format(graft) on a DV snapshot fails fast") {
    val t = freshTable()
    val e = intercept[IllegalStateException] {
      TestSpark.spark.read.format("graft").load(t).count()
    }
    assert(e.getMessage.contains("GraftExtensions"))
  }

  test("with extensions, format(graft) subtracts deletion vectors") {
    val t = freshTable()
    val df = extSpark.read.format("graft").load(t)
    assert(df.count() == 3)
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
  }

  test("with extensions, SQL over a graft temp view is DV-correct") {
    val t = freshTable()
    extSpark.read.format("graft").load(t).createOrReplaceTempView("g")
    val n = extSpark.sql("SELECT count(*) FROM g WHERE id > 0").head().getLong(0)
    assert(n == 3)
    val sum = extSpark.sql("SELECT sum(id) FROM g").head().getLong(0)
    assert(sum == 9L) // 1 + 3 + 5
  }

  test("GraftTable.read in the extension session does not double-apply DVs") {
    val t = freshTable()
    assert(GraftTable.read(extSpark, t).count() == 3)
  }
}
