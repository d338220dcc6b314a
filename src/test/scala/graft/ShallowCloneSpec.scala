package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

class ShallowCloneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def freshPair(): (String, String) = {
    val root = Files.createTempDirectory("graft_clone_").toString
    (s"$root/src", s"$root/dest")
  }

  private def seed(src: String): Unit = {
    val df = spark.range(0, 300).toDF("id").withColumn("v", col("id") * 2)
    GraftTable.write(df.repartition(3), src, "overwrite")
  }

  test("clone is metadata-only and reads the source's data") {
    val (src, dest) = freshPair()
    seed(src)
    GraftTable.delete(spark, src, "id >= 290") // clone inherits DVs too
    val m = GraftTable.shallowClone(spark, src, dest)
    assert(m.operation == "shallow_clone" && m.version == 1L)
    // no data files under the clone — only the manifest
    val f = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!f.exists(new org.apache.hadoop.fs.Path(dest, "data")))
    val got = GraftTable.read(spark, dest)
    assert(got.count() == 290)
    assert(got.agg(sum(col("v"))).head().getLong(0) ==
      (0L until 290L).map(_ * 2).sum)
  }

  test("clone of an old version pins that snapshot") {
    val (src, dest) = freshPair()
    seed(src)
    val v1 = GraftTable.loadManifest(spark, src).version
    GraftTable.write(spark.range(300, 400).toDF("id")
      .withColumn("v", col("id") * 2), src, "append")
    GraftTable.shallowClone(spark, src, dest, Some(v1))
    assert(GraftTable.read(spark, dest).count() == 300)
    assert(GraftTable.read(spark, src).count() == 400)
  }

  test("mutations of the clone land under dest and never touch the source") {
    val (src, dest) = freshPair()
    seed(src)
    GraftTable.shallowClone(spark, src, dest)
    GraftTable.write(spark.range(1000, 1100).toDF("id")
      .withColumn("v", col("id") * 2), dest, "append")
    GraftTable.delete(spark, dest, "id < 10")
    GraftTable.update(spark, dest, Map("v" -> "v + 1"), Some("id = 50"))
    assert(GraftTable.read(spark, dest).count() == 390)
    assert(GraftTable.read(spark, dest).filter(col("id") === 50).head().getLong(1) == 101L)
    // source untouched by all of it
    assert(GraftTable.read(spark, src).count() == 300)
    assert(GraftTable.read(spark, src).filter(col("id") === 50).head().getLong(1) == 100L)
    // appended fragment ids / row ids continue past the source's high-water marks
    val sm = GraftTable.loadManifest(spark, src)
    val dm = GraftTable.loadManifest(spark, dest)
    assert(dm.maxFragmentId > sm.maxFragmentId)
  }

  test("compact + cleanup on the clone localizes data and spares the source") {
    val (src, dest) = freshPair()
    seed(src)
    GraftTable.shallowClone(spark, src, dest)
    GraftTable.delete(spark, dest, "id % 3 = 0")
    GraftTable.compact(spark, dest, targetRows = 100)
    GraftTable.cleanupOldVersions(spark, dest, keepLast = 1)
    assert(GraftTable.read(spark, dest).count() == 200)
    // source data files all still present and readable
    assert(GraftTable.read(spark, src).count() == 300)
  }

  test("clone onto an existing table is refused") {
    val (src, dest) = freshPair()
    seed(src)
    GraftTable.shallowClone(spark, src, dest)
    intercept[IllegalStateException] {
      GraftTable.shallowClone(spark, src, dest)
    }
  }
}
