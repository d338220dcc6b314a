package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** `GraftTable.validate` — integrity verification (reference
  * `Dataset::validate`). */
class ValidateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_validate_").toString + "/t"

  private def people = (1L to 50L).map(i => (i, s"name-$i", i * 2.0))
    .toDF("id", "name", "score")

  test("full lifecycle table validates clean") {
    val t = tmp()
    GraftTable.write(people.repartition(3), t)
    GraftTable.delete(spark, t, "id <= 5")
    GraftTable.addColumnsFiles(spark, t, Seq("score2" -> "score * 2"))
    GraftTable.write(people.withColumn("score2", $"score" * 2)
      .filter($"id" <= 10).repartition(1), t, "append")
    graft.index.ScalarIndex.buildBtree(spark, t, "id", s"$t/_indices")
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("missing fragment file, wrong size, and footer drift are reported") {
    val t = tmp()
    GraftTable.write(people.repartition(2), t)
    val m = GraftTable.loadManifest(spark, t)
    val conf = spark.sessionState.newHadoopConf()
    // delete one fragment file outright
    val victim = new Path(new Path(t), m.fragments.head.path)
    assert(victim.getFileSystem(conf).delete(victim, false))
    // corrupt another by appending garbage (size mismatch fires first)
    val second = java.nio.file.Paths.get(t, m.fragments(1).path)
    java.nio.file.Files.write(second, Array.fill[Byte](16)(0),
      java.nio.file.StandardOpenOption.APPEND)
    val issues = GraftTable.validate(spark, t)
    assert(issues.exists(_.startsWith(s"missing fragment file ${m.fragments.head.path}")),
      issues.toString)
    assert(issues.exists(_.contains(s"fragment ${m.fragments(1).path}: size")),
      issues.toString)
  }

  test("missing deletion vector and index marker are reported") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.delete(spark, t, "id = 7")
    graft.index.ScalarIndex.buildBtree(spark, t, "id", s"$t/_indices")
    assert(GraftTable.validate(spark, t).isEmpty)
    val m = GraftTable.loadManifest(spark, t)
    val conf = spark.sessionState.newHadoopConf()
    val dv = new Path(new Path(t), m.dvFiles.head)
    dv.getFileSystem(conf).delete(dv, true)
    val idxDir = new Path(s"$t/_indices/${m.indices.head.name}")
    idxDir.getFileSystem(conf).delete(idxDir, true)
    val issues = GraftTable.validate(spark, t)
    assert(issues.exists(_.startsWith("missing dv")), issues.toString)
    assert(issues.exists(_.contains("directory or marker missing")), issues.toString)
  }
}
