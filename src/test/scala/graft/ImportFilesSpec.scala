package graft

import java.nio.file.Files
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Zero-copy external-file import (reference distributed/external-write
  * commit: `Fragment.create_from_file` `fragment.py:279` + dataset
  * `commit`): externally produced parquet registers as fragments by
  * reference — no copy, no rewrite. */
class ImportFilesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(pfx: String): String = Files.createTempDirectory(pfx).toString

  private def df(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  /** Write a parquet dir externally, return its part files. */
  private def externalParquet(r: Range): Seq[String] = {
    val dir = tmp("graft_ext_")
    df(r).coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
    new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
  }

  test("import registers files in place; reads, stats, row ids all work") {
    val t = tmp("graft_imp_") + "/t"
    GraftTable.write(df(1 to 5), t, "overwrite")
    val ext = externalParquet(6 to 10)
    val m = GraftTable.commitFiles(spark, t, ext)
    assert(m.operation == "import_files")
    // files stayed in their original directory (renamed in place to the
    // frag-<id> pattern, no data copied under the table root)
    assert(ext.forall(p => new java.io.File(p).getParentFile.listFiles()
      .exists(_.getName.startsWith("frag-"))))
    assert(m.fragments.filter(_.addedVersion == m.version)
      .forall(f => f.path.contains("graft_ext_")))
    // full read + zonemap stats + contiguous row ids on imported fragments
    assert(GraftTable.read(spark, t).count() == 10L)
    val imported = m.fragments.filter(_.addedVersion == m.version)
    assert(imported.forall(_.stats.nonEmpty), "footer stats collected")
    assert(imported.forall(_.rowIdStart >= 0), "row ids assigned")
    // DML over imported rows
    GraftTable.delete(spark, t, "id = 7")
    assert(GraftTable.read(spark, t).count() == 9L)
    val withId = GraftTable.read(spark, t, withRowId = true)
    val rid = withId.filter("id = 9").select("_rowid").head().getLong(0)
    assert(GraftTable.takeRows(spark, t, Seq(rid)).select("id").head().getLong(0) == 9L)
  }

  test("schema mismatches are refused") {
    val t = tmp("graft_imp_") + "/t"
    GraftTable.write(df(1 to 3), t, "overwrite")
    val wrongType = {
      val dir = tmp("graft_ext_")
      Seq((1, "x")).toDF("id", "v").coalesce(1) // id INT, table stores BIGINT
        .write.mode(SaveMode.Overwrite).parquet(dir)
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    }
    intercept[IllegalArgumentException] {
      GraftTable.commitFiles(spark, t, wrongType)
    }
    val extraCol = {
      val dir = tmp("graft_ext_")
      Seq((1L, "x", 3.0)).toDF("id", "v", "w").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(dir)
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    }
    intercept[IllegalArgumentException] {
      GraftTable.commitFiles(spark, t, extraCol)
    }
  }

  test("files differing only in nullability import together (fingerprint ignores repetition)") {
    val t = tmp("graft_imp_") + "/t"
    GraftTable.write(df(1 to 2), t, "overwrite")
    // file A: non-nullable id (parquet 'required'), from spark.range
    val dirA = tmp("graft_ext_")
    spark.range(3, 5).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(dirA)
    // file B: nullable id (parquet 'optional'), via boxed values
    val dirB = tmp("graft_ext_")
    Seq((java.lang.Long.valueOf(5L), "v5"))
      .toDF("id", "v").coalesce(1).write.mode(SaveMode.Overwrite).parquet(dirB)
    val files = Seq(dirA, dirB).flatMap(d => new java.io.File(d).listFiles().toSeq
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath))
    GraftTable.commitFiles(spark, t, files)
    assert(GraftTable.read(spark, t).count() == 5L)
    assert(GraftTable.read(spark, t).orderBy("id").select("v").as[String]
      .collect().toSeq == Seq("v1", "v2", "v3", "v4", "v5"))
  }

  test("import into a renamed table binds physical names to logical schema") {
    val t = tmp("graft_imp_") + "/t"
    GraftTable.write(df(1 to 3), t, "overwrite")
    GraftTable.alterColumns(spark, t, renames = Map("v" -> "label"))
    // external files carry the PHYSICAL name "v"
    val ext = externalParquet(4 to 6)
    GraftTable.commitFiles(spark, t, ext)
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.columns.toSeq == Seq("id", "label"))
    assert(back.filter("id = 5").select("label").as[String].head() == "v5")
  }

  test("overwrite mode replaces content, keeps lineage and config") {
    val t = tmp("graft_imp_") + "/t"
    GraftTable.write(df(1 to 5), t, "overwrite",
      configUpdates = Map("graft.write.compression" -> "zstd"))
    val ext = externalParquet(100 to 102)
    val m = GraftTable.commitFiles(spark, t, ext, mode = "overwrite")
    assert(m.version == 2L)
    assert(m.config.get("graft.write.compression").contains("zstd"))
    assert(GraftTable.read(spark, t).count() == 3L)
    // time travel to v1 still sees the old content
    assert(GraftTable.read(spark, t, version = Some(1L)).count() == 5L)
  }
}
