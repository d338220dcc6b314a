package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.{Fts, Knn}
import org.apache.spark.sql.functions._

class TagsCleanupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_tc_").toString + "/t"
  private def people = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  test("tags name versions; readTag time-travels") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.write(Seq((4L, "d")).toDF("id", "v"), t, "append")
    GraftTable.tag(spark, t, "v1-release", 1L)
    assert(GraftTable.tags(spark, t) == Map("v1-release" -> 1L))
    assert(GraftTable.readTag(spark, t, "v1-release").count() == 3)
    assertThrows[IllegalArgumentException](GraftTable.tag(spark, t, "bad", 99L))
    // create over an existing name errors (reference Tags.create);
    // updateTag retargets (reference Tags.update); delete (Tags.delete)
    assertThrows[IllegalArgumentException](GraftTable.tag(spark, t, "v1-release", 2L))
    GraftTable.updateTag(spark, t, "v1-release", 2L)
    assert(GraftTable.tags(spark, t) == Map("v1-release" -> 2L))
    assertThrows[IllegalArgumentException](GraftTable.updateTag(spark, t, "ghost", 2L))
    GraftTable.deleteTag(spark, t, "v1-release")
    assert(GraftTable.tags(spark, t).isEmpty)
    assertThrows[IllegalArgumentException](GraftTable.deleteTag(spark, t, "nope"))
  }

  test("cleanupOldVersions drops old manifests + unreferenced files, keeps tagged") {
    val t = tmp()
    GraftTable.write(people, t)                                     // v1
    GraftTable.write(people, t, "overwrite")                        // v2 (v1 files orphaned)
    GraftTable.write(Seq((9L, "z")).toDF("id", "v"), t, "append")   // v3
    GraftTable.tag(spark, t, "keep-me", 2L)
    // reference default error_if_tagged_old_versions=true: the tag
    // protecting v2 (an old version at keepLast=1) fails the call loudly
    val e = intercept[IllegalArgumentException] {
      GraftTable.cleanupOldVersions(spark, t, keepLast = 1)
    }
    assert(e.getMessage.contains("keep-me"), e.getMessage)
    assert(GraftTable.versions(spark, t) == Seq(1L, 2L, 3L), "error = no-op")
    // opting out retains tagged silently, sweeps the rest, reports stats
    val stats = GraftTable.cleanupOldVersions(spark, t, keepLast = 1,
      errorIfTaggedOldVersions = false)
    assert(stats.oldVersionsRemoved == 1L, stats.toString)
    assert(stats.filesRemoved >= 1L && stats.bytesRemoved > 0L, stats.toString)
    // v1 manifest gone, v2 kept via tag, v3 kept as latest
    assert(GraftTable.versions(spark, t) == Seq(2L, 3L))
    // current + tagged reads still work (their files survived the sweep)
    assert(GraftTable.read(spark, t).count() == 4)
    assert(GraftTable.readTag(spark, t, "keep-me").count() == 3)
  }

  test("multivector search ranks by summed similarity") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(0.7f, 0.7f))
    ).toDF("id", "vec")
    val out = Knn.multivectorSearch(df, "id", "vec",
      Seq(Array(1.0f, 0.0f), Array(0.0f, 1.0f)), k = 3, overfetch = 10)
      .select("id").as[Long].collect()
    assert(out.head == 3L) // equidistant from both queries -> highest sum
    // the SAME ranking over a packed-f16 column (explicit flag — binary
    // could equally be sign-bit packed, so the caller must say)
    val packed = df.select($"id", graft.functions.F16Functions.f16Pack($"vec").as("vec"))
    val outF16 = Knn.multivectorSearch(packed, "id", "vec",
      Seq(Array(1.0f, 0.0f), Array(0.0f, 1.0f)), k = 3, overfetch = 10,
      packedF16 = true)
      .select("id").as[Long].collect()
    assert(outF16.toSeq == out.toSeq)
  }

  test("fts boost demotes docs containing the negative terms") {
    val dir = Files.createTempDirectory("fts_boost_").toString
    val corpus = Seq(
      (1L, "spark spark fast"), (2L, "spark slow slow"), (3L, "other stuff")
    ).toDF("doc_id", "text")
    Fts.buildIndex(corpus, "doc_id", "text", dir)
    val out = Fts.boostQuery(spark, dir, Seq("spark"), Seq("slow"), 1.0, 5)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq.take(2) == Seq(1L, 2L))
  }
}
