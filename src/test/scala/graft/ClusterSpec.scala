package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{FragmentStats, GraftTable}

/** `GraftTable.cluster`: range-clustered layout rewrite that makes fragment
  * zonemaps selective. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String = Files.createTempDirectory("graft_cl_").toString + "/t"

  /** fragments whose zonemap cannot rule out lang = 'v' */
  private def langCandidates(t: String, v: String): (Int, Int) = {
    val m = GraftTable.loadManifest(spark, t)
    val lang = AttributeReference("lang", StringType)()
    val n = m.fragments.count(f =>
      FragmentStats.mayMatch(f.stats, f.rows, EqualTo(lang, Literal(v))))
    (n, m.fragments.size)
  }

  test("clustering changes layout, never content; zonemaps become selective") {
    val t = tmp()
    // deliberately scattered: every fragment contains every language
    GraftTable.write(Tables.documents(spark, sf).repartition(8, col("doc_id")),
      t, "overwrite")
    val before = GraftTable.read(spark, t).orderBy("doc_id").collect()
    val (candBefore, totalBefore) = langCandidates(t, "de")
    assert(candBefore == totalBefore, "scattered layout: nothing prunable")

    GraftTable.cluster(spark, t, Seq("lang", "n_chars"), targetRows = 64)
    val after = GraftTable.read(spark, t).orderBy("doc_id").collect()
    assert(after.toSeq == before.toSeq) // same rows, new layout
    val (candAfter, totalAfter) = langCandidates(t, "de")
    assert(totalAfter >= 5, s"expected several fragments, got $totalAfter")
    assert(candAfter * 3 <= totalAfter,
      s"zonemap still can't prune: $candAfter of $totalAfter fragments match lang='de'")
  }

  test("cluster materializes deletions and preserves stable row ids") {
    val t = tmp()
    GraftTable.write(Tables.documents(spark, sf).repartition(4, col("doc_id")),
      t, "overwrite")
    val idsBefore = GraftTable.read(spark, t, withRowId = true)
      .filter($"lang" =!= "zh").select("doc_id", GraftTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    GraftTable.delete(spark, t, "lang = 'zh'")
    GraftTable.cluster(spark, t, Seq("lang"), targetRows = 128)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.dvFiles.isEmpty && m.numDeleted == 0, "deletions materialized")
    val after = GraftTable.read(spark, t, withRowId = true)
      .select("doc_id", GraftTable.RowIdCol).as[(Long, Long)].collect().toMap
    assert(after == idsBefore) // zh gone; surviving ids unchanged
  }

  test("cluster validates its columns") {
    val t = tmp()
    GraftTable.write(Tables.documents(spark, sf).limit(10), t, "overwrite")
    val e = intercept[IllegalArgumentException] {
      GraftTable.cluster(spark, t, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
    intercept[IllegalArgumentException] {
      GraftTable.cluster(spark, t, Seq.empty)
    }
  }

  test("zorder tightens every dimension; range only the leading one") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo => EQ, Literal => L}
    import org.apache.spark.sql.types.LongType
    // independent 64×64 grid: x and y carry no joint structure, the case
    // where lexicographic (x, y) sort leaves y unprunable
    def grid = spark.range(0, 4096).toDF("id")
      .withColumn("x", col("id") % 64)
      .withColumn("y", col("id") / 64)
      .repartition(8, col("id"))
    def candidates(t: String, c: String, v: Long): Int = {
      val m = GraftTable.loadManifest(spark, t)
      val attr = AttributeReference(c, LongType)()
      m.fragments.count(f => FragmentStats.mayMatch(f.stats, f.rows, EQ(attr, L(v))))
    }
    val tr = tmp(); val tz = tmp()
    GraftTable.write(grid, tr, "overwrite")
    GraftTable.write(grid, tz, "overwrite")
    GraftTable.cluster(spark, tr, Seq("x", "y"), targetRows = 256)
    GraftTable.cluster(spark, tz, Seq("x", "y"), targetRows = 256, curve = "zorder")
    val total = GraftTable.loadManifest(spark, tz).fragments.size
    assert(total >= 8, s"expected >= 8 fragments, got $total")
    // range: x prunes hard, y not at all (each x-slice spans all of y)
    assert(candidates(tr, "x", 10) * 4 <= total)
    assert(candidates(tr, "y", 10) == GraftTable.loadManifest(spark, tr).fragments.size)
    // zorder: BOTH dimensions prune
    assert(candidates(tz, "x", 10) * 2 <= total,
      s"zorder x candidates: ${candidates(tz, "x", 10)} of $total")
    assert(candidates(tz, "y", 10) * 2 <= total,
      s"zorder y candidates: ${candidates(tz, "y", 10)} of $total")
    // layout change only — content identical
    assert(GraftTable.read(spark, tz).orderBy("id").collect().toSeq ==
      GraftTable.read(spark, tr).orderBy("id").collect().toSeq)
  }

  test("zorder rejects non-numeric columns") {
    val t = tmp()
    GraftTable.write(Tables.documents(spark, sf).limit(20), t, "overwrite")
    val e = intercept[IllegalArgumentException] {
      GraftTable.cluster(spark, t, Seq("lang"), curve = "zorder")
    }
    assert(e.getMessage.contains("numeric"))
    intercept[IllegalArgumentException] {
      GraftTable.cluster(spark, t, Seq("n_chars"), curve = "hilbert")
    }
  }

  test("clustered scan prunes fragments in the file index") {
    val t = tmp()
    GraftTable.write(Tables.documents(spark, sf).repartition(8, col("doc_id")),
      t, "overwrite")
    GraftTable.cluster(spark, t, Seq("n_chars"), targetRows = 64)
    // narrow range on the clustered column → listFiles keeps few fragments
    val hi = GraftTable.read(spark, t).agg(max($"n_chars")).head().getLong(0)
    val filtered = GraftTable.read(spark, t).filter($"n_chars" === hi)
    val expected = Tables.documents(spark, sf).filter($"n_chars" === hi)
      .select("doc_id").as[Long].collect().toSet
    assert(filtered.select("doc_id").as[Long].collect().toSet == expected)
  }
}
