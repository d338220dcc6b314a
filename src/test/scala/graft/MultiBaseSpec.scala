package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Multi-base storage (reference manifest `base_paths`,
  * `rust/lance-table/src/format/manifest.rs:103,562`; Python `add_bases`,
  * `dataset.py:2154`): one logical table whose fragments spread across
  * registered storage locations — hot/cold tiering, bucket spreading. */
class MultiBaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(pfx: String): String =
    Files.createTempDirectory(pfx).toString

  private def df(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("addBases is metadata-only; write-to-base lands fragments under the base") {
    val t = tmp("graft_mb_") + "/t"
    val cold = tmp("graft_mb_cold_")
    GraftTable.write(df(1 to 10), t, "overwrite")            // v1, table-local
    val m1 = GraftTable.addBases(spark, t, Map("cold" -> cold)) // v2
    assert(m1.bases == Map("cold" -> cold))
    assert(m1.fragments.map(_.path) ==
      GraftTable.loadManifest(spark, t, Some(1L)).fragments.map(_.path))
    GraftTable.write(df(11 to 20), t, "append", base = Some("cold")) // v3
    val m2 = GraftTable.loadManifest(spark, t)
    val based = m2.fragments.filter(_.path.contains(cold))
    assert(based.nonEmpty, s"expected based fragments, got ${m2.fragments.map(_.path)}")
    // full read spans both locations
    assert(GraftTable.read(spark, t).count() == 20L)
    assert(GraftTable.read(spark, t).agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == (1 to 20).sum.toLong)
  }

  test("unknown base name is refused; names cannot be re-pointed") {
    val t = tmp("graft_mb_") + "/t"
    GraftTable.write(df(1 to 3), t, "overwrite")
    intercept[IllegalArgumentException] {
      GraftTable.write(df(4 to 5), t, "append", base = Some("nope"))
    }
    val b1 = tmp("graft_mb_b1_")
    GraftTable.addBases(spark, t, Map("b" -> b1))
    GraftTable.addBases(spark, t, Map("b" -> b1)) // idempotent re-add OK
    intercept[IllegalArgumentException] {
      GraftTable.addBases(spark, t, Map("b" -> tmp("graft_mb_b2_")))
    }
  }

  test("delete / update / compact over a mixed-base table") {
    val t = tmp("graft_mb_") + "/t"
    val cold = tmp("graft_mb_cold_")
    GraftTable.write(df(1 to 10), t, "overwrite")
    GraftTable.addBases(spark, t, Map("cold" -> cold))
    GraftTable.write(df(11 to 20), t, "append", base = Some("cold"))
    GraftTable.delete(spark, t, "id IN (5, 15)") // one local, one based row
    assert(GraftTable.read(spark, t).count() == 18L)
    GraftTable.update(spark, t, Map("v" -> "'upd'"), Some("id = 12"))
    assert(GraftTable.read(spark, t).filter("v = 'upd'").count() == 1L)
    // compaction migrates everything back under the table root
    GraftTable.compact(spark, t)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.forall(!_.path.contains(cold)),
      "compaction rewrites land table-local")
    assert(GraftTable.read(spark, t).count() == 18L)
  }

  test("cleanup sweeps dropped based files but keeps referenced ones") {
    val t = tmp("graft_mb_") + "/t"
    val cold = tmp("graft_mb_cold_")
    GraftTable.write(df(1 to 5), t, "overwrite")             // v1
    GraftTable.addBases(spark, t, Map("cold" -> cold))       // v2
    GraftTable.write(df(6 to 10), t, "append", base = Some("cold"))  // v3
    GraftTable.write(df(11 to 15), t, "overwrite")           // v4: based frags dropped
    GraftTable.write(df(16 to 20), t, "append", base = Some("cold")) // v5: new based frags
    def coldParquets(): Seq[String] = {
      val d = new java.io.File(cold, "data")
      if (!d.exists()) Nil
      else d.listFiles().toSeq.filter(_.isDirectory)
        .flatMap(_.listFiles().toSeq).map(_.getName).filter(_.endsWith(".parquet"))
    }
    val before = coldParquets()
    GraftTable.cleanupOldVersions(spark, t, keepLast = 2)    // keep v4, v5
    val after = coldParquets()
    assert(after.size < before.size, s"v3's based files swept: $before -> $after")
    assert(after.nonEmpty, "v5's based files survive")
    assert(GraftTable.read(spark, t).count() == 10L)
    assert(GraftTable.read(spark, t).agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == (11 to 20).sum.toLong)
  }

  test("graft.write.base config routes writes without the explicit param") {
    val t = tmp("graft_mb_") + "/t"
    val cold = tmp("graft_mb_cold_")
    GraftTable.write(df(1 to 5), t, "overwrite")
    GraftTable.addBases(spark, t, Map("cold" -> cold))
    GraftTable.updateConfig(spark, t, Map(GraftTable.WriteBaseKey -> "cold"))
    GraftTable.write(df(6 to 10), t, "append") // no base param — config routes
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.exists(_.path.contains(cold)),
      s"config-routed append landed under the base: ${m.fragments.map(_.path)}")
    assert(GraftTable.read(spark, t).count() == 10L)
    // removing the key restores table-local writes
    GraftTable.updateConfig(spark, t, Map.empty, remove = Seq(GraftTable.WriteBaseKey))
    GraftTable.write(df(11 to 12), t, "append")
    val m2 = GraftTable.loadManifest(spark, t)
    assert(!m2.fragments.filter(_.addedVersion == m2.version).exists(_.path.contains(cold)))
  }

  test("take-by-address and stable row ids work across bases") {
    val t = tmp("graft_mb_") + "/t"
    val cold = tmp("graft_mb_cold_")
    GraftTable.write(df(1 to 5), t, "overwrite")
    GraftTable.addBases(spark, t, Map("cold" -> cold))
    GraftTable.write(df(6 to 10), t, "append", base = Some("cold"))
    val withId = GraftTable.read(spark, t, withRowId = true)
    val idOf8 = withId.filter("id = 8").select("_rowid").head().getLong(0)
    val taken = GraftTable.takeRows(spark, t, Seq(idOf8))
    assert(taken.select("id").head().getLong(0) == 8L)
  }
}
