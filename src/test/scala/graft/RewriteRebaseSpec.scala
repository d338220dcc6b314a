package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Rewrite conflict semantics (reference `transaction.rs` — a Rewrite
  * conflicts only with operations that touched the rewritten fragments):
  * compaction REBASES over concurrent appends / metadata commits and
  * aborts on concurrent deletes/updates. Without the rebase, a 100 TB
  * table under continuous ingest could never compact. The `beforeCommit`
  * seam injects the concurrent commit deterministically between staging
  * and the commit loop. */
class RewriteRebaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_rebase_").toString + "/t"

  private def df(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("full compact rebases over a concurrent append") {
    val t = tmp()
    GraftTable.write(df(1 to 10).repartition(4), t, "overwrite")
    GraftTable.delete(spark, t, "id = 3")
    val m = GraftTable.compact(spark, t, targetRows = 100, beforeCommit = { () =>
      GraftTable.write(df(11 to 15), t, "append")
    })
    assert(m.operation == "rewrite")
    // appended rows AND compacted rows both present
    val got = GraftTable.read(spark, t).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((1L to 15L).filterNot(_ == 3L)))
    // the appended fragment survived untouched (same id range from the append)
    assert(m.fragments.exists(_.addedVersion == m.version - 1),
      "appended fragment carried through the rebase")
  }

  test("partial compactFiles rebases over a concurrent append") {
    val t = tmp()
    // many small fragments → all are compaction candidates
    GraftTable.write(df(1 to 12).repartition(6), t, "overwrite")
    val m = GraftTable.compactFiles(spark, t, targetRows = 100,
      beforeCommit = { () => GraftTable.write(df(13 to 14), t, "append") })
    assert(m.operation == "rewrite")
    val got = GraftTable.read(spark, t).select("id").as[Long].collect().sorted.toSeq
    assert(got == (1L to 14L))
  }

  test("compact aborts on a concurrent delete (would resurrect rows)") {
    val t = tmp()
    GraftTable.write(df(1 to 10).repartition(4), t, "overwrite")
    val e = intercept[IllegalStateException] {
      GraftTable.compact(spark, t, targetRows = 100, beforeCommit = { () =>
        GraftTable.delete(spark, t, "id = 5")
      })
    }
    assert(e.getMessage.contains("compaction conflict"))
    // the delete itself is intact
    assert(GraftTable.read(spark, t).count() == 9L)
  }

  test("compact aborts on a concurrent overlapping rewrite") {
    val t = tmp()
    GraftTable.write(df(1 to 10).repartition(4), t, "overwrite")
    val e = intercept[IllegalStateException] {
      GraftTable.compact(spark, t, targetRows = 100, beforeCommit = { () =>
        GraftTable.compact(spark, t, targetRows = 100) // rewrites same fragments
      })
    }
    assert(e.getMessage.contains("compaction conflict"))
    assert(GraftTable.read(spark, t).count() == 10L)
  }

  test("rebase composes with metadata-only concurrent commits") {
    val t = tmp()
    GraftTable.write(df(1 to 8).repartition(4), t, "overwrite")
    val m = GraftTable.compact(spark, t, targetRows = 100, beforeCommit = { () =>
      GraftTable.updateConfig(spark, t, Map("graft.test.marker" -> "yes"))
    })
    assert(m.config.get("graft.test.marker").contains("yes"),
      "concurrent config commit survives the rebase")
    assert(GraftTable.read(spark, t).count() == 8L)
  }
}
