package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Version deltas (reference `rust/lance/src/dataset/delta.rs`
  * `DatasetDelta`): inserted / updated / deleted rows and transactions
  * between two versions, over the row-version system columns. */
class DeltaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_delta_").toString + "/t"

  /** v1: ids 0..99 · v2: append 100..149 · v3: update v%10==3 on ids<100 ·
    * v4: delete ids 20..29. */
  private def seed(t: String): Unit = {
    def df(lo: Long, hi: Long) =
      spark.range(lo, hi).toDF("id").withColumn("v", col("id") * 10)
    GraftTable.write(df(0, 100).repartition(2), t, "overwrite")
    GraftTable.write(df(100, 150).repartition(1), t, "append")
    GraftTable.update(spark, t, Map("v" -> "v + 1"), Some("id % 10 = 3 AND id < 100"))
    GraftTable.delete(spark, t, "id >= 20 AND id < 30")
  }

  test("deltaInserted: rows created in the range, end-snapshot DVs applied") {
    val t = tmp(); seed(t)
    val ins = GraftTable.deltaInserted(spark, t, 1L, 4L)
      .select("id").as[Long].collect().toSet
    assert(ins == (100L until 150L).toSet, s"got $ins")
    // range ending before the delete still sees every appended row
    val insV2 = GraftTable.deltaInserted(spark, t, 1L, 2L)
      .select("id").as[Long].collect().toSet
    assert(insV2 == (100L until 150L).toSet)
    // nothing inserted in (2, 3] — the update rewrites, never creates
    assert(GraftTable.deltaInserted(spark, t, 2L, 3L).count() == 0L)
  }

  test("deltaUpdated: created before the range, rewritten inside it; values are new") {
    val t = tmp(); seed(t)
    val upd = GraftTable.deltaUpdated(spark, t, 1L, 4L)
      .select($"id", $"v").as[(Long, Long)].collect().toMap
    val expectIds = (0L until 100L).filter(i => i % 10 == 3 && !(i >= 20 && i < 30))
    assert(upd.keySet == expectIds.toSet, s"got ${upd.keySet}")
    assert(upd.forall { case (id, v) => v == id * 10 + 1 }, s"got $upd")
    // system columns ride along
    val cols = GraftTable.deltaUpdated(spark, t, 1L, 4L).columns.toSet
    assert(cols.contains(GraftTable.RowCreatedCol) &&
      cols.contains(GraftTable.RowLastUpdatedCol) &&
      cols.contains(GraftTable.RowIdCol))
    // the appended-then-never-touched rows are NOT updates
    assert(!upd.keySet.exists(_ >= 100L))
  }

  test("deltaDeleted: begin-version rows gone by end, with begin values") {
    val t = tmp(); seed(t)
    val del = GraftTable.deltaDeleted(spark, t, 1L, 4L)
      .select($"id", $"v").as[(Long, Long)].collect().toMap
    assert(del.keySet == (20L until 30L).toSet, s"got ${del.keySet}")
    // values are the BEGIN snapshot's (id 23 was updated at v3, then
    // deleted — the begin copy predates the update)
    assert(del(23L) == 230L)
    // an update alone is not a delete (ids are move-stable)
    assert(GraftTable.deltaDeleted(spark, t, 1L, 3L).count() == 0L)
  }

  test("deltaTransactions lists the commits in the range") {
    val t = tmp(); seed(t)
    val tx = GraftTable.deltaTransactions(spark, t, 1L, 4L)
      .select($"version", $"operation").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(tx == Seq((2L, "append"), (3L, "update"), (4L, "delete")), s"got $tx")
    assert(GraftTable.deltaTransactions(spark, t, 3L, 4L).count() == 1L)
  }

  test("delta scan prunes to fragments the range touched") {
    val t = tmp(); seed(t)
    // (1, 2]: only the appended fragment is in the pruned manifest — the
    // inserted scan must not list v1's fragments
    val m = GraftTable.loadManifest(spark, t, Some(2L))
    val touched = m.fragments.count(_.addedVersion > 1L)
    assert(touched == 1, s"seed wrote $touched fragments at v2")
    val files = GraftTable.deltaInserted(spark, t, 1L, 2L)
      .inputFiles.map(_.split('/').last).toSet
    // v1 staged two fragments; neither may appear in the scan's file set
    val v1Frags = GraftTable.loadManifest(spark, t, Some(1L)).fragments
      .map(_.path.split('/').last).toSet
    assert(files.nonEmpty && files.intersect(v1Frags).isEmpty,
      s"v1 fragments leaked into the delta scan: ${files.intersect(v1Frags)}")
  }

  test("mergeInsert keeps matched rows' ids; inserts draw fresh ones") {
    val t = tmp()
    GraftTable.write(spark.range(0, 10).toDF("id")
      .withColumn("v", col("id")).repartition(1), t, "overwrite")
    val before = GraftTable.read(spark, t, withRowId = true)
      .select($"id", col(GraftTable.RowIdCol)).as[(Long, Long)].collect().toMap
    val src = spark.range(5, 15).toDF("id").withColumn("v", col("id") * 100)
    GraftTable.mergeInsert(spark, t, src, Seq("id"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.nextRowId == 15L, "only the 5 inserts advance the high-water mark")
    val after = GraftTable.read(spark, t, withRowId = true)
      .select($"id", col(GraftTable.RowIdCol)).as[(Long, Long)].collect().toMap
    (0L until 10L).foreach(i => assert(after(i) == before(i),
      s"id $i moved: ${after(i)} vs ${before(i)}"))
    assert((10L until 15L).map(after).toSet == (10L until 15L).toSet)
    // matched rows carry the source values under their old ids
    val vs = GraftTable.read(spark, t).filter($"id" >= 5 && $"id" < 10)
      .select($"v").as[Long].collect().toSet
    assert(vs == (5L until 10L).map(_ * 100).toSet)
  }
}
