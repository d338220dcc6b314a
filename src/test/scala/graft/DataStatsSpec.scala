package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Per-column storage statistics (reference `statistics.rs`
  * `calculate_data_stats`): compressed bytes on disk per column from one
  * executor-parallel footer pass. */
class DataStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_dstats_").toString + "/t"

  test("covers every column; the wide binary column dominates; sums bound by file sizes") {
    val t = tmp()
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("small", (col("id") % 7).cast("int"))
      .withColumn("payload", expr("cast(repeat(uuid(), 40) as binary)"))
    GraftTable.write(df.repartition(3), t, "overwrite")
    val st = GraftTable.dataStats(spark, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.keySet == Set("id", "small", "payload"), s"got ${st.keySet}")
    assert(st.values.forall(_ > 0L), s"zero-byte column: $st")
    assert(st("payload") > st("id") * 10,
      s"payload should dominate: $st")
    // column chunks cannot exceed the physical fragment bytes
    val m = GraftTable.loadManifest(spark, t)
    assert(st.values.sum <= m.fragments.map(_.sizeBytes).sum, s"$st")
  }

  test("renamed columns report under the logical name; column files are included") {
    val t = tmp()
    GraftTable.write(spark.range(0, 500).toDF("id")
      .withColumn("v", col("id") * 2).repartition(2), t, "overwrite")
    GraftTable.alterColumns(spark, t, renames = Map("v" -> "value"))
    val st1 = GraftTable.dataStats(spark, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st1.keySet == Set("id", "value"), s"got ${st1.keySet}")
    // a no-rewrite add_columns lands a supplemental dataset; its bytes show
    GraftTable.addColumnsFiles(spark, t, Seq("doubled" -> "value * 2"))
    val st2 = GraftTable.dataStats(spark, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st2.contains("doubled") && st2("doubled") > 0L, s"got $st2")
    assert(st2("id") == st1("id"), "existing columns unchanged by add_columns")
  }
}
