package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Bucketed graft tables: co-located joins/aggregations on the bucket
  * columns plan ZERO shuffles — the 100 TB lever for repeated big joins —
  * and rewriting mutations degrade the spec safely instead of erroring. */
class BucketedTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_bucket_").toString + "/t"

  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed-bucketed equi-join plans no exchange; results exact") {
    val a = tmp(); val b = tmp()
    val dfA = spark.range(0, 5000).toDF("id")
      .withColumn("x", col("id") * 2)
    val dfB = spark.range(0, 5000).toDF("id")
      .withColumn("y", col("id") * 3)
    GraftTable.write(dfA, a, "overwrite", bucketBy = Some((8, Seq("id"))))
    GraftTable.write(dfB, b, "overwrite", bucketBy = Some((8, Seq("id"))))
    // appends inherit the spec and add suffixed files
    GraftTable.write(spark.range(5000, 6000).toDF("id")
      .withColumn("x", col("id") * 2), a, "append")
    noBroadcast {
      val ra = GraftTable.read(spark, a)
      val rb = GraftTable.read(spark, b)
      val joined = ra.join(rb, "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"join must still be a real join:\n$plan")
      // correctness: equal to the unbucketed computation
      val got = joined.agg(count(lit(1)), sum(col("x") + col("y"))).head()
      val exp = dfA.join(dfB, "id")
        .agg(count(lit(1)), sum(col("x") + col("y"))).head()
      assert(got == exp, s"$got vs $exp")
    }
    val ra = GraftTable.read(spark, a)
    // group-by on the bucket column also avoids the exchange
    val aggPlan = ra.groupBy("id").agg(sum("x"))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$aggPlan")
  }

  test("point filters on the bucket column prune to one bucket") {
    val t = tmp()
    GraftTable.write(spark.range(0, 4000).toDF("id")
      .withColumn("v", col("id") * 2), t, "overwrite",
      bucketBy = Some((8, Seq("id"))))
    // DisableUnnecessaryBucketedScan turns the bucketed read off for a
    // bare filter (no distribution-requiring operator above it); bucket
    // PRUNING needs it on — the standard knob for point-probe workloads
    val prev = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = GraftTable.read(spark, t).filter(col("id") === 1234L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"an equality probe must touch one bucket:\n$plan")
      assert(q.collect().map(_.getLong(1)).toSeq == Seq(2468L))
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("mismatched append fails; bucketing survives delete/compact/update, degrades after cluster") {
    val t = tmp()
    GraftTable.write(spark.range(0, 2000).toDF("id")
      .withColumn("v", col("id") % 7), t, "overwrite",
      bucketBy = Some((4, Seq("id"))))
    intercept[IllegalArgumentException] {
      GraftTable.write(spark.range(0, 10).toDF("id")
        .withColumn("v", lit(0L)), t, "append", bucketBy = Some((8, Seq("id"))))
    }
    // DV delete keeps files in place: still bucketed, rows correct
    GraftTable.delete(spark, t, "id % 100 = 0")
    val afterDelete = GraftTable.read(spark, t)
    assert(afterDelete.count() == 1980)
    val p1 = afterDelete.groupBy("id").count()
      .queryExecution.executedPlan.toString
    // the DV mask side shuffles its own (tiny) addr set; the GROUPING
    // must not re-shuffle the bucketed id
    assert(!p1.contains("Exchange hashpartitioning(id"), p1)
    assert(p1.contains("Bucketed: true"), p1)
    // compaction PRESERVES the bucketed layout: rewrite groups re-route
    // to their buckets and outputs keep the suffix, so the zero-shuffle
    // property survives maintenance (deletions materialized)
    GraftTable.compactFiles(spark, t, targetRows = 1 << 20)
    val afterCompact = GraftTable.read(spark, t)
    assert(afterCompact.count() == 1980)
    val p2 = afterCompact.groupBy("id").count()
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange hashpartitioning(id") &&
      p2.contains("Bucketed: true"),
      s"compaction must keep the bucketed layout:\n$p2")
    assert(GraftTable.loadManifest(spark, t).fragments
      .forall(_.path.matches(".*frag-\\d+_\\d+\\.parquet")),
      "compacted fragments keep the bucket suffix")
    // UPDATE also preserves the layout (rewritten rows re-route by their
    // CURRENT values — even a bucket-column update lands correctly)
    GraftTable.update(spark, t, Map("v" -> "99"), Some("id = 7"))
    val afterUpdate = GraftTable.read(spark, t)
    assert(afterUpdate.count() == 1980)
    assert(afterUpdate.filter(col("id") === 7L).head().getLong(1) == 99L)
    val p3 = afterUpdate.groupBy("id").count()
      .queryExecution.executedPlan.toString
    assert(!p3.contains("Exchange hashpartitioning(id") &&
      p3.contains("Bucketed: true"),
      s"update must keep the bucketed layout:\n$p3")
    // cluster() re-sorts the layout — semantically incompatible with hash
    // buckets; its unsuffixed files DEGRADE the spec to an ordinary scan
    // (plan shuffles again), never an error
    GraftTable.cluster(spark, t, Seq("v"), targetRows = 4096)
    val afterCluster = GraftTable.read(spark, t)
    assert(afterCluster.count() == 1980)
    val p4 = afterCluster.groupBy("id").count()
      .queryExecution.executedPlan.toString
    assert(p4.contains("Exchange hashpartitioning(id"),
      s"post-cluster layout is unbucketed; the spec must drop:\n$p4")
    // unbucketed overwrite clears the stale keys
    GraftTable.write(spark.range(0, 5).toDF("id")
      .withColumn("v", lit(1L)), t, "overwrite")
    val m = GraftTable.loadManifest(spark, t)
    assert(!m.config.contains(GraftTable.BucketNumKey), m.config.toString)
  }

  test("plain overwrite inherits the bucket spec; unbucket=true opts out; dropped column degrades") {
    val t = tmp()
    GraftTable.write(spark.range(0, 2000).toDF("id")
      .withColumn("v", col("id") % 7), t, "overwrite",
      bucketBy = Some((4, Seq("id"))))
    // plain overwrite (no bucketBy) keeps the declared layout
    GraftTable.write(spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") % 3), t, "overwrite")
    val m1 = GraftTable.loadManifest(spark, t)
    assert(m1.config.get(GraftTable.BucketNumKey).contains("4"), m1.config.toString)
    assert(m1.fragments.forall(_.path.matches(".*frag-\\d+_\\d+\\.parquet")),
      m1.fragments.map(_.path).toString)
    val p = GraftTable.read(spark, t).groupBy("id").count()
      .queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true") &&
      !p.contains("Exchange hashpartitioning(id"), p)
    // explicit opt-out clears the keys and writes unsuffixed fragments
    GraftTable.write(spark.range(0, 10).toDF("id")
      .withColumn("v", lit(0L)), t, "overwrite", unbucket = true)
    val m2 = GraftTable.loadManifest(spark, t)
    assert(!m2.config.contains(GraftTable.BucketNumKey), m2.config.toString)
    // unbucket is overwrite-only and excludes bucketBy
    intercept[IllegalArgumentException] {
      GraftTable.write(spark.range(0, 1).toDF("id")
        .withColumn("v", lit(0L)), t, "append", unbucket = true)
    }
    // a bucketed table overwritten WITHOUT the bucket column can't keep
    // the layout — degrades to unbucketed, keys stripped, no error
    val t2 = tmp()
    GraftTable.write(spark.range(0, 100).toDF("id")
      .withColumn("v", lit(1L)), t2, "overwrite", bucketBy = Some((4, Seq("id"))))
    GraftTable.write(spark.range(0, 50).toDF("other")
      .withColumn("v", lit(2L)), t2, "overwrite")
    val m3 = GraftTable.loadManifest(spark, t2)
    assert(!m3.config.contains(GraftTable.BucketNumKey), m3.config.toString)
    assert(GraftTable.read(spark, t2).count() == 50)
  }

  test("bucketed compaction honors targetRows: oversized buckets split into single-bucket files") {
    val t = tmp()
    // two fragments so the 4-bucket table is a compaction candidate
    GraftTable.write(spark.range(0, 4000).toDF("id")
      .withColumn("v", col("id") % 7), t, "overwrite",
      bucketBy = Some((4, Seq("id"))))
    GraftTable.write(spark.range(4000, 8000).toDF("id")
      .withColumn("v", col("id") % 7), t, "append")
    // targetRows far below rows/bucket (~2000 post-merge): each bucket
    // must split into several files instead of one oversized file per
    // bucket (full compact: unconditional wholesale rewrite)
    GraftTable.compact(spark, t, targetRows = 500)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.length > 4,
      s"ceiling ignored: ${m.fragments.length} fragments for 8000 rows @ 500")
    assert(m.fragments.forall(_.rows <= 500),
      m.fragments.map(_.rows).mkString(","))
    assert(m.fragments.forall(_.path.matches(".*frag-\\d+_\\d+\\.parquet")),
      "split outputs keep the bucket suffix")
    // still a bucketed layout: zero-shuffle grouping and exact rows
    val r = GraftTable.read(spark, t)
    assert(r.count() == 8000)
    val p = r.groupBy("id").count().queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(id") &&
      p.contains("Bucketed: true"), p)
    // point probe still prunes to one bucket's files
    assert(r.filter(col("id") === 4321L).count() == 1)
  }
}
