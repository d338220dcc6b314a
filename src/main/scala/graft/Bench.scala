package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A warmup query first absorbs JVM/Spark/codegen startup so per-query
  * numbers measure the operators, not session bring-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle.partitions: bounded below cpu count — at bench scale (sf≤1)
    // tasks are tiny and 32-way shuffles lose more to scheduling/GC than
    // they gain in parallelism (measured: 16 beats 32 by ~10% wall-clock on
    // a 32-core box). AQE coalesces further at runtime. On a real cluster
    // this knob is per-job, sized to data volume.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(math.min(cpus.toInt, 16), 8).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + whole-stage-codegen paths (scan/filter/agg/join/sort) +
    // parquet footer caches, so per-query numbers measure operators, not JIT
    {
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(spark, sfDir)
      li.filter("l_quantity > 0").count()
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")), avg(col("l_extendedprice")))
        .orderBy(col("l_returnflag")).collect()
      li.join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).count().collect()
    }

    // one-time index builds first, timed as their own build_* entries —
    // queries that reuse the cached index then measure query cost only. A
    // failed build/query records a -1 sentinel (never a normal-looking
    // duration) and bumps the error count, so a query silently rebuilding a
    // failed index inside its own timing is visible in the artifact.
    var errors = 0
    val buildResults = (queries.Vector.builds ++ queries.FtsQueries.builds)
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir); true } catch { case _: Throwable => errors += 1; false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => errors += 1; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // seconds rounded to 3 decimals: keeps the single JSON line well under
    // the driver's ~2 KB stdout-tail parse window (full-precision doubles
    // overflowed it in r2/r3 and the artifact recorded "parsed": null)
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = (buildResults ++ results).map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = (buildResults ++ results).map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":$errors,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
