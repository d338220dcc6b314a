package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused gate timer for same-box A/B adjudication (r15, VERDICT r14 #1):
  * times the named SparkEntry gates with Bench's exact protocol (deepClean
  * between reps, sf dir from SPARK_GRAFT_SF_DIR) and prints one JSON line
  * with the per-gate sorted rep spreads. Copy this file into another
  * checkout to time the SAME gates under different code on the SAME box —
  * the drift-free comparison bench_compare can only approximate across
  * sessions.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.GateAB gate1 gate2 ...
  * Env: SPARK_GRAFT_BENCH_REPS (default 3).
  */
object GateAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.max(math.min(cpus.toInt, 16), 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench's warmup: JIT + codegen + footer caches
    locally {
      import org.apache.spark.sql.functions._
      val li = graft.Tables.lineitem(spark, sfDir)
      li.filter("l_quantity > 0").count()
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).collect()
    }
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      graft.operators.HnswIndex.unpersistAll()
      System.gc()
    }
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val gates = if (args.nonEmpty) args.toSeq
      else Seq("q_ann_defer", "q_ann_remap", "q_ann_prefilter_combined",
        "q_ann_hnsw_after_compact")
    val out = gates.map { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown gate $name"))
      val runs = (1 to reps).map { _ =>
        deepClean()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> runs
    }
    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = out.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    println(s"""{"gate_ab":$json,"reps":$reps,"load_avg":${r3(loadAvg)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
