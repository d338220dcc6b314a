package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: time individual SparkEntry queries under a chosen
  * cpus/shuffle config (A/B experiments — not part of the driver
  * contract). Usage: QueryTime <sfDir> <q1,q2,...> [repeats]. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench
    locally {
      import org.apache.spark.sql.functions._
      val li = graft.Tables.lineitem(spark, sfDir)
      li.filter("l_quantity > 0").count()
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).collect()
    }
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"QTIME cpus=$cpus shuffle=$shuffle $n run$r ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
