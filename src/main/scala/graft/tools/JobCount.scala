package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch harness: run named SparkEntry queries once and report Spark
  * job/stage/task counts plus summed task time vs wall time — tells
  * scheduling-bound from compute-bound at bench scale (guide §1).
  * Usage: JobCount <sfDir> <q1,q2,...> [reps] */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      }
    })
    // warmup
    locally {
      import org.apache.spark.sql.functions._
      val li = graft.Tables.lineitem(spark, sfDir)
      li.filter("l_quantity > 0").count()
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).collect()
    }
    for (n <- names; r <- 1 to reps) {
      System.gc()
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"JCOUNT $n run$r wall=${wall}%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskTime=${taskNanos.get / 1e9}%.3f")
    }
    spark.stop()
  }
}
