package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: does the packed-key rewrite fire for the SF1 Q1 anchor, and
  * what does it buy? Times q1 through the anchor session with the conf on
  * vs off (best-of-7 after 3 warmups, the anchor protocol). */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TpchAnchor.ensureTable(spark)
    val sess = TpchAnchor.anchorSession(spark)
    def bestOf(fn: () => Unit): Double = {
      for (_ <- 1 to 3) fn()
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    sess.conf.set(graft.plans.GraftPackedKeyAggRule.ConfKey,
      "l_returnflag,l_linestatus")
    val dfOn = TpchAnchor.q1(spark, TpchAnchor.TableDir)
    val planOn = dfOn.queryExecution.optimizedPlan.toString
    println(s"packed_in_plan=${planOn.contains("pack_string_key")}")
    def setOn(on: Boolean): Unit = sess.conf.set(
      graft.plans.GraftPackedKeyAggRule.ConfKey,
      if (on) "l_returnflag,l_linestatus" else "")
    // JIT both variants fully before any measurement, then interleave
    for (_ <- 1 to 5; on <- Seq(true, false)) {
      setOn(on); TpchAnchor.q1(spark, TpchAnchor.TableDir).collect()
    }
    val cycles = (1 to 4).map { _ =>
      setOn(true)
      val on = bestOf(() => { TpchAnchor.q1(spark, TpchAnchor.TableDir).collect(); () })
      setOn(false)
      val off = bestOf(() => { TpchAnchor.q1(spark, TpchAnchor.TableDir).collect(); () })
      (on, off)
    }
    cycles.zipWithIndex.foreach { case ((on, off), i) =>
      println(f"""{"cycle":${i + 1},"pack_on":$on%.4f,"pack_off":$off%.4f}""")
    }
    println(f"""{"best_on":${cycles.map(_._1).min}%.4f,"best_off":${cycles.map(_._2).min}%.4f}""")
    spark.stop()
  }
}
