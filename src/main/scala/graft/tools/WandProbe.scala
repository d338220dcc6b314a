package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Fts

/** Scratch harness: measure matchQuery vs matchQueryWand on a replicated
  * SKEWED corpus to locate the WAND crossover empirically. Not part of the
  * driver contract. */
object WandProbe {
  val Terms = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/wand_probe/base"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    // skewed corpus: 1 strong doc per 1024-block (high tf, short), the rest
    // weak (each term once, long filler) — the shape WAND exists for
    val filler = (0 until 40).map(i => s"filler$i").mkString(" ")
    val docs = (0L until 5000L).map { id =>
      val strong = id < 5L // all strong docs in block 0 — skew WAND can use
      val text =
        if (strong) Terms.map(t => (t + " ") * 8).mkString(" ")
        else Terms.mkString(" ") + " " + filler
      (id, text)
    }.toDF("doc_id", "text")
    Fts.buildIndex(docs, "doc_id", "text", base)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Fts.matchQuery(spark, base, Terms, 10).count() // warmup
    for (factor <- args.headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16, 64))) {
      val big = s"${System.getProperty("java.io.tmpdir")}/wand_probe/x$factor"
      val bp = new org.apache.hadoop.fs.Path(big)
      if (fs.exists(bp)) fs.delete(bp, true)
      val tRep = time(Fts.replicateIndex(spark, base, big, factor))
      var tm = 0.0; var tw = 0.0
      for (_ <- 1 to 2) tm = time(Fts.matchQuery(spark, big, Terms, 10).count())
      for (_ <- 1 to 2) tw = time(
        Fts.matchQueryWand(spark, big, Terms, 10, seedBlocks = 4, minPostings = 0L).count())
      val m = Fts.matchQuery(spark, big, Terms, 10).collect().map(_.toString).toSeq
      val w = Fts.matchQueryWand(spark, big, Terms, 10, seedBlocks = 4, minPostings = 0L)
        .collect().map(_.toString).toSeq
      val est = spark.read.parquet(s"$big/termstats")
        .filter(org.apache.spark.sql.functions.col("token").isin(Terms: _*))
        .agg(org.apache.spark.sql.functions.sum("df")).head().getDouble(0)
      println(f"PROBE x$factor%d est=$est%.0f rep=$tRep%.2f match=$tm%.3f wand=$tw%.3f equal=${m == w}")
    }
    spark.stop()
  }
}
