package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness (r17): how much of the minhash-family cost is the
  * shingleSet higher-order pipeline itself? Times the shingle pass alone
  * (noop sink) at cluster width. Usage: runMain graft.tools.ShingleProbe [sfDir] */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val TA = graft.operators.TextAnalysis
    val docs = TA.spreadForCompute(
      graft.Tables.documents(spark, sfDir), col("doc_id")).localCheckpoint()
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"SHPROBE $label run$r ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    time("tokens_only")(docs.select(split(col("text"), " ").as("t")))
    time("shingleSet")(docs.select(TA.shingleSet(col("text"), 3).as("sh")))
    time("shingleSet+sig")(docs.select(
      graft.functions.TextHashFunctions.minhashSignature(
        TA.shingleSet(col("text"), 3), 64).as("sig")))
    time("shingleSet+jaccard_self")(docs.select(
      TA.jaccard(TA.shingleSet(col("text"), 3),
        TA.shingleSet(col("text"), 3)).as("j")))
    spark.stop()
  }
}
