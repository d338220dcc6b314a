package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness (r17): dump before/after `explain("formatted")` pairs
  * for the BUILD-internal plans this round reshaped — the r16 "before"
  * shapes are reconstructed inline (the committed code has already
  * changed), exactly like plans/r16 did. Usage:
  *   runMain graft.tools.R17Plans <sfDir> <outDir>
  */
object R17Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r17")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name (${plan.count(_ == '\n')} lines)")
    }

    val A = graft.format.GraftTable.RowAddrCol
    // ---- ngram index build: r16 shape (HOF trigram pipeline + range
    // repartition that SAMPLES the child) vs r17 (TrigramSet + hash)
    val tbl = java.nio.file.Files.createTempDirectory("r17plans_tbl_").toString
    graft.format.GraftTable.write(
      graft.Tables.documents(spark, sfDir)
        .repartitionByRange(8, col("doc_id")), tbl, "overwrite")
    val scan = graft.format.GraftTable.read(spark, tbl, withRowAddr = true)
    val oldTrigrams = when(length(lower(col("text"))) >= 3,
      array_distinct(transform(sequence(lit(1), length(lower(col("text"))) - 2),
        i => lower(col("text")).substr(i, lit(3)))))
      .otherwise(typedLit(Array.empty[String]))
    dump("buildngram_postings_before",
      scan.select(col(A), explode(oldTrigrams).as("gram"))
        .repartitionByRange(8, col("gram"))
        .sortWithinPartitions(col("gram")))
    val newTrigrams = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.index.TrigramSet(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(lower(col("text")))))
    dump("buildngram_postings_after",
      scan.select(col(A), explode(newTrigrams).as("gram"))
        .repartition(8, col("gram"))
        .sortWithinPartitions(col("gram")))

    // ---- fts optimize termstats: r16 O(corpus) recompute from the full
    // merged postings vs r17 O(delta) stored∪delta merge
    val idx = java.nio.file.Files.createTempDirectory("r17plans_fts_").toString
    val docs = graft.Tables.documents(spark, sfDir)
    graft.operators.Fts.buildIndex(
      docs.filter("doc_id % 2 = 0"), "doc_id", "text", idx)
    val deltaDf = docs.filter("doc_id % 2 = 1")
      .select(col("doc_id"), graft.operators.Fts.tokenize(col("text")).as("tk"))
      .select(col("doc_id"), explode(col("tk")).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("tf"))
    dump("fts_optimize_termstats_before",
      spark.read.parquet(s"$idx/postings")
        .groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
        .repartition(2, col("token")).sortWithinPartitions(col("token")))
    dump("fts_optimize_termstats_after",
      spark.read.parquet(s"$idx/termstats").select(col("token"), col("df"))
        .unionByName(deltaDf.groupBy(col("token"))
          .agg(count(lit(1)).cast("double").as("df")))
        .groupBy(col("token")).agg(sum(col("df")).as("df"))
        .repartition(2, col("token")).sortWithinPartitions(col("token")))
    spark.stop()
  }
}
