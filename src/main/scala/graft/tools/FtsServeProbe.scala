package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: find the last-ulp divergence between the batched boolean
  * scorer and the driver-side serve formula. */
object FtsServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("fts_probe_").toString
    graft.operators.Fts.buildIndex(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", dir)
    // batched per-posting pieces for doc 496 and the two tokens
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("token").isin("table", "vector") && col("doc_id").isin(496L, 11L))
      .select("token", "doc_id", "tf").collect()
    val ts = spark.read.parquet(s"$dir/termstats")
      .filter(col("token").isin("table", "vector")).collect()
    val ds = spark.read.parquet(s"$dir/docstats")
      .filter(col("doc_id").isin(496L, 11L)).collect()
    val meta = spark.read.parquet(s"$dir/meta").collect()
    println(s"post=${post.mkString(";")}")
    println(s"ts=${ts.mkString(";")}")
    println(s"ds=${ds.mkString(";")}")
    println(s"meta=${meta.mkString(";")}")
    // batched term_score rows (through the real Column expression)
    val b = graft.operators.Fts.booleanQuery(spark, dir,
      Seq("table"), Seq("vector"), Seq("slow"), 600)
      .filter(col("doc_id").isin(496L, 11L)).collect()
    println(s"batched=${b.map(r => (r.getLong(0), java.lang.Double.toHexString(r.getDouble(1)))).mkString(";")}")
    val m = graft.operators.Fts.matchQuery(spark, dir, Seq("table", "vector"), 600)
      .filter(col("doc_id").isin(496L, 11L)).collect()
    println(s"match  =${m.map(r => (r.getLong(0), java.lang.Double.toHexString(r.getDouble(1)))).mkString(";")}")
    graft.operators.Fts.serveUnpersist(dir)
    val s = graft.operators.Fts.serveLocal(spark, dir, Seq("table", "vector"), 600)
      .filter(e => e._1 == 496L || e._1 == 11L)
    println(s"serve  =${s.map(e => (e._1, java.lang.Double.toHexString(e._2))).mkString(";")}")
    // per-term comparison: replicate scored()'s expression vs the driver math
    val n = 500.0; val avgdl = spark.read.parquet(s"$dir/meta")
      .head().getDouble(1)
    println(s"avgdl bits=${java.lang.Double.toHexString(avgdl)}")
    val pieces = spark.read.parquet(s"$dir/postings")
      .filter(col("token").isin("table", "vector") && col("doc_id").isin(496L, 11L))
      .join(spark.read.parquet(s"$dir/termstats"), "token")
      .join(spark.read.parquet(s"$dir/docstats"), "doc_id")
      .withColumn("term_score",
        log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (1.2 + 1)) /
          (col("tf") + lit(1.2) * (lit(1 - 0.75) + lit(0.75) * col("dl") / lit(avgdl))))
      .select("token", "doc_id", "tf", "df", "dl", "term_score").collect()
    pieces.foreach { r =>
      val (tok, doc, tf, df, dl, sc) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val mine = idf * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
      println(s"$tok/$doc spark=${java.lang.Double.toHexString(sc)} mine=${java.lang.Double.toHexString(mine)}")
    }
    spark.stop()
  }
}
