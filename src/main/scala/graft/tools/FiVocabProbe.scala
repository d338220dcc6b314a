package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which corpus tokens the Finnish stemmer rewrites, per SF —
  * the q_fts_stemmed_fi closed-vocabulary oracle mapping source. */
object FiVocabProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new StringBuilder
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val toks = graft.Tables.documents(spark, d)
        .select(explode(graft.operators.Fts.tokenize(col("text"))).as("t"))
        .distinct().collect().map(_.getString(0))
      out.append(s"== $d (${toks.length} distinct)\n")
      toks.sorted.foreach { t =>
        val fi = graft.functions.SnowballStemmer.finnish(t)
        if (fi != t) out.append(s"$t -> $fi\n")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/fivocab.txt"),
      out.toString.getBytes("UTF-8"))
    println("wrote /tmp/fivocab.txt")
    spark.stop()
  }
}
