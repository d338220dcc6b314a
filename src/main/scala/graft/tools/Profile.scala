package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Dev utility: time labeled build/query phases of the heavy operators.
  * Usage: runMain graft.tools.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup
    Tables.documents(spark, sfDir).count()

    val tmp = java.nio.file.Files.createTempDirectory("prof_").toString
    // sub-phase breakdown of the FTS build
    locally {
      import org.apache.spark.sql.functions._
      val df = Tables.documents(spark, sfDir)
      val tokenized = df.select(col("doc_id"),
        graft.operators.Fts.tokenize(col("text")).as("tk")).persist()
      time("fts.phase.tokenize+count") { tokenized.count() }
      val postings = tokenized
        .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "token")))
        .groupBy(col("token"), col("doc_id"))
        .agg(count(lit(1)).cast("double").as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"))
        .persist()
      time("fts.phase.postings-agg") { postings.count() }
      time("fts.phase.postings-write") {
        postings.repartitionByRange(col("token"))
          .write.mode("overwrite").parquet(s"$tmp/p1")
      }
      time("fts.phase.postings-write-hash8") {
        postings.repartition(8, col("token")).sortWithinPartitions(col("token"))
          .write.mode("overwrite").parquet(s"$tmp/p2")
      }
      time("fts.phase.termstats") {
        postings.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
          .repartitionByRange(col("token")).write.mode("overwrite").parquet(s"$tmp/t1")
      }
      tokenized.unpersist(); postings.unpersist()
    }
    time("fts.buildIndex") {
      graft.operators.Fts.buildIndex(
        Tables.documents(spark, sfDir), "doc_id", "text", s"$tmp/fts")
    }
    time("fts.matchQuery") {
      graft.operators.Fts.matchQuery(spark, s"$tmp/fts", Seq("spark", "vector"), 20).count()
    }
    time("fts.booleanQuery") {
      graft.operators.Fts.booleanQuery(spark, s"$tmp/fts",
        must = Seq("table"), should = Seq("vector"), mustNot = Seq("slow"), k = 20).count()
    }
    val emb = Tables.embeddings(spark, sfDir)
    time("hnsw.build") {
      graft.operators.HnswIndex.build(
        emb.select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding")),
        "vec_id", "embedding", s"$tmp/hnsw", nlist = 4)
    }
    val q = emb.filter("vec_id = 0").select("embedding").head().getSeq[Float](0).toArray
    time("hnsw.search") {
      graft.operators.HnswIndex.search(spark, s"$tmp/hnsw", q, 10, 4).count()
    }
    spark.stop()
  }
}
