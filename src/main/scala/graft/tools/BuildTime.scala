package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: time index-build paths in isolation under a chosen
  * cpus/shuffle config (A/B experiments — not part of the driver contract).
  * Each rep writes to a fresh temp dir, so caches cannot leak across reps.
  * Usage: BuildTime <sfDir> <name1,name2,...> [repeats]
  * Names: fts, fts_stemmed, fts_stemmed_fi, fts_nopos, minhash_pairs,
  *        fts_merge_parts, fts_optimize. */
object BuildTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    def freshDir(): String =
      java.nio.file.Files.createTempDirectory("buildtime_").toString
    def ftsCfg(name: String): graft.operators.FtsConfig = name match {
      case "fts" => graft.operators.FtsConfig()
      case "fts_stemmed" => graft.operators.FtsConfig(stemming = true)
      case "fts_stemmed_fi" =>
        graft.operators.FtsConfig(stemming = true, language = "finnish")
      case "fts_nopos" => graft.operators.FtsConfig(storePositions = false)
    }
    def run(name: String): Unit = {
      val docs = graft.Tables.documents(spark, sfDir)
      name match {
        case n if n.startsWith("fts") && n != "fts_merge_parts" && n != "fts_optimize" =>
          graft.operators.Fts.buildIndex(docs, "doc_id", "text", freshDir(),
            config = ftsCfg(n))
        case "minhash_pairs" =>
          graft.operators.Dedup.minhashNearDupPairs(
            docs.withColumn("sh",
              graft.operators.TextAnalysis.shingleSet(
                org.apache.spark.sql.functions.col("text"), 3)),
            "doc_id", "sh", 0.8).count()
        case "fts_optimize" =>
          val dir = freshDir()
          graft.operators.Fts.buildIndex(
            docs.filter("doc_id % 2 = 0"), "doc_id", "text", dir)
          graft.operators.Fts.optimizeIndex(
            docs.filter("doc_id % 2 = 1"), "doc_id", "text", dir)
        case "fts_merge_parts" =>
          // two staged doc-disjoint parts + the merge path (ADVICE r16:
          // the usage string advertised this name with no case behind it)
          val tbl = freshDir()
          graft.format.GraftTable.write(docs
            .repartitionByRange(4, org.apache.spark.sql.functions.col("doc_id")),
            tbl, "overwrite")
          val m = graft.format.GraftTable.loadManifest(spark, tbl)
          val ids = m.fragments.map(_.id).sorted
          val (idsA, idsB) = ids.splitAt(ids.length / 2)
          val uuid = java.util.UUID.randomUUID().toString.take(8)
          graft.operators.Fts.buildPartForTable(spark, tbl, "doc_id", "text",
            uuid, 0, idsA)
          graft.operators.Fts.buildPartForTable(spark, tbl, "doc_id", "text",
            uuid, 1, idsB)
          graft.operators.Fts.mergePartsForTable(spark, tbl, "doc_id", "text", uuid)
        case "hnsw" =>
          graft.operators.HnswIndex.build(
            graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
            freshDir(), nlist = 8)
        case "hnsw_graph_cpu" =>
          // driver-local graph build over the same vectors: isolates the
          // in-memory insert loop from the Spark plumbing around it
          val vecs = graft.Tables.embeddings(spark, sfDir)
            .select("vec_id", "embedding").collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          val per = vecs.grouped(math.max(1, vecs.length / 8)).toSeq
          per.foreach(g => graft.operators.HnswIndex.buildGraphProbe(g, 16, 64))
      }
    }
    for (n <- names; r <- 1 to reps) {
      System.gc()
      val t0 = System.nanoTime()
      run(n)
      println(f"BTIME cpus=$cpus shuffle=$shuffle $n run$r ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
