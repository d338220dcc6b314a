package graft.tools

import org.apache.spark.sql.SparkSession
import graft.format.{GraftExtensions, GraftTable}

/** End-to-end demo of the graft format through the public surface:
  * write → delete (DVs) → format("graft") read + SQL with the extensions
  * installed → time travel. `runMain graft.tools.Demo`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t = java.nio.file.Files.createTempDirectory("graft_demo_").toString + "/events"
    Seq((1L, "click", 2.0), (2L, "view", 1.0), (3L, "click", 5.0),
        (4L, "purchase", 9.0), (5L, "view", 3.0))
      .toDF("id", "kind", "value")
      .write.format("graft").save(t)
    GraftTable.delete(spark, t, "kind = 'view'")

    spark.read.format("graft").load(t).createOrReplaceTempView("events")
    println("== after DV delete, via format(\"graft\") + SQL ==")
    spark.sql("SELECT kind, count(*) n, sum(value) total FROM events GROUP BY kind ORDER BY kind")
      .show()
    println("== time travel to v1 ==")
    spark.read.format("graft").option("versionAsOf", "1").load(t)
      .groupBy("kind").count().orderBy("kind").show()

    // scalar-index auto-rewrite: fresh btree on a clean table
    val t2 = java.nio.file.Files.createTempDirectory("graft_demo_").toString + "/ids"
    spark.range(0, 1000).toDF("id").write.format("graft").save(t2)
    graft.index.ScalarIndex.buildBtree(spark, t2, "id", s"$t2/_indices")
    val q = spark.read.format("graft").load(t2).filter($"id".between(10, 15))
    println("== index-rewritten plan (expect LeftSemi mask join) ==")
    println(q.queryExecution.optimizedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Relation") || l.contains("Filter"))
      .mkString("\n"))
    println("== result ==")
    q.orderBy("id").show()

    // late materialization: filter on the narrow column, fetch wide rows
    val t3 = java.nio.file.Files.createTempDirectory("graft_demo_").toString + "/docs"
    spark.range(0, 1000).toDF("id")
      .withColumn("wide_payload", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("x" * 500), $"id"))
      .repartitionByRange(4, $"id")
      .write.format("graft").save(t3)
    val late = GraftTable.readLate(spark, t3, "id BETWEEN 900 AND 905", Seq("id"))
    println("== readLate result (wide col fetched only for 1 of 4 fragments) ==")
    late.select($"id", org.apache.spark.sql.functions.length($"wide_payload").as("payload_len"))
      .orderBy("id").show()

    println("== describe (metadata-only table statistics) ==")
    GraftTable.describe(spark, t3).show(false)

    // round 2: no-rewrite schema evolution + branches + partial compaction
    println("== addColumnsFiles: new column, fragment files untouched ==")
    GraftTable.addColumnsFiles(spark, t, Seq("value_sq" -> "value * value"))
    spark.read.format("graft").load(t).orderBy("id").show()

    println("== branches: dev fork appends without touching main ==")
    GraftTable.createBranch(spark, t, "dev")
    GraftTable.writeBranch(Seq((99L, "test", 0.0, 0.0))
      .toDF("id", "kind", "value", "value_sq"), t, "dev")
    println(s"main rows: ${GraftTable.read(spark, t).count()}  " +
      s"dev rows: ${GraftTable.readBranch(spark, t, "dev").count()}")

    println("== _rowaddr point lookup: plan prunes to addressed fragments ==")
    val addr = GraftTable.read(spark, t3, withRowAddr = true)
      .filter($"id" === 500L).select("_rowaddr").head().getLong(0)
    val pt = GraftTable.read(spark, t3, withRowAddr = true).filter($"_rowaddr" === addr)
    val prunedFrags = pt.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            g: graft.format.GraftFileIndex, _, _, _, _, _), _, _, _, _)
          if g.addrPruned => g.manifest.fragments.length
    }
    println(s"fragments scanned: ${prunedFrags.headOption.getOrElse(-1)} of 4")
    pt.select("id").show()

    println("== partial compaction: only indebted fragments rewritten ==")
    GraftTable.delete(spark, t3, "id < 250") // fragment 0 fully deleted
    val before = GraftTable.loadManifest(spark, t3).fragments.map(_.id).toSet
    GraftTable.compactFiles(spark, t3, targetRows = 500)
    val after = GraftTable.loadManifest(spark, t3).fragments.map(_.id).toSet
    println(s"kept fragment ids: ${(before intersect after).toSeq.sorted.mkString(",")}; " +
      s"rows: ${GraftTable.countRows(spark, t3)}")

    println("== pure-SQL surface: CREATE / INSERT / UPDATE / MERGE / time travel ==")
    val wh = java.nio.file.Files.createTempDirectory("graft_demo_wh_").toString
    spark.conf.set("spark.sql.catalog.demo", "graft.format.GraftCatalog")
    spark.conf.set("spark.sql.catalog.demo.warehouse", wh)
    spark.sql("CREATE NAMESPACE demo.db")
    spark.sql("CREATE TABLE demo.db.users (id BIGINT, name STRING) USING graft")
    spark.sql("INSERT INTO demo.db.users VALUES (1, 'ada'), (2, 'bob'), (3, 'eve')")
    spark.sql("UPDATE demo.db.users SET name = upper(name) WHERE id = 2")
    Seq((3L, "EVE"), (4L, "dan")).toDF("id", "name").createOrReplaceTempView("updates")
    spark.sql("""MERGE INTO demo.db.users t USING updates u ON t.id = u.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("DELETE FROM demo.db.users WHERE id = 1")
    spark.sql("SELECT * FROM demo.db.users ORDER BY id").show()
    println("-- VERSION AS OF 2 (first insert) --")
    spark.sql("SELECT * FROM demo.db.users VERSION AS OF 2 ORDER BY id").show()

    println("== maintenance procedures: stats / history / validate ==")
    spark.sql("CALL demo.system.stats(table => 'db.users')").show(false)
    spark.sql("CALL demo.system.history(table => 'db.users')")
      .select("version", "operation", "num_rows", "num_deleted").show(false)
    println(s"validate issues: " +
      spark.sql("CALL demo.system.validate(table => 'db.users')").count())

    println("== shallow clone: fork to a new path, mutate without touching source ==")
    val cl = java.nio.file.Files.createTempDirectory("graft_demo_").toString + "/clone"
    GraftTable.shallowClone(spark, t3, cl)
    GraftTable.delete(spark, cl, "id >= 600")
    println(s"source rows: ${GraftTable.countRows(spark, t3)}  " +
      s"clone rows: ${GraftTable.countRows(spark, cl)}")

    println("== search from pure SQL: create_index + fts_search / knn_search ==")
    spark.sql("CREATE TABLE demo.db.docs (id BIGINT, vec ARRAY<FLOAT>, body STRING) USING graft")
    spark.sql("INSERT INTO demo.db.docs SELECT id, " +
      "array(CAST(id % 5 AS FLOAT), CAST(id % 3 AS FLOAT)), " +
      "CASE WHEN id = 7 THEN 'rare needle token' ELSE concat('common text ', id) END " +
      "FROM range(0, 100)")
    spark.sql("CALL demo.system.create_index(table => 'db.docs', `column` => 'vec', " +
      "index_type => 'IVF_FLAT', nlist => 2)")
    spark.sql("CALL demo.system.create_index(table => 'db.docs', `column` => 'body', " +
      "index_type => 'FTS')")
    spark.sql("CALL demo.system.fts_search(table => 'db.docs', name => 'fts_body', " +
      "query => 'needle', k => 3)").show(false)
    spark.sql("CALL demo.system.knn_search(table => 'db.docs', name => 'ivf_vec', " +
      "query => array(1.0D, 1.0D), k => 3, filter => 'id % 2 = 1')").show(false)

    println("== layout clustering: zonemaps become selective ==")
    spark.sql("CALL demo.system.cluster(table => 'db.docs', columns => 'id', " +
      "target_rows => 32)").show(false)
    spark.stop()
  }
}
