package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.index.ScalarIndex

class ScalarIndexRuleSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // reuse the extension session machinery from GraftExtensionsSpec
  private lazy val extSpark = {
    TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-idxrule-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.format.GraftExtensions)
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(TestSpark.spark)
    org.apache.spark.sql.SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  private def freshIndexed(): String = {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    val df = TestSpark.spark.range(0, 500).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10)))
    GraftTable.write(df, t, "overwrite")
    ScalarIndex.buildBtree(TestSpark.spark, t, "id", s"$t/_indices")
    t
  }

  test("fresh index: filter is rewritten to mask semi-join, result exact") {
    val t = freshIndexed()
    val q = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan) // mask applied
    assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == (100L to 110L))
  }

  test("use_scalar_index=false disables the rewrite (reference escape hatch)") {
    val t = freshIndexed()
    extSpark.conf.set("graft.scan.use_scalar_index", "false")
    try {
      val q = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("LeftSemi"), s"no mask with the rule disabled:\n$plan")
      assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == (100L to 110L))
    } finally extSpark.conf.unset("graft.scan.use_scalar_index")
    // back on: the mask returns
    val q2 = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    assert(q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("use_stats=false disables zonemap pruning (reference debugging knob)") {
    val s = TestSpark.spark
    val t = Files.createTempDirectory("graft_ir_us_").toString + "/t"
    GraftTable.write(s.range(0, 800).toDF("id")
      .repartitionByRange(8, col("id")), t, "overwrite")
    val pruned = graft.format.ScanAnalyze.analyze(s, t, Some("id >= 700")).toMap
    assert(pruned("fragments_scanned") < pruned("fragments_total"), pruned.toString)
    s.conf.set("graft.scan.use_stats", "false")
    try {
      val all = graft.format.ScanAnalyze.analyze(s, t, Some("id >= 700")).toMap
      assert(all("fragments_scanned") == all("fragments_total"),
        s"stats off must scan everything: $all")
      assert(all("rows_returned") == pruned("rows_returned"), "same result either way")
    } finally s.conf.unset("graft.scan.use_stats")
  }

  test("append after build: partial coverage — mask over indexed fragments, flat union over fresh") {
    val t = freshIndexed()
    GraftTable.write(TestSpark.spark.range(500, 600).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10))), t, "append")
    val q = GraftTable.read(extSpark, t).filter(col("id") >= 450)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan) // indexed fragments still masked
    assert(plan.contains("Union"), plan)    // fresh fragments scanned flat
    assert(q.count() == 150) // 450..499 via index + 500..599 via flat branch
  }

  test("optimizeBtree re-freshens: append then optimize — full mask, no flat union") {
    val t = freshIndexed()
    GraftTable.write(TestSpark.spark.range(500, 600).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10))), t, "append")
    assert(ScalarIndex.optimizeBtree(TestSpark.spark, t, "id", s"$t/_indices") == 100L)
    val q = GraftTable.read(extSpark, t).filter(col("id") >= 450)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("Union"), plan) // delta indexed — no flat branch
    assert(q.count() == 150)
    assert(ScalarIndex.optimizeBtree(TestSpark.spark, t, "id", s"$t/_indices") == 0L)
  }

  test("compacted away: index is stale, rule does not apply, result exact") {
    val t = freshIndexed()
    GraftTable.delete(TestSpark.spark, t, "id < 250")
    GraftTable.compact(TestSpark.spark, t) // indexed fragments replaced
    val q = GraftTable.read(extSpark, t).filter(col("id").between(300, 310))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LeftSemi"), plan)
    assert(q.count() == 11)
  }

  test("DV snapshot: mask semi-join composes with the DV anti-join") {
    val t = freshIndexed()
    GraftTable.delete(TestSpark.spark, t, "id = 105")
    val q = extSpark.read.format("graft").load(t).filter(col("id").between(100, 110))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      ((100L to 110L).filterNot(_ == 105L)))
  }

  test("supplemental-column snapshot: index rewrite keeps merged values") {
    val t = freshIndexed()
    GraftTable.addColumnsFiles(TestSpark.spark, t, Seq("id2" -> "id * 2"))
    // index built at v1 covers all fragments (add_columns adds none)
    val q = extSpark.read.format("graft").load(t).filter(col("id").between(10, 12))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(q.select("id2").collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 22L, 24L))
  }

  test("_rowaddr point lookup prunes the scan to addressed fragments") {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    GraftTable.write(TestSpark.spark.range(0, 1000).toDF("id").repartition(8), t, "overwrite")
    val addrs = GraftTable.read(extSpark, t, withRowAddr = true)
      .filter(col("id").isin(3L, 700L)).select("_rowaddr")
      .collect().map(_.getLong(0)).toSeq
    val q = GraftTable.read(extSpark, t, withRowAddr = true)
      .filter(col("_rowaddr").isin(addrs: _*))
    val gfis = q.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            g: graft.format.GraftFileIndex, _, _, _, _, _), _, _, _, _) => g
    }
    assert(gfis.exists(g => g.addrPruned &&
      g.manifest.fragments.length == addrs.map(_ >>> 32).distinct.length),
      q.queryExecution.optimizedPlan.toString)
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 700L))
  }

  test("_rowaddr equality lookup prunes to one fragment") {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    GraftTable.write(TestSpark.spark.range(0, 1000).toDF("id").repartition(8), t, "overwrite")
    val addr = GraftTable.read(extSpark, t, withRowAddr = true)
      .filter(col("id") === 42L).select("_rowaddr").collect().head.getLong(0)
    val q = GraftTable.read(extSpark, t, withRowAddr = true)
      .filter(col("_rowaddr") === addr)
    val gfis = q.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            g: graft.format.GraftFileIndex, _, _, _, _, _), _, _, _, _) => g
    }
    assert(gfis.exists(g => g.addrPruned && g.manifest.fragments.length == 1),
      q.queryExecution.optimizedPlan.toString)
    assert(q.select("id").collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("label-list rule: array_contains conjunction rewritten to mask semi-join") {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    val df = TestSpark.spark.range(0, 300).toDF("id")
      .withColumn("tags", filter(
        typedlit(Seq("even", "div3")),
        x => (x === "even" && pmod(col("id"), lit(2)) === 0) ||
             (x === "div3" && pmod(col("id"), lit(3)) === 0)))
    GraftTable.write(df, t, "overwrite")
    ScalarIndex.buildLabelList(TestSpark.spark, t, "tags", s"$t/_indices")
    val q = GraftTable.read(extSpark, t)
      .filter(array_contains(col("tags"), "even") && array_contains(col("tags"), "div3"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(q.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 300L).filter(_ % 6 == 0).toSet)
  }

  test("label-list rule: arrays_overlap any-of semantics, stale after compaction") {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    val df = TestSpark.spark.range(0, 300).toDF("id")
      .withColumn("tags", when(pmod(col("id"), lit(3)) === 0, typedlit(Seq("a", "b")))
        .otherwise(typedlit(Seq("c"))))
    GraftTable.write(df, t, "overwrite")
    ScalarIndex.buildLabelList(TestSpark.spark, t, "tags", s"$t/_indices")
    val q = GraftTable.read(extSpark, t)
      .filter(arrays_overlap(col("tags"), typedlit(Seq("a", "zzz"))))
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.count() == 100)
    // compaction rewrites fragments → index stale → rule must not apply
    GraftTable.delete(TestSpark.spark, t, "id < 30")
    GraftTable.compact(TestSpark.spark, t)
    val q2 = GraftTable.read(extSpark, t)
      .filter(arrays_overlap(col("tags"), typedlit(Seq("a", "zzz"))))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q2.count() == 90)
  }

  test("json rule: get_json_object filter rewritten to mask semi-join, exact") {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    val df = TestSpark.spark.range(0, 400).toDF("id")
      .withColumn("props", concat(lit("""{"k": """), col("id") % 40, lit("}")))
    GraftTable.write(df, t, "overwrite")
    ScalarIndex.buildJson(TestSpark.spark, t, "props", "$.k", s"$t/_indices")
    val q = GraftTable.read(extSpark, t)
      .filter(get_json_object(col("props"), "$.k") === "13")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(q.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 400L).filter(_ % 40 == 13).toSet)
    // appended fragments scan flat (partial coverage) but stay exact
    GraftTable.write(TestSpark.spark.range(400, 450).toDF("id")
      .withColumn("props", concat(lit("""{"k": """), col("id") % 40, lit("}"))),
      t, "append")
    val q2 = GraftTable.read(extSpark, t)
      .filter(get_json_object(col("props"), "$.k") === "13")
    val plan2 = q2.queryExecution.optimizedPlan.toString
    assert(plan2.contains("LeftSemi") && plan2.contains("Union"), plan2)
    assert(q2.count() == (0L until 450L).count(_ % 40 == 13))
  }

  test("ngram rule: contains conjunct rewritten to trigram mask semi-join, exact") {
    val t = Files.createTempDirectory("graft_ngr_").toString + "/t"
    val words = Seq("sparkling", "vectorized", "tabular", "indexing", "hashing")
    val df = TestSpark.spark.range(0, 500).toDF("id")
      .withColumn("txt", concat(lit("doc "),
        element_at(typedLit(words), (pmod(col("id"), lit(5)) + 1).cast("int")),
        lit(" payload")))
    GraftTable.write(df.repartition(4, col("id")), t, "overwrite")
    ScalarIndex.buildNgram(TestSpark.spark, t, "txt", s"$t/_indices")
    val q = GraftTable.read(extSpark, t).filter(col("txt").contains("vector"))
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.count() == 100)
    assert(q.select("id").collect().map(_.getLong(0)).forall(_ % 5 == 1))
    // needle under 3 chars has no trigram: no rewrite, still exact
    val q2 = GraftTable.read(extSpark, t).filter(col("txt").contains("iz"))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q2.count() == 100)
  }

  test("non-sargable filter untouched") {
    val t = freshIndexed()
    val q = GraftTable.read(extSpark, t).filter(col("id") + col("grp") > 100)
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.count() == GraftTable.read(TestSpark.spark, t)
      .filter(col("id") + col("grp") > 100).count())
  }

  test("refine keeps conjuncts the index does not cover") {
    val t = freshIndexed()
    val q = GraftTable.read(extSpark, t)
      .filter(col("id").between(100, 120) && col("grp") === 5)
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(105L, 115L))
  }

  test("index inventory is memoized: repeated queries do zero extra FS probes") {
    val t = freshIndexed()
    def plan() = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
      .queryExecution.optimizedPlan.toString
    assert(plan().contains("LeftSemi")) // warm the (table, version, dir) entry
    val before = graft.format.GraftScalarIndexRule.fsProbes.get()
    (1 to 5).foreach(_ => assert(plan().contains("LeftSemi")))
    val after = graft.format.GraftScalarIndexRule.fsProbes.get()
    assert(after == before, s"optimizer probed the filesystem $before -> $after")
    // a fresh build at the SAME table version bumps the epoch: the new
    // marker is picked up (no stale-forever negative/positive cache)
    ScalarIndex.buildBtree(TestSpark.spark, t, "grp", s"$t/_indices")
    val q2 = GraftTable.read(extSpark, t).filter(col("grp") === 3)
    assert(q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q2.count() == 50)
  }

  test("column identity: an entry naming a different column vetoes the index") {
    // the rename chain that would reuse a physical name is rejected at the
    // source (see rename-shadow test below); this exercises the
    // defense-in-depth veto for index provenance that does not match
    // (e.g. restored/copied table state)
    val t = freshIndexed()
    val m = GraftTable.loadManifest(TestSpark.spark, t)
    val good = m.indices.find(_.name == "btree_id").get
    // forge the manifest entry to claim the rows came from column `grp`
    GraftTable.commitIndex(TestSpark.spark, t, good.copy(column = "grp"))
    val q = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.count() == 11) // flat scan stays exact
    // restoring the true identity re-enables the rewrite
    GraftTable.commitIndex(TestSpark.spark, t, good)
    val q2 = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    assert(q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("uuid guard: a dir rebuilt under a different build vetoes stale entries") {
    val t = freshIndexed()
    // tamper with the dir marker so its uuid no longer matches the entry —
    // the shape of a dir that was overwritten by a LATER build while we hold
    // an OLD manifest (time travel / restore / clone)
    val v = GraftTable.loadManifest(TestSpark.spark, t).version
    ScalarIndex.writeVersionMarker(TestSpark.spark, s"$t/_indices/btree_id", v,
      Some("id"), Some("not-the-committed-build"))
    val q = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.count() == 11)
  }

  test("legacy tables (no manifest entries): markers still drive the rewrite") {
    // hand-roll an index the pre-manifest way: data + marker, no commit
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    val df = TestSpark.spark.range(0, 500).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10)))
    GraftTable.write(df, t, "overwrite")
    GraftTable.read(TestSpark.spark, t, withRowAddr = true)
      .select(col("id").as("v"), col(GraftTable.RowAddrCol))
      .write.parquet(s"$t/_indices/btree_id")
    val v = GraftTable.loadManifest(TestSpark.spark, t).version
    assert(!GraftTable.loadManifest(TestSpark.spark, t).indicesAuthoritative)
    // legacy markers without a column identity are accepted
    ScalarIndex.writeVersionMarker(TestSpark.spark, s"$t/_indices/btree_id", v, None)
    val q = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == (100L to 110L))
    // a marker naming a different column vetoes (legacy column check)
    ScalarIndex.writeVersionMarker(TestSpark.spark, s"$t/_indices/btree_id", v, Some("grp"))
    val q2 = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q2.count() == 11)
  }

  test("manifest authority: committed builds are visible with zero FS probes after first load") {
    val t = freshIndexed()
    assert(GraftTable.loadManifest(TestSpark.spark, t).indices.map(_.name) == Seq("btree_id"))
    // simulate a fresh process: wipe every memoized probe
    graft.format.GraftScalarIndexRule.invalidateCache()
    def plan() = GraftTable.read(extSpark, t).filter(col("id").between(100, 110))
      .queryExecution.optimizedPlan.toString
    val before = graft.format.GraftScalarIndexRule.fsProbes.get()
    assert(plan().contains("LeftSemi")) // first load: ONE uuid verification
    val afterFirst = graft.format.GraftScalarIndexRule.fsProbes.get()
    assert(afterFirst - before <= 1, s"first load probed ${afterFirst - before}×")
    (1 to 5).foreach(_ => assert(plan().contains("LeftSemi")))
    assert(graft.format.GraftScalarIndexRule.fsProbes.get() == afterFirst,
      "repeat queries must not touch the filesystem")
  }

  test("renames and adds that shadow another column's physical name are rejected") {
    val t = Files.createTempDirectory("graft_ir_").toString + "/t"
    GraftTable.write(TestSpark.spark.range(0, 50).toDF("a")
      .withColumn("b", col("a") + 1000), t, "overwrite")
    GraftTable.alterColumns(TestSpark.spark, t, renames = Map("b" -> "c"))
    // logical b is free, but physical b still backs field c: both a rename
    // and a supplemental add into that name would bind to c's on-file data
    intercept[IllegalArgumentException] {
      GraftTable.alterColumns(TestSpark.spark, t, renames = Map("a" -> "b"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.addColumnsFiles(TestSpark.spark, t, Seq("b" -> "CAST(1 AS BIGINT)"))
    }
    // renaming c BACK to its own physical name is legitimate
    GraftTable.alterColumns(TestSpark.spark, t, renames = Map("c" -> "b"))
    assert(GraftTable.read(TestSpark.spark, t).select(sum(col("b"))).head().getLong(0) ==
      (0L until 50L).map(_ + 1000).sum)
  }
}
