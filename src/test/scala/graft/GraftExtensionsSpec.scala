package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{GraftExtensions, GraftTable}

class GraftExtensionsSpec extends AnyFunSuite {

  // a dedicated session with the extensions installed (shares the context)
  private lazy val extSpark: SparkSession = {
    TestSpark.spark // ensure a context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  private def freshTable(): String = {
    val t = Files.createTempDirectory("graft_ext_").toString + "/t"
    import TestSpark.spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v")
    GraftTable.write(df, t)
    GraftTable.delete(TestSpark.spark, t, "id IN (2, 4)")
    t
  }

  test("without extensions, format(graft) on a DV snapshot fails fast") {
    val t = freshTable()
    val e = intercept[IllegalStateException] {
      TestSpark.spark.read.format("graft").load(t).count()
    }
    assert(e.getMessage.contains("GraftExtensions"))
  }

  test("with extensions, format(graft) subtracts deletion vectors") {
    val t = freshTable()
    val df = extSpark.read.format("graft").load(t)
    assert(df.count() == 3)
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
  }

  test("with extensions, SQL over a graft temp view is DV-correct") {
    val t = freshTable()
    extSpark.read.format("graft").load(t).createOrReplaceTempView("g")
    val n = extSpark.sql("SELECT count(*) FROM g WHERE id > 0").head().getLong(0)
    assert(n == 3)
    val sum = extSpark.sql("SELECT sum(id) FROM g").head().getLong(0)
    assert(sum == 9L) // 1 + 3 + 5
  }

  test("GraftTable.read in the extension session does not double-apply DVs") {
    val t = freshTable()
    assert(GraftTable.read(extSpark, t).count() == 3)
  }

  test("auto late materialization: two-phase plan on blob table, single-pass on narrow") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val t = Files.createTempDirectory("graft_latemat_").toString + "/t"
    val df = extSpark.range(0, 800).toDF("id")
      .withColumn("label", concat(lit("k"), col("id") % 10))
      .withColumn("payload", expr("cast(repeat('x', 2048) as binary)"))
    GraftTable.write(df.repartitionByRange(8, col("id")), t, "overwrite")

    // narrow filter + wide projection → two-phase: LeftSemi against the
    // checkpointed address list, phase-2 relation pruned to match fragments
    val q = GraftTable.read(extSpark, t)
      .filter(col("id") >= 700).select(col("id"), col("payload"))
    val plan = q.queryExecution.optimizedPlan
    assert(plan.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      s"no two-phase semi-join in:\n$plan")
    val scans = plan.collect {
      case LogicalRelation(HadoopFsRelation(g: graft.format.GraftFileIndex, _, _, _, _, _), _, _, _, _) => g
    }
    assert(scans.exists(_.manifest.fragments.length < 8),
      "phase-2 scan was not fragment-pruned")
    assert(q.count() == 100)
    assert(q.agg(sum(length(col("payload")))).head().getLong(0) == 100L * 2048)

    // all-narrow projection over the same table → plan untouched
    val q2 = GraftTable.read(extSpark, t)
      .filter(col("id") >= 700).select(col("id"), col("label"))
    assert(q2.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "late-mat fired on an all-narrow projection")

    // all-narrow TABLE (no wide column anywhere) → untouched as well
    val t2 = Files.createTempDirectory("graft_latemat2_").toString + "/t"
    GraftTable.write(extSpark.range(0, 800).toDF("id")
      .withColumn("v", col("id") * 2).repartitionByRange(8, col("id")), t2, "overwrite")
    val q3 = GraftTable.read(extSpark, t2).filter(col("id") >= 700)
      .select(col("id"), col("v"))
    assert(q3.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty)

    // phase 1 memoized: re-planning the same predicate runs no new job
    val before = graft.format.GraftLateMatRule.phase1Runs.get()
    GraftTable.read(extSpark, t).filter(col("id") >= 700)
      .select(col("id"), col("payload")).queryExecution.optimizedPlan
    assert(graft.format.GraftLateMatRule.phase1Runs.get() == before,
      "phase 1 re-ran for a memoized predicate")

    // ...but a table DROPPED and RECREATED at the same path is a NEW
    // identity even though (path, version) repeat — the memo must miss
    // (r14: keyed on commitTsMillis; a hit here would serve match
    // addresses computed against the deleted incarnation's fragments)
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(extSpark.sessionState.newHadoopConf())
    fs.delete(root, true)
    GraftTable.write(df.repartitionByRange(8, col("id")), t, "overwrite")
    val q4 = GraftTable.read(extSpark, t)
      .filter(col("id") >= 700).select(col("id"), col("payload"))
    q4.queryExecution.optimizedPlan
    assert(graft.format.GraftLateMatRule.phase1Runs.get() > before,
      "phase 1 memo served a dropped-and-recreated table")
    assert(q4.count() == 100)
  }

  test("injected SQL kernels: distance, BPE, sketches resolve to native expressions") {
    val s = extSpark
    val row = s.sql(
      """SELECT l2_distance(array(0.0F, 3.0F), array(4.0F, 3.0F)) AS l2,
        |  dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dp,
        |  bpe_token_count('the theatre') AS bpe,
        |  ngram_repetition(array('a','b','a','b'), 2) AS rep,
        |  hamming_distance(X'FF', X'0F') AS hd""".stripMargin).head()
    assert(row.getDouble(0) == 4.0, row.toString)
    assert(row.getDouble(1) == 11.0, row.toString)
    // full EnglishMerges: "the" + ' ' + "the","at","re" = 5 tokens
    assert(row.getInt(2) == 5, row.toString)
    // bigrams "a b"x2, "b a"x1 -> top = 2*3 = 6; dup = 6
    assert(row.getSeq[Long](3) == Seq(6L, 6L), row.toString)
    assert(row.getLong(4) == 4L, row.toString)
    // literal-required args fail with a clear message, not a cast error
    val e = intercept[Exception] {
      s.sql("SELECT ngram_repetition(array('a'), 1 + 1)").head()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")),
      e.getMessage)
    // wrong arity fails with a typed message, not IndexOutOfBounds
    val e2 = intercept[Exception] {
      s.sql("SELECT l2_distance(array(1.0F))").head()
    }
    assert(e2.getMessage.contains("expects 2 argument") ||
      Option(e2.getCause).exists(_.getMessage.contains("expects 2 argument")),
      e2.getMessage)
  }

  test("injected URL kernels: normalize / host / registered domain from SQL (r16)") {
    val row = extSpark.sql(
      """SELECT
        |  url_normalize('HTTPS://WWW.Example.COM:443/Path/?utm_source=x&keep=1#f') AS n,
        |  url_host('https://user@Sub.Example.COM:8443/x') AS h,
        |  url_registered_domain('cdn.news.co.uk') AS d""".stripMargin).head()
    assert(row.getString(0) == "https://example.com/Path/?keep=1", row.toString)
    assert(row.getString(1) == "sub.example.com", row.toString)
    assert(row.getString(2) == "news.co.uk", row.toString)
  }
}
