package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{GraftExtensions, GraftTable}
import graft.index.{ScalarIndex, ScalarIndexPlugin, ScalarIndexRegistry}

/** Scalar-index plugin registry (r16, VERDICT r15 "What's missing" #3;
  * reference `scalar/registry.rs` ScalarIndexPlugin): a third-party kind
  * registers once and gets create_index/optimize_index dispatch, a
  * committed manifest IndexMeta, and optimizer-rule participation with
  * the refine step guaranteeing exactness for over-approximate masks. */
class ScalarPluginSpec extends AnyFunSuite {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_plugwh_").toString

  private lazy val s: SparkSession = {
    TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .master("local[4]").appName("graft-plugin-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g", "graft.format.GraftCatalog")
      .config("spark.sql.catalog.g.warehouse", warehouse)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    sess.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    sess
  }

  /** Toy but complete plugin: buckets an integral column by v mod 16 —
    * candidatesFor serves equality predicates with the residue bucket's
    * addresses, deliberately OVER-approximate (mod collisions), which the
    * rule's refine filter must make exact. */
  object ModuloPlugin extends ScalarIndexPlugin {
    val kind = "MODULO"
    def dirName(column: String): String = s"modulo_$column"
    @volatile var optimizeCalls = 0
    def build(spark: SparkSession, tablePath: String, column: String,
              indexPath: String, params: String): Unit = {
      val dir = s"$indexPath/${dirName(column)}"
      GraftTable.read(spark, tablePath, withRowAddr = true)
        .select(pmod(col(column), lit(16L)).as("bucket"),
          col(GraftTable.RowAddrCol))
        .write.mode("overwrite").parquet(dir)
      ScalarIndex.commitPluginBuild(spark, tablePath, indexPath, this, column,
        if (params.nonEmpty) Map("params" -> params) else Map.empty)
    }
    def optimize(spark: SparkSession, tablePath: String, column: String,
                 indexPath: String): Long = {
      optimizeCalls += 1
      build(spark, tablePath, column, indexPath, "")
      GraftTable.countRows(spark, tablePath)
    }
    def candidatesFor(spark: SparkSession, indexDir: String, column: String,
                      predicate: Expression): Option[DataFrame] = predicate match {
      case EqualTo(_: AttributeReference, Literal(v: Long, _)) =>
        Some(spark.read.parquet(indexDir)
          .filter(col("bucket") === ((v % 16 + 16) % 16))
          .select(col(GraftTable.RowAddrCol)))
      case _ => None
    }
  }

  private def stub(kindName: String, dir: String => String = c => s"x_$c") =
    new ScalarIndexPlugin {
      val kind = kindName
      def dirName(c: String) = dir(c)
      def build(s: SparkSession, t: String, c: String, i: String, p: String): Unit = ()
      def optimize(s: SparkSession, t: String, c: String, i: String): Long = 0L
      def candidatesFor(s: SparkSession, d: String, c: String, p: Expression) = None
    }

  test("register: refuses builtin kinds, lowercase, and kind conflicts") {
    val e1 = intercept[IllegalArgumentException] {
      ScalarIndexRegistry.register(stub("BTREE"))
    }
    assert(e1.getMessage.contains("built-in"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ScalarIndexRegistry.register(stub("modulo"))
    }
    assert(e2.getMessage.contains("UPPERCASE"), e2.getMessage)
    ScalarIndexRegistry.register(ModuloPlugin)
    ScalarIndexRegistry.register(ModuloPlugin) // same instance: idempotent
    val e3 = intercept[IllegalArgumentException] {
      ScalarIndexRegistry.register(stub("MODULO", c => s"y_$c"))
    }
    assert(e3.getMessage.contains("already registered"), e3.getMessage)
  }

  test("plugin index: SQL build + committed IndexMeta + rule rewrite, exact under refine") {
    ScalarIndexRegistry.register(ModuloPlugin)
    val t = "plug_tbl"
    val path = s"$warehouse/db/$t"
    s.sql(s"CREATE TABLE g.db.$t (id BIGINT, v STRING) USING graft")
    s.sql(s"INSERT INTO g.db.$t SELECT id, concat('row-', id) FROM range(0, 500)")
    // build through the SQL surface: a kind unknown to the builtins
    // dispatches to the registry
    val created = s.sql(
      s"CALL g.system.create_index(table => 'db.$t', `column` => 'id', " +
        "index_type => 'MODULO')").head()
    assert(created.getString(0) == "modulo_id")
    // committed into the manifest inventory with the plugin's kind
    val inv = s.sql(s"CALL g.system.indices(table => 'db.$t')").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(inv.get("modulo_id").contains("MODULO"), inv.toString)
    // the rule rewrites an equality filter through the plugin mask
    // (LeftSemi in the optimized plan); the refine filter makes the
    // over-approximate residue bucket EXACT
    val q = s.sql(s"SELECT id FROM g.db.$t WHERE id = 77")
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(77L))
    // a non-equality predicate is not servable by this plugin: no rewrite,
    // still correct
    val q2 = s.sql(s"SELECT id FROM g.db.$t WHERE id > 495")
    assert(!q2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q2.count() == 4L)
    // appended fragments are scanned flat until optimize (partial
    // coverage keeps exactness)
    s.sql(s"INSERT INTO g.db.$t SELECT id, concat('row-', id) FROM range(500, 520)")
    val q3 = s.sql(s"SELECT id FROM g.db.$t WHERE id = 503")
    assert(q3.collect().map(_.getLong(0)).toSeq == Seq(503L))
    // optimize_index dispatches to the plugin from the manifest entry
    val before = ModuloPlugin.optimizeCalls
    s.sql(s"CALL g.system.optimize_index(table => 'db.$t', name => 'modulo_id')")
      .collect()
    assert(ModuloPlugin.optimizeCalls == before + 1)
    val q4 = s.sql(s"SELECT id FROM g.db.$t WHERE id = 503")
    assert(q4.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q4.collect().map(_.getLong(0)).toSeq == Seq(503L))
  }
}
