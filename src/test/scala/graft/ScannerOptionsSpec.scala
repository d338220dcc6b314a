package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.Fts

/** Scanner-convenience surface (r16, VERDICT r15 #7): the read-path
  * option bundle (reference `default_scan_options` / `apply_defaults`)
  * and the FTS score-projection toggle (reference
  * `disable_scoring_autoprojection`). */
class ScannerOptionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ReadOptions bundle: conf-pinned defaults drive readWithDefaults") {
    val t = Files.createTempDirectory("readopts_").toString + "/t"
    GraftTable.write(Tables.region(spark, sf), t, "overwrite")
    // no confs set → plain read, no system columns
    assert(!GraftTable.readWithDefaults(spark, t).columns.contains(GraftTable.RowAddrCol))
    spark.conf.set(s"${GraftTable.ReadOptionsConfPrefix}withRowAddr", "true")
    try {
      val df = GraftTable.readWithDefaults(spark, t)
      assert(df.columns.contains(GraftTable.RowAddrCol),
        "conf-pinned withRowAddr must reach the read")
      // explicit read() call sites never change under the conf
      assert(!GraftTable.read(spark, t).columns.contains(GraftTable.RowAddrCol))
      // explicit bundle overload == the flag form
      val viaOpts = GraftTable.read(spark, t,
        GraftTable.ReadOptions(withRowAddr = true))
      assert(viaOpts.columns.toSeq == df.columns.toSeq)
    } finally spark.conf.unset(s"${GraftTable.ReadOptionsConfPrefix}withRowAddr")
  }

  test("ReadOptions: version pin via conf; unknown option key refused") {
    val t = Files.createTempDirectory("readopts_v_").toString + "/t"
    GraftTable.write(Tables.region(spark, sf), t, "overwrite")
    val v1 = GraftTable.latestVersion(spark, t).get
    GraftTable.write(Tables.nation(spark, sf)
      .selectExpr("n_nationkey as r_regionkey", "n_name as r_name"), t, "append")
    spark.conf.set(s"${GraftTable.ReadOptionsConfPrefix}version", v1.toString)
    try {
      assert(GraftTable.readWithDefaults(spark, t).count() ==
        Tables.region(spark, sf).count(), "conf-pinned version must read v1")
    } finally spark.conf.unset(s"${GraftTable.ReadOptionsConfPrefix}version")
    // a typo'd option must refuse, not silently configure nothing
    // (reference apply_defaults raises ValueError on unknown keys)
    spark.conf.set(s"${GraftTable.ReadOptionsConfPrefix}withRowAddrs", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        GraftTable.readWithDefaults(spark, t)
      }
      assert(e.getMessage.contains("withRowAddrs"), e.getMessage)
    } finally spark.conf.unset(s"${GraftTable.ReadOptionsConfPrefix}withRowAddrs")
  }

  test("FTS withScore=false projects ids only, same top-k membership") {
    val dir = Files.createTempDirectory("fts_noscore_").toString
    Fts.buildIndex(Tables.documents(spark, sf), "doc_id", "text", dir)
    val scored = Fts.matchQuery(spark, dir, Seq("spark", "vector"), 10)
    assert(scored.columns.toSeq == Seq("doc_id", "_score"))
    val bare = Fts.matchQuery(spark, dir, Seq("spark", "vector"), 10,
      withScore = false)
    assert(bare.columns.toSeq == Seq("doc_id"),
      "withScore=false must drop the auto-projected _score")
    assert(bare.as[Long].collect().toSet ==
      scored.select("doc_id").as[Long].collect().toSet,
      "the toggle must not change WHICH docs rank into the top-k")
  }
}
