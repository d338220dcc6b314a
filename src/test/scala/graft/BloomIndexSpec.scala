package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.index.BloomIndex

class BloomIndexSpec extends AnyFunSuite {

  private lazy val extSpark = {
    TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-bloom-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.format.GraftExtensions)
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(TestSpark.spark)
    org.apache.spark.sql.SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  /** 8 fragments, each holding a distinct contiguous range of high-cardinality
    * ids in RANDOM order within the fragment (zonemaps still prune ranges, so
    * shuffle values across fragments instead: id i lands in fragment i % 8 —
    * every fragment's min/max spans nearly the whole domain). */
  private def freshBloomed(): String = {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/t"
    val df = TestSpark.spark.range(0, 4000).toDF("id")
      .withColumn("part", pmod(col("id"), lit(8)))
      .withColumn("payload", concat(lit("row-"), col("id")))
      .repartition(8, col("part"))
      .drop("part")
    GraftTable.write(df, t, "overwrite")
    BloomIndex.build(TestSpark.spark, t, "id", s"$t/_indices")
    t
  }

  private def prunedFragCount(q: org.apache.spark.sql.DataFrame): Option[Int] =
    q.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            g: graft.format.GraftFileIndex, _, _, _, _, _), _, _, _, _)
          if g.maskApplied => g.manifest.fragments.length
    }.headOption

  test("candidateFragments is an at-most mask containing the true fragment") {
    val t = freshBloomed()
    val dir = s"$t/_indices/bloom_id"
    val all = GraftTable.loadManifest(TestSpark.spark, t).fragments.map(_.id).toSet
    // find which fragment really holds id=1234
    val trueFrag = GraftTable.read(TestSpark.spark, t, withRowAddr = true)
      .filter(col("id") === 1234L).select(col("_rowaddr"))
      .collect().map(_.getLong(0) >>> 32).toSet
    val cands = BloomIndex.candidateFragments(TestSpark.spark, dir, Seq(1234L))
    assert(trueFrag.subsetOf(cands))
    assert(cands.subsetOf(all))
    assert(cands.size < all.size, s"bloom pruned nothing: $cands")
  }

  test("equality filter: scan pruned to bloom-positive fragments, result exact") {
    val t = freshBloomed()
    val q = GraftTable.read(extSpark, t).filter(col("id") === 1234L)
    val n = prunedFragCount(q)
    assert(n.exists(_ < 8), s"no bloom pruning in plan: $n")
    val got = q.select("payload").collect().map(_.getString(0)).toSeq
    assert(got == Seq("row-1234"))
  }

  test("IN filter unions probe values; values absent everywhere prune to ~zero") {
    val t = freshBloomed()
    val q = GraftTable.read(extSpark, t).filter(col("id").isin(17L, 2918L))
    assert(prunedFragCount(q).exists(_ < 8))
    assert(q.count() == 2)
    // absent value: every bloom rejects (false positives aside)
    val q2 = GraftTable.read(extSpark, t).filter(col("id") === 999999L)
    assert(prunedFragCount(q2).exists(_ <= 1))
    assert(q2.count() == 0)
  }

  test("append after build: fresh fragments kept flat, result exact; optimize covers them") {
    val t = freshBloomed()
    GraftTable.write(TestSpark.spark.range(10000, 10100).toDF("id")
      .withColumn("payload", concat(lit("row-"), col("id"))), t, "append")
    // 10050 lives only in the uncovered fresh fragment
    val q = GraftTable.read(extSpark, t).filter(col("id") === 10050L)
    assert(q.count() == 1)
    assert(BloomIndex.optimize(TestSpark.spark, t, "id", s"$t/_indices") == 100L)
    val q2 = GraftTable.read(extSpark, t).filter(col("id") === 10050L)
    assert(prunedFragCount(q2).exists(_ <= 2), "optimized bloom should prune fresh fragments too")
    assert(q2.count() == 1)
    assert(BloomIndex.optimize(TestSpark.spark, t, "id", s"$t/_indices") == 0L)
  }

  test("compaction invalidates coverage: no pruning, still exact") {
    val t = freshBloomed()
    GraftTable.delete(TestSpark.spark, t, "id % 10 = 3")
    GraftTable.compact(TestSpark.spark, t)
    val q = GraftTable.read(extSpark, t).filter(col("id") === 1234L)
    assert(prunedFragCount(q).isEmpty, "stale bloom must not prune")
    assert(q.count() == 1)
    val qDeleted = GraftTable.read(extSpark, t).filter(col("id") === 1233L)
    assert(qDeleted.count() == 0)
  }

  test("plan-cache key is collision-free: IN ('ab','c') then IN ('a','bc') both exact") {
    // Three fragments with disjoint string values: frag A holds only 'a',
    // frag B holds 'ab' + 'c', frag C holds 'bc'. The probe sets
    // ('ab','c') and ('a','bc') concatenate to the same string — an
    // ambiguous cache key would hand the second query the first's
    // candidate-fragment set {B}, pruning away the fragments that actually
    // hold 'a' and 'bc' BEFORE the refine filter → silently missing rows.
    val t = Files.createTempDirectory("graft_bloom_collide_").toString + "/t"
    import TestSpark.spark.implicits._
    def frag(vals: String*) =
      GraftTable.write(vals.toDF("s").withColumn("pay", concat(lit("v-"), col("s")))
        .coalesce(1), t, "append")
    frag("a"); frag("ab", "c"); frag("bc")
    BloomIndex.build(TestSpark.spark, t, "s", s"$t/_indices")

    val first = GraftTable.read(extSpark, t).filter(col("s").isin("ab", "c"))
    assert(prunedFragCount(first).exists(_ == 1), "first probe set should keep only frag B")
    assert(first.select("s").collect().map(_.getString(0)).sorted.toSeq == Seq("ab", "c"))

    // back-to-back second query with the colliding value set
    val second = GraftTable.read(extSpark, t).filter(col("s").isin("a", "bc"))
    assert(second.select("s").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "bc"),
      "colliding cache key reused the other probe set's fragment mask — rows dropped")
    assert(prunedFragCount(second).exists(_ == 2), "second probe set should keep frags A and C")
  }

  test("DV snapshot: bloom pruning composes with the deletion-vector anti-join") {
    val t = freshBloomed()
    GraftTable.delete(TestSpark.spark, t, "id = 1234")
    val q = GraftTable.read(extSpark, t).filter(col("id") === 1234L)
    assert(q.count() == 0)
    val q2 = GraftTable.read(extSpark, t).filter(col("id") === 1235L)
    assert(q2.count() == 1)
  }
}
