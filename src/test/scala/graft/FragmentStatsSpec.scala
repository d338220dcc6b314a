package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{FragmentStats, GraftFileIndex, GraftTable}

class FragmentStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_zs_").toString + "/t"

  /** table with 4 range-disjoint fragments on id: [0,25),[25,50),[50,75),[75,100) */
  private def rangedTable(): String = {
    val t = tmp()
    val df = spark.range(0, 100).toDF("id")
      .withColumn("name", concat(lit("row-"), col("id")))
      .withColumn("val", col("id").cast("double") * 1.5)
      .repartitionByRange(4, col("id"))
    GraftTable.write(df, t, "overwrite")
    t
  }

  test("manifest carries per-fragment min/max/nullCount stats") {
    val t = rangedTable()
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.length == 4)
    m.fragments.foreach { f =>
      assert(f.stats.contains("id") && f.stats.contains("name") && f.stats.contains("val"))
      assert(f.stats("id").kind == "long")
      assert(f.stats("val").kind == "double")
      assert(f.stats("name").kind == "string")
      assert(f.stats("id").nullCount == 0)
    }
    // fragments are range-disjoint on id
    val ranges = m.fragments.map(f => (f.stats("id").min.toLong, f.stats("id").max.toLong)).sorted
    assert(ranges.sliding(2).forall { case Seq((_, aMax), (bMin, _)) => aMax < bMin; case _ => true })
  }

  test("listFiles prunes fragments by pushed range predicate") {
    val t = rangedTable()
    val m = GraftTable.loadManifest(spark, t)
    val index = new GraftFileIndex(spark, new Path(t), m)
    val idAttr = AttributeReference("id", LongType)()
    // id = 80 -> exactly one fragment
    val eq = EqualTo(idAttr, Literal(80L))
    assert(index.listFiles(Nil, Seq(eq)).head.files.length == 1)
    // id < 30 -> two fragments
    val lt = LessThan(idAttr, Literal(30L))
    assert(index.listFiles(Nil, Seq(lt)).head.files.length == 2)
    // id >= 999 -> none
    val none = GreaterThanOrEqual(idAttr, Literal(999L))
    assert(index.listFiles(Nil, Seq(none)).head.files.isEmpty)
    // string predicate on name
    val nameAttr = AttributeReference("name", StringType)()
    val sEq = EqualTo(nameAttr, Literal.create("row-99", StringType))
    assert(index.listFiles(Nil, Seq(sEq)).head.files.length < 4)
    // unknown column / unsupported expr -> keep all
    assert(index.listFiles(Nil, Seq(Literal(true))).head.files.length == 4)
  }

  test("e2e: pruned query returns correct rows") {
    val t = rangedTable()
    val out = GraftTable.read(spark, t).filter($"id" >= 90)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == (90L until 100L))
  }

  test("take reads only addressed fragments and returns addressed rows") {
    val t = rangedTable()
    val all = GraftTable.read(spark, t, withRowAddr = true)
      .select("_rowaddr", "id").as[(Long, Long)].collect().toMap
    val wanted = all.filter { case (_, id) => Seq(3L, 42L, 97L).contains(id) }.keys.toSeq
    val got = GraftTable.take(spark, t, wanted)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 42L, 97L))
  }

  test("sampleHash is deterministic and approximately sized") {
    val t = rangedTable()
    val s1 = GraftTable.sampleHash(spark, t, 0.3).select("id").as[Long].collect().toSet
    val s2 = GraftTable.sampleHash(spark, t, 0.3).select("id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1.nonEmpty && s1.size < 100)
  }

  test("readLate: narrow-phase filter + fragment-pruned wide fetch is exact") {
    val t = rangedTable()
    val late = GraftTable.readLate(spark, t, "id >= 90", Seq("id"))
      .select("id", "name", "val").collect().sortBy(_.getLong(0))
    val direct = GraftTable.read(spark, t).filter($"id" >= 90)
      .select("id", "name", "val").collect().sortBy(_.getLong(0))
    assert(late.map(_.toString).toSeq == direct.map(_.toString).toSeq)
    assert(late.length == 10)
    // matches live in exactly 1 of 4 fragments -> phase 2 manifest pruned to 1
    val m = GraftTable.loadManifest(spark, t)
    val touched = m.fragments.filter(f =>
      f.stats("id").max.toLong >= 90).map(_.id)
    assert(touched.length == 1)
  }

  test("describe folds fragment stats into table-level column stats, no data IO") {
    val t = rangedTable()
    val d = GraftTable.describe(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(d("id").getLong(2) == 100) // rows
    assert(d("id").getString(4) == "0" && d("id").getString(5) == "99") // min/max
    assert(d("id").getLong(3) == 0) // nulls
    assert(d("val").getString(5).toDouble == 148.5)
  }

  test("takeBlobs fetches only the payload column for addressed rows") {
    val t = rangedTable()
    val addrs = GraftTable.read(spark, t, withRowAddr = true)
      .filter($"id".isin(7L, 93L)).select("_rowaddr").as[Long].collect().toSeq
    val blobs = GraftTable.takeBlobs(spark, t, addrs, "name")
    assert(blobs.columns.toSeq == Seq("_rowaddr", "name"))
    assert(blobs.select("name").as[String].collect().toSet == Set("row-7", "row-93"))
  }

  test("timestamp columns get footer stats (MICROS write) and prune fragments") {
    val t = Files.createTempDirectory("graft_ts_").toString + "/t"
    val df = spark.range(0, 100).toDF("id")
      .withColumn("ts", expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600)"))
    GraftTable.write(df.repartitionByRange(4, col("ts")), t, "overwrite")
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.forall(_.stats.contains("ts")),
      s"timestamp stats missing: ${m.fragments.head.stats.keys}")
    assert(m.fragments.forall(_.stats("ts").kind == "long"))
    val index = new GraftFileIndex(spark, new Path(t), m)
    val tsAttr = AttributeReference("ts", TimestampType)()
    // literal in micros: 2024-01-01 12:00:00 UTC
    val cutoff = java.time.Instant.parse("2024-01-01T12:00:00Z").getEpochSecond * 1000000L
    val lt = LessThan(tsAttr, Literal(cutoff, TimestampType))
    val kept = index.listFiles(Nil, Seq(lt)).head.files.length
    assert(kept < 4 && kept >= 1, s"expected pruning, kept $kept/4")
    // e2e exactness
    val n = GraftTable.read(spark, t)
      .filter(col("ts") < expr("timestamp'2024-01-01 12:00:00'")).count()
    assert(n == 12)
  }

  test("mayMatch conservative on nulls") {
    import graft.format.ColumnStat
    val stats = Map("x" -> ColumnStat("long", "1", "10", 5))
    val x = AttributeReference("x", LongType)()
    assert(FragmentStats.mayMatch(stats, 20, IsNull(x)))
    assert(FragmentStats.mayMatch(stats, 20, IsNotNull(x)))
    assert(!FragmentStats.mayMatch(Map("x" -> ColumnStat("long", "1", "10", 20)), 20, IsNotNull(x)))
    assert(!FragmentStats.mayMatch(stats, 20, EqualTo(x, Literal(11L))))
    assert(FragmentStats.mayMatch(stats, 20, EqualTo(x, Literal(10L))))
  }
}
