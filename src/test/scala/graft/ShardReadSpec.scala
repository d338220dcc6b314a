package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Distributed-training shard access (reference `ShardedFragmentSampler`,
  * `sampler.py:330` — rank gets `fragments[rank::world_size]`): shards are
  * fragment-granular, disjoint, and cover the table exactly. */
class ShardReadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_shard_").toString + "/t"

  test("shards are a disjoint exact cover of the snapshot") {
    val t = tmp()
    GraftTable.write((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(8), t, "overwrite")
    val world = 3
    val shards = (0 until world).map(r =>
      GraftTable.readShard(spark, t, r, world))
    val ids = shards.map(_.select("id").as[Long].collect().toSet)
    assert(ids.map(_.size).sum == 100, "cover is exact")
    for (a <- 0 until world; b <- (a + 1) until world)
      assert(ids(a).intersect(ids(b)).isEmpty, s"shards $a and $b overlap")
    assert(ids.reduce(_ ++ _) == (1L to 100L).toSet)
  }

  test("randomized sharding with one seed still partitions exactly") {
    val t = tmp()
    GraftTable.write((1 to 60).map(i => (i.toLong, i.toString)).toDF("id", "v")
      .repartition(6), t, "overwrite")
    val world = 4
    val ids = (0 until world).map(r =>
      GraftTable.readShard(spark, t, r, world, randomize = true, seed = 42L)
        .select("id").as[Long].collect().toSet)
    assert(ids.map(_.size).sum == 60)
    assert(ids.reduce(_ ++ _) == (1L to 60L).toSet)
    // a different seed re-deals fragments but still covers
    val ids2 = (0 until world).map(r =>
      GraftTable.readShard(spark, t, r, world, randomize = true, seed = 7L)
        .select("id").as[Long].collect().toSet)
    assert(ids2.reduce(_ ++ _) == (1L to 60L).toSet)
  }

  test("shards respect deletion vectors and version pins") {
    val t = tmp()
    GraftTable.write((1 to 50).map(i => (i.toLong, i.toString)).toDF("id", "v")
      .repartition(5), t, "overwrite")                       // v1
    GraftTable.delete(spark, t, "id % 10 = 0")               // v2
    val live = (0 until 2).map(r =>
      GraftTable.readShard(spark, t, r, 2).select("id").as[Long].collect().toSet)
    assert(live.reduce(_ ++ _) == (1L to 50L).filterNot(_ % 10 == 0).toSet)
    // pinned to v1: deleted rows still visible
    val v1 = (0 until 2).map(r =>
      GraftTable.readShard(spark, t, r, 2, version = Some(1L))
        .select("id").as[Long].collect().toSet)
    assert(v1.reduce(_ ++ _) == (1L to 50L).toSet)
  }

  test("rank bounds are validated") {
    val t = tmp()
    GraftTable.write(Seq((1L, "a")).toDF("id", "v"), t, "overwrite")
    intercept[IllegalArgumentException] { GraftTable.readShard(spark, t, 3, 3) }
    intercept[IllegalArgumentException] { GraftTable.readShard(spark, t, 0, 0) }
  }
}
