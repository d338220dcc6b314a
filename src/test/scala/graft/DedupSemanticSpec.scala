package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** `Dedup.semanticDedup` — SemDeDup cluster-then-prune invariants. */
class DedupSemanticSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Three well-separated directions in R³; each direction carries groups of
    * near-identical vectors (semantic duplicates) plus a lone outlier. */
  private def fixture = {
    def jitter(base: Array[Float], eps: Float, n: Int, startId: Long) =
      (0 until n).map { i =>
        (startId + i, base.zipWithIndex.map { case (v, d) =>
          v + (if (d == 0) eps * i else -eps * i)
        }.toSeq)
      }
    val groups =
      jitter(Array(10f, 0f, 0f), 0.01f, 4, 0L) ++   // dup group, cluster A
      jitter(Array(0f, 10f, 0f), 0.01f, 3, 100L) ++ // dup group, cluster B
      jitter(Array(0f, 0f, 10f), 0.01f, 2, 200L) ++ // dup group, cluster C
      Seq((300L, Seq(7f, 7f, 0.5f)))                // outlier, no near-dup
    groups.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("near-identical groups collapse to one kept representative per cluster") {
    val out = Dedup.semanticDedup(fixture, "vec_id", "embedding",
      nClusters = 3, tau = 0.99).collect()
    assert(out.length == 10)
    // a tight group keeps exactly ONE representative in each cluster its
    // members landed in (k-means may split a group across cluster
    // boundaries; within a cluster the group always collapses)
    def check(lo: Long, hi: Long): Unit = {
      val g = out.filter(r => r.getLong(0) >= lo && r.getLong(0) <= hi)
      val clusters = g.map(_.getAs[Int]("cluster")).toSet
      val kept = g.count(_.getAs[Boolean]("kept"))
      assert(kept == clusters.size,
        s"group [$lo,$hi]: kept $kept across ${clusters.size} clusters")
    }
    check(0, 3); check(100, 102); check(200, 201)
    val keptIds = out.filter(_.getAs[Boolean]("kept")).map(_.getLong(0)).toSet
    assert(keptIds.contains(300L), s"outlier pruned: $keptIds")
  }

  test("kept rows of one cluster are never tau-similar to each other") {
    val out = Dedup.semanticDedup(Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", nClusters = 8, tau = 0.9)
    val keptVecs = out.filter($"kept")
      .join(Tables.embeddings(spark, "/root/testdata/sf0.001"), "vec_id")
      .select($"cluster", $"vec_id", $"embedding")
    val a = keptVecs.select($"cluster", $"vec_id".as("a_id"), $"embedding".as("a_vec"))
    val b = keptVecs.select($"cluster", $"vec_id".as("b_id"), $"embedding".as("b_vec"))
    val violating = a.join(b, Seq("cluster"))
      .filter($"a_id" < $"b_id")
      .withColumn("sim", lit(1.0) -
        graft.functions.VectorFunctions.cosineDistance($"a_vec", $"b_vec"))
      .filter($"sim" >= 0.9)
      .count()
    assert(violating == 0, s"$violating kept pairs at or above tau")
  }

  test("deterministic: two runs agree row for row") {
    val run1 = Dedup.semanticDedup(Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", 8, 0.85).orderBy("vec_id").collect().toSeq
    val run2 = Dedup.semanticDedup(Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", 8, 0.85).orderBy("vec_id").collect().toSeq
    assert(run1 == run2)
  }

  test("every pruned row has a ranked-ahead tau-similar neighbor in its cluster") {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Dedup.semanticDedup(base, "vec_id", "embedding", 8, 0.9)
    val rows = out.join(base, "vec_id")
      .select($"cluster", $"vec_id", $"centroid_sim", $"kept", $"embedding")
    val pr = rows.filter(!$"kept")
      .select($"cluster", $"vec_id".as("a_id"), $"centroid_sim".as("a_r"), $"embedding".as("a_vec"))
    val all = rows
      .select($"cluster", $"vec_id".as("b_id"), $"centroid_sim".as("b_r"), $"embedding".as("b_vec"))
    val witnessed = pr.join(all, Seq("cluster"))
      .filter($"b_r" < $"a_r" || ($"b_r" === $"a_r" && $"b_id" < $"a_id"))
      .withColumn("sim", lit(1.0) -
        graft.functions.VectorFunctions.cosineDistance($"a_vec", $"b_vec"))
      .filter($"sim" >= 0.9)
      .select($"a_id").distinct().count()
    val prunedCount = out.filter(!$"kept").count()
    assert(witnessed == prunedCount,
      s"$prunedCount pruned but only $witnessed have a dominating witness")
  }
}
