package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.format.{GraftExtensions, GraftTable}
import graft.operators.{IvfIndex, Knn, PqIndex}

/** Precomputed-model index builds (reference
  * `create_index(ivf_centroids=..., pq_codebook=..., train=False)`,
  * `python/lance/dataset.py:2525-2541`; `IvfModel.save/load`
  * `indices/ivf.py`; `PqModel.save/load` `indices/pq.py`;
  * `IndicesBuilder.train_ivf/train_pq` `indices/builder.py:60,149`):
  * train once on a bounded sample, persist the model, build any number of
  * indexes under it without retraining — rebuilds and clones become
  * byte-identical and training a one-time cost at any corpus size.
  */
class PretrainedModelSpec extends AnyFunSuite {

  private val warehouse = Files.createTempDirectory("graft_pre_wh_").toString

  private lazy val s: SparkSession = {
    TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pretrained-test")
      .config("spark.sql.shuffle.partitions", "4")
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

  private def dir(): String = Files.createTempDirectory("graft_pre_").toString

  /** 120 deterministic 8-d vectors around 4 well-separated anchors. */
  private def seedVectors(sess: SparkSession, path: String): Unit = {
    import sess.implicits._
    val rows = (0 until 120).map { i =>
      val a = i % 4
      val base = Array.fill(8)(0.0f)
      base(a * 2) = 10.0f
      val v = base.zipWithIndex.map { case (x, j) =>
        x + ((i * 31 + j * 17) % 7) * 0.05f
      }
      (i.toLong, v.toSeq)
    }
    GraftTable.write(rows.toDF("id", "vec"), path, "overwrite")
  }

  test("IVF: saved model reused byte-identically; full-probe == flat") {
    val t = dir(); seedVectors(s, t)
    val model = dir() + "/ivf_model"
    val (nlist, d) = IvfIndex.trainModelToPath(s, t, "id", "vec",
      nlist = 4, metric = "l2", dest = model)
    assert(nlist == 4 && d == 8)

    val idx = dir() + "/idx"
    IvfIndex.buildForTable(s, t, "id", "vec", idx, nlist = 99, // ignored
      centroidsFile = Some(model))
    // no retrain: the index's centroids ARE the saved model's, float-exact
    val saved = IvfIndex.loadModel(s, model).centroids
    val built = IvfIndex.loadModel(s, idx).centroids
    assert(saved.length == built.length)
    saved.zip(built).foreach { case (a, b) => assert(a.sameElements(b)) }

    val q = Array.fill(8)(0.0f); q(0) = 10.0f
    val got = IvfIndex.search(s, idx, "id", "vec", q, k = 5, nprobes = 4)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val truth = Knn.flatSearch(GraftTable.read(s, t), "vec", q, 5, "l2",
        tieBreakers = Seq(col("id")))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == truth)
  }

  test("IVF_PQ: residual codebook + centroids reused; exact refine == flat") {
    val t = dir(); seedVectors(s, t)
    val ivfM = dir() + "/ivf_model"
    IvfIndex.trainModelToPath(s, t, "id", "vec", 4, "l2", ivfM)
    val pqM = dir() + "/pq_model"
    val (m, k, variant) = PqIndex.trainCodebookToPath(s, t, "id", "vec",
      m = 4, k = 16, metric = "l2", dest = pqM, ivfCentroidsFile = Some(ivfM))
    assert((m, k, variant) == ((4, 16, "residual")))

    val idx = dir() + "/idx"
    PqIndex.buildForTable(s, t, "id", "vec", idx, nlist = 99, m = 1, k = 1,
      ivfCentroidsFile = Some(ivfM), pqCodebookFile = Some(pqM))
    // codebook reused float-exact (no retrain)
    val saved = PqIndex.loadPq(s, pqM).codebooks
    val built = PqIndex.loadPq(s, idx).codebooks
    assert(saved.length == built.length)
    for (sub <- saved.indices; c <- saved(sub).indices)
      assert(saved(sub)(c).sameElements(built(sub)(c)))

    val q = Array.fill(8)(0.0f); q(2) = 10.0f
    val got = PqIndex.search(s, idx, "id", "vec", q, kNeighbors = 5,
        nprobes = 4, refineFactor = 10)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val truth = Knn.flatSearch(GraftTable.read(s, t), "vec", q, 5, "l2",
        tieBreakers = Seq(col("id")))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == truth)
  }

  test("guards: dimension mismatch, metric mismatch, residual without centroids") {
    val t = dir(); seedVectors(s, t)
    // model with the wrong dimension
    val badModel = dir() + "/bad"
    IvfIndex.saveModelTo(s, badModel,
      IvfIndex.Model(Array(Array.fill(5)(0.0f), Array.fill(5)(1.0f))))
    val e1 = intercept[IllegalArgumentException] {
      IvfIndex.buildForTable(s, t, "id", "vec", dir() + "/i1", 2,
        centroidsFile = Some(badModel))
    }
    assert(e1.getMessage.contains("dimension"))

    // cosine-trained codebook refused by an l2 build
    val ivfM = dir() + "/ivfm"
    IvfIndex.trainModelToPath(s, t, "id", "vec", 4, "cosine", ivfM)
    val pqCos = dir() + "/pqcos"
    PqIndex.trainCodebookToPath(s, t, "id", "vec", 4, 16, "cosine", pqCos,
      Some(ivfM))
    val e2 = intercept[IllegalArgumentException] {
      PqIndex.buildForTable(s, t, "id", "vec", dir() + "/i2", 4,
        metric = "l2", ivfCentroidsFile = Some(ivfM),
        pqCodebookFile = Some(pqCos))
    }
    assert(e2.getMessage.contains("metric"))

    // residual codebook demands its centroids back at build time
    val ivf2 = dir() + "/ivf2"
    IvfIndex.trainModelToPath(s, t, "id", "vec", 4, "l2", ivf2)
    val pqRes = dir() + "/pqres"
    PqIndex.trainCodebookToPath(s, t, "id", "vec", 4, 16, "l2", pqRes, Some(ivf2))
    val e3 = intercept[IllegalArgumentException] {
      PqIndex.buildForTable(s, t, "id", "vec", dir() + "/i3", 4,
        pqCodebookFile = Some(pqRes))
    }
    assert(e3.getMessage.contains("centroids"))
  }

  test("SQL surface: train_ivf_model + create_index(ivf_centroids_file)") {
    s.sql("DROP TABLE IF EXISTS g.db.prevec")
    s.sql("CREATE TABLE g.db.prevec (id BIGINT, vec ARRAY<FLOAT>) USING graft")
    val vals = (0 until 64).map { i =>
      val v = (0 until 8).map(j => (if (i % 4 == j / 2) 10.0 else 0.0) +
        (i * 13 + j) % 5 * 0.1).map(x => s"CAST($x AS FLOAT)").mkString(",")
      s"($i, array($v))"
    }.mkString(",")
    s.sql(s"INSERT INTO g.db.prevec VALUES $vals")
    val model = dir() + "/sql_ivf"
    val tr = s.sql(s"CALL g.system.train_ivf_model(table => 'db.prevec', " +
      s"column => 'vec', nlist => 4, dest => '$model', id_col => 'id')").collect()
    assert(tr.head.getInt(1) == 4 && tr.head.getInt(2) == 8)
    val ci = s.sql(s"CALL g.system.create_index(table => 'db.prevec', " +
      s"column => 'vec', index_type => 'IVF_FLAT', id_col => 'id', " +
      s"ivf_centroids_file => '$model')").collect()
    assert(ci.head.getString(0) == "ivf_vec")
    // the committed entry records the provenance and the model's nlist
    val idxRows = s.sql("CALL g.system.indices(table => 'db.prevec')").collect()
    assert(idxRows.exists(_.getString(0) == "ivf_vec"))
    // ivf_partition reads one partition's membership (VectorIndexReader
    // read_partition parity); the four partitions tile the 64 ids
    val sizes = (0 until 4).map { pid =>
      s.sql(s"CALL g.system.ivf_partition(table => 'db.prevec', " +
        s"name => 'ivf_vec', pid => $pid)").count()
    }
    assert(sizes.sum == 64, s"partitions ${sizes.mkString(",")} must tile the corpus")
    assert(sizes.forall(_ > 0), "well-separated anchors: every partition non-empty")
  }
}
