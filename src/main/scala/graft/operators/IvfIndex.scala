package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** IVF (inverted-file) vector index: coarse k-means partitioning + partition-
  * pruned search.
  *
  * Capability mirror of the reference's IVF family
  * (`rust/lance-index/src/vector/ivf/`, `kmeans.rs`;
  * `ANNIvfPartitionExec`/`ANNIvfSubIndexExec`, `io/exec/knn.rs:359,579`),
  * Spark-first:
  *
  *  - **train**: deterministic Lloyd's on a driver-side sample (the
  *    reference trains centroids on a sample too — `dataset.py:2517`);
  *    centroids are small (nlist × dim floats).
  *  - **build**: one distributed pass assigns every vector its nearest
  *    centroid via [[IvfAssign]]; the index dataset is parquet
  *    `partitionBy(__ivf_pid)` — partition values become directories, so
  *    probing IS directory pruning, Spark-native.
  *  - **search**: rank centroids on the driver (nlist ops), scan only the
  *    `nprobes` chosen partitions, exact distances within them, global
  *    top-k via TakeOrderedAndProject. Cost scales with nprobes/nlist of
  *    the data — the 100 TB path. With nprobes = nlist the result is
  *    EXACTLY flat search (gate-checkable against the brute-force oracle).
  *
  * [[PqIndex]] adds PQ sub-quantization within partitions (`vector/pq/`)
  * and [[HnswIndex]] adds per-partition graph sub-indexes (`vector/hnsw/`);
  * all three share this coarse IVF layout.
  */
object IvfIndex {
  val PidCol = "__ivf_pid"

  case class Model(centroids: Array[Array[Float]]) {
    def nlist: Int = centroids.length
    /** Partitions ranked by centroid distance to the query (driver-side). */
    def rank(query: Array[Float]): Seq[Int] =
      centroids.indices.sortBy(i => l2sq(centroids(i), query))
  }

  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Deterministic Lloyd's: init = vectors of the `nlist` smallest ids in
    * the sample; fixed iteration count; ties to the lowest partition id. */
  def train(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
            maxIter: Int = 10, sampleSize: Int = 100000): Model = {
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    require(sample.length >= nlist, s"need >= $nlist vectors to train, got ${sample.length}")
    var centroids = sample.take(nlist).map(_.clone())
    for (_ <- 0 until maxIter) {
      val sums = Array.fill(nlist)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](nlist)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var i = 0
        while (i < nlist) {
          val d = l2sq(centroids(i), v)
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < v.length) { s(j) += v(j); j += 1 }
      }
      centroids = centroids.indices.map { i =>
        if (counts(i) == 0) centroids(i)
        else sums(i).map(x => (x / counts(i)).toFloat)
      }.toArray
    }
    Model(centroids)
  }

  /** Build the index dataset: assign pids, write partitioned parquet +
    * centroids sidecar. */
  def build(df: DataFrame, idCol: String, vecCol: String, indexPath: String,
            nlist: Int, maxIter: Int = 10): Model = {
    val model = train(df, idCol, vecCol, nlist, maxIter)
    val assigned = df.withColumn(PidCol,
      ColumnBridge.column(IvfAssign(ColumnBridge.expression(col(vecCol)), model.centroids)))
    assigned.write.mode(SaveMode.Overwrite).partitionBy(PidCol).parquet(s"$indexPath/vectors")
    val spark = df.sparkSession
    val rows = model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    spark.createDataFrame(rows.toSeq).toDF("pid", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexPath/centroids")
    model
  }

  def loadModel(spark: SparkSession, indexPath: String): Model = {
    val rows = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("pid").collect()
    Model(rows.map(r => r.getSeq[Float](1).toArray))
  }

  /** ANN search: probe the `nprobes` nearest partitions, exact distances
    * inside, global top-k. `nprobes >= nlist` ⇒ identical to flat search. */
  def search(spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
             query: Array[Float], k: Int, nprobes: Int,
             metric: String = "l2"): DataFrame = {
    val model = loadModel(spark, indexPath)
    val probes = model.rank(query).take(math.min(nprobes, model.nlist))
    val candidates = spark.read.parquet(s"$indexPath/vectors")
      .filter(col(PidCol).isin(probes: _*))
    Knn.flatSearch(candidates, vecCol, query, k, metric,
      tieBreakers = Seq(col(idCol))).drop(PidCol)
  }

  /** Build over a graft table snapshot, recording the covered version —
    * the input to [[searchCombined]]'s fresh-data handling and
    * [[optimizeForTable]]'s delta append. The index rows carry `_rowaddr`
    * so post-build deletions can be subtracted at query time. */
  def buildForTable(spark: SparkSession, tablePath: String, idCol: String,
                    vecCol: String, indexPath: String, nlist: Int): Model = {
    val version = graft.format.GraftTable.latestVersion(spark, tablePath).getOrElse(0L)
    val model = build(
      graft.format.GraftTable.read(spark, tablePath, withRowAddr = true),
      idCol, vecCol, indexPath, nlist)
    graft.index.ScalarIndex.writeVersionMarker(spark, indexPath, version)
    model
  }

  /** Incremental index maintenance (reference `optimize_indices`,
    * `rust/lance/src/dataset/index.rs`): assign ONLY the fragments appended
    * since the build to the EXISTING centroids and append them into the
    * partitioned index dataset — no retrain, no rewrite of indexed rows.
    * Returns the number of newly indexed rows. At 100 TB, maintenance IO is
    * O(delta); centroid quality drifts only as far as the data distribution
    * does (the reference makes the same trade — retrain is a rebuild). */
  def optimizeForTable(spark: SparkSession, tablePath: String, idCol: String,
                       vecCol: String, indexPath: String): Long = {
    import graft.format.GraftTable
    val vi = graft.index.ScalarIndex.indexedVersion(spark, indexPath)
      .getOrElse(throw new IllegalStateException(
        s"$indexPath has no version marker — build with buildForTable"))
    val m = GraftTable.loadManifest(spark, tablePath)
    val freshFrags = m.fragments.filter(_.addedVersion > vi)
    if (freshFrags.isEmpty) {
      graft.index.ScalarIndex.writeVersionMarker(spark, indexPath, m.version)
      return 0L
    }
    val model = loadModel(spark, indexPath)
    val fresh = GraftTable.readFragments(spark, tablePath, m, freshFrags,
      withRowAddr = true)
    val assigned = fresh.withColumn(PidCol,
      ColumnBridge.column(IvfAssign(ColumnBridge.expression(col(vecCol)), model.centroids)))
    assigned.write.mode(SaveMode.Append).partitionBy(PidCol)
      .parquet(s"$indexPath/vectors")
    graft.index.ScalarIndex.writeVersionMarker(spark, indexPath, m.version)
    freshFrags.map(_.rows).sum
  }

  /** `knn_combined` (reference `scanner.rs:2946-3030`): ANN over the
    * fragments the index covers, UNION flat KNN over fragments appended
    * since the index was built, then merged global top-k — correct results
    * on fresh data without waiting for an index rebuild. The flat side
    * scans only the new fragments (fragment metadata carries
    * `addedVersion`, the role of the reference's `fragment_bitmap`).
    */
  def searchCombined(spark: SparkSession, tablePath: String, indexPath: String,
                     idCol: String, vecCol: String, query: Array[Float],
                     k: Int, nprobes: Int): DataFrame = {
    import graft.format.GraftTable
    val indexedVersion = graft.index.ScalarIndex.indexedVersion(spark, indexPath)
      .getOrElse(throw new IllegalStateException(
        s"$indexPath has no version marker — build with buildForTable"))
    val m = GraftTable.loadManifest(spark, tablePath)
    // rows deleted AFTER the build are still in the index dataset: overfetch
    // by the table's deleted count (bounded, usually small pre-compaction),
    // subtract by the stored _rowaddr, re-cut to k (reference prefilter
    // semantics, `scanner.rs` prefilter + `knn.rs`)
    val addrCol = graft.format.GraftTable.RowAddrCol
    val overfetch = k + math.min(m.numDeleted, Int.MaxValue.toLong - k).toInt
    val raw = search(spark, indexPath, idCol, vecCol, query, overfetch, nprobes)
    val indexed0 =
      if (m.dvFiles.isEmpty || !raw.columns.contains(addrCol)) raw
      else {
        val t = new org.apache.hadoop.fs.Path(tablePath)
        val dv = spark.read.parquet(
            m.dvFiles.map(p => new org.apache.hadoop.fs.Path(t, p).toString): _*)
          .select(col("addr").as(addrCol)).distinct()
        raw.join(dv, Seq(addrCol), "left_anti")
      }
    val indexed = indexed0
      .orderBy(col(Knn.DistanceCol), col(idCol)).limit(k)
      .select(col(idCol), col(Knn.DistanceCol))
    val freshFrags = m.fragments.filter(_.addedVersion > indexedVersion)
    if (freshFrags.isEmpty) return indexed
    val fresh = Knn.flatSearch(
        GraftTable.readFragments(spark, tablePath, m, freshFrags),
        vecCol, query, k, "l2", tieBreakers = Seq(col(idCol)))
      .select(col(idCol), col(Knn.DistanceCol))
    indexed.unionByName(fresh)
      .orderBy(col(Knn.DistanceCol), col(idCol))
      .limit(k)
  }
}

/** Nearest-centroid assignment: argmin over the embedded centroid table.
  * One O(nlist · dim) pass per row; centroids ride along in the serialized
  * expression (they are small). Ties resolve to the lowest pid —
  * deterministic across runs and executors.
  */
case class IvfAssign(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_assign requires array<float|double>, got ${t.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var acc = 0.0
      var i = 0
      val m = math.min(n, cent.length)
      while (i < m) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val d = v - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
