package graft.format

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** FileIndex over a graft snapshot: hands Spark's parquet FileFormat exactly
  * the fragment files of one table version. File statuses are fabricated
  * from manifest metadata (size from commit time) — NO filesystem listing at
  * plan time, which is what keeps planning O(1) IO at 100k-fragment scale
  * (the manifest is the listing, as in the reference's fragment list).
  *
  * `listFiles` prunes fragments with the manifest's per-fragment min/max/
  * nullCount stats (zonemap-equivalent, reference `scalar/zonemap.rs`), on
  * top of parquet row-group pruning that happens per task.
  */
/** Shared parsing for the `graft.scan.*` boolean escape hatches (parsed
  * like Spark's own boolean confs: False/FALSE/0 all disable). One place,
  * so the two scan knobs can't drift apart. */
private[graft] object GraftConf {
  def isDisabled(spark: SparkSession, key: String): Boolean =
    Seq("false", "0").contains(spark.conf.get(key, "true").trim.toLowerCase)
}

class GraftFileIndex(
    spark: SparkSession,
    val tablePath: Path,
    val manifest: GraftManifest,
    /** true once the DV anti-join has been planned around this index
      * (prevents the extension rule from rewriting its own output). */
    val dvApplied: Boolean = false,
    /** true once a scalar-index mask semi-join has been planned around this
      * index (prevents the index rule from re-rewriting). */
    val maskApplied: Boolean = false,
    /** true once the `_rowaddr` point-lookup rule has pruned this index's
      * fragment list (prevents re-pruning loops). */
    val addrPruned: Boolean = false) extends FileIndex {

  private def status(f: FragmentMeta): FileStatus =
    new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
      new Path(tablePath, f.path))

  override def rootPaths: Seq[Path] = Seq(tablePath)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // zonemap pruning: drop fragments whose min/max/nullCount stats prove the
    // pushed predicates can't match (reference ZONEMAP semantics; the
    // manifest is the zone map, so this is zero extra IO).
    // `graft.scan.use_stats=false` (reference ScannerBuilder.use_stats) turns
    // it off — the debugging/benchmarking knob for isolating pruning effects.
    val useStats = !GraftConf.isDisabled(spark, "graft.scan.use_stats")
    val kept =
      if (!useStats) manifest.fragments
      else manifest.fragments.filter { f =>
        dataFilters.forall(e => FragmentStats.mayMatch(f.stats, f.rows, e))
      }
    prunedTo = kept.length
    lastKept = kept
    Seq(PartitionDirectory(InternalRow.empty, kept.map(status).toArray))
  }

  /** observability: fragments surviving the last listFiles pruning */
  @volatile var prunedTo: Int = manifest.fragments.length

  /** observability: WHICH fragments survived (metadata-sized; rows/bytes
    * feed [[ScanAnalyze]] / `CALL g.system.analyze`) */
  @volatile var lastKept: Seq[FragmentMeta] = manifest.fragments

  override def inputFiles: Array[String] =
    manifest.fragments.map(f => new Path(tablePath, f.path).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = manifest.fragments.map(_.sizeBytes).sum

  override def partitionSchema: StructType = new StructType()
}
