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
  * Round-2 hook: `listFiles` receives `dataFilters`; fragment-level min/max
  * stats in the manifest will prune fragments here (zonemap-equivalent,
  * reference `scalar/zonemap.rs`), on top of parquet row-group pruning that
  * already happens per task.
  */
class GraftFileIndex(
    spark: SparkSession,
    tablePath: Path,
    manifest: GraftManifest) extends FileIndex {

  private val statuses: Seq[FileStatus] = manifest.fragments.map { f =>
    new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
      new Path(tablePath, f.path))
  }

  override def rootPaths: Seq[Path] = Seq(tablePath)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))

  override def inputFiles: Array[String] =
    statuses.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = manifest.fragments.map(_.sizeBytes).sum

  override def partitionSchema: StructType = new StructType()
}
