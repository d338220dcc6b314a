package graft.format

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.StructType

/** Catalyst integration for the graft format (SURVEY §4 "custom rules").
  *
  * [[GraftDvRule]] rewrites any `format("graft")` relation whose snapshot
  * carries deletion vectors into the DV anti-join plan that
  * [[GraftTable.read]] builds — so with the extension installed,
  * `spark.read.format("graft")` is fully correct on mutated tables, and SQL
  * over graft temp views inherits the same semantics. The rewrite preserves
  * the relation's output attribute ids (parents of the node are untouched).
  *
  * Install: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.format.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(session => new GraftDvRule(session))
  }
}

class GraftDvRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr @ LogicalRelation(
        HadoopFsRelation(gfi: GraftFileIndex, _, _, _, _, _), _, _, _, _)
        if gfi.manifest.dvFiles.nonEmpty && !gfi.dvApplied =>
      rewrite(lr, gfi)
  }

  private def rewrite(lr: LogicalRelation, gfi: GraftFileIndex): LogicalPlan = {
    val m = gfi.manifest
    // fresh relation over the same snapshot, marked dvApplied
    val relation = HadoopFsRelation(
      location = new GraftFileIndex(session, gfi.tablePath, m, dvApplied = true),
      partitionSchema = new StructType(),
      dataSchema = m.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(session)
    val base = ColumnBridge.ofRows(session, LogicalRelation(relation, isStreaming = false))
    val addr = shiftleft(regexp_extract(col("_metadata.file_name"),
      "frag-(\\d+)\\.parquet$", 1).cast("long"), 32)
      .plus(col("_metadata.row_index"))
    val dv = session.read
      .parquet(m.dvFiles.map(p => new org.apache.hadoop.fs.Path(gfi.tablePath, p).toString): _*)
      .select(col("addr").as(GraftTable.RowAddrCol)).distinct()
    val joined = base.withColumn(GraftTable.RowAddrCol, addr)
      .join(dv, Seq(GraftTable.RowAddrCol), "left_anti")
      .drop(GraftTable.RowAddrCol)
    val analyzed = joined.queryExecution.analyzed
    // restore the original relation's attribute ids for the parents
    val out: Seq[NamedExpression] = lr.output.zip(analyzed.output).map {
      case (orig, fresh) => Alias(fresh, orig.name)(exprId = orig.exprId)
    }
    Project(out, analyzed)
  }
}
