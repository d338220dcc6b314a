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
    e.injectResolutionRule(session => new GraftScalarIndexRule(session))
  }
}

/** Filter → scalar-index rewrite (SURVEY §2.7 / reference
  * `apply_scalar_indices`, `lance-index/src/scalar/expression.rs:1549`):
  *
  * `Filter(cond, graftRelation)` where some conjunct of `cond` is sargable
  * on a column with a FRESH btree index (`<table>/_indices/btree_<col>`,
  * indexed version == snapshot version) becomes
  *
  * `Filter(cond, SemiJoin(relation+addr, indexLookup(conjunct)))`
  *
  * i.e. the index produces a row-address mask (the reference's
  * `IndexExprResult` exact mask); the ORIGINAL filter stays on top as the
  * refine step, so the rewrite is correctness-preserving by construction.
  * A stale or absent index leaves the plan untouched.
  */
class GraftScalarIndexRule(session: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        lr @ LogicalRelation(HadoopFsRelation(gfi: GraftFileIndex, _, _, _, _, _), _, _, _, _))
        if !gfi.maskApplied && gfi.manifest.dvFiles.isEmpty &&
          gfi.manifest.columnFiles.isEmpty =>
      findSargable(cond, gfi) match {
        case None => f
        case Some((colName, pred)) => rewrite(f, lr, gfi, colName, pred)
      }
  }

  /** first conjunct that is sargable on exactly one indexed+fresh column */
  private def findSargable(cond: Expression, gfi: GraftFileIndex): Option[(String, Expression)] = {
    splitConjunctivePredicates(cond).collectFirst {
      case p if p.references.size == 1 && sargableShape(p) &&
        indexFresh(gfi, p.references.head.name) =>
        (p.references.head.name, p)
    }
  }

  // At resolution time literals are usually wrapped in Cast, so accept any
  // foldable non-column side; the column side may itself be cast-wrapped.
  private def sargableShape(e: Expression): Boolean = e match {
    case And(l, r) => sargableShape(l) && sargableShape(r)
    case Or(l, r) => sargableShape(l) && sargableShape(r)
    case b: BinaryComparison =>
      (isAttrSide(b.left) && b.right.foldable) || (isAttrSide(b.right) && b.left.foldable)
    case In(a, vs) if isAttrSide(a) => vs.forall(_.foldable)
    case _ => false
  }

  private def isAttrSide(e: Expression): Boolean = e match {
    case _: AttributeReference => true
    case c: Cast => isAttrSide(c.child)
    case _ => false
  }

  private def indexDir(gfi: GraftFileIndex, colName: String): String =
    s"${gfi.tablePath}/_indices/btree_$colName"

  private def indexFresh(gfi: GraftFileIndex, colName: String): Boolean =
    graft.index.ScalarIndex.indexedVersion(session, indexDir(gfi, colName))
      .contains(gfi.manifest.version)

  private def rewrite(f: Filter, lr: LogicalRelation, gfi: GraftFileIndex,
                      colName: String, pred: Expression): LogicalPlan = {
    val m = gfi.manifest
    // mask: index rows satisfying pred (attr substituted by index's v col)
    val idx = session.read.parquet(indexDir(gfi, colName))
    val vAttr = idx.queryExecution.analyzed.output.find(_.name == "v").get
    val predOnV = pred.transform { case _: AttributeReference => vAttr }
    val mask = ColumnBridge.ofRows(session,
        Filter(predOnV, idx.queryExecution.analyzed))
      .select(col(GraftTable.RowAddrCol))
    // base relation (maskApplied) with derived addr, semi-joined to the mask
    val relation = HadoopFsRelation(
      location = new GraftFileIndex(session, gfi.tablePath, m,
        dvApplied = true, maskApplied = true),
      partitionSchema = new StructType(), dataSchema = m.schema,
      bucketSpec = None, fileFormat = new ParquetFileFormat,
      options = Map.empty)(session)
    val base = ColumnBridge.ofRows(session, LogicalRelation(relation, isStreaming = false))
    val addr = shiftleft(regexp_extract(col("_metadata.file_name"),
      "frag-(\\d+)\\.parquet$", 1).cast("long"), 32)
      .plus(col("_metadata.row_index"))
    val masked = base.withColumn(GraftTable.RowAddrCol, addr)
      .join(mask, Seq(GraftTable.RowAddrCol), "left_semi")
      .drop(GraftTable.RowAddrCol)
    val analyzed = masked.queryExecution.analyzed
    val out: Seq[NamedExpression] = lr.output.zip(analyzed.output).map {
      case (orig, fresh) => Alias(fresh, orig.name)(exprId = orig.exprId)
    }
    // original filter stays on top = refine step (exactness guaranteed)
    Filter(f.condition, Project(out, analyzed))
  }
}

/** Snapshot-semantics rule for `format("graft")` relations: applies the DV
  * anti-join AND the supplemental-column merge (no-rewrite add_columns) that
  * [[GraftTable.read]] builds, so plain DataFrame/SQL reads see exactly the
  * committed snapshot. */
class GraftDvRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr @ LogicalRelation(
        HadoopFsRelation(gfi: GraftFileIndex, _, _, _, _, _), _, _, _, _)
        if (gfi.manifest.dvFiles.nonEmpty || gfi.manifest.columnFiles.nonEmpty) &&
          !gfi.dvApplied =>
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
    val withAddr = base.withColumn(GraftTable.RowAddrCol, addr)
    val live =
      if (m.dvFiles.isEmpty) withAddr
      else {
        val dv = session.read
          .parquet(m.dvFiles.map(p => new org.apache.hadoop.fs.Path(gfi.tablePath, p).toString): _*)
          .select(col("addr").as(GraftTable.RowAddrCol)).distinct()
        withAddr.join(dv, Seq(GraftTable.RowAddrCol), "left_anti")
      }
    val joined = GraftTable.mergeColumnFiles(session, gfi.tablePath, m, live)
      .drop(GraftTable.RowAddrCol)
    val analyzed = joined.queryExecution.analyzed
    // restore the original relation's attribute ids for the parents
    val out: Seq[NamedExpression] = lr.output.zip(analyzed.output).map {
      case (orig, fresh) => Alias(fresh, orig.name)(exprId = orig.exprId)
    }
    Project(out, analyzed)
  }
}
