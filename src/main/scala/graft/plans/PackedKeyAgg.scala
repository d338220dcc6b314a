package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Opt-in packed group-key rewrite (r15, VERDICT r14 #2).
  *
  * TPC-H Q1's residual over DuckDB was pinned by tools/Q1Lab to
  * UTF8String group-key handling in the aggregate hash map (~0.16 s at
  * SF1; a packed-numeric-key A/B ran 1.5×). This rule makes that rewrite
  * available as a user assertion: listing a column in
  *
  *   spark.graft.agg.packedStringKeys = l_returnflag,l_linestatus
  *
  * asserts its values are at most [[PackStringKey.MaxBytes]] UTF-8 bytes;
  * every `GROUP BY` over the column then groups on an injectively PACKED
  * long (byte-length in the low byte, content bytes above — two distinct
  * strings can never collide, nulls stay null) and the original string is
  * restored from the packed key after the aggregate, so results — values,
  * names, schema, downstream sorts — are bit-identical to the unpacked
  * plan. The aggregate's hash map keys become longs: no UTF8String
  * hashing/equality per probed row, and whole-stage codegen keeps the
  * pack itself to one static call per input row.
  *
  * An over-length value fails the QUERY with a clear error naming the
  * conf (the assertion is the user's; the engine refuses to guess) —
  * column stats cannot prove max-length cheaply at plan time, which is
  * why this is opt-in rather than automatic.
  */
class GraftPackedKeyAggRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftPackedKeyAggRule.ConfKey

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = session.conf.get(ConfKey, "")
    if (conf.trim.isEmpty) return plan
    val names = conf.split(",").map(_.trim).filter(_.nonEmpty).toSet
    if (names.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate if agg.groupingExpressions.exists(isTarget(_, names)) =>
        val grouping = agg.groupingExpressions
        val aggExprs = agg.aggregateExpressions
        val targets = grouping.collect {
          case a: AttributeReference if isTarget(a, names) => a.exprId -> a
        }.toMap
        val newGrouping = grouping.map {
          case a: AttributeReference if targets.contains(a.exprId) =>
            PackStringKey(a)
          case g => g
        }
        // bare references to a packed key OUTSIDE aggregate functions are
        // group values: restore them from the packed key. The inner
        // PackStringKey(a) is semantically equal to the new grouping
        // expression, so physical planning maps it onto the grouping
        // attribute; references INSIDE aggregate functions read input
        // rows and stay untouched.
        def restore(e: Expression): Expression = e match {
          case ae: AggregateExpression => ae
          case a: AttributeReference if targets.contains(a.exprId) =>
            UnpackStringKey(PackStringKey(a))
          case other => other.mapChildren(restore)
        }
        val newAggExprs = aggExprs.map {
          case a: AttributeReference if targets.contains(a.exprId) =>
            Alias(UnpackStringKey(PackStringKey(a)), a.name)(exprId = a.exprId,
              qualifier = a.qualifier)
          case al @ Alias(c, name) =>
            Alias(restore(c), name)(exprId = al.exprId, qualifier = al.qualifier)
          case other => other.mapChildren(restore).asInstanceOf[NamedExpression]
        }
        agg.copy(groupingExpressions = newGrouping,
          aggregateExpressions = newAggExprs)
    }
  }

  private def isTarget(e: Expression, names: Set[String]): Boolean = e match {
    case a: AttributeReference => a.dataType == StringType && names(a.name)
    case _ => false
  }
}

object GraftPackedKeyAggRule {
  val ConfKey = "spark.graft.agg.packedStringKeys"
}

/** Injective pack of a short string into a long: byte count in the low
  * byte, content bytes little-endian above it. Values longer than
  * [[PackStringKey.MaxBytes]] bytes fail the query — the conf is the
  * user's length assertion. */
case class PackStringKey(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pack_string_key needs a string child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "pack_string_key"

  protected override def nullSafeEval(input: Any): Any =
    PackStringKey.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PackStringKey.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackStringKey {
  /** 7 content bytes + 1 length byte = 64 bits, injective. */
  val MaxBytes = 7

  def pack(s: UTF8String): Long = {
    val n = s.numBytes()
    if (n > MaxBytes)
      throw new IllegalStateException(
        s"packedStringKeys: value '${s.toString}' is $n UTF-8 bytes; " +
          s"${GraftPackedKeyAggRule.ConfKey} asserts every value of the " +
          s"listed columns fits $MaxBytes bytes — remove the column from " +
          "the conf for this dataset")
    var packed = n.toLong
    var i = 0
    while (i < n) {
      packed |= (s.getByte(i) & 0xFFL) << (8 * (i + 1))
      i += 1
    }
    packed
  }

  def unpack(packed: Long): UTF8String = {
    val n = (packed & 0xFFL).toInt
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      bytes(i) = ((packed >>> (8 * (i + 1))) & 0xFFL).toByte
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }
}

/** Inverse of [[PackStringKey]] — restores the original string from the
  * packed group key after aggregation. */
case class UnpackStringKey(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unpack_string_key needs a long child, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "unpack_string_key"

  protected override def nullSafeEval(input: Any): Any =
    PackStringKey.unpack(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PackStringKey.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
