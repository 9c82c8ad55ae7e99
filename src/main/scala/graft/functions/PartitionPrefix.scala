package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Per-partition running sum of a LONG child, seeded with a per-partition
 * starting offset — the Tungsten-native prefix attachment used by
 * [[graft.ops.Rank.globalPrefix]]. With `child = 1L` it yields the global
 * row number; with `child = value` the global running sum.
 *
 * Mirrors the stateful-codegen pattern of Spark's own
 * `MonotonicallyIncreasingID` (a mutable long in the generated class,
 * initialized in `initialize(partitionIndex)`), but seeds from a
 * driver-computed `long[]` offset table instead of `pid << 33`, turning a
 * per-partition counter into an exact GLOBAL prefix without any exchange.
 *
 * Ordering contract: evaluates in partition-iterator order, so it is
 * meaningful only directly above a source whose partitions are already
 * sorted in the target order (globalPrefix pins that by wrapping the
 * range-partitioned, partition-sorted plan as a compiled InternalRow RDD
 * behind a LogicalRDD barrier — the sort cannot be elided or reordered
 * across an RDD boundary, and both consuming passes share the one
 * shuffle). Marked nondeterministic so
 * Catalyst never reorders, collapses, or pushes anything across it.
 * Partitions absent from `offsets` (possible only when they hold no rows)
 * seed 0 — the seed is never observed.
 */
case class PartitionRunningSum(child: Expression, offsets: Array[Long])
  extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "partition_running_sum"

  // Mutable `acc` must not be shared across projections/threads:
  // stateful=true makes interpreted/mutable projections fresh-copy this
  // expression (freshCopyIfContainsStatefulExpression), exactly like
  // MonotonicallyIncreasingID.
  override def stateful: Boolean = true

  @transient private var acc: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    acc = if (partitionIndex < offsets.length) offsets(partitionIndex) else 0L

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v != null) acc += v.asInstanceOf[Long]
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "prsAcc")
    val offRef = ctx.addReferenceObj("prsOffsets", offsets, "long[]")
    ctx.addPartitionInitializationStatement(
      s"$accTerm = partitionIndex < $offRef.length ? $offRef[partitionIndex] : 0L;")
    val c = child.genCode(ctx)
    val addStmt =
      if (child.nullable) s"if (!${c.isNull}) { $accTerm += ${c.value}; }"
      else s"$accTerm += ${c.value};"
    ev.copy(
      code = code"""
        ${c.code}
        $addStmt
        final long ${ev.value} = $accTerm;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PartitionRunningSum =
    copy(child = newChild)
}
