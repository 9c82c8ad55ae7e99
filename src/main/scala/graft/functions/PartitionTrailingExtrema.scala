package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Monotonic-deque trailing-window extremum state — the O(1)-amortized
 * sliding-extrema structure [[PartitionTrailingExtrema]] evaluates through.
 * One instance per (expression, partition); arrays are bounded by `window`
 * (deque positions within one window are strictly increasing, so at most
 * `window` entries are ever live).
 *
 * NULL semantics mirror the window-aggregate formulation this replaced:
 * null values never enter the deque (max/min ignore nulls) and a window
 * containing no non-null value yields null.
 */
final class TrailingExtremaBuf(window: Int, isMax: Boolean) {
  private val pos = new Array[Long](window)
  private val va = new Array[Long](window)
  private var head = 0
  private var len = 0
  private var rowIdx = 0L
  private var prevKey: AnyRef = null
  private var sawRow = false
  private var nullOut = false

  private def keyChanged(k: AnyRef): Boolean =
    !sawRow || (if (prevKey == null) k != null else !prevKey.equals(k))

  /** Advance one row (in partition-sorted order) and return the trailing
    * `window`-row extremum for the group keyed by `k`. Read [[lastNull]]
    * immediately after — it reports whether THIS result is null. */
  def next(k: AnyRef, vIsNull: Boolean, v: Long): Long = {
    if (keyChanged(k)) {
      head = 0; len = 0; rowIdx = 0L
      // keys may be backed by reused buffers (UTF8String over an UnsafeRow)
      // — copy on store, compare by value
      prevKey = k match {
        case u: UTF8String => u.copy()
        case other => other
      }
      sawRow = true
    }
    while (len > 0 && pos(head) <= rowIdx - window) {
      head += 1; if (head == window) head = 0
      len -= 1
    }
    if (!vIsNull) {
      while (len > 0 && {
        var t = head + len - 1; if (t >= window) t -= window
        if (isMax) va(t) <= v else va(t) >= v
      }) len -= 1
      var t = head + len; if (t >= window) t -= window
      pos(t) = rowIdx; va(t) = v; len += 1
    }
    rowIdx += 1L
    nullOut = len == 0
    if (nullOut) 0L else va(head)
  }

  def lastNull: Boolean = nullOut
}

/**
 * Trailing-window extremum over a partition-sorted scan: for each row,
 * `max`/`min` of `value` over the trailing `window` rows (current row
 * inclusive) of its `key` group — the monotonic-deque formulation of
 * rolling extrema, O(1) amortized per row in ONE pass over ONE sort.
 *
 * Replaces the Lemire tile decomposition [[graft.ops.TimeSeries]] used
 * through Spark windows, which needed FOUR in-partition sorts (row_number
 * asc, per-tile prefix asc, per-tile suffix desc, cross-tile lag asc) —
 * Spark cannot prove the tile orderings compatible and re-sorts for each
 * window spec.
 *
 * Ordering contract (same family as [[PartitionRunningSum]]): evaluates in
 * partition-iterator order and is meaningful only directly above a source
 * whose partitions are hash-clustered by the group key and sorted by
 * (key, order...) — rollingExtrema pins that by wrapping the repartitioned,
 * partition-sorted plan as a compiled InternalRow RDD behind a LogicalRDD
 * barrier. Marked nondeterministic so Catalyst never reorders, collapses,
 * or pushes anything across it. Group keys must be atomic values (value
 * equality detects group boundaries; UTF8String keys are defensively
 * copied).
 */
case class PartitionTrailingExtrema(key: Expression, value: Expression,
    window: Int, isMax: Boolean) extends Expression with Nondeterministic {

  override def children: Seq[Expression] = Seq(key, value)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (isMax) "partition_trailing_max" else "partition_trailing_min"

  // fresh-copied per projection/thread, like MonotonicallyIncreasingID
  override def stateful: Boolean = true

  @transient private var buf: TrailingExtremaBuf = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    buf = new TrailingExtremaBuf(window, isMax)

  override protected def evalInternal(input: InternalRow): Any = {
    val k = key.eval(input).asInstanceOf[AnyRef]
    val v = value.eval(input)
    val out = buf.next(k, v == null, if (v == null) 0L else v.asInstanceOf[Long])
    if (buf.lastNull) null else java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bufCls = classOf[TrailingExtremaBuf].getName
    val bufTerm = ctx.addMutableState(bufCls, "pteBuf")
    ctx.addPartitionInitializationStatement(
      s"$bufTerm = new $bufCls($window, $isMax);")
    val k = key.genCode(ctx)
    val v = value.genCode(ctx)
    val keyObj =
      if (key.nullable) s"(${k.isNull} ? null : (Object) ${k.value})"
      else s"(Object) ${k.value}"
    val vNull = if (value.nullable) v.isNull.toString else "false"
    val vVal = s"(${vNull} ? 0L : ${v.value})"
    ev.copy(code = code"""
      ${k.code}
      ${v.code}
      long ${ev.value} = $bufTerm.next($keyObj, $vNull, $vVal);
      boolean ${ev.isNull} = $bufTerm.lastNull();""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PartitionTrailingExtrema =
    copy(key = newChildren(0), value = newChildren(1))
}
