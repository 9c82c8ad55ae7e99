package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Aggregate function contract — mirrors the reference's five-phase lifecycle
 * (`create_state / accumulate / retract / merge / finish`, SURVEY §2.1 #15-16;
 * reference `arrow-udf-runtime/src/python/mod.rs:229-309,456-656`).
 *
 * Spark's planner drives exactly the partial-aggregation split the reference
 * documents: per-partition `accumulate` (partial), shuffle states, `merge`
 * (final), `finish`. `retract` has no batch analogue — it is exercised by the
 * streaming path ([[graft.streaming]]) where late/updated rows are retracted
 * from running state.
 */
abstract class GraftAggregate[S, O] extends Serializable {
  def createState(): S
  def accumulate(state: S, input: Row): S
  /** Inverse of accumulate; optional (reference: retractable aggregates). */
  def retract(state: S, input: Row): S =
    throw new UnsupportedOperationException(s"$getClass is append-only")
  def merge(a: S, b: S): S
  def finish(state: S): O
}

object GraftAggregates {

  /** Lower a [[GraftAggregate]] onto a Spark UDAF. `stateEncoder` chooses the
    * state representation: a product encoder for transparent struct state, or
    * `Encoders.javaSerialization` for opaque binary state — the analogue of
    * the reference's `arrowudf.pickle` extension state (SURVEY §2.1 #17).
    *
    * Compatibility tier: `ScalaAggregator` deserializes every input row into
    * an external `Row` (RowEncoder), which costs an object array +
    * `GenericRowWithSchema` per row. The hot path for registered aggregates is
    * [[GraftTypedAgg]], which skips that entirely. */
  def lower[S, O](g: GraftAggregate[S, O], inputSchema: StructType,
                  stateEnc: Encoder[S], outputEnc: Encoder[O]): UserDefinedFunction = {
    val agg = new Aggregator[Row, S, O] {
      override def zero: S = g.createState()
      override def reduce(b: S, a: Row): S = g.accumulate(b, a)
      override def merge(b1: S, b2: S): S = g.merge(b1, b2)
      override def finish(reduction: S): O = g.finish(reduction)
      override def bufferEncoder: Encoder[S] = stateEnc
      override def outputEncoder: Encoder[O] = outputEnc
    }
    org.apache.spark.sql.functions.udaf(agg, Encoders.row(inputSchema))
  }
}

/**
 * Reusable external-`Row` facade over a projected `InternalRow` — lets a
 * [[GraftAggregate]] read typed fields with zero per-row materialization (the
 * deserialization `ScalaAggregator` pays on every input row). Primitive
 * accessors read the underlying unsafe row directly; generic `get` converts
 * lazily on access. The instance is only valid for the duration of one
 * `accumulate` call — implementations must not retain it.
 */
final class AggInputRow(types: Array[DataType]) extends Row {
  private var cur: InternalRow = _
  def target(r: InternalRow): Unit = cur = r

  override def length: Int = types.length
  override def isNullAt(i: Int): Boolean = cur.isNullAt(i)
  override def getBoolean(i: Int): Boolean = cur.getBoolean(i)
  override def getByte(i: Int): Byte = cur.getByte(i)
  override def getShort(i: Int): Short = cur.getShort(i)
  override def getInt(i: Int): Int = cur.getInt(i)
  override def getLong(i: Int): Long = cur.getLong(i)
  override def getFloat(i: Int): Float = cur.getFloat(i)
  override def getDouble(i: Int): Double = cur.getDouble(i)
  override def getString(i: Int): String =
    if (cur.isNullAt(i)) null else cur.getUTF8String(i).toString

  @transient private lazy val toScala: Array[Any => Any] =
    types.map(CatalystTypeConverters.createToScalaConverter)
  override def get(i: Int): Any =
    if (cur.isNullAt(i)) null else toScala(i)(cur.get(i, types(i)))
  override def copy(): Row = Row.fromSeq(Seq.tabulate(length)(get))
}

/**
 * Native lowering of a [[GraftAggregate]]: a Catalyst
 * `TypedImperativeAggregate` whose `update` hands the user function a reusable
 * [[AggInputRow]] over the projected input — no per-row encoder work, no
 * boxing beyond what the state type itself requires. State rides the shuffle
 * as java-serialized bytes (the `arrowudf.pickle` analogue; only one state per
 * group per partition is ever serialized, so this is off the hot path).
 */
case class GraftTypedAgg[S](
    name: String,
    agg: GraftAggregate[S, _],
    resultType: DataType,
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[S] {

  override def createAggregationBuffer(): S = agg.createState()

  @transient private lazy val proj = UnsafeProjection.create(children)
  @transient private lazy val facade = new AggInputRow(children.map(_.dataType).toArray)
  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(resultType)

  override def update(buffer: S, row: InternalRow): S = {
    facade.target(proj(row))
    agg.accumulate(buffer, facade)
  }
  override def merge(buffer: S, other: S): S = agg.merge(buffer, other)
  override def eval(buffer: S): Any = toCatalyst(agg.finish(buffer))

  override def serialize(buffer: S): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(buffer.asInstanceOf[AnyRef]); oos.close()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): S = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[S] finally ois.close()
  }

  override def nullable: Boolean = true
  override def dataType: DataType = resultType
  override def prettyName: String = name
  override def withNewMutableAggBufferOffset(newOffset: Int): GraftTypedAgg[S] =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftTypedAgg[S] =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftTypedAgg[S] =
    copy(children = newChildren)
}

// ---- conformance aggregates (reference tests/python.rs:670-913) ------------

/** `sum` — the reference's simplest aggregate; Long state. */
class SumAgg extends GraftAggregate[Long, Long] {
  override def createState(): Long = 0L
  override def accumulate(state: Long, input: Row): Long =
    if (input.isNullAt(0)) state else state + input.getInt(0)
  override def retract(state: Long, input: Row): Long =
    if (input.isNullAt(0)) state else state - input.getInt(0)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(state: Long): Long = state
}

/** weighted_avg — struct state `{sum, weight}`, float output, with merge +
  * finish (reference `tests/python.rs:746-913`). */
case class WAvgState(sum: Long, weight: Long)
class WeightedAvgAgg extends GraftAggregate[WAvgState, Double] {
  override def createState(): WAvgState = WAvgState(0L, 0L)
  override def accumulate(s: WAvgState, in: Row): WAvgState =
    if (in.isNullAt(0) || in.isNullAt(1)) s
    else WAvgState(s.sum + in.getInt(0).toLong * in.getInt(1), s.weight + in.getInt(1))
  override def retract(s: WAvgState, in: Row): WAvgState =
    if (in.isNullAt(0) || in.isNullAt(1)) s
    else WAvgState(s.sum - in.getInt(0).toLong * in.getInt(1), s.weight - in.getInt(1))
  override def merge(a: WAvgState, b: WAvgState): WAvgState =
    WAvgState(a.sum + b.sum, a.weight + b.weight)
  override def finish(s: WAvgState): Double =
    if (s.weight == 0) Double.NaN else s.sum.toDouble / s.weight.toDouble
}

/** Exact median with opaque (java-serialized) state — the `arrowudf.pickle`
  * analogue: arbitrary JVM state rides as binary through the shuffle.
  *
  * '''Memory contract''': exact median is not computable in sublinear state,
  * so this aggregate holds O(group size) values per group — it exists to
  * demonstrate the opaque-state lifecycle. It is registered under the
  * explicitly opt-in name `median_exact_unbounded` (the default
  * `median_udaf` is [[BoundedMedianAgg]], O(cap) state per group), and it
  * fails LOUDLY — not with an executor OOM — when any one group exceeds
  * `maxValues` (default 2^26 doubles ≈ 512 MB of state). At 100 TB-scale
  * group sizes, use the bounded default or Spark's
  * `percentile_approx(col, 0.5, accuracy)` (QuantileSummaries /
  * Greenwald–Khanna, O(accuracy) state per group) — see AggregateSpec for
  * the accuracy cross-check against this exact aggregate. */
class MedianAgg(maxValues: Int = 1 << 26)
  extends GraftAggregate[java.util.ArrayList[Double], Double] {
  private def guard(n: Int): Unit =
    require(n <= maxValues,
      s"median_exact_unbounded: a single group exceeds $maxValues values — " +
        "exact unbounded median holds O(group) state; use median_udaf " +
        "(bounded) or percentile_approx for groups this hot")
  override def createState(): java.util.ArrayList[Double] = new java.util.ArrayList[Double]()
  override def accumulate(s: java.util.ArrayList[Double], in: Row): java.util.ArrayList[Double] = {
    if (!in.isNullAt(0)) { guard(s.size + 1); s.add(in.getDouble(0)) }
    s
  }
  override def merge(a: java.util.ArrayList[Double], b: java.util.ArrayList[Double]): java.util.ArrayList[Double] = {
    guard(a.size + b.size); a.addAll(b); a
  }
  override def finish(s: java.util.ArrayList[Double]): Double = {
    if (s.isEmpty) return Double.NaN
    val arr = new Array[Double](s.size)
    var i = 0
    while (i < arr.length) { arr(i) = s.get(i); i += 1 }
    java.util.Arrays.sort(arr)
    val n = arr.length
    if (n % 2 == 1) arr(n / 2) else (arr(n / 2 - 1) + arr(n / 2)) / 2.0
  }
}

/** Bounded-memory median — the scale-safe companion to [[MedianAgg]].
  *
  * State is EXACT (every value kept, result identical to [[MedianAgg]] and to
  * SQL `median`) while a group holds ≤ `cap` values; past that it collapses
  * into a weighted-centroid histogram of ≤ `cap / 4` (value, weight) pairs
  * (streaming-histogram compression: repeatedly merge the two closest
  * centroids — Ben-Haim & Yom-Tov's decision-tree histogram), so per-group
  * state is O(cap) REGARDLESS of group size: a hot key at 100 TB costs
  * ~¼ MiB, not an executor OOM. The sketch median is approximate (error
  * tracks local centroid density, cross-checked ≤1% vs exact in
  * AggregateSpec); groups under the cap lose nothing.
  *
  * Default cap 32768 (≈256 KiB exact-phase state): the sf1 scale-up oracle
  * caught the old 4096 default degrading 6000-row groups to the sketch —
  * a ~0.2% divergence from SQL `median`, inside the contract but paying
  * approximation for memory nobody was short of. The frontier now sits at
  * 32k rows per group; genuinely hot keys still collapse instead of OOM.
  *
  * Append-only: retraction from a collapsed histogram is not meaningful.
  */
class BoundedMedianAgg(cap: Int = 32768)
  extends GraftAggregate[BoundedMedianAgg.State, Double] {
  import BoundedMedianAgg.State
  private val sketchCap = math.max(64, cap / 4)

  override def createState(): State = new State

  override def accumulate(s: State, in: Row): State = {
    if (!in.isNullAt(0)) {
      if (s.exact != null) {
        s.exact.add(in.getDouble(0))
        if (s.exact.size > cap) spill(s)
      } else {
        s.buf.add(Array(in.getDouble(0), 1.0))
        if (s.buf.size > 2 * sketchCap) compress(s)
      }
    }
    s
  }

  override def merge(a: State, b: State): State = {
    if (a.exact != null && b.exact != null) {
      a.exact.addAll(b.exact)
      if (a.exact.size > cap) spill(a)
      return a
    }
    if (a.exact != null) spill(a)
    if (b.exact != null) spill(b)
    a.buf.addAll(b.buf)
    if (a.buf.size > 2 * sketchCap) compress(a)
    a
  }

  override def finish(s: State): Double = {
    if (s.exact != null) {
      if (s.exact.isEmpty) return Double.NaN
      val arr = new Array[Double](s.exact.size)
      var i = 0
      while (i < arr.length) { arr(i) = s.exact.get(i); i += 1 }
      java.util.Arrays.sort(arr)
      val n = arr.length
      return if (n % 2 == 1) arr(n / 2) else (arr(n / 2 - 1) + arr(n / 2)) / 2.0
    }
    compress(s)
    // weighted median over the sorted centroids
    var total = 0.0
    s.buf.forEach(c => total += c(1))
    var cum = 0.0
    var i = 0
    while (i < s.buf.size) {
      cum += s.buf.get(i)(1)
      if (cum >= total / 2) return s.buf.get(i)(0)
      i += 1
    }
    Double.NaN
  }

  /** Exact → sketch: every value becomes a weight-1 centroid, then compress. */
  private def spill(s: State): Unit = {
    s.buf = new java.util.ArrayList[Array[Double]](s.exact.size)
    var i = 0
    while (i < s.exact.size) { s.buf.add(Array(s.exact.get(i), 1.0)); i += 1 }
    s.exact = null
    compress(s)
  }

  /** Sort by value and repeatedly merge the two closest centroids (weighted
    * mean) until ≤ sketchCap remain. */
  private def compress(s: State): Unit = {
    if (s.buf.size <= sketchCap) return
    val arr = new Array[Array[Double]](s.buf.size)
    s.buf.toArray(arr)
    java.util.Arrays.sort(arr, java.util.Comparator.comparingDouble((c: Array[Double]) => c(0)))
    var n = arr.length
    while (n > sketchCap) {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < n - 1) {
        val gap = arr(i + 1)(0) - arr(i)(0)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val (a, b) = (arr(best), arr(best + 1))
      val w = a(1) + b(1)
      arr(best) = Array((a(0) * a(1) + b(0) * b(1)) / w, w)
      System.arraycopy(arr, best + 2, arr, best + 1, n - best - 2)
      n -= 1
    }
    s.buf = new java.util.ArrayList[Array[Double]](n)
    var i = 0
    while (i < n) { s.buf.add(arr(i)); i += 1 }
  }
}

object BoundedMedianAgg {
  /** Exactly one of `exact` (values) / `buf` (centroids) is live; both are
    * java-serialized opaque state like [[MedianAgg]]'s. */
  final class State extends Serializable {
    var exact: java.util.ArrayList[Double] = new java.util.ArrayList[Double]()
    var buf: java.util.ArrayList[Array[Double]] = _
  }
}

object ConformanceAggregates {
  import org.apache.spark.sql.types._

  def registerAll(): Unit = {
    Udf.aggregateNative("sum_udaf(int) -> bigint")(new SumAgg)
    Udf.aggregateNative("weighted_avg(int, int) -> double")(new WeightedAvgAgg)
    // The DEFAULT median is the bounded-state form: exact while a group
    // holds <= cap values (far above every oracle SF's group sizes, so the
    // cross-engine hash gates exercise the EXACT path), O(cap) state on a
    // hot key at any scale. The O(group)-state demo stays available under
    // an explicitly scary opt-in name with a loud group-size guard.
    Udf.aggregateNative("median_udaf(double) -> double")(new BoundedMedianAgg())
    Udf.aggregateNative("median_bounded(double) -> double")(new BoundedMedianAgg())
    Udf.aggregateNative("median_exact_unbounded(double) -> double")(new MedianAgg())

    // Compatibility tier kept registered (and spec-covered) under a distinct
    // name: the UDAF/Aggregator lowering with an explicit state encoder.
    Udf.aggregate("sum_udaf_boxed(int) -> bigint", GraftAggregates.lower(
      new SumAgg, StructType(Seq(StructField("v", IntegerType))),
      Encoders.scalaLong, Encoders.scalaLong))
  }
}
