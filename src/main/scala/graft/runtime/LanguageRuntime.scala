package graft.runtime

import graft.sig.CallMode
import org.apache.spark.sql.types.DataType

/** Source bundle for a five-phase aggregate registered through the runtime SPI
  * (reference shape: `arrow-udf-runtime/src/python/mod.rs:229-309` — a guest
  * class with create_state/accumulate/retract/merge/finish methods; here each
  * phase is its own guest function). `retract` is optional: append-only
  * aggregates omit it and fail fast if the streaming path needs retraction. */
final case class AggregateCode(
    init: String,
    accumulate: String,
    retract: Option[String],
    merge: String,
    finish: String)

/**
 * Pluggable embedded-runtime SPI — the JVM-side analogue of the reference's
 * per-language runtimes (`arrow-udf-runtime`: Python `python/mod.rs:187-309`,
 * JavaScript `javascript/mod.rs:328-456`, WASM `wasm/mod.rs:87-613`).
 *
 * A runtime owns compiled function handles and evaluates them row-at-a-time
 * (or batch-at-a-time, the implementation's choice). The Spark integration
 * instantiates ONE runtime per executor (the reference's instance-pool
 * pattern, `wasm/mod.rs:257-319`) via a `@transient lazy val` in the task
 * closure — see [[ScriptUdf]].
 *
 * Implementations must be deterministic given (code, args) unless declared
 * otherwise, and must enforce their own resource limits (the reference's JS
 * memory/timeout limits, `javascript/mod.rs:229-260`): [[ScriptRuntime]]
 * budgets interpreter steps per call.
 */
trait LanguageRuntime {
  def name: String
  /** Compile + register a scalar function body under `fname`. */
  def addFunction(fname: String, returnType: DataType, mode: CallMode, code: String): Unit
  /** Evaluate a registered function on one row of arguments. May throw — the
    * caller surfaces failures per the error-column convention. */
  def call(fname: String, args: Seq[Any]): Any
  /** Table-function form: zero or more output values per input row. */
  def callTable(fname: String, args: Seq[Any]): Iterator[Any] =
    call(fname, args) match {
      case null => Iterator.empty
      case it: Iterator[_] => it.asInstanceOf[Iterator[Any]]
      case s: Seq[_] => s.iterator.asInstanceOf[Iterator[Any]]
      case one => Iterator.single(one)
    }

  // ---- aggregates through the SPI (reference python/mod.rs:229-309,456-656)
  // Aggregate state is an opaque guest value: the host only threads it
  // between phase calls (and serializes it across the shuffle — the
  // `arrowudf.pickle` analogue).
  private def unsupportedAgg: Nothing =
    throw new UnsupportedOperationException(s"$name: aggregates unsupported")
  /** Compile + register a five-phase aggregate under `fname`. */
  def addAggregate(fname: String, returnType: DataType, code: AggregateCode): Unit =
    unsupportedAgg
  def aggCreateState(fname: String): Any = unsupportedAgg
  def aggAccumulate(fname: String, state: Any, args: Seq[Any]): Any = unsupportedAgg
  /** Inverse of accumulate; throws for append-only aggregates. */
  def aggRetract(fname: String, state: Any, args: Seq[Any]): Any = unsupportedAgg
  def aggMerge(fname: String, a: Any, b: Any): Any = unsupportedAgg
  def aggFinish(fname: String, state: Any): Any = unsupportedAgg

  /** Batched column-at-a-time call (reference JS batched mode,
    * `javascript/mod.rs:536-625`): the host hands whole argument columns for a
    * chunk of rows; the default loops over [[call]], implementations with a
    * vectorized guest path override it. Null inputs yield null outputs
    * (ReturnNullOnNullInput batch semantics). */
  def callBatch(fname: String, cols: Seq[Array[Any]], rows: Int): Array[Any] = {
    val out = new Array[Any](rows)
    val args = new Array[Any](cols.length)
    var r = 0
    while (r < rows) {
      var i = 0
      var anyNull = false
      while (i < cols.length) {
        args(i) = cols(i)(r)
        if (args(i) == null) anyNull = true
        i += 1
      }
      out(r) =
        if (anyNull) null
        else call(fname, scala.collection.immutable.ArraySeq.unsafeWrapArray(args.clone()))
      r += 1
    }
    out
  }
}
