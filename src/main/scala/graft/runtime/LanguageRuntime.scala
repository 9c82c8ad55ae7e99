package graft.runtime

import graft.sig.CallMode
import org.apache.spark.sql.types.DataType

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
}
