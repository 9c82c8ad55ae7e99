package graft

import graft.functions.{AggImpl, Builtins}
import graft.sig.Registry
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * `SparkSessionExtensions` installer — the engine-embedding mechanism
 * (SURVEY §2.1 #29; the reference's DuckDB-extension glue re-expressed the
 * Spark way). Enables config-driven activation with no code changes:
 *
 * {{{
 * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * // or: SparkSession.builder().withExtensions(new GraftExtensions()(_))
 * }}}
 *
 * Aggregates cannot be injected through `injectFunction` (they are
 * `UserDefinedFunction`s, not expression builders) — [[Graft.install]]
 * registers those on first use; everything else becomes session-native here.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Builtins.ensureRegistered()
    // auto-lower eligible native expressions onto the columnar kernel tier
    ext.injectColumnar(graft.plans.GraftColumnarRule(_))
    val reg = Registry.global
    reg.names.foreach { name =>
      val defs = reg.lookup(name)
      defs.head.impl match {
        case AggImpl(_) => // needs a live session; Graft.install covers it
        case _ =>
          val info = new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
            defs.map(_.signature.toString).mkString("; "), "")
          ext.injectFunction((FunctionIdentifier(name), info, Graft.builderFor(name)))
      }
    }
  }
}
