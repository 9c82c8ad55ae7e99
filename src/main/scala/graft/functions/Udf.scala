package graft.functions

import graft.sig._
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Registration DSL — the engine's analogue of the reference's `#[function]`
 * proc-macro (`arrow-udf-macros/src/lib.rs:279-295`). A signature string
 * declares name + types; a Scala lambda supplies the behavior:
 *
 * {{{
 * Udf.scalar2[Int, Int, Int]("gcd(int, int) -> int")((a, b) => Kernels.gcd(a, b))
 * Udf.fallible2[Int, Int, Int]("div(int, int) -> int")((a, b) => a / b)
 * Udf.table1[Int, Int]("series(int) ->> int")(n => Iterator.range(0, n))
 * }}}
 *
 * Wildcards expand like the reference (`int*`, `float*`, `*`); overloads
 * resolve by argument type + extension metadata at analysis time.
 *
 * Argument/return JVM types follow Spark's external row format: int8→Byte,
 * int32→Int, string→String, T[]→Seq[T], struct→Row, date32→java.sql.Date,
 * timestamp→java.time.LocalDateTime, decimal(p,s)→java.math.BigDecimal.
 */
object Udf {

  private def reg(sig: String, impl: AnyRef, mode: CallMode, deterministic: Boolean,
                  fallible: Boolean): Unit =
    Signature.expand(sig).foreach { s =>
      Registry.global.register(FunctionDef(s, impl, mode, deterministic, fallible))
    }

  // ---- scalar -------------------------------------------------------------
  def scalar0[R](sig: String, deterministic: Boolean = true)(f: () => R): Unit =
    reg(sig, ScalarImpl(_ => f()), CallMode.ReturnNullOnNullInput, deterministic, fallible = false)

  def scalar1[A1, R](sig: String, mode: CallMode = CallMode.ReturnNullOnNullInput,
                     deterministic: Boolean = true)(f: A1 => R): Unit =
    reg(sig, ScalarImpl(a => f(a(0).asInstanceOf[A1])), mode, deterministic, fallible = false)

  def scalar2[A1, A2, R](sig: String, mode: CallMode = CallMode.ReturnNullOnNullInput,
                         deterministic: Boolean = true)(f: (A1, A2) => R): Unit =
    reg(sig, ScalarImpl(a => f(a(0).asInstanceOf[A1], a(1).asInstanceOf[A2])), mode,
      deterministic, fallible = false)

  def scalar3[A1, A2, A3, R](sig: String, mode: CallMode = CallMode.ReturnNullOnNullInput,
                             deterministic: Boolean = true)(f: (A1, A2, A3) => R): Unit =
    reg(sig, ScalarImpl(a => f(a(0).asInstanceOf[A1], a(1).asInstanceOf[A2],
      a(2).asInstanceOf[A3])), mode, deterministic, fallible = false)

  def scalar4[A1, A2, A3, A4, R](sig: String, mode: CallMode = CallMode.ReturnNullOnNullInput,
                                 deterministic: Boolean = true)(f: (A1, A2, A3, A4) => R): Unit =
    reg(sig, ScalarImpl(a => f(a(0).asInstanceOf[A1], a(1).asInstanceOf[A2],
      a(2).asInstanceOf[A3], a(3).asInstanceOf[A4])), mode, deterministic, fallible = false)

  /** Variadic / wide signatures: the lambda sees the raw argument Seq
    * (reference: 16-arg `many_args`, variadic trailing `...`). */
  def scalarN[R](sig: String, mode: CallMode = CallMode.ReturnNullOnNullInput,
                 deterministic: Boolean = true)(f: Seq[Any] => R): Unit =
    reg(sig, ScalarImpl(a => f(a)), mode, deterministic, fallible = false)

  // ---- fallible scalar (error column) ------------------------------------
  def fallible1[A1, R](sig: String)(f: A1 => R): Unit =
    reg(sig, ScalarImpl(a => f(a(0).asInstanceOf[A1])),
      CallMode.ReturnNullOnNullInput, deterministic = true, fallible = true)

  def fallible2[A1, A2, R](sig: String)(f: (A1, A2) => R): Unit =
    reg(sig, ScalarImpl(a => f(a(0).asInstanceOf[A1], a(1).asInstanceOf[A2])),
      CallMode.ReturnNullOnNullInput, deterministic = true, fallible = true)

  // ---- table (set-returning) ---------------------------------------------
  def table1[A1, R](sig: String, fallible: Boolean = false)(f: A1 => Iterator[R]): Unit =
    reg(sig, TableImpl(a => f(a(0).asInstanceOf[A1]).asInstanceOf[Iterator[Any]]),
      CallMode.ReturnNullOnNullInput, deterministic = true, fallible)

  def table2[A1, A2, R](sig: String, fallible: Boolean = false)(f: (A1, A2) => Iterator[R]): Unit =
    reg(sig, TableImpl(a => f(a(0).asInstanceOf[A1], a(1).asInstanceOf[A2])
      .asInstanceOf[Iterator[Any]]), CallMode.ReturnNullOnNullInput, deterministic = true, fallible)

  def table3[A1, A2, A3, R](sig: String, fallible: Boolean = false)(f: (A1, A2, A3) => Iterator[R]): Unit =
    reg(sig, TableImpl(a => f(a(0).asInstanceOf[A1], a(1).asInstanceOf[A2], a(2).asInstanceOf[A3])
      .asInstanceOf[Iterator[Any]]), CallMode.ReturnNullOnNullInput, deterministic = true, fallible)

  // ---- native expression tier --------------------------------------------
  /** Register a hand-written Catalyst expression (codegen'd kernel tier). */
  def native(sig: String, deterministic: Boolean = true)(build: Seq[Expression] => Expression): Unit =
    reg(sig, ExprImpl(build), CallMode.ReturnNullOnNullInput, deterministic, fallible = false)

  // ---- aggregate ----------------------------------------------------------
  /** Register a pre-lowered UDAF under a signature (see [[GraftAggregate]]). */
  def aggregate(sig: String, udf: org.apache.spark.sql.expressions.UserDefinedFunction): Unit = {
    Signature.expand(sig).foreach { s0 =>
      val s = s0.copy(kind = FunctionKind.Aggregate)
      Registry.global.register(FunctionDef(s, AggImpl(udf), CallMode.ReturnNullOnNullInput,
        deterministic = true, fallible = false))
    }
  }

  /** Register a [[GraftAggregate]] on the native tier ([[GraftTypedAgg]]):
    * zero per-row deserialization, java-serialized state through the shuffle. */
  def aggregateNative(sig: String)(g: GraftAggregate[_, _]): Unit = {
    Signature.expand(sig).foreach { s0 =>
      val s = s0.copy(kind = FunctionKind.Aggregate)
      Registry.global.register(FunctionDef(s, NativeAggImpl(g), CallMode.ReturnNullOnNullInput,
        deterministic = true, fallible = false))
    }
  }
}
