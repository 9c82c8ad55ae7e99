package graft.runtime

import graft.sig.CallMode
import org.apache.spark.sql.types._

/**
 * A small, dependency-free embedded expression language ("graftscript") —
 * stands in for the reference's embedded CPython/QuickJS runtimes to prove
 * the [[LanguageRuntime]] SPI end-to-end with real sandbox properties:
 *
 *  - functions are *source code strings* compiled at `addFunction` time
 *    (reference `python/mod.rs:205-227`);
 *  - evaluation is interpreted, isolated from the host JVM (no reflection,
 *    no IO primitives in the language);
 *  - per-call resource limit: an interpreter step budget — exceeding it
 *    aborts the call (reference JS timeout/memory caps,
 *    `javascript/mod.rs:229-260`).
 *
 * Syntax: s-expressions. `(fn (x y) (+ x (* y 2)))` declares params + body.
 * Builtins: + - * / % min max abs if < <= > >= = and or not len substr upper
 * lower concat. Numbers are Long or Double; strings double-quoted.
 */
class ScriptRuntime(stepBudget: Int = 100000) extends LanguageRuntime with Serializable {

  override def name: String = "graftscript"

  // ---- s-expression AST ----------------------------------------------------
  sealed trait Sx
  case class SAtom(s: String) extends Sx
  case class SNum(v: Double, isInt: Boolean) extends Sx
  case class SStr(s: String) extends Sx
  case class SList(items: List[Sx]) extends Sx

  private case class Compiled(params: List[String], body: Sx)
  private case class CompiledAgg(init: Compiled, accumulate: Compiled,
                                 retract: Option[Compiled], merge: Compiled,
                                 finish: Compiled)
  private val fns = scala.collection.concurrent.TrieMap.empty[String, Compiled]
  private val aggs = scala.collection.concurrent.TrieMap.empty[String, CompiledAgg]

  private def compile(code: String): Compiled =
    parse(tokenize(code)) match {
      case (SList(SAtom("fn") :: SList(params) :: body :: Nil), rest) if rest.isEmpty =>
        Compiled(params.map { case SAtom(p) => p
          case other => throw new IllegalArgumentException(s"bad param $other") }, body)
      case _ => throw new IllegalArgumentException(
        s"graftscript function must be (fn (params...) body): $code")
    }

  override def addFunction(fname: String, returnType: DataType, mode: CallMode,
                           code: String): Unit =
    fns(fname) = compile(code)

  override def call(fname: String, args: Seq[Any]): Any = {
    val c = fns.getOrElse(fname, throw new NoSuchElementException(s"no function $fname"))
    invoke(fname, c, args)
  }

  /** Batched form: the compiled-handle lookup happens once per batch, the
    * row loop runs on the resolved handle (null-in → null-out). */
  override def callBatch(fname: String, cols: Seq[Array[Any]], rows: Int): Array[Any] = {
    val c = fns.getOrElse(fname, throw new NoSuchElementException(s"no function $fname"))
    val colsArr = cols.toArray
    val nArgs = colsArr.length
    val out = new Array[Any](rows)
    val args = new Array[Any](nArgs)
    var r = 0
    while (r < rows) {
      var anyNull = false
      var i = 0
      while (i < nArgs) {
        args(i) = colsArr(i)(r)
        if (args(i) == null) anyNull = true
        i += 1
      }
      // safe to alias `args`: invoke materializes the env map before returning
      if (!anyNull)
        out(r) = invoke(fname, c,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(args))
      r += 1
    }
    out
  }

  private def invoke(fname: String, c: Compiled, args: Seq[Any]): Any = {
    require(c.params.length == args.length, s"$fname expects ${c.params.length} args")
    val env = c.params.zip(args).toMap
    val budget = new Budget(stepBudget)
    eval(c.body, env, budget)
  }

  // ---- aggregates through the SPI -----------------------------------------
  // Each phase is its own guest function; state is whatever guest value the
  // phases produce (the host never inspects it).
  override def addAggregate(fname: String, returnType: DataType,
                            code: AggregateCode): Unit =
    aggs(fname) = CompiledAgg(compile(code.init), compile(code.accumulate),
      code.retract.map(compile), compile(code.merge), compile(code.finish))

  private def agg(fname: String): CompiledAgg =
    aggs.getOrElse(fname, throw new NoSuchElementException(s"no aggregate $fname"))

  override def aggCreateState(fname: String): Any =
    invoke(fname, agg(fname).init, Nil)
  override def aggAccumulate(fname: String, state: Any, args: Seq[Any]): Any =
    invoke(fname, agg(fname).accumulate, state +: args)
  override def aggRetract(fname: String, state: Any, args: Seq[Any]): Any =
    invoke(fname, agg(fname).retract.getOrElse(
      throw new UnsupportedOperationException(s"$fname is append-only")), state +: args)
  override def aggMerge(fname: String, a: Any, b: Any): Any =
    invoke(fname, agg(fname).merge, Seq(a, b))
  override def aggFinish(fname: String, state: Any): Any =
    invoke(fname, agg(fname).finish, Seq(state))

  private final class Budget(var left: Int) {
    def tick(): Unit = {
      left -= 1
      if (left <= 0) throw new IllegalStateException("step budget exhausted")
    }
  }

  // ---- tokenizer / parser --------------------------------------------------
  private def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += "("; i += 1
        case ')' => out += ")"; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          require(end > 0, "unterminated string")
          out += s.substring(i, end + 1); i = end + 1
        case _ =>
          var j = i
          while (j < s.length && !s.charAt(j).isWhitespace &&
            s.charAt(j) != '(' && s.charAt(j) != ')') j += 1
          out += s.substring(i, j); i = j
      }
    }
    out.result()
  }

  private def parse(tokens: List[String]): (Sx, List[String]) = tokens match {
    case "(" :: rest =>
      var items = List.newBuilder[Sx]
      var rem = rest
      while (rem.headOption.contains(")") == false) {
        require(rem.nonEmpty, "unbalanced parens")
        val (sx, r2) = parse(rem)
        items += sx
        rem = r2
      }
      (SList(items.result()), rem.tail)
    case tok :: rest if tok.startsWith("\"") => (SStr(tok.substring(1, tok.length - 1)), rest)
    case tok :: rest if tok.matches("-?\\d+") => (SNum(tok.toDouble, isInt = true), rest)
    case tok :: rest if tok.matches("-?\\d*\\.\\d+([eE]-?\\d+)?") => (SNum(tok.toDouble, isInt = false), rest)
    case tok :: rest => (SAtom(tok), rest)
    case Nil => throw new IllegalArgumentException("empty input")
  }

  // ---- evaluator -----------------------------------------------------------
  private def num(v: Any): Double = v match {
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: Double => d
    case f: Float => f.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case null => throw new NullPointerException("null argument")
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }
  private def bothInt(a: Any, b: Any): Boolean = (a, b) match {
    case (_: Long | _: Int | _: Short | _: Byte, _: Long | _: Int | _: Short | _: Byte) => true
    case _ => false
  }
  private def longOr(a: Double, isInt: Boolean): Any = if (isInt) a.toLong else a

  private def eval(sx: Sx, env: Map[String, Any], budget: Budget): Any = {
    budget.tick()
    sx match {
      case SNum(v, isInt) => longOr(v, isInt)
      case SStr(s) => s
      case SAtom("true") => true
      case SAtom("false") => false
      case SAtom("null") => null
      case SAtom(name) =>
        env.getOrElse(name, throw new NoSuchElementException(s"unbound symbol $name"))
      case SList(SAtom(op) :: argSx) =>
        op match {
          case "if" =>
            val cond = eval(argSx(0), env, budget)
            if (cond == true) eval(argSx(1), env, budget) else eval(argSx(2), env, budget)
          case "and" => argSx.forall(a => eval(a, env, budget) == true)
          case "or"  => argSx.exists(a => eval(a, env, budget) == true)
          case _ =>
            val args = argSx.map(a => eval(a, env, budget))
            applyBuiltin(op, args)
        }
      case other => throw new IllegalArgumentException(s"cannot evaluate $other")
    }
  }

  private def applyBuiltin(op: String, args: List[Any]): Any = op match {
    case "+" => arith(args, _ + _)
    case "-" => arith(args, _ - _)
    case "*" => arith(args, _ * _)
    case "/" =>
      if (bothInt(args(0), args(1))) {
        val d = num(args(1)).toLong
        if (d == 0) throw new ArithmeticException("division by zero")
        num(args(0)).toLong / d
      } else num(args(0)) / num(args(1))
    case "%" => num(args(0)).toLong % num(args(1)).toLong
    case "min" => if (num(args(0)) <= num(args(1))) args(0) else args(1)
    case "max" => if (num(args(0)) >= num(args(1))) args(0) else args(1)
    case "abs" => if (bothInt(args(0), args(0))) math.abs(num(args(0)).toLong) else math.abs(num(args(0)))
    case "<"  => num(args(0)) < num(args(1))
    case "<=" => num(args(0)) <= num(args(1))
    case ">"  => num(args(0)) > num(args(1))
    case ">=" => num(args(0)) >= num(args(1))
    case "="  => args(0) == args(1)
    case "not" => args(0) != true
    case "len" => args(0) match {
      case s: String => s.length.toLong
      case s: Seq[_] => s.length.toLong
      case other => throw new IllegalArgumentException(s"len of $other")
    }
    case "substr" => args(0).asInstanceOf[String]
      .substring(num(args(1)).toInt, num(args(2)).toInt)
    case "upper" => args(0).asInstanceOf[String].toUpperCase
    case "lower" => args(0).asInstanceOf[String].toLowerCase
    case "concat" => args.map(a => if (a == null) "" else a.toString).mkString
    // list: multi-value result — the table-function (setof) yield form.
    case "list" => args
    case other => throw new NoSuchElementException(s"unknown builtin $other")
  }

  private def arith(args: List[Any], f: (Double, Double) => Double): Any = {
    val allInt = args.forall(a => bothInt(a, a))
    val r = args.map(num).reduceLeft(f)
    if (allInt) r.toLong else r
  }
}

/**
 * Spark registration for script functions — `ScriptUdf.register` compiles the
 * code on the driver (fail fast), ships the *source* in the task closure, and
 * lazily re-compiles once per executor (instance-pool pattern): the
 * [[ScriptRuntime]] itself never crosses the wire.
 */
object ScriptUdf {
  def register(sig: String, code: String,
               mode: CallMode = CallMode.ReturnNullOnNullInput,
               fallible: Boolean = false,
               stepBudget: Int = 100000): Unit = {
    import graft.sig._
    val parsed = Signature.parse(sig)
    // driver-side validation: compile now, fail fast on syntax errors
    new ScriptRuntime(stepBudget).addFunction(parsed.name, parsed.returns.dataType, mode, code)
    val fname = parsed.name
    val retType = parsed.returns.dataType
    // Ship only (code, signature); the executor-side pool compiles once per JVM.
    val impl: AnyRef =
      if (parsed.kind == FunctionKind.Table)
        graft.functions.TableImpl(args =>
          ScriptUdf.pool(fname, retType, mode, code, stepBudget).callTable(fname, args))
      else
        graft.functions.ScalarImpl(args =>
          ScriptUdf.pool(fname, retType, mode, code, stepBudget).call(fname, args))
    Registry.global.register(FunctionDef(parsed, impl, mode,
      deterministic = true, fallible = fallible))
    // batched dispatch for hosts holding whole batches (the remote server):
    // the pool's TrieMap lookup — keyed on the full source string — and the
    // compiled-handle resolution happen once per batch instead of per row.
    // A re-registration that no longer qualifies must DROP any stale entry,
    // or the server would keep serving the old implementation.
    if (parsed.kind == FunctionKind.Scalar && !fallible &&
        mode == CallMode.ReturnNullOnNullInput)
      graft.functions.BatchEval.overrides(fname) = (parsed.toString,
        (cols, rows) =>
          ScriptUdf.pool(fname, retType, mode, code, stepBudget)
            .callBatch(fname, cols, rows))
    else
      graft.functions.BatchEval.overrides.remove(fname)
  }

  /** Per-JVM runtime pool keyed by function identity — one compiled instance
    * per executor, reused across tasks (reference `wasm/mod.rs:257-319`). */
  private val pools = scala.collection.concurrent.TrieMap.empty[String, ScriptRuntime]
  private[runtime] def pool(fname: String, ret: DataType, mode: CallMode,
                            code: String, stepBudget: Int): ScriptRuntime =
    pools.getOrElseUpdate(fname + " " + code, {
      val rt = new ScriptRuntime(stepBudget)
      rt.addFunction(fname, ret, mode, code)
      rt
    })
  private[runtime] def aggPool(fname: String, ret: DataType, code: AggregateCode,
                               stepBudget: Int): ScriptRuntime =
    // key on the full phase sources (hashCode alone could collide and reuse
    // a different aggregate's compiled phases)
    pools.getOrElseUpdate(Seq(fname, "agg", code.init, code.accumulate,
      code.retract.getOrElse(""), code.merge, code.finish).mkString(""), {
      val rt = new ScriptRuntime(stepBudget)
      rt.addAggregate(fname, ret, code)
      rt
    })

  /** Five-phase aggregate whose every phase runs in the embedded runtime —
    * the SPI analogue of the reference's guest-class aggregates
    * (`python/mod.rs:229-309,456-656`). State is an opaque guest value
    * serialized java-side across the shuffle (pickle-state analogue). Rows
    * with any NULL input are skipped (SQL aggregate null semantics). */
  final class ScriptAggregate(fname: String, ret: DataType, code: AggregateCode,
                              stepBudget: Int)
    extends graft.functions.GraftAggregate[AnyRef, Any] {
    @transient private lazy val rt = ScriptUdf.aggPool(fname, ret, code, stepBudget)
    override def createState(): AnyRef =
      rt.aggCreateState(fname).asInstanceOf[AnyRef]
    override def accumulate(s: AnyRef, in: org.apache.spark.sql.Row): AnyRef =
      if (in.anyNull) s
      else rt.aggAccumulate(fname, s, in.toSeq).asInstanceOf[AnyRef]
    override def retract(s: AnyRef, in: org.apache.spark.sql.Row): AnyRef =
      if (in.anyNull) s
      else rt.aggRetract(fname, s, in.toSeq).asInstanceOf[AnyRef]
    override def merge(a: AnyRef, b: AnyRef): AnyRef =
      rt.aggMerge(fname, a, b).asInstanceOf[AnyRef]
    override def finish(s: AnyRef): Any = rt.aggFinish(fname, s)
  }

  /** Register a five-phase script aggregate under a SQL-callable signature.
    * Validates (compiles) all phases on the driver, ships only sources. */
  def registerAggregate(sig: String, code: AggregateCode,
                        stepBudget: Int = 100000): Unit = {
    import org.apache.spark.sql.{Encoder, Encoders}
    val parsed = graft.sig.Signature.parse(sig)
    // fail fast on driver: compile every phase now
    new ScriptRuntime(stepBudget).addAggregate(parsed.name, parsed.returns.dataType, code)
    val inputSchema = StructType(parsed.args.zipWithIndex.map {
      case (g, i) => g.field(s"a$i")
    })
    val outEnc: Encoder[Any] = (parsed.returns.dataType match {
      case LongType    => Encoders.scalaLong
      case IntegerType => Encoders.scalaInt
      case DoubleType  => Encoders.scalaDouble
      case StringType  => Encoders.STRING
      case other => throw new IllegalArgumentException(
        s"script aggregate return type $other unsupported")
    }).asInstanceOf[Encoder[Any]]
    val lowered = graft.functions.GraftAggregates.lower(
      new ScriptAggregate(parsed.name, parsed.returns.dataType, code, stepBudget),
      inputSchema, Encoders.javaSerialization[AnyRef], outEnc)
    graft.functions.Udf.aggregate(sig, lowered)
  }

  /** Batched column-at-a-time evaluation through the runtime SPI — plugs the
    * [[LanguageRuntime.callBatch]] surface into the BatchUdf chunked tier. */
  def withBatchColumn(df: org.apache.spark.sql.DataFrame, outName: String,
                      inputCols: Seq[String], retType: DataType,
                      fname: String, code: String,
                      stepBudget: Int = 100000,
                      batchSize: Int = 1024): org.apache.spark.sql.DataFrame =
    graft.functions.BatchUdf.withBatchColumn(df, outName, inputCols, retType, batchSize) {
      cols =>
        val rt = pool(fname, retType, CallMode.ReturnNullOnNullInput, code, stepBudget)
        rt.callBatch(fname, cols, if (cols.isEmpty) 0 else cols.head.length)
    }
}
