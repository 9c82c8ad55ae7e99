package graft.functions

import graft.sig.CallMode
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Implementation payloads stored in the registry (kind-tagged to survive erasure). */
final case class ScalarImpl(f: Seq[Any] => Any)
final case class TableImpl(f: Seq[Any] => Iterator[Any])
/** A native Catalyst expression factory — the "generated kernel" tier. */
final case class ExprImpl(build: Seq[Expression] => Expression)
/** A pre-built UDAF (lowered from [[GraftAggregate]]). */
final case class AggImpl(udf: org.apache.spark.sql.expressions.UserDefinedFunction)
/** A [[GraftAggregate]] lowered natively onto [[GraftTypedAgg]] (hot tier). */
final case class NativeAggImpl(agg: GraftAggregate[_, _])

/**
 * Generic scalar invocation: calls a Scala closure row-at-a-time with
 * JVM-friendly argument values (String, Int, Seq, Row, ...), honoring the
 * declared [[CallMode]] (reference null semantics, `codegen_utils.rs:415-444`).
 *
 * Real `doGenCode` (ScalaUDF-style: the expression rides `references`, the
 * generated code fills an args array and calls [[invokeExternal]]) — NOT
 * CodegenFallback, which would exclude the enclosing Project from
 * WholeStageCodegen entirely and force the whole stage interpreted. With
 * this, a plan mixing boxed invokes with native kernels keeps one fused
 * codegen'd pipeline from the columnar scan onward.
 */
case class ScalarInvoke(
    funcName: String,
    function: Seq[Any] => Any,
    override val dataType: DataType,
    children: Seq[Expression],
    callMode: CallMode = CallMode.ReturnNullOnNullInput,
    isDeterministic: Boolean = true)
  extends Expression {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean =
    isDeterministic && children.forall(_.deterministic)

  @transient private lazy val argConverters =
    children.map(c => CatalystTypeConverters.createToScalaConverter(c.dataType)).toArray
  @transient private lazy val resultConverter =
    CatalystTypeConverters.createToCatalystConverter(dataType)

  /** Generated-code entry: catalyst child value → external argument. */
  def convertArg(i: Int, v: Any): Any = argConverters(i)(v)

  /** Generated-code entry: external args (nulls preserved) → catalyst result,
    * honoring the CallMode null semantics. */
  def invokeExternal(args: Array[Any]): Any = {
    if (callMode == CallMode.ReturnNullOnNullInput) {
      var i = 0
      while (i < args.length) { if (args(i) == null) return null; i += 1 }
    }
    val r = function(scala.collection.immutable.ArraySeq.unsafeWrapArray(args))
    if (r == null) null else resultConverter(r)
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      args(i) = if (v == null) null else argConverters(i)(v)
      i += 1
    }
    invokeExternal(args)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen._
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("scalarInvoke", this, classOf[ScalarInvoke].getName)
    val argsTerm = ctx.freshName("invokeArgs")
    val resTerm = ctx.freshName("invokeRes")
    val childGens = children.map(_.genCode(ctx))
    val setArgs = childGens.zipWithIndex.map { case (g, i) =>
      code"""${g.code}
            |$argsTerm[$i] = ${g.isNull} ? null : $self.convertArg($i, ${g.value});
            |""".stripMargin
    }.foldLeft(code"")(_ + _)
    val javaT = CodeGenerator.javaType(dataType)
    val unbox =
      if (CodeGenerator.isPrimitiveType(dataType))
        s"((${CodeGenerator.boxedType(dataType)}) $resTerm).${javaT}Value()"
      else s"($javaT) $resTerm"
    ev.copy(code =
      code"""Object[] $argsTerm = new Object[${children.length}];
            |$setArgs
            |Object $resTerm = $self.invokeExternal($argsTerm);
            |boolean ${ev.isNull} = ($resTerm == null);
            |$javaT ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
            |if (!${ev.isNull}) { ${ev.value} = $unbox; }
            |""".stripMargin)
  }

  override def prettyName: String = funcName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/**
 * Fallible scalar invocation — the reference's error-column semantics
 * (`codegen_utils.rs:586-603`): a function that can fail yields
 * `struct<value: T, error: string>` per row; a failing row carries a NULL
 * value and the exception message, instead of failing the query.
 */
case class FallibleScalarInvoke(
    funcName: String,
    function: Seq[Any] => Any,
    valueType: DataType,
    children: Seq[Expression],
    callMode: CallMode = CallMode.ReturnNullOnNullInput)
  extends Expression {

  override val dataType: StructType = StructType(Seq(
    StructField("value", valueType, nullable = true),
    StructField("error", StringType, nullable = true)))

  override def nullable: Boolean = false

  @transient private lazy val argConverters =
    children.map(c => CatalystTypeConverters.createToScalaConverter(c.dataType)).toArray
  @transient private lazy val resultConverter =
    CatalystTypeConverters.createToCatalystConverter(valueType)

  /** Generated-code entry: catalyst child value → external argument. */
  def convertArg(i: Int, v: Any): Any = argConverters(i)(v)

  /** Generated-code entry: the (value, error) row — never null. */
  def invokeExternal(args: Array[Any]): InternalRow = {
    if (callMode == CallMode.ReturnNullOnNullInput) {
      var i = 0
      while (i < args.length) {
        if (args(i) == null) return new GenericInternalRow(Array[Any](null, null))
        i += 1
      }
    }
    try {
      val r = function(scala.collection.immutable.ArraySeq.unsafeWrapArray(args))
      new GenericInternalRow(Array[Any](if (r == null) null else resultConverter(r), null))
    } catch {
      case e: Exception =>
        val msg = if (e.getMessage == null) e.getClass.getSimpleName else e.getMessage
        new GenericInternalRow(Array[Any](null, UTF8String.fromString(msg)))
    }
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      args(i) = if (v == null) null else argConverters(i)(v)
      i += 1
    }
    invokeExternal(args)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen._
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("fallibleInvoke", this, classOf[FallibleScalarInvoke].getName)
    val argsTerm = ctx.freshName("invokeArgs")
    val childGens = children.map(_.genCode(ctx))
    val setArgs = childGens.zipWithIndex.map { case (g, i) =>
      code"""${g.code}
            |$argsTerm[$i] = ${g.isNull} ? null : $self.convertArg($i, ${g.value});
            |""".stripMargin
    }.foldLeft(code"")(_ + _)
    ev.copy(code =
      code"""Object[] $argsTerm = new Object[${children.length}];
            |$setArgs
            |InternalRow ${ev.value} = $self.invokeExternal($argsTerm);
            |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override def prettyName: String = funcName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/**
 * Set-returning (table) function as a Catalyst [[Generator]] — the Spark-native
 * form of the reference's `->> T` functions (`codegen_utils.rs:446-503`).
 * Output rows are `(value)` or `(value, error)` for fallible generators; input
 * row correlation comes from LATERAL VIEW / generator semantics instead of the
 * reference's materialized `row: Int32` index column, and is zero-cost.
 * Laziness: the returned iterator is consumed incrementally by GenerateExec
 * (the analogue of the reference's 1024-row chunked generator).
 */
case class TableFnInvoke(
    funcName: String,
    function: Seq[Any] => Iterator[Any],
    valueType: DataType,
    children: Seq[Expression],
    callMode: CallMode = CallMode.ReturnNullOnNullInput,
    fallible: Boolean = false)
  extends Generator with CodegenFallback {

  override def elementSchema: StructType =
    if (fallible) StructType(Seq(
      StructField("value", valueType, nullable = true),
      StructField("error", StringType, nullable = true)))
    else StructType(Seq(StructField("value", valueType, nullable = true)))

  @transient private lazy val argConverters =
    children.map(c => CatalystTypeConverters.createToScalaConverter(c.dataType)).toArray
  @transient private lazy val resultConverter =
    CatalystTypeConverters.createToCatalystConverter(valueType)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    var anyNull = false
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) { anyNull = true; args(i) = null }
      else args(i) = argConverters(i)(v)
      i += 1
    }
    if (anyNull && callMode == CallMode.ReturnNullOnNullInput) Iterator.empty
    else if (fallible) {
      try {
        function(scala.collection.immutable.ArraySeq.unsafeWrapArray(args)).map { v =>
          new GenericInternalRow(Array[Any](if (v == null) null else resultConverter(v), null))
        }
      } catch {
        case e: Exception =>
          val msg = if (e.getMessage == null) e.getClass.getSimpleName else e.getMessage
          Iterator.single(new GenericInternalRow(Array[Any](null, UTF8String.fromString(msg))))
      }
    } else {
      function(scala.collection.immutable.ArraySeq.unsafeWrapArray(args)).map { v =>
        new GenericInternalRow(Array[Any](if (v == null) null else resultConverter(v)))
      }
    }
  }

  override def prettyName: String = funcName
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Native codegen'd whitespace token count (no split allocation) — promotes
  * the corpus-curation gate function to the fastest tier. */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd Jaro-Winkler similarity (see [[Kernels.jaroWinkler]]) —
  * the record-linkage scorer as a whole-stage-codegen expression, so fuzzy
  * entity comparisons stay inside the generated loop. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd 60-bit md5 content fingerprint (UTF8String bytes direct,
  * no String conversion). */
case class DocFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.md5_60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.md5_60($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd per-document gram fingerprints: element i is
  * doc_fingerprint of tokens [i, i+n) joined by single spaces — identical
  * values to `transform(sequence(0, size(ws)-n), i ->
  * doc_fingerprint(array_join(slice(ws, i+1, n), ' ')))` but each token's
  * bytes are extracted ONCE and streamed through the digest per covering
  * gram, instead of copying every token into ~n sliced-and-joined gram
  * strings (the dedupSpans hot path). Empty array when size < n. */
case class GramFingerprintsExpr(child: Expression, nExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_fingerprints"
  override protected def nullSafeEval(arr: Any, n: Any): Any =
    Kernels.gramFingerprints(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.functions.Kernels.gramFingerprints($a, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** Native writer-style JSON render (see [[JsonKernel]]): renders catalyst
  * internal values straight into a UTF8String builder — no external
  * conversion, no intermediate Map/Row/String per row. */
case class JsonRenderExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_to_json"
  override protected def nullSafeEval(input: Any): Any =
    JsonKernel.render(input, child.dataType)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val dtRef = ctx.addReferenceObj("jsonDt", child.dataType,
      "org.apache.spark.sql.types.DataType")
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonKernel.render($c, $dtRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd FNV-1a 64 over a string's UTF-8 bytes. */
case class Fnv64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.fnv1a64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.fnv1a64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd double-precision cosine over float[] columns — primitive
  * `ArrayData` access, no boxing (hot path of the similarity operators).
  * An `array<int>` left side (quantized codes) dispatches to the int/float
  * kernel: the quantization scale cancels in cosine, so int8 codes score
  * against float queries directly. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // computed once per expression instance — nullSafeEval is the per-row
  // interpreted path, no dataType match belongs there
  @transient private lazy val intLeft: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, _) => true
    case _ => false
  }
  private def kernelName: String = if (intLeft) "cosineSimIF" else "cosineSim"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (intLeft) Kernels.cosineSimIF(aa, bb) else Kernels.cosineSim(aa, bb)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$kernelName($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd gcd — the reference's flagship benchmark function
  * (`README.md:88-93`). Int and Long overloads. */
case class GcdExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = left.dataType
  override def prettyName: String = "gcd"

  override protected def nullSafeEval(a: Any, b: Any): Any = dataType match {
    case LongType => Kernels.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case _ => Kernels.gcd(a.asInstanceOf[Int], b.asInstanceOf[Int])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.gcd($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
