package graft.sig

import graft.types.GraftType
import graft.types.GraftType.GType
import org.apache.spark.sql.types.{DataType, Metadata, StructField}

/** How a function treats NULL inputs (reference: `arrow-udf-runtime/src/lib.rs:17-29`). */
sealed trait CallMode
object CallMode {
  /** Skip the call and return NULL when any argument is NULL (the default). */
  case object ReturnNullOnNullInput extends CallMode
  /** Invoke the function even when arguments are NULL. */
  case object CalledOnNullInput extends CallMode
}

/** What kind of function a signature declares. */
sealed trait FunctionKind
object FunctionKind {
  case object Scalar extends FunctionKind
  /** Set-returning (table) function: `f(args) ->> T` or `-> setof T`. */
  case object Table extends FunctionKind
  case object Aggregate extends FunctionKind
}

/**
 * A fully-resolved function signature: `name(argTypes) -> returnType`.
 *
 * Signature strings follow the reference's surface grammar
 * (`arrow-udf-macros/src/parse.rs:24-99`): `"gcd(int, int) -> int"`,
 * table functions via `"series(int) ->> int"` or `"-> setof int"`, variadic
 * last arg via `"..."`, wildcards `int*`/`float*`/`*` expanded at registration.
 */
final case class Signature(
    name: String,
    args: Seq[GType],
    variadic: Boolean,
    returns: GType,
    kind: FunctionKind,
) {
  def arity: Int = args.length

  /** Does this signature accept a concrete call-site argument list?
    * Matching is by Spark DataType + extension metadata (the reference matches
    * on Arrow `Field` equality incl. metadata — `sig.rs:92-111`). */
  def matches(actual: Seq[(DataType, Metadata)]): Boolean = {
    if (variadic) {
      // `...` allows MORE than the declared args, never fewer (sig.rs:106-110).
      actual.length >= args.length &&
      args.dropRight(1).zip(actual).forall { case (g, (dt, md)) => g.accepts(dt, md) } &&
      actual.drop(args.length - 1).forall { case (dt, md) => args.last.accepts(dt, md) }
    } else {
      actual.length == args.length &&
      args.zip(actual).forall { case (g, (dt, md)) => g.accepts(dt, md) }
    }
  }

  override def toString: String = {
    val arrow = if (kind == FunctionKind.Table) "->>" else "->"
    s"$name(${args.map(_.name).mkString(",")}${if (variadic) ",..." else ""}) $arrow ${returns.name}"
  }
}

object Signature {

  /** Parse one signature string; wildcards NOT yet expanded (see [[expand]]). */
  def parse(sig: String): Signature = {
    val (head, retRaw, kind) = splitArrow(sig)
    val open = head.indexOf('(')
    val close = head.lastIndexOf(')')
    require(open > 0 && close > open, s"malformed signature '$sig'")
    val name = head.substring(0, open).trim.toLowerCase
    val argsRaw = head.substring(open + 1, close).trim
    var variadic = false
    val argNames: Seq[String] =
      if (argsRaw.isEmpty) Nil
      else splitTop(argsRaw).map(_.trim).filter { a =>
        if (a == "...") { variadic = true; false } else true
      }
    Signature(name, argNames.map(GraftType.parse), variadic, GraftType.parse(retRaw), kind)
  }

  /** Parse + wildcard-expand into all concrete signatures (cartesian product is
    * NOT taken — like the reference, each wildcard position i maps pairwise when
    * multiple wildcards align, otherwise expands independently one at a time). */
  def expand(sig: String): Seq[Signature] = {
    val (head, retRaw, kind) = splitArrow(sig)
    val open = head.indexOf('(')
    val close = head.lastIndexOf(')')
    require(open > 0 && close > open, s"malformed signature '$sig'")
    val name = head.substring(0, open).trim.toLowerCase
    val argsRaw = head.substring(open + 1, close).trim
    var variadic = false
    val argNames: Seq[String] =
      if (argsRaw.isEmpty) Nil
      else splitTop(argsRaw).map(_.trim).filter { a =>
        if (a == "...") { variadic = true; false } else true
      }
    val expansions: Seq[Seq[String]] = argNames.map(GraftType.expandWildcard)
    val retExp: Seq[String] = GraftType.expandWildcard(retRaw)
    val n = (expansions.map(_.length) :+ retExp.length).max
    // Pairwise expansion: every wildcard list must have length 1 or n.
    (0 until n).map { i =>
      val args = expansions.map(e => if (e.length == 1) e.head else e(i % e.length))
      val ret = if (retExp.length == 1) retExp.head else retExp(i % retExp.length)
      Signature(name, args.map(GraftType.parse), variadic, GraftType.parse(ret), kind)
    }.distinct
  }

  private def splitArrow(sig: String): (String, String, FunctionKind) = {
    val iTab = sig.indexOf("->>")
    if (iTab >= 0) (sig.substring(0, iTab), sig.substring(iTab + 3).trim, FunctionKind.Table)
    else {
      val i = sig.indexOf("->")
      require(i >= 0, s"signature '$sig' missing '->'")
      val ret = sig.substring(i + 2).trim
      if (ret.toLowerCase.startsWith("setof "))
        (sig.substring(0, i), ret.substring(6).trim, FunctionKind.Table)
      else (sig.substring(0, i), ret, FunctionKind.Scalar)
    }
  }

  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().filter(_.trim.nonEmpty)
  }
}

/**
 * A registered function: signature + implementation + properties.
 *
 * `impl` is kind-dependent:
 *  - Scalar: `Seq[Any] => Any` (may throw — see error-column adapter)
 *  - Table:  `Seq[Any] => Iterator[Any]`
 *  - Aggregate: a [[graft.functions.GraftAggregate]] instance
 */
final case class FunctionDef(
    signature: Signature,
    impl: AnyRef,
    callMode: CallMode = CallMode.ReturnNullOnNullInput,
    deterministic: Boolean = true, // reference `volatile` attr ⇒ false
    fallible: Boolean = false,     // Result-returning fn ⇒ error column
)

/**
 * Global function registry with metadata-sensitive overload resolution
 * (reference: `arrow-udf/src/sig.rs:39-151`). Spark's own FunctionRegistry
 * resolves by name only, so overload selection happens here *before* we hand
 * Catalyst a concrete expression.
 */
final class Registry {
  private val byName = scala.collection.concurrent.TrieMap.empty[String, Vector[FunctionDef]]
  // Monotonic change counter: bumped by EVERY register()/clear(), including a
  // re-registration that replaces an identical signature in place (which
  // leaves the overload COUNT unchanged — the r15 install() memo keyed on the
  // count and would silently keep the stale implementation installed).
  private val revCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  def register(fd: FunctionDef): Unit = {
    val key = fd.signature.name
    byName.updateWith(key) {
      case Some(v) =>
        // Replace an identical signature; otherwise append (overload).
        val kept = v.filterNot(existing =>
          existing.signature.kind == fd.signature.kind &&
          existing.signature.args.map(_.name) == fd.signature.args.map(_.name))
        Some(kept :+ fd)
      case None => Some(Vector(fd))
    }
    revCounter.incrementAndGet()
  }

  /** Monotonic revision of the registry contents — the correct memo key for
    * anything caching "has this registry been installed somewhere". */
  def revision: Long = revCounter.get()

  def lookup(name: String): Seq[FunctionDef] =
    byName.getOrElse(name.toLowerCase, Vector.empty)

  /** Overload resolution by concrete argument types + extension metadata. */
  def resolve(name: String, actual: Seq[(DataType, Metadata)]): Option[FunctionDef] =
    lookup(name).find(_.signature.matches(actual))

  def names: Seq[String] = byName.keys.toSeq.sorted
  def all: Seq[FunctionDef] = byName.values.flatten.toSeq
  def clear(): Unit = { byName.clear(); revCounter.incrementAndGet(); () }
}

object Registry {
  /** The process-global registry (reference: linkme distributed slice → REGISTRY). */
  val global: Registry = new Registry
}
