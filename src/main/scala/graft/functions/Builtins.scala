package graft.functions

import graft.sig.CallMode

/**
 * The built-in conformance function set — mirrors the reference's example /
 * test corpus (SURVEY §2.2: gcd, div, length, substring, split, key_value,
 * range, array_sum, to_json, datetime, ...) re-expressed as graft
 * registrations. Idempotent: `ensureRegistered()` is called by
 * [[graft.Graft.install]].
 */
object Builtins {

  @volatile private var registered = false

  def ensureRegistered(): Unit = synchronized {
    if (registered) return
    registered = true

    ConformanceAggregates.registerAll()
    graft.ops.TextAnalysis.registerAll()
    graft.ops.Dedup.registerAll()
    graft.ops.Sketches.registerAll()
    graft.ops.Similarity.registerAll()
    graft.ops.Multimodal.registerAll()
    graft.wasm.WasmKernels.registerAll()
    graft.wasm.WasmFixture.registerAll()

    // Embedded-runtime (graftscript) demo function — SURVEY §2.1 #13/#19 SPI.
    graft.runtime.ScriptUdf.register(
      "script_score(bigint) -> bigint", "(fn (x) (+ (* x 3) 1))")

    // Embedded-runtime AGGREGATE through the SPI — all five phases run guest
    // code (SURVEY §2.1 #15 via #13; reference python/mod.rs:229-309).
    graft.runtime.ScriptUdf.registerAggregate(
      "script_sumsq(bigint) -> bigint",
      graft.runtime.AggregateCode(
        init = "(fn () 0)",
        accumulate = "(fn (s x) (+ s (* x x)))",
        retract = Some("(fn (s x) (- s (* x x)))"),
        merge = "(fn (a b) (+ a b))",
        finish = "(fn (s) s)"))

    // Embedded-runtime TABLE function through the SPI: yields each of 0..x-1
    // capped at 3 (multi-value `list` yield; SURVEY §2.1 #14).
    graft.runtime.ScriptUdf.register(
      "script_echoes(bigint) ->> bigint",
      "(fn (x) (if (<= x 1) (list x) (if (= x 2) (list x (+ x 1)) (list x (+ x 1) (+ x 2)))))")

    // gcd: native codegen'd tier for int32/int64 (flagship benchmark fn).
    Udf.native("gcd(int, int) -> int") { children => GcdExpr(children(0), children(1)) }
    Udf.native("gcd(bigint, bigint) -> bigint") { children => GcdExpr(children(0), children(1)) }

    // graft_div: fallible integer division → struct<value, error> (error
    // column). Named graft_div: `div` would shadow Spark's built-in.
    Udf.fallible2[Int, Int, Int]("graft_div(int, int) -> int") { (a, b) =>
      if (b == 0) throw new ArithmeticException("division by zero") else a / b
    }

    // neg / add / option-add (CalledOnNullInput demo: null counts as 0).
    Udf.scalar1[Int, Int]("neg(int) -> int")(a => -a)
    Udf.scalar2[Int, Int, Int]("add(int, int) -> int")(_ + _)
    Udf.scalarN[Int]("option_add(int, int) -> int", mode = CallMode.CalledOnNullInput) { args =>
      args.map(a => if (a == null) 0 else a.asInstanceOf[Int]).sum
    }

    // length overloads (string vs binary) — overload-resolution conformance.
    Udf.scalar1[String, Int]("graft_length(string) -> int")(_.length)
    Udf.scalar1[Array[Byte], Int]("graft_length(binary) -> int")(_.length)

    // substring(string, start) 0-based, reference semantics.
    Udf.scalar2[String, Int, String]("graft_substring(string, int) -> string") { (s, i) =>
      s.substring(math.min(math.max(i, 0), s.length))
    }

    // split → string[]
    Udf.scalar2[String, String, Seq[String]]("graft_split(string, string) -> string[]") {
      (s, sep) => scala.collection.immutable.ArraySeq.unsafeWrapArray(s.split(java.util.regex.Pattern.quote(sep), -1))
    }

    // array_sum(int[]) — null elements ignored (reference primitive-slice path).
    Udf.scalar1[Seq[Integer], Int]("array_sum(int[]) -> int") { xs =>
      var s = 0
      xs.foreach(x => if (x != null) s += x.intValue())
      s
    }

    // key_value("a=b") → struct<key,value>; malformed input → null struct.
    Udf.scalar1[String, org.apache.spark.sql.Row](
      "key_value(string) -> struct<key: string, value: string>") { s =>
      val i = s.indexOf('=')
      if (i <= 0) null
      else org.apache.spark.sql.Row(s.substring(0, i), s.substring(i + 1))
    }

    // zero-arg conformance functions (reference `zero()`, `null()`).
    Udf.scalar0[Int]("zero() -> int")(() => 0)
    Udf.scalarN[Any]("graft_null() -> int", mode = CallMode.CalledOnNullInput)(_ => null)

    // struct_of_all: one struct covering the scalar matrix in a single value
    // (reference tests.rs:264-327), seeded per row for a data-bearing check.
    Udf.scalar1[Int, org.apache.spark.sql.Row](
      "struct_of_all(int) -> struct<b: boolean, i32: int, i64: bigint, f64: double, s: string, d: date32, ts: timestamp>") { i =>
      org.apache.spark.sql.Row(
        i % 2 == 0, i, i.toLong * 1000L, i / 7.0, s"v$i",
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong)),
        java.time.LocalDateTime.ofEpochSecond(i.toLong * 3600L, 0, java.time.ZoneOffset.UTC))
    }

    // many_args: 16 ints summed (wide-signature conformance, tests.rs:344-367).
    Udf.scalarN[Int]("many_args(" + Seq.fill(16)("int").mkString(",") + ") -> int") { args =>
      args.map(a => if (a == null) 0 else a.asInstanceOf[Int]).sum
    }

    // Variadic concat with separator (variadic conformance, sig.rs:106-110).
    Udf.scalarN[String]("concat_sep(string, string, ...) -> string") { args =>
      val sep = args.head.asInstanceOf[String]
      args.tail.filter(_ != null).map(_.toString).mkString(sep)
    }

    // ---- table functions ---------------------------------------------------
    // range_setof(n) ->> int : 0..n-1 (reference `range` table fn).
    Udf.table1[Int, Int]("range_setof(int) ->> int")(n => Iterator.range(0, n))

    // repeat_value(v, n) ->> int (reference repeat_value, tests.rs).
    Udf.table2[Int, Int, Int]("repeat_value(int, int) ->> int") { (v, n) =>
      Iterator.fill(math.max(n, 0))(v)
    }

    // key_values("a=b,c=d") ->> struct — setof-struct conformance
    // (reference key_values, tests.rs:256-262).
    Udf.table1[String, org.apache.spark.sql.Row](
      "key_values(string) ->> struct<key: string, value: string>") { s =>
      s.split(",").iterator.flatMap { kv =>
        val i = kv.indexOf('=')
        if (i <= 0) None
        else Some(org.apache.spark.sql.Row(kv.substring(0, i), kv.substring(i + 1)))
      }
    }

    // json_array_elements: setof + error column (tests.rs:663-683).
    Udf.table1[String, String]("json_array_elements(string) ->> string", fallible = true) { s =>
      val t = s.trim
      if (!t.startsWith("[") || !t.endsWith("]"))
        throw new IllegalArgumentException("not a json array")
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) Iterator.empty
      else splitTopJson(body).iterator.map(_.trim)
    }

    // ---- extension types ---------------------------------------------------
    // Unconstrained (text-backed) decimal arithmetic — reference's
    // `arrowudf.decimal` extension (README.md:66-79; tests.rs:574-592).
    Udf.scalar2[String, String, String]("decimal_add(decimal, decimal) -> decimal") {
      (a, b) => new java.math.BigDecimal(a).add(new java.math.BigDecimal(b)).toPlainString
    }
    Udf.scalar2[String, String, String]("decimal_mul(decimal, decimal) -> decimal") {
      (a, b) => new java.math.BigDecimal(a).multiply(new java.math.BigDecimal(b)).toPlainString
    }

    // to_json over the wildcard matrix (tests.rs:104-114): JVM value → JSON
    // text. Scalars resolve through the boxed renderer; container types go to
    // the NATIVE writer-style kernel (JsonRenderExpr) — same bytes, no
    // per-row external Map/Seq/Row materialization.
    Udf.scalarN[String]("graft_to_json(*) -> json")(args => Json.render(args.head))
    Seq("int[]", "bigint[]", "string[]", "float[]", "double[]",
      "struct<key: string, value: string>", "map<string, string>").foreach { t =>
      Udf.native(s"graft_to_json($t) -> json") { children => JsonRenderExpr(children(0)) }
    }

    // identity over every type (tests.rs:68-92) — exercises the full
    // conversion matrix through the generic invoke tier.
    Udf.scalarN[Any]("graft_identity(*) -> *", mode = CallMode.CalledOnNullInput)(_.head)
    Udf.scalarN[Any]("graft_identity(string[]) -> string[]",
      mode = CallMode.CalledOnNullInput)(_.head)
    Udf.scalarN[Any]("graft_identity(struct<key: string, value: string>) -> struct<key: string, value: string>",
      mode = CallMode.CalledOnNullInput)(_.head)
    Udf.scalarN[Any]("graft_identity(map<string, string>) -> map<string, string>",
      mode = CallMode.CalledOnNullInput)(_.head)
    // bounded decimals are spelled per (p,s) and not in the `*` wildcard set —
    // register the money-shaped identity explicitly (remote Decimal128 path).
    Udf.scalarN[Any]("graft_identity(decimal(18,2)) -> decimal(18,2)",
      mode = CallMode.CalledOnNullInput)(_.head)
    // timestamptz is not in the `*` wildcard set (it expands `timestamp` to
    // the naive NTZ type) — register the instant-typed identity explicitly.
    Udf.scalarN[Any]("graft_identity(timestamptz) -> timestamptz",
      mode = CallMode.CalledOnNullInput)(_.head)

    // datetime(date, time64) -> timestamp (tests.rs:546-571): compose a date
    // and a µs-of-day (extension-tagged bigint) into a naive timestamp.
    Udf.scalar2[java.sql.Date, Long, java.time.LocalDateTime]("datetime(date32, time64) -> timestamp") {
      (d, micros) =>
        d.toLocalDate.atStartOfDay.plusNanos(micros * 1000L)
    }

    // interval_parts: decompose a calendar interval into integer components.
    // Pairs with graft_identity(interval) for oracle-checkable interval
    // coverage — Spark and DuckDB render interval STRINGS differently
    // ("1 days" vs "1 day"), integers compare exactly.
    Udf.scalar1[org.apache.spark.unsafe.types.CalendarInterval, org.apache.spark.sql.Row](
      "interval_parts(interval) -> struct<months: int, days: int, micros: bigint>") { iv =>
      org.apache.spark.sql.Row(iv.months, iv.days, iv.microseconds)
    }

    // json_get(json, i) -> json : array element access on the json extension
    // type (reference jsonb_access, `arrow-udf-example`); resolves only for
    // metadata-tagged json arguments.
    Udf.scalar2[String, Int, String]("json_get(json, int) -> json") { (s, i) =>
      val t = s.trim
      if (!t.startsWith("[") || !t.endsWith("]")) null
      else {
        val parts = splitTopJson(t.substring(1, t.length - 1).trim).map(_.trim)
        if (i < 0 || i >= parts.length || parts(i).isEmpty) null else parts(i)
      }
    }

    // ---- stable hashes (shared by dedup/fingerprint operators) -------------
    Udf.native("fnv64(string) -> bigint") { children => Fnv64Expr(children(0)) }
    Udf.native("poly_hash(string) -> bigint") { children =>
      ScalarInvoke("poly_hash",
        a => { val s = a(0).asInstanceOf[String]
          var h = 0L; var i = 0
          while (i < s.length) { h = (h * 31 + s.charAt(i)) % 1000000007L; i += 1 }
          h },
        org.apache.spark.sql.types.LongType, children)
    }
  }

  /** Minimal JSON renderer for `graft_to_json` — JVM external values → JSON
    * text (matches DuckDB's rendering for scalars: bare numbers, quoted
    * strings, lowercase booleans). */
  object Json {
    def render(v: Any): String = v match {
      case null => "null"
      case s: String => quote(s)
      case b: Boolean => if (b) "true" else "false"
      case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
      case f: Float => render(f.toDouble)
      case n: java.lang.Number => n.toString
      case seq: scala.collection.Seq[_] => seq.map(render).mkString("[", ",", "]")
      case r: org.apache.spark.sql.Row =>
        r.schema.fieldNames.zip(r.toSeq).map { case (k, x) => quote(k) + ":" + render(x) }
          .mkString("{", ",", "}")
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => quote(k.toString) + ":" + render(x) }.mkString("{", ",", "}")
      case other => quote(other.toString)
    }
    private def quote(s: String): String = {
      val sb = new java.lang.StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append("\"").toString
    }
  }

  /** Split a JSON array body on top-level commas (no dependency JSON parser —
    * enough for the conformance fixture). */
  private def splitTopJson(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false; var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }
}
