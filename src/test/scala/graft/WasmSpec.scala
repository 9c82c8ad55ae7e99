package graft

import graft.wasm._
import graft.wasm.Asm._
import org.scalatest.funsuite.AnyFunSuite

/** WASM guest tier: builder → decoder → interpreter round trips, the
  * reference's export-discovery convention, sandbox containment (fuel, memory
  * cap, trap isolation — reference `tests/wasm.rs:33-69`), and the Spark
  * integration through the registry. */
class WasmSpec extends AnyFunSuite {

  private def instance(config: WasmConfig = WasmConfig()) =
    new WasmInstance(WasmModule.decode(WasmKernels.moduleBytes), config)

  private val gcdExport = WasmUdf.exportName("wasm_gcd(bigint,bigint) -> bigint")
  private val divExport = WasmUdf.exportName("wasm_div(bigint,bigint) -> bigint")
  private val fibExport = WasmUdf.exportName("wasm_fib(bigint) -> bigint")
  private val hypExport = WasmUdf.exportName("wasm_hyp(double,double) -> double")

  test("gcd: loop + locals + unsigned rem") {
    val inst = instance()
    assert(inst.invoke(gcdExport, Array(48L, 18L)) == 6L)
    assert(inst.invoke(gcdExport, Array(17L, 13L)) == 1L)
    assert(inst.invoke(gcdExport, Array(0L, 5L)) == 5L)
    assert(inst.invoke(gcdExport, Array(1071L, 462L)) == 21L)
  }

  test("fib: recursion through call") {
    val inst = instance()
    assert(inst.invoke(fibExport, Array(10L)) == 55L)
    assert(inst.invoke(fibExport, Array(1L)) == 1L)
    assert(inst.invoke(fibExport, Array(0L)) == 0L)
  }

  test("hyp: f64 arithmetic matches IEEE") {
    val inst = instance()
    val bits = inst.invoke(hypExport, Array(
      java.lang.Double.doubleToRawLongBits(3.0), java.lang.Double.doubleToRawLongBits(4.0)))
    assert(java.lang.Double.longBitsToDouble(bits) == 5.0)
  }

  test("div traps on zero; the instance is isolated, a fresh one still works") {
    val inst = instance()
    assert(inst.invoke(divExport, Array(10L, 3L)) == 3L)
    val t = intercept[WasmTrap] { inst.invoke(divExport, Array(1L, 0L)) }
    assert(t.getMessage.contains("divide by zero"))
    assert(instance().invoke(divExport, Array(9L, 3L)) == 3L)
  }

  test("fuel budget contains an infinite loop") {
    val inst = instance(WasmConfig(fuel = 100000))
    val t = intercept[WasmTrap] { inst.invoke("probe_spin", Array.empty) }
    assert(t.getMessage.contains("fuel"))
  }

  test("memory bomb stops at the configured cap, not at JVM OOM") {
    // cap at 2 MiB = 32 pages; module min is 1 page
    val inst = instance(WasmConfig(memoryLimitBytes = 2L << 20))
    val pages = inst.invoke("probe_oom", Array.empty)
    assert(pages == 32L, s"grew to $pages pages")
  }

  test("memory load/store + data segment round trip") {
    val b = new WasmBuilder
    b.memory(1)
    b.dataSegment(16, Array[Byte](7, 0, 0, 0, 0, 0, 0, 0))
    // f(x) = { mem[8] = x; mem[8] + mem[16] }
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(
      i32Const(8), localGet(0), i64Store(),
      i32Const(8), i64Load(), i32Const(16), i64Load(), i64Add),
      exportAs = Some("f"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("f", Array(35L)) == 42L)
  }

  test("globals: immutable init, mutable accumulate across calls in one instance") {
    val b = new WasmBuilder
    val gAnswer = b.global(i64, mutable = false, i64Const(40L))
    val gAcc = b.global(i64, mutable = true, i64Const(0L))
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(
      globalGet(gAcc), localGet(0), i64Add, globalSet(gAcc),
      globalGet(gAcc), globalGet(gAnswer), i64Add),
      exportAs = Some("acc"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("acc", Array(1L)) == 41L)
    assert(inst.invoke("acc", Array(1L)) == 42L) // mutable global persisted
  }

  test("out-of-bounds access and unreachable trap cleanly") {
    val b = new WasmBuilder
    b.memory(1)
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      i32Const(WasmModule.PageSize), i64Load()), exportAs = Some("oob"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(unreachable, i64Const(0)),
      exportAs = Some("boom"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(intercept[WasmTrap] { inst.invoke("oob", Array.empty) }
      .getMessage.contains("out of bounds"))
    assert(intercept[WasmTrap] { inst.invoke("boom", Array.empty) }
      .getMessage.contains("unreachable"))
  }

  test("call depth limit contains unbounded recursion") {
    val b = new WasmBuilder
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(localGet(0), call(0)),
      exportAs = Some("r"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(intercept[WasmTrap] { inst.invoke("r", Array(0L)) }
      .getMessage.contains("call depth"))
  }

  test("br_table and select execute") {
    val b = new WasmBuilder
    // f(i) = [10, 20, 30][i] via br_table; out of range -> 99
    b.func(Seq(i32), Seq(i32), Seq.empty, concat(
      block(i32, concat(
        block(concat(
          block(concat(
            block(concat(
              localGet(0),
              Array[Byte](0x0E, 0x03, 0x00, 0x01, 0x02, 0x03) // br_table 0 1 2 default 3
            )),
            i32Const(10), br(2))),
          i32Const(20), br(1))),
        i32Const(30)))),
      exportAs = Some("pick"))
    // select(a, b, cond)
    b.func(Seq(i32, i32, i32), Seq(i32), Seq.empty, concat(
      localGet(0), localGet(1), localGet(2), select), exportAs = Some("sel"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("pick", Array(0L)) == 10L)
    assert(inst.invoke("pick", Array(1L)) == 20L)
    assert(inst.invoke("pick", Array(2L)) == 30L)
    assert(inst.invoke("sel", Array(7L, 8L, 1L)) == 7L)
    assert(inst.invoke("sel", Array(7L, 8L, 0L)) == 8L)
  }

  test("bump allocator: 8-aligned, grows memory on demand, reset_heap frees") {
    val inst = instance()
    val p1 = inst.invoke("alloc", Array(10L)).toInt
    val p2 = inst.invoke("alloc", Array(3L)).toInt
    assert(p2 == p1 + 16) // align8(10) = 16
    // large enough to force memory.grow past the 1-page minimum
    val big = inst.invoke("alloc", Array(300000L)).toInt
    inst.writeBytes(big + 299999, Array[Byte](1)) // end of region is addressable
    inst.invoke("reset_heap", Array.empty)
    assert(inst.invoke("alloc", Array(1L)).toInt == p1)
  }

  test("string args ride the FFI alloc ABI: count_byte over guest memory") {
    val spark = TestSpark.spark
    Graft.install(spark)
    val rows = spark.sql(
      """SELECT doc_id, text, wasm_count_byte(text, 101) AS ne
        |FROM parquet.`/root/testdata/sf0.001/documents.parquet`
        |ORDER BY doc_id LIMIT 50""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getString(1).getBytes("UTF-8").count(_ == 'e'.toByte).toLong
      assert(r.getLong(2) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("table function: divisors through the out-buffer ABI over LATERAL VIEW") {
    val spark = TestSpark.spark
    Graft.install(spark)
    val rows = spark.sql(
      """SELECT n, t.d AS d
        |FROM (SELECT CAST(id + 1 AS BIGINT) AS n FROM range(0, 12))
        |LATERAL VIEW wasm_divisors(n) t AS d
        |ORDER BY n, d""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (1L to 12L).flatMap(n => (1L to n).filter(n % _ == 0).map(n -> _))
    assert(rows.toSeq == expected.sortBy(identity))
  }

  test("table function overflow: total above out-buffer cap triggers exact-size retry") {
    // seq(n) yields 0..n-1; n=200 overflows the host's initial 64-entry buffer
    val b = new WasmBuilder
    b.memory(1, Some(256))
    b.func(Seq(i64, i32, i32), Seq(i64), Seq(i64), concat(
      block(
        loop(concat(
          localGet(3), localGet(0), i64GeS, brIf(1),
          localGet(3), i32WrapI64, localGet(2), i32LtS,
          ifVoid(concat(
            localGet(1), localGet(3), i32WrapI64, i32Const(8), i32Mul, i32Add,
            localGet(3), i64Store())),
          localGet(3), i64Const(1), i64Add, localSet(3),
          br(0)))),
      localGet(0)),
      exportAs = Some(WasmUdf.exportName("wasm_seq_test(bigint) ->> bigint")))
    b.addBumpAllocator(heapBase = 64)
    b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(3L),
      exportAs = Some(WasmUdf.VersionExport))
    assert(WasmUdf.load(b.build()) == Seq("wasm_seq_test"))
    val impl = graft.sig.Registry.global.lookup("wasm_seq_test").head
      .impl.asInstanceOf[graft.functions.TableImpl]
    val out = impl.f(Seq(200L)).map(_.asInstanceOf[Long]).toSeq
    assert(out == (0L until 200L))
  }

  test("wasm aggregate: five guest phases drive a retractable sum") {
    val spark = TestSpark.spark
    Graft.install(spark)
    val s = spark.sql("SELECT wasm_sum(CAST(id AS BIGINT)) AS s FROM range(0, 1000)")
      .collect()(0).getLong(0)
    assert(s == 499500L)
    // phase calls directly, including retract (the streaming hook)
    val agg = graft.sig.Registry.global.lookup("wasm_sum").head
      .impl.asInstanceOf[graft.functions.NativeAggImpl].agg
      .asInstanceOf[graft.functions.GraftAggregate[Long, Any]]
    var st = agg.createState()
    st = agg.accumulate(st, org.apache.spark.sql.Row(5L))
    st = agg.accumulate(st, org.apache.spark.sql.Row(7L))
    st = agg.retract(st, org.apache.spark.sql.Row(5L))
    assert(agg.finish(agg.merge(st, 10L)) == 17L)
  }

  test("symbol encode/decode matches the reference alphabet shape") {
    val sig = "wasm_gcd(bigint,bigint) -> bigint"
    val enc = WasmUdf.symbolEncode(sig)
    assert(!enc.contains('+') && !enc.contains('/') && !enc.contains('='))
    assert(WasmUdf.symbolDecode(enc) == sig)
  }

  test("load() rejects a module without the ABI version export") {
    val b = new WasmBuilder
    b.func(Seq(i64), Seq(i64), Seq.empty, localGet(0),
      exportAs = Some(WasmUdf.exportName("ident(bigint) -> bigint")))
    val t = intercept[WasmTrap] { WasmUdf.load(b.build()) }
    assert(t.getMessage.contains("version"))
  }

  test("memory/table/global imports: host provides fresh instances of the declared limits") {
    // the `--import-memory` linking shape: the module imports its linear
    // memory, function-pointer table, and a mutable global instead of
    // defining them — every index space must still resolve (imports occupy
    // the front), and the host satisfies each with a fresh isolated instance
    val b = new WasmBuilder
    val gAcc = b.importGlobal("env", "acc", i64, mutable = true)
    b.importMemory("env", "memory", 1, Some(4))
    b.importTable("env", "__indirect_function_table", 2, Some(2))
    val gLocal = b.global(i64, mutable = false, i64Const(5L)) // index shifted past the import
    val dbl = b.func(Seq(i64), Seq(i64), Seq.empty, concat(localGet(0), localGet(0), i64Add))
    val neg = b.func(Seq(i64), Seq(i64), Seq.empty, concat(i64Const(0L), localGet(0), i64Sub))
    val unTi = b.typeIdx(Seq(i64), Seq(i64))
    // f(sel, x): mem[8] = x (imported memory); acc += mem[8] (imported
    // global, zero-initialized by the host); table[sel](acc + gLocal)
    b.func(Seq(i32, i64), Seq(i64), Seq.empty, concat(
      i32Const(8), localGet(1), i64Store(),
      globalGet(gAcc), i32Const(8), i64Load(), i64Add, globalSet(gAcc),
      globalGet(gAcc), globalGet(gLocal), i64Add,
      localGet(0), callIndirect(unTi)),
      exportAs = Some("f"))
    b.elem(0, Seq(dbl, neg))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("f", Array(0L, 10L)) == 30L)  // dbl(10 + 5)
    assert(inst.invoke("f", Array(1L, 10L)) == -25L) // neg(20 + 5): imported global persisted
    // a second instance starts from zero again — no cross-instance sharing
    val inst2 = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst2.invoke("f", Array(0L, 10L)) == 30L)
  }

  test("WASI preview1 shims: a pure-compute wasip1 startup sequence runs without trapping") {
    val b = new WasmBuilder
    val envSizes = b.importFunc("wasi_snapshot_preview1", "environ_sizes_get", Seq(i32, i32), Seq(i32))
    val fdWrite = b.importFunc("wasi_snapshot_preview1", "fd_write", Seq(i32, i32, i32, i32), Seq(i32))
    val procExit = b.importFunc("wasi_snapshot_preview1", "proc_exit", Seq(i32), Seq.empty)
    val randomGet = b.importFunc("wasi_snapshot_preview1", "random_get", Seq(i32, i32), Seq(i32))
    val fdSeek = b.importFunc("wasi_snapshot_preview1", "fd_seek", Seq(i32, i64, i32, i32), Seq(i32))
    b.memory(1)
    // libc startup shape: environ_sizes_get(count@0, bufsize@4) must answer
    // errno 0 with both counts zeroed
    b.func(Seq.empty, Seq(i32), Seq.empty, concat(
      i32Const(0), i32Const(4), call(envSizes)), exportAs = Some("startup"))
    // panic plumbing: one iovec {ptr=64, len=5} at 16; fd_write(stderr, ...)
    // swallows the bytes but reports the true count through nwritten@8
    b.func(Seq.empty, Seq(i32), Seq.empty, concat(
      i32Const(16), i32Const(64), i32Store(),
      i32Const(16), i32Const(5), i32Store(4),
      i32Const(2), i32Const(16), i32Const(1), i32Const(8), call(fdWrite),
      drop, i32Const(8), i32Load()), exportAs = Some("panic_write"))
    // random_get is deterministic: the same call yields the same bytes
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      i32Const(32), i32Const(8), call(randomGet), drop,
      i32Const(32), i64Load()), exportAs = Some("rand"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      i32Const(7), call(procExit), i64Const(0)), exportAs = Some("die"))
    b.func(Seq.empty, Seq(i32), Seq.empty, concat(
      i32Const(3), i64Const(0L), i32Const(0), i32Const(48), call(fdSeek)),
      exportAs = Some("seek"))
    val bytes = b.build()
    val inst = new WasmInstance(WasmModule.decode(bytes), WasmConfig())
    assert(inst.invoke("startup", Array.empty) == 0L)      // errno success
    assert(inst.invoke("panic_write", Array.empty) == 5L)  // nwritten honored
    val r1 = inst.invoke("rand", Array.empty)
    val inst2 = new WasmInstance(WasmModule.decode(bytes), WasmConfig())
    assert(r1 != 0L && inst2.invoke("rand", Array.empty) == r1) // reproducible
    assert(intercept[WasmTrap] { inst2.invoke("die", Array.empty) }
      .getMessage.contains("proc_exit(7)"))
    assert(inst.invoke("seek", Array.empty) == 8L)         // errno badf
    // a non-WASI import still traps like before
    val b2 = new WasmBuilder
    val ext = b2.importFunc("env", "host_thing", Seq.empty, Seq(i32))
    b2.func(Seq.empty, Seq(i32), Seq.empty, call(ext), exportAs = Some("go"))
    val i3 = new WasmInstance(WasmModule.decode(b2.build()), WasmConfig())
    assert(intercept[WasmTrap] { i3.invoke("go", Array.empty) }
      .getMessage.contains("unresolved import"))
  }

  test("duplicate memory (imported + defined) is rejected; unknown import kinds trap") {
    val b = new WasmBuilder
    b.importMemory("env", "memory", 1)
    b.memory(1)
    b.func(Seq(i64), Seq(i64), Seq.empty, localGet(0), exportAs = Some("id"))
    assert(intercept[WasmTrap] { WasmModule.decode(b.build()) }
      .getMessage.contains("multiple memories"))
    // hand-craft an import with bogus kind 9: magic + version + section 2
    val bytes = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00,
      0x02, 0x08, 0x01, 0x01, 0x65, 0x01, 0x66, 0x09, 0x7F, 0x00)
    assert(intercept[WasmTrap] { WasmModule.decode(bytes) }
      .getMessage.contains("unsupported import kind"))
  }

  // ---- Spark integration ---------------------------------------------------

  test("wasm_gcd over SQL matches the native gcd tier") {
    val spark = TestSpark.spark
    Graft.install(spark)
    val rows = spark.sql(
      """SELECT wasm_gcd(CAST(id + 24 AS BIGINT), CAST(id + 36 AS BIGINT)) AS w,
        |       gcd(CAST(id + 24 AS INT), CAST(id + 36 AS INT)) AS n
        |FROM range(0, 100)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getInt(1).toLong, r.toString))
  }

  test("wasm_div error column: trap becomes error, not task failure") {
    val spark = TestSpark.spark
    Graft.install(spark)
    val rows = spark.sql(
      """SELECT id, wasm_div(CAST(10 AS BIGINT), CAST(id % 2 AS BIGINT)) AS d
        |FROM range(0, 4) ORDER BY id""".stripMargin)
      .selectExpr("id", "d.value AS v", "d.error AS e").collect()
    rows.foreach { r =>
      if (r.getLong(0) % 2 == 1) { assert(r.getLong(1) == 10L); assert(r.isNullAt(2)) }
      else { assert(r.isNullAt(1)); assert(r.getString(2).contains("divide by zero")) }
    }
  }

  test("pool reuses instances across calls; trapped ones are restored and reused") {
    val spark = TestSpark.spark
    Graft.install(spark)
    // mixed ok/trap rows in one partition exercise acquire/release and the
    // trap → restorePristine → release path (no per-trap re-instantiation)
    val n = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT wasm_div(CAST(100 AS BIGINT), CAST(id % 3 AS BIGINT)) AS d
        |  FROM range(0, 300)) WHERE d.error IS NULL""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 200L)
  }

  test("restorePristine: a trapped instance is state-identical to a fresh one") {
    val b = new WasmBuilder
    b.memory(1)
    b.dataSegment(0, Array[Byte](42, 0, 0, 0, 0, 0, 0, 0))
    val g = b.global(i64, mutable = true, i64Const(7L))
    // dirty EVERYTHING an errant guest can dirty, then trap: mutable global,
    // heap over the data segment, and a memory.grow — the pool must hand the
    // next caller something indistinguishable from a fresh instantiation
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      i64Const(999L), globalSet(g),
      i32Const(0), i64Const(13L), i64Store(),
      i32Const(3), memoryGrow, drop,
      unreachable, i64Const(0)), exportAs = Some("dirty_then_trap"))
    // probe = global*1000 + mem[0] + memory.size*100000: catches a stale
    // global, a dirty heap, and un-shed growth in one number
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      globalGet(g), i64Const(1000L), i64Mul,
      i32Const(0), i64Load(), i64Add,
      memorySize, i64ExtendI32U, i64Const(100000L), i64Mul, i64Add),
      exportAs = Some("probe"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    val fresh = 7L * 1000 + 42 + 1L * 100000
    assert(inst.invoke("probe", Array.empty) == fresh)
    intercept[WasmTrap] { inst.invoke("dirty_then_trap", Array.empty) }
    inst.restorePristine()
    assert(inst.invoke("probe", Array.empty) == fresh)
    // restore is idempotent across repeated trap/restore cycles
    intercept[WasmTrap] { inst.invoke("dirty_then_trap", Array.empty) }
    inst.restorePristine()
    assert(inst.invoke("probe", Array.empty) == fresh)
  }

  // ---- string returns + blob aggregate state -------------------------------

  test("string RETURN rides the alloc ABI back out: substring over SQL") {
    val spark = TestSpark.spark
    Graft.install(spark)
    val r = spark.sql(
      "SELECT wasm_substring('hello world', 6, 5) AS a, " +
      "       wasm_substring('hello', 0, 99) AS b").collect()(0)
    assert(r.getString(0) == "world")
    assert(r.getString(1) == "hello") // len clamps to the buffer
  }

  test("substring clamps hostile start/len instead of reading out of bounds") {
    val impl = graft.sig.Registry.global.lookup("wasm_substring").head
      .impl.asInstanceOf[graft.functions.ScalarImpl]
    assert(impl.f(Seq("hello", 99, 5)) == "")   // start past end
    assert(impl.f(Seq("hello", -3, 2)) == "he") // negative start → 0
    assert(impl.f(Seq("hello", 2, -1)) == "")   // negative len → 0
  }

  test("blob-state aggregate: two-accumulator weighted avg, all phases in the guest") {
    val spark = TestSpark.spark
    Graft.install(spark)
    // sum(v*w)/sum(w) with v = id, w = id % 3 + 1 over 0..99
    val got = spark.sql(
      """SELECT wasm_wavg(CAST(id AS INT), CAST(id % 3 + 1 AS BIGINT)) AS wa
        |FROM range(0, 100)""".stripMargin).collect()(0).getDouble(0)
    val (vw, w) = (0 until 100).foldLeft((0L, 0L)) { case ((a, b), i) =>
      (a + i.toLong * (i % 3 + 1), b + (i % 3 + 1)) }
    assert(math.abs(got - vw.toDouble / w.toDouble) < 1e-12)
    // direct phase drive, including retract and a 16-byte state round trip
    val agg = graft.sig.Registry.global.lookup("wasm_wavg").head
      .impl.asInstanceOf[graft.functions.NativeAggImpl].agg
      .asInstanceOf[graft.functions.GraftAggregate[Array[Byte], Any]]
    var st = agg.createState()
    assert(st.length == 16)
    st = agg.accumulate(st, org.apache.spark.sql.Row(10, 2L)) // +20, w 2
    st = agg.accumulate(st, org.apache.spark.sql.Row(4, 1L))  // +4, w 1
    st = agg.retract(st, org.apache.spark.sql.Row(4, 1L))     // back out
    var other = agg.createState()
    other = agg.accumulate(other, org.apache.spark.sql.Row(6, 2L)) // +12, w 2
    assert(agg.finish(agg.merge(st, other)) == 8.0) // 32 / 4
  }

  // ---- hostile-module containment ------------------------------------------

  test("deeply nested blocks are rejected at decode, not a StackOverflowError") {
    val nested = 50000
    val body = Array.fill(nested)(Array[Byte](0x02, 0x40)).flatten ++
      Array.fill(nested)(0x0B.toByte)
    val b = new WasmBuilder
    b.func(Seq.empty, Seq.empty, Seq.empty, body)
    val t = intercept[WasmTrap] { WasmModule.decode(b.build()) }
    assert(t.getMessage.contains("nesting"))
  }

  test("runtime block nesting counts against maxCallDepth") {
    val depth = 200
    val body = Array.fill(depth)(Array[Byte](0x02, 0x40)).flatten ++
      Array.fill(depth)(0x0B.toByte)
    val b = new WasmBuilder
    b.func(Seq.empty, Seq.empty, Seq.empty, body, exportAs = Some("deep"))
    // block budget = 4 x maxCallDepth (separate from the call counter, so
    // deep-but-legal recursion keeps its full depth allowance)
    val inst = new WasmInstance(WasmModule.decode(b.build()),
      WasmConfig(maxCallDepth = 40))
    val t = intercept[WasmTrap] { inst.invoke("deep", Array.empty) }
    assert(t.getMessage.contains("nesting"))
  }

  test("operand stack underflow and bad local index trap, never a JVM error") {
    val b = new WasmBuilder
    b.func(Seq.empty, Seq(i64), Seq.empty, i64Add, exportAs = Some("underflow"))
    b.func(Seq.empty, Seq(i64), Seq.empty, localGet(7), exportAs = Some("badlocal"))
    val m = WasmModule.decode(b.build())
    val t1 = intercept[WasmTrap] {
      new WasmInstance(m, WasmConfig()).invoke("underflow", Array.empty) }
    assert(t1.getMessage.contains("underflow"))
    val t2 = intercept[WasmTrap] {
      new WasmInstance(m, WasmConfig()).invoke("badlocal", Array.empty) }
    assert(t2.getMessage.contains("malformed module"))
  }

  test("hostile table-function totals: absurd size and ever-growing both trap") {
    val b = new WasmBuilder
    b.memory(1, Some(256))
    // claims 2^30 rows without writing any
    b.func(Seq(i64, i32, i32), Seq(i64), Seq.empty, i64Const(1L << 30),
      exportAs = Some(WasmUdf.exportName("wasm_huge_test(bigint) ->> bigint")))
    // always reports cap * 2: a host that trusts it would loop forever
    b.func(Seq(i64, i32, i32), Seq(i64), Seq.empty, concat(
      localGet(2), i32Const(2), i32Mul, i64ExtendI32S),
      exportAs = Some(WasmUdf.exportName("wasm_grow_test(bigint) ->> bigint")))
    b.addBumpAllocator(heapBase = 64)
    b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(3L),
      exportAs = Some(WasmUdf.VersionExport))
    WasmUdf.load(b.build())
    val huge = graft.sig.Registry.global.lookup("wasm_huge_test").head
      .impl.asInstanceOf[graft.functions.TableImpl]
    assert(intercept[WasmTrap] { huge.f(Seq(1L)).toSeq }
      .getMessage.contains("invalid total"))
    val grow = graft.sig.Registry.global.lookup("wasm_grow_test").head
      .impl.asInstanceOf[graft.functions.TableImpl]
    assert(intercept[WasmTrap] { grow.f(Seq(1L)).toSeq }
      .getMessage.contains("grew past"))
  }

  test("pool key separates configs: same binary, different limits never share") {
    val a = WasmPool.keyOf(WasmKernels.moduleBytes, WasmConfig())
    val b = WasmPool.keyOf(WasmKernels.moduleBytes, WasmConfig(fuel = 42))
    assert(a != b)
    assert(WasmPool.keyOf(WasmKernels.moduleBytes, WasmConfig()) == a)
  }

  test("call_indirect dispatches through the funcref table with type checks") {
    val b = new WasmBuilder
    // two (i64,i64)->i64 kernels selected by table index, plus one with a
    // DIFFERENT type to prove the runtime signature check
    val addI = b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Add))
    val mulI = b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Mul))
    val wrongType = b.func(Seq(i64), Seq(i64), Seq.empty, localGet(0))
    val binTi = b.typeIdx(Seq(i64, i64), Seq(i64))
    // dispatch(sel, a, b) = table[sel](a, b)
    b.func(Seq(i32, i64, i64), Seq(i64), Seq.empty, concat(
      localGet(1), localGet(2), localGet(0), callIndirect(binTi)),
      exportAs = Some("dispatch"))
    b.table(4)
    b.elem(0, Seq(addI, mulI, wrongType)) // table[3] stays uninitialized
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("dispatch", Array(0L, 6L, 7L)) == 13L)
    assert(inst.invoke("dispatch", Array(1L, 6L, 7L)) == 42L)
    assert(intercept[WasmTrap] { inst.invoke("dispatch", Array(2L, 1L, 1L)) }
      .getMessage.contains("type mismatch"))
    assert(intercept[WasmTrap] { inst.invoke("dispatch", Array(3L, 1L, 1L)) }
      .getMessage.contains("uninitialized"))
    assert(intercept[WasmTrap] { inst.invoke("dispatch", Array(99L, 1L, 1L)) }
      .getMessage.contains("undefined element"))
  }

  test("bulk memory: memory.copy (overlapping) and memory.fill") {
    val b = new WasmBuilder
    b.memory(1, Some(4))
    b.dataSegment(0, "abcdefgh".getBytes("UTF-8"))
    // copy(dst, src, n) then read byte at i
    b.func(Seq(i32, i32, i32), Seq.empty, Seq.empty, concat(
      localGet(0), localGet(1), localGet(2), memoryCopy),
      exportAs = Some("copy"))
    b.func(Seq(i32, i32, i32), Seq.empty, Seq.empty, concat(
      localGet(0), localGet(1), localGet(2), memoryFill),
      exportAs = Some("fill"))
    b.func(Seq(i32), Seq(i64), Seq.empty, concat(
      localGet(0), i32Load8U(), i64ExtendI32U),
      exportAs = Some("peek"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    inst.invoke("copy", Array(2L, 0L, 4L)) // overlapping: ab|abcd|gh
    assert((0 to 7).map(i => inst.invoke("peek", Array(i.toLong)).toChar).mkString ==
      "ababcdgh")
    inst.invoke("fill", Array(0L, 'z'.toLong, 3L))
    assert((0 to 7).map(i => inst.invoke("peek", Array(i.toLong)).toChar).mkString ==
      "zzzbcdgh")
    assert(intercept[WasmTrap] { inst.invoke("copy", Array(65530L, 0L, 100L)) }
      .getMessage.contains("out of bounds"))
  }

  test("saturating truncation clamps instead of trapping; NaN goes to 0") {
    val b = new WasmBuilder
    b.func(Seq(f64), Seq(i64), Seq.empty, concat(localGet(0), i32TruncSatF64S, i64ExtendI32S),
      exportAs = Some("sat32"))
    b.func(Seq(f64), Seq(i64), Seq.empty, concat(localGet(0), i64TruncSatF64S),
      exportAs = Some("sat64"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    def f(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    assert(inst.invoke("sat32", Array(f(1e12))) == Int.MaxValue.toLong)
    assert(inst.invoke("sat32", Array(f(-1e12))) == Int.MinValue.toLong)
    assert(inst.invoke("sat32", Array(f(Double.NaN))) == 0L)
    assert(inst.invoke("sat32", Array(f(-7.9))) == -7L)
    assert(inst.invoke("sat64", Array(f(1e300))) == Long.MaxValue)
    assert(inst.invoke("sat64", Array(f(Double.NegativeInfinity))) == Long.MinValue)
  }

  test("start function runs at instantiation under full containment") {
    val b = new WasmBuilder
    b.memory(1, Some(4))
    // ctor writes a magic value; peek reads it back
    val ctor = b.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(8), i64Const(0xC0FFEEL), i64Store()))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(i32Const(8), i64Load()),
      exportAs = Some("peek"))
    b.start(ctor)
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("peek", Array.empty) == 0xC0FFEEL)
    // hostile ctor: infinite loop traps at INSTANTIATION under the fuel cap
    val evil = new WasmBuilder
    evil.memory(1, Some(4))
    val spin = evil.func(Seq.empty, Seq.empty, Seq.empty, loop(br(0)))
    evil.start(spin)
    val m = WasmModule.decode(evil.build())
    assert(intercept[WasmTrap] {
      new WasmInstance(m, WasmConfig(fuel = 100000)) }.getMessage.contains("fuel"))
  }

  test("function imports load as stubs: module runs until an import is reached") {
    val b = new WasmBuilder
    // the wasip1 shape: an fd_write import the numeric kernel never calls
    val fdWrite = b.importFunc("wasi_snapshot_preview1", "fd_write",
      Seq(i32, i32, i32, i32), Seq(i32))
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(localGet(0), i64Const(1L), i64Add),
      exportAs = Some("inc"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      i32Const(0), i32Const(0), i32Const(0), i32Const(0), call(fdWrite),
      i64ExtendI32S),
      exportAs = Some("logs"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("inc", Array(41L)) == 42L) // import never reached
    assert(intercept[WasmTrap] { inst.invoke("logs", Array.empty) }
      .getMessage.contains("fd_write"))
  }

  test("tinyint return maps through fromSlot; unsupported returns fail at load") {
    val b = new WasmBuilder
    b.func(Seq(i64), Seq(i64), Seq.empty, localGet(0),
      exportAs = Some(WasmUdf.exportName("wasm_byte_test(bigint) -> tinyint")))
    b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(3L),
      exportAs = Some(WasmUdf.VersionExport))
    WasmUdf.load(b.build())
    val impl = graft.sig.Registry.global.lookup("wasm_byte_test").head
      .impl.asInstanceOf[graft.functions.ScalarImpl]
    assert(impl.f(Seq(7L)) == 7.toByte)
    val bad = new WasmBuilder
    bad.func(Seq(i64), Seq(i64), Seq.empty, localGet(0),
      exportAs = Some(WasmUdf.exportName("wasm_bad_ret(bigint) -> date")))
    bad.func(Seq.empty, Seq(i64), Seq.empty, i64Const(3L),
      exportAs = Some(WasmUdf.VersionExport))
    assert(intercept[IllegalArgumentException] { WasmUdf.load(bad.build()) }
      .getMessage.contains("unsupported wasm return type"))
  }

  // --- WASM 2.0 breadth: multi-value, reference types, table mutation ------

  test("multi-value: loop with params carries state on the operand stack") {
    val b = new WasmBuilder
    val ti = b.typeIdx(Seq(i64, i64), Seq(i64))
    // sum 1..n with (acc, i) as LOOP PARAMS instead of locals — the shape
    // LLVM emits for reduction loops under the multi-value proposal
    b.func(Seq(i64), Seq(i64), Seq(i64), concat(
      i64Const(0), localGet(0),
      loopOfType(ti, concat(
        localSet(1), localGet(1), i64Add,           // acc += i
        localGet(1), i64Const(1), i64Sub, localSet(1), // i -= 1
        localGet(1), localGet(1), i64Const(0), i64GtS,
        brIf(0),                                    // br to head re-supplies (acc, i)
        drop))),
      exportAs = Some("sumn"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("sumn", Array(10L)) == 55L)
    assert(inst.invoke("sumn", Array(0L)) == 0L)
    assert(inst.invoke("sumn", Array(1000L)) == 500500L)
  }

  test("multi-value: a two-result function round-trips through call") {
    val b = new WasmBuilder
    val dm = b.func(Seq(i64, i64), Seq(i64, i64), Seq.empty, concat(
      localGet(0), localGet(1), i64DivS,
      localGet(0), localGet(1), i64RemS))
    b.func(Seq(i64, i64), Seq(i64), Seq(i64), concat(
      localGet(0), localGet(1), call(dm),           // [q, r]
      localSet(2), i64Const(1000), i64Mul, localGet(2), i64Add),
      exportAs = Some("combine"))
    b.exportFunc("dm", dm)
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("combine", Array(12345L, 100L)) == 123045L)
    // multi-value stays internal: the host slot ABI carries one result
    assert(intercept[WasmTrap] { inst.invoke("dm", Array(7L, 2L)) }
      .getMessage.contains("multi-value"))
  }

  test("multi-value: if with block params computes on the inherited stack") {
    val b = new WasmBuilder
    val ti = b.typeIdx(Seq(i64, i64), Seq(i64))
    b.func(Seq(i64, i64), Seq(i64), Seq.empty, concat(
      localGet(0), localGet(1),
      localGet(0), localGet(1), i64LtS,
      ifOfType(ti,
        concat(drop, drop, localGet(1), localGet(0), i64Sub), // b - a
        i64Sub)),                                             // a - b
      exportAs = Some("absdiff"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("absdiff", Array(3L, 10L)) == 7L)
    assert(inst.invoke("absdiff", Array(10L, 3L)) == 7L)
    assert(inst.invoke("absdiff", Array(5L, 5L)) == 0L)
  }

  test("ref types + table ops: passive elem, init/get/set/grow/fill, drop") {
    val b = new WasmBuilder
    val t0 = b.typeIdx(Seq.empty, Seq(i64))
    val f10 = b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(10))
    val f20 = b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(20))
    b.table(2, Some(4))
    val seg = b.elemPassive(Seq(f10, f20))
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(
      localGet(0), i32WrapI64, callIndirect(t0)), exportAs = Some("call_i"))
    b.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(0), i32Const(0), i32Const(2), tableInit(seg)), exportAs = Some("setup"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      refNullFunc, i32Const(2), tableGrow, i64ExtendI32S), exportAs = Some("grow2"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      tableSize, i64ExtendI32S), exportAs = Some("size"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      i32Const(3), tableGet, refIsNull, i64ExtendI32S), exportAs = Some("slot3null"))
    b.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(3), refFunc(f10), tableSet), exportAs = Some("set3"))
    b.func(Seq.empty, Seq.empty, Seq.empty, elemDrop(seg), exportAs = Some("dropseg"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    // before table.init every slot is null
    assert(intercept[WasmTrap] { inst.invoke("call_i", Array(0L)) }
      .getMessage.contains("uninitialized"))
    inst.invoke("setup", Array.empty)
    assert(inst.invoke("call_i", Array(0L)) == 10L)
    assert(inst.invoke("call_i", Array(1L)) == 20L)
    // grow by 2 null slots: old size back, new size visible
    assert(inst.invoke("grow2", Array.empty) == 2L)
    assert(inst.invoke("size", Array.empty) == 4L)
    assert(inst.invoke("slot3null", Array.empty) == 1L)
    // table.set with a ref.func constant makes the slot callable
    inst.invoke("set3", Array.empty)
    assert(inst.invoke("slot3null", Array.empty) == 0L)
    assert(inst.invoke("call_i", Array(3L)) == 10L)
    // growing past the declared max fails with -1, like memory.grow
    assert(inst.invoke("grow2", Array.empty) == -1L)
    // dropped segments are empty: a non-zero-length table.init traps
    inst.invoke("dropseg", Array.empty)
    assert(intercept[WasmTrap] { inst.invoke("setup", Array.empty) }
      .getMessage.contains("table.init"))
  }

  test("funcref locals default to null, not func index 0") {
    val b = new WasmBuilder
    b.func(Seq.empty, Seq(i64), Seq(funcref), concat(
      localGet(0), refIsNull, i64ExtendI32U), exportAs = Some("lnull"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("lnull", Array.empty) == 1L)
  }

  test("passive data: memory.init copies on demand; data.drop releases") {
    val b = new WasmBuilder
    b.memory(1)
    val seg = b.dataPassive("HELLO".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(16), i32Const(0), i32Const(5), memoryInit(seg)), exportAs = Some("init"))
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(
      localGet(0), i32WrapI64, i32Load8U(16), i64ExtendI32U), exportAs = Some("peek"))
    b.func(Seq.empty, Seq.empty, Seq.empty, dataDrop(seg), exportAs = Some("rel"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("peek", Array(0L)) == 0L) // passive bytes NOT copied at instantiation
    inst.invoke("init", Array.empty)
    assert(inst.invoke("peek", Array(0L)) == 'H'.toLong)
    assert(inst.invoke("peek", Array(4L)) == 'O'.toLong)
    inst.invoke("rel", Array.empty)
    assert(intercept[WasmTrap] { inst.invoke("init", Array.empty) }
      .getMessage.contains("memory.init"))
  }

  test("foreign-binary fixture: LLVM-shaped layout decodes, ABI works end-to-end") {
    // the checked-in hand-assembled module (NOT WasmBuilder output): funcref
    // table, __stack_pointer-style globals, active data at 1024, trailing
    // name/producers/target_features custom sections — all must decode
    val bytes = WasmFixture.bytes
    val m = WasmModule.decode(bytes)
    val names = m.exports.map(_.name).toSet
    assert(names.contains("ARROWUDF_VERSION_3_0") && names.contains("alloc"))
    assert(m.exports.count(_.name.startsWith("arrowudf_")) == 7)
    // the active data segment landed where the foreign layout says
    val inst = new WasmInstance(m, WasmConfig())
    assert(new String(inst.readBytes(1024, 5),
      java.nio.charset.StandardCharsets.US_ASCII) == "graft")
    // edge semantics through the SQL surface
    val spark = TestSpark.spark
    graft.Graft.install(spark)
    val r = spark.sql(
      """SELECT wasm_fx_gcd(0, 5) AS g0, wasm_fx_gcd(91, 0) AS g1,
        |  wasm_fx_upper('mIxEd! 42 [a-z]') AS up,
        |  wasm_fx_vadd(-3, 5) AS vneg""".stripMargin).collect().head
    assert(r.getInt(0) == 5 && r.getInt(1) == 91)
    assert(r.getString(2) == "MIXED! 42 [A-Z]")
    assert(r.getLong(3) == 2L)
    // aggregate phases incl. merge across a forced repartition
    val ss = spark.sql(
      """SELECT wasm_fx_sumsq(CAST(v AS INT)) AS ss
        |FROM (SELECT explode(sequence(1, 10)) AS v DISTRIBUTE BY v % 3)""".stripMargin)
      .collect().head.getLong(0)
    assert(ss == 385L) // 1^2 + ... + 10^2
    // round-2 matrix: f64 math, f32x4 SIMD, multi-value internal call
    val m2 = spark.sql(
      """SELECT wasm_fx_hypot(CAST(3 AS DOUBLE), CAST(4 AS DOUBLE)) AS h,
        |  wasm_fx_fma(CAST(3 AS FLOAT), CAST(4 AS FLOAT), CAST(5 AS FLOAT)) AS f,
        |  wasm_fx_spread(-3, 9) AS s1, wasm_fx_spread(9, -3) AS s2,
        |  wasm_fx_spread(7, 7) AS s3""".stripMargin).collect().head
    assert(m2.getDouble(0) == 5.0)
    assert(m2.getFloat(1) == 17.0f)
    assert(m2.getLong(2) == 12L && m2.getLong(3) == 12L && m2.getLong(4) == 0L)
    // table function through the foreign binary's out-buffer ABI
    val divs = spark.sql(
      "SELECT d FROM (SELECT 1) LATERAL VIEW wasm_fx_divisors(12) t AS d ORDER BY d")
      .collect().map(_.getInt(0)).toSeq
    assert(divs == Seq(1, 2, 3, 4, 6, 12))
    // out-buffer overflow handshake: 55440 has 120 divisors > the 64-slot
    // initial cap, forcing the exact-size re-call (and staying inside the
    // default 10M-step fuel: ~0.9M loop steps per call)
    val many = spark.sql(
      "SELECT count(*) AS c FROM (SELECT 1) LATERAL VIEW wasm_fx_divisors(55440) t AS d")
      .collect().head.getLong(0)
    assert(many == 120L)
  }

  test("rustc-built fixture: real LLVM codegen decodes, full ABI works end-to-end") {
    // fixture_rustc.wasm is genuine compiler output (nightly rustc →
    // wasm32-unknown-unknown from the no_core crate tools/wasm_conformance.rs)
    // — instruction selection, block layout, and the mutable __stack_pointer
    // global are LLVM's, the conformance axis the hand-assembled fixture
    // cannot provide
    val bytes = WasmFixture.rustcBytes
    val m = WasmModule.decode(bytes)
    val names = m.exports.map(_.name).toSet
    assert(names.contains("ARROWUDF_VERSION_3_0") &&
      names.contains("alloc") && names.contains("reset_heap") &&
      names.contains("memory"))
    assert(m.exports.count(_.name.startsWith("arrowudf_")) == 8)
    // LLVM provenance rides in the binary itself: rustc emits a
    // target_features custom section listing the enabled wasm features
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(raw.contains("target_features") && raw.contains("mutable-globals"),
      "expected rustc/LLVM's target_features custom section")
    // LLVM-SELECTED SIMD: the crate builds with +simd128 and the loop
    // vectorizer turns rs_count_eq's byte loop into v128 code — require the
    // characteristic opcodes in the committed binary (v128.const = FD 0C,
    // i8x16.eq = FD 23) so the claim can never silently rot
    assert(raw.contains("simd128"), "expected simd128 in target_features")
    def hasOp(a: Int, b: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xFF) == a && (p(1) & 0xFF) == b)
    assert(hasOp(0xFD, 0x0C), "no v128.const — LLVM did not vectorize")
    assert(hasOp(0xFD, 0x23), "no i8x16.eq — LLVM did not vectorize")
    // edge semantics through the SQL surface
    val spark = TestSpark.spark
    graft.Graft.install(spark)
    val r = spark.sql(
      """SELECT wasm_rs_gcd(0, 5) AS g0, wasm_rs_gcd(-48, 18) AS g1,
        |  wasm_rs_mix(12345, 67) AS m,
        |  wasm_rs_poly(CAST(3 AS DOUBLE), CAST(4 AS DOUBLE)) AS p,
        |  wasm_rs_fma(CAST(3 AS FLOAT), CAST(4 AS FLOAT), CAST(5 AS FLOAT)) AS f,
        |  wasm_rs_upper('mIxEd! 42 [a-z]') AS up""".stripMargin).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 6L)
    assert(r.getInt(2) == 55740)
    assert(r.getDouble(3) == 49.0)
    assert(r.getFloat(4) == 17.0f)
    assert(r.getString(5) == "MIXED! 42 [A-Z]")
    // the autovectorized byte-count: >16-byte inputs take the v128 lanes,
    // the sub-16 tail and the empty string take the scalar epilogue
    val cnt = spark.sql(
      """SELECT wasm_rs_count('sixteen bytes ee + tail eee', 101) AS a,
        |  wasm_rs_count('short e', 101) AS b,
        |  wasm_rs_count('', 101) AS c,
        |  wasm_rs_count(repeat('e', 1000), 101) AS d""".stripMargin).collect().head
    assert(cnt.getLong(0) == 8L, cnt.toString)
    assert(cnt.getLong(1) == 1L && cnt.getLong(2) == 0L && cnt.getLong(3) == 1000L)
    // aggregate phases incl. merge across a forced repartition
    val ss = spark.sql(
      """SELECT wasm_rs_sumsq(CAST(v AS INT)) AS ss
        |FROM (SELECT explode(sequence(1, 10)) AS v DISTRIBUTE BY v % 3)""".stripMargin)
      .collect().head.getLong(0)
    assert(ss == 385L)
    // table function + the out-buffer overflow handshake (120 divisors >
    // the 64-slot initial cap forces the exact-size re-call)
    val divs = spark.sql(
      "SELECT d FROM (SELECT 1) LATERAL VIEW wasm_rs_divisors(12) t AS d ORDER BY d")
      .collect().map(_.getInt(0)).toSeq
    assert(divs == Seq(1, 2, 3, 4, 6, 12))
    val many = spark.sql(
      "SELECT count(*) AS c FROM (SELECT 1) LATERAL VIEW wasm_rs_divisors(55440) t AS d")
      .collect().head.getLong(0)
    assert(many == 120L)
    // FALLIBLE path through REAL compiler output: LLVM's zero-divisor guard
    // calls the crate's trap shim (immediate OOB store, never a fuel burn);
    // the error column carries the trap, the good row computes, and the
    // trapped instance was discarded without poisoning the pool
    val e = spark.sql(
      """SELECT wasm_rs_div(91, 7).value AS v1, wasm_rs_div(91, 7).error AS e1,
        |  wasm_rs_div(1, 0).value AS v0, wasm_rs_div(1, 0).error AS e0,
        |  wasm_rs_div(84, 2).value AS v2""".stripMargin).collect().head
    assert(e.getLong(0) == 13L && e.isNullAt(1))
    assert(e.isNullAt(2) && e.getString(3).contains("out of bounds"))
    assert(e.getLong(4) == 42L)
  }
}
