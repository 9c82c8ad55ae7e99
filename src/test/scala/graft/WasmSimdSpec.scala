package graft

import graft.wasm._
import graft.wasm.Asm._
import org.scalatest.funsuite.AnyFunSuite

/** SIMD (v128) tier: lane arithmetic, shuffles, saturation, conversions,
  * memory ops, and — critically — the shadow-stack plumbing that lets v128
  * values flow through width-polymorphic instructions (select, block
  * results, locals, globals, internal calls) without type tracking. */
class WasmSimdSpec extends AnyFunSuite {

  private def run(body: Array[Byte], locals: Seq[Byte] = Seq.empty,
      withMem: Boolean = false, results: Seq[Byte] = Seq(i64)): Long = {
    val b = new WasmBuilder
    if (withMem) b.memory(1, Some(4))
    b.func(Seq.empty, results, locals, body, exportAs = Some("t"))
    new WasmInstance(WasmModule.decode(b.build()), WasmConfig()).invoke("t", Array.empty)
  }

  private def i32x4Bytes(a: Int, b: Int, c: Int, d: Int): Seq[Int] =
    Seq(a, b, c, d).flatMap(v => Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF))
  private def i16x8Bytes(xs: Int*): Seq[Int] = {
    require(xs.length == 8)
    xs.flatMap(v => Seq(v & 0xFF, (v >> 8) & 0xFF))
  }
  private def f32x4Bytes(a: Float, b: Float, c: Float, d: Float): Seq[Int] =
    Seq(a, b, c, d).flatMap { v =>
      val bits = java.lang.Float.floatToRawIntBits(v)
      Seq(bits & 0xFF, (bits >> 8) & 0xFF, (bits >> 16) & 0xFF, (bits >> 24) & 0xFF)
    }
  private def f64x2Bytes(a: Double, b: Double): Seq[Int] =
    Seq(a, b).flatMap { v =>
      val bits = java.lang.Double.doubleToRawLongBits(v)
      (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toInt)
    }

  test("i32x4 add/mul + extract_lane") {
    val v = run(concat(
      v128ConstBytes(i32x4Bytes(1, 2, 3, 4)),
      v128ConstBytes(i32x4Bytes(10, 20, 30, 40)),
      i32x4Add, i32x4ExtractLane(2), i64ExtendI32S))
    assert(v == 33L)
    val m = run(concat(
      v128ConstBytes(i32x4Bytes(3, -5, 7, 100000)),
      v128ConstBytes(i32x4Bytes(4, 6, -2, 100000)),
      i32x4Mul, i32x4ExtractLane(1), i64ExtendI32S))
    assert(m == -30L)
  }

  test("splat round-trips through every lane shape") {
    assert(run(concat(i32Const(-7), i8x16Splat, i8x16ExtractLaneS(15), i64ExtendI32S)) == -7L)
    assert(run(concat(i32Const(0xABCD), i16x8Splat, i16x8ExtractLaneU(3), i64ExtendI32S)) == 0xABCDL)
    assert(run(concat(i32Const(123456), i32x4Splat, i32x4ExtractLane(3), i64ExtendI32S)) == 123456L)
    assert(run(concat(i64Const(0x123456789ABCDEFL), i64x2Splat, i64x2ExtractLane(1))) == 0x123456789ABCDEFL)
  }

  test("i8x16.shuffle picks lanes across both operands; swizzle zero-fills") {
    // a = bytes 0..15, b = bytes 100..115; take a[0], b[0], a[15], b[15]...
    val v = run(concat(
      v128ConstBytes(0 until 16),
      v128ConstBytes(100 until 116),
      i8x16Shuffle(Seq(0, 16, 15, 31) ++ Seq.fill(12)(0)),
      i32x4ExtractLane(0), i64ExtendI32U))
    // lanes: 0, 100, 15, 115 -> little-endian i32
    assert(v == ((0L) | (100L << 8) | (15L << 16) | (115L << 24)))
    val sw = run(concat(
      v128ConstBytes(0 until 16),
      v128ConstBytes(Seq(1, 15, 200, 3) ++ Seq.fill(12)(0)), // 200 -> out of range -> 0
      i8x16Swizzle, i32x4ExtractLane(0), i64ExtendI32U))
    assert(sw == ((1L) | (15L << 8) | (0L << 16) | (3L << 24)))
  }

  test("i8x16 saturating add/sub clamp at the lane bounds") {
    val v = run(concat(
      v128ConstBytes(Seq(120, 0x90, 200, 10) ++ Seq.fill(12)(0)), // 0x90 = -112 signed
      v128ConstBytes(Seq(100, 0x90, 100, 5) ++ Seq.fill(12)(0)),
      i8x16AddSatS, i32x4ExtractLane(0), i64ExtendI32U))
    // 120+100 sat-> 127; -112 + -112 sat-> -128 (0x80); -56 + 100 = 44; 15
    assert((v & 0xFF) == 127L)
    assert(((v >> 8) & 0xFF) == 0x80L)
    assert(((v >> 16) & 0xFF) == 44L)
    assert(((v >> 24) & 0xFF) == 15L)
    val u = run(concat(
      v128ConstBytes(Seq(200, 10) ++ Seq.fill(14)(0)),
      v128ConstBytes(Seq(100, 20) ++ Seq.fill(14)(0)),
      i8x16AddSatU, i16x8ExtractLaneU(0), i64ExtendI32U))
    assert((u & 0xFF) == 255L && ((u >> 8) & 0xFF) == 30L)
  }

  test("i32x4.dot_i16x8_s multiplies pairs and sums") {
    val v = run(concat(
      v128ConstBytes(i16x8Bytes(1, 2, 3, 4, -5, 6, 0, 0)),
      v128ConstBytes(i16x8Bytes(10, 20, 30, 40, 50, -60, 0, 0)),
      i32x4DotI16x8S, i32x4ExtractLane(0), i64ExtendI32S))
    assert(v == (1 * 10 + 2 * 20).toLong)
    val v2 = run(concat(
      v128ConstBytes(i16x8Bytes(1, 2, 3, 4, -5, 6, 0, 0)),
      v128ConstBytes(i16x8Bytes(10, 20, 30, 40, 50, -60, 0, 0)),
      i32x4DotI16x8S, i32x4ExtractLane(2), i64ExtendI32S))
    assert(v2 == (-5 * 50 + 6 * -60).toLong)
  }

  test("f32x4 arithmetic, compare masks, and bitmask") {
    val v = run(concat(
      v128ConstBytes(f32x4Bytes(1.5f, -2f, 3f, 0.25f)),
      v128ConstBytes(f32x4Bytes(2f, 2f, 3f, 4f)),
      f32x4Mul, f32x4ExtractLane(0), i64ExtendI32U))
    assert(java.lang.Float.intBitsToFloat(v.toInt) == 3f)
    // lt mask: (1.5 < 2, -2 < 2, 3 < 3, 0.25 < 4) = (T, T, F, T) -> bitmask 0b1011
    val m = run(concat(
      v128ConstBytes(f32x4Bytes(1.5f, -2f, 3f, 0.25f)),
      v128ConstBytes(f32x4Bytes(2f, 2f, 3f, 4f)),
      f32x4Lt, i32x4Bitmask, i64ExtendI32U))
    assert(m == 0xBL)
  }

  test("f64x2 sqrt/div and promote/demote") {
    val v = run(concat(
      v128ConstBytes(f64x2Bytes(16.0, 2.25)),
      f64x2Sqrt, f64x2ExtractLane(1)))
    assert(java.lang.Double.longBitsToDouble(v) == 1.5)
    val p = run(concat(
      v128ConstBytes(f32x4Bytes(3.5f, -7f, 99f, 99f)),
      f64x2PromoteLowF32x4, f64x2ExtractLane(1)))
    assert(java.lang.Double.longBitsToDouble(p) == -7.0)
  }

  test("trunc_sat and convert lane conversions") {
    val v = run(concat(
      v128ConstBytes(f32x4Bytes(1.9f, -2.9f, Float.NaN, 3e10f)),
      i32x4TruncSatF32x4S, i32x4ExtractLane(1), i64ExtendI32S))
    assert(v == -2L)
    val n = run(concat(
      v128ConstBytes(f32x4Bytes(1.9f, -2.9f, Float.NaN, 3e10f)),
      i32x4TruncSatF32x4S, i32x4ExtractLane(2), i64ExtendI32S))
    assert(n == 0L)
    val s = run(concat(
      v128ConstBytes(f32x4Bytes(1.9f, -2.9f, Float.NaN, 3e10f)),
      i32x4TruncSatF32x4S, i32x4ExtractLane(3), i64ExtendI32S))
    assert(s == Int.MaxValue.toLong)
    val c = run(concat(
      v128ConstBytes(i32x4Bytes(-3, 0, 0, 0)),
      f32x4ConvertI32x4S, f32x4ExtractLane(0), i64ExtendI32U))
    assert(java.lang.Float.intBitsToFloat(c.toInt) == -3f)
  }

  test("narrow saturates; extend widens with sign") {
    val v = run(concat(
      v128ConstBytes(i16x8Bytes(300, -300, 100, -100, 0, 1, 2, 3)),
      v128ConstBytes(i16x8Bytes(0, 0, 0, 0, 0, 0, 0, 0)),
      i8x16NarrowI16x8S, i32x4ExtractLane(0), i64ExtendI32U))
    assert((v & 0xFF) == 127L)          // 300 sat-> 127
    assert(((v >> 8) & 0xFF) == 0x80L)  // -300 sat-> -128
    assert(((v >> 16) & 0xFF) == 100L)
    assert(((v >> 24) & 0xFF) == 156L)  // -100 as unsigned byte
    val e = run(concat(
      v128ConstBytes(Seq(0xFE, 5) ++ Seq.fill(14)(0)), // -2, 5
      i16x8ExtendLowI8x16S, i16x8ExtractLaneS(0), i64ExtendI32S))
    assert(e == -2L)
  }

  test("shifts: shl / shr_s / shr_u per lane, count mod lane width") {
    val v = run(concat(
      v128ConstBytes(i32x4Bytes(-8, 16, 1, 0)),
      i32Const(2), i32x4ShrS, i32x4ExtractLane(0), i64ExtendI32S))
    assert(v == -2L)
    val u = run(concat(
      v128ConstBytes(i32x4Bytes(-8, 16, 1, 0)),
      i32Const(34), i32x4ShrU, i32x4ExtractLane(1), i64ExtendI32S)) // 34 mod 32 = 2
    assert(u == 4L)
    val s = run(concat(
      v128ConstBytes(i32x4Bytes(3, 0, 0, 0)),
      i32Const(3), i32x4Shl, i32x4ExtractLane(0), i64ExtendI32S))
    assert(s == 24L)
  }

  test("bitmask / any_true / all_true") {
    assert(run(concat(
      v128ConstBytes(Seq(0x80, 1, 0x80, 0) ++ Seq.fill(12)(0)),
      i8x16Bitmask, i64ExtendI32U)) == 5L)
    assert(run(concat(
      v128ConstBytes(Seq.fill(16)(0)), v128AnyTrue, i64ExtendI32U)) == 0L)
    assert(run(concat(
      v128ConstBytes(Seq(0, 0, 1, 0) ++ Seq.fill(12)(0)), v128AnyTrue, i64ExtendI32U)) == 1L)
    assert(run(concat(
      v128ConstBytes(Seq.fill(16)(7)), i8x16AllTrue, i64ExtendI32U)) == 1L)
    assert(run(concat(
      v128ConstBytes(Seq(7, 0) ++ Seq.fill(14)(7)), i8x16AllTrue, i64ExtendI32U)) == 0L)
  }

  test("v128 flows through select, block results, if/else, and locals (shadow stack)") {
    // untyped select between two v128s — both arms' HIGH halves must survive
    val sel = run(concat(
      v128ConstBytes(i32x4Bytes(1, 2, 3, 4)),
      v128ConstBytes(i32x4Bytes(9, 8, 7, 6)),
      i32Const(0), select,                 // picks the second
      i32x4ExtractLane(3), i64ExtendI32S))
    assert(sel == 6L)
    // block with a v128 result type
    val blk = run(concat(
      block(v128, v128ConstBytes(i32x4Bytes(5, 6, 7, 8))),
      i32x4ExtractLane(2), i64ExtendI32S))
    assert(blk == 7L)
    // if/else producing v128
    val ife = run(concat(
      i32Const(1),
      ifElse(v128,
        v128ConstBytes(i32x4Bytes(11, 0, 0, 44)),
        v128ConstBytes(i32x4Bytes(99, 0, 0, 99))),
      i32x4ExtractLane(3), i64ExtendI32S))
    assert(ife == 44L)
    // v128 local: set, tee, get — high half must round-trip
    val loc = run(concat(
      v128ConstBytes(i32x4Bytes(0, 0, 0, 123)),
      localSet(0),
      v128ConstBytes(i32x4Bytes(1, 1, 1, 1)), drop,
      localGet(0), i32x4ExtractLane(3), i64ExtendI32S),
      locals = Seq(v128))
    assert(loc == 123L)
  }

  test("v128 crosses internal calls; host boundary rejects it") {
    val b = new WasmBuilder
    // internal helper: (v128) -> i32, extracts lane 3
    val helper = b.func(Seq(v128), Seq(i32), Seq.empty,
      concat(localGet(0), i32x4ExtractLane(3)))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      v128ConstBytes(i32x4Bytes(0, 0, 0, 777)), call(helper), i64ExtendI32S),
      exportAs = Some("t"))
    b.exportFunc("leak", helper) // v128 param at the host boundary
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("t", Array.empty) == 777L)
    val t = intercept[WasmTrap] { inst.invoke("leak", Array(0L)) }
    assert(t.getMessage.contains("v128 is internal-only"))
  }

  test("v128 global init, get and set") {
    val b = new WasmBuilder
    b.global(v128, mutable = true, v128ConstBytes(i32x4Bytes(0, 0, 42, 0)))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      globalGet(0), i32x4ExtractLane(2), i64ExtendI32S), exportAs = Some("g"))
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      v128ConstBytes(i32x4Bytes(0, 0, 0, -9)), globalSet(0),
      globalGet(0), i32x4ExtractLane(3), i64ExtendI32S), exportAs = Some("s"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    assert(inst.invoke("g", Array.empty) == 42L)
    assert(inst.invoke("s", Array.empty) == -9L)
  }

  test("v128 memory ops: store/load, load_splat, load8x8_s, store64_lane") {
    val rt = run(concat(
      i32Const(8), v128ConstBytes(i32x4Bytes(-1, 2, -3, 4)), v128Store(),
      i32Const(8), v128Load(), i32x4ExtractLane(2), i64ExtendI32S),
      withMem = true)
    assert(rt == -3L)
    val sp = run(concat(
      i32Const(0), i32Const(0x01020304), i32Store(),
      i32Const(0), v128Load32Splat(), i32x4ExtractLane(3), i64ExtendI32S),
      withMem = true)
    assert(sp == 0x01020304L)
    // sign-extending widening load: byte 0xFF -> i16 lane -1
    val wl = run(concat(
      i32Const(0), i32Const(0xFF), i32Store(),   // mem[0] = 0xFF
      i32Const(0), v128Load8x8S(), i16x8ExtractLaneS(0), i64ExtendI32S),
      withMem = true)
    assert(wl == -1L)
    // store64_lane writes one selected lane to memory
    val sl = run(concat(
      i32Const(32), v128ConstBytes(i32x4Bytes(1, 2, 3, 4)), v128Store64Lane(0, 1),
      i32Const(32), i64Load()),
      withMem = true)
    assert(sl == ((3L & 0xFFFFFFFFL) | (4L << 32)))
  }

  test("hostile: unassigned SIMD opcode and bad lane index trap, contained") {
    val b = new WasmBuilder
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      v128ConstBytes(Seq.fill(16)(0)),
      Array[Byte](0xFD.toByte, 0x9A.toByte, 0x01.toByte), // unassigned subopcode (LEB 0x9A)
      i64x2ExtractLane(0)), exportAs = Some("bad"))
    val inst = new WasmInstance(WasmModule.decode(b.build()), WasmConfig())
    val t = intercept[WasmTrap] { inst.invoke("bad", Array.empty) }
    assert(t.getMessage.contains("SIMD"))
    // decode-time rejection of an out-of-range shuffle selector
    val b2 = new WasmBuilder
    b2.func(Seq.empty, Seq(i64), Seq.empty, concat(
      v128ConstBytes(Seq.fill(16)(0)), v128ConstBytes(Seq.fill(16)(0)),
      i8x16Shuffle(Seq(40) ++ Seq.fill(15)(0)),
      i64x2ExtractLane(0)), exportAs = Some("bad2"))
    val t2 = intercept[WasmTrap] { WasmModule.decode(b2.build()) }
    assert(t2.getMessage.contains("shuffle"))
  }

  test("compiled-shape conformance: one module composing every cdylib feature") {
    // The instruction mix an LLVM-compiled `+simd128` cdylib actually uses,
    // in one module: IMPORTED memory (--import-memory linking), a ctor START
    // function seeding the funcref table from a passive element segment
    // (__wasm_call_ctors shape), call_indirect dispatch, bulk memory
    // (memory.fill), a SIMD inner loop with a scalar tail, the bump-alloc
    // FFI surface, and a mutable stack-pointer-style global.
    val b = new WasmBuilder
    b.importMemory("env", "memory", 1, Some(4))
    val spGlobal = b.global(i32, mutable = true, i32Const(1024)) // stack pointer shape
    val allocIdx = b.addBumpAllocator(heapBase = 4096)
    // summing kernel: i64x2 lane sum of 16-byte blocks + scalar tail
    val sumTy = b.typeIdx(Seq(i32, i32), Seq(i64))
    val simdSum = b.func(Seq(i32, i32), Seq(i64), Seq(i32, i64, v128), concat(
      v128ConstBytes(Seq.fill(16)(0)), localSet(4),
      block(
        loop(concat(
          localGet(2), i32Const(8), i32Add, localGet(1), i32GtS, brIf(1),
          localGet(4),
          localGet(0), localGet(2), i32Add, v128Load8x8U(), // 8 bytes -> i16x8
          i32x4ExtAddPairwiseI16x8S,                        // -> i32x4 pair sums
          i32x4Add, localSet(4),                            // acc += (4 partials)
          localGet(2), i32Const(8), i32Add, localSet(2),
          br(0)))),
      // fold the four i32 partial lanes + scalar-tail the rest
      localGet(4), i32x4ExtractLane(0), i64ExtendI32S,
      localGet(4), i32x4ExtractLane(1), i64ExtendI32S, i64Add,
      localGet(4), i32x4ExtractLane(2), i64ExtendI32S, i64Add,
      localGet(4), i32x4ExtractLane(3), i64ExtendI32S, i64Add, localSet(3),
      block(
        loop(concat(
          localGet(2), localGet(1), i32GeS, brIf(1),
          localGet(0), localGet(2), i32Add, i32Load8U(), i64ExtendI32U,
          localGet(3), i64Add, localSet(3),
          localGet(2), i32Const(1), i32Add, localSet(2),
          br(0)))),
      localGet(3)))
    // a second kernel dispatched through the table: constant 0
    val zeroFn = b.func(Seq(i32, i32), Seq(i64), Seq.empty, i64Const(0L))
    b.table(2, Some(2))
    val seg = b.elemPassive(Seq(simdSum, zeroFn))
    val ctor = b.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(0), i32Const(0), i32Const(2), tableInit(seg)))
    b.start(ctor)
    // exported entry: memory.fill a buffer with a byte value, then dispatch
    // the summing kernel through call_indirect (selector param)
    b.func(Seq(i32, i32, i32), Seq(i64), Seq(i32), concat(
      // ptr = alloc(len)
      localGet(1), call(allocIdx), localSet(3),
      // memory.fill(ptr, fillByte, len)
      localGet(3), localGet(2), localGet(1), memoryFill,
      // call_indirect sum(ptr, len) via table slot `sel`
      localGet(3), localGet(1),
      localGet(0),
      callIndirect(sumTy)), exportAs = Some("entry"))
    val mod = WasmModule.decode(b.build())
    assert(mod.hasV128)
    val inst = new WasmInstance(mod, WasmConfig())
    // slot 0 = SIMD sum: len bytes of value v sum to len*v (crosses the
    // 8-byte stride: 37 = 4 SIMD blocks + 5-byte tail)
    assert(inst.invoke("entry", Array(0L, 37L, 11L)) == 37L * 11L)
    assert(inst.invoke("entry", Array(0L, 16L, 255L)) == 16L * 255L)
    assert(inst.invoke("entry", Array(0L, 5L, 7L)) == 35L)   // pure tail
    assert(inst.invoke("entry", Array(1L, 37L, 11L)) == 0L)  // dispatched to zeroFn
    // the stack-pointer global is untouched by any of it
    assert(inst.invoke("entry", Array(0L, 0L, 0L)) == 0L)
    val _ = spGlobal
  }

  test("count_simd kernel matches the scalar count_byte across lengths") {
    val spark = TestSpark.spark
    // lengths 0..40 cross the 16-byte SIMD stride and exercise the tail
    val rows = spark.sql(
      """SELECT n, wasm_count_simd(s, 97) AS simd, wasm_count_byte(s, 97) AS scalar
        |FROM (SELECT id AS n, repeat('abca', CAST(id AS INT)) AS s
        |      FROM range(0, 11))""".stripMargin).collect()
    assert(rows.length == 11)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch at n=${r.getLong(0)}")
      assert(r.getLong(1) == 2 * r.getLong(0)) // 'abca' has two 'a's
    }
  }
}
