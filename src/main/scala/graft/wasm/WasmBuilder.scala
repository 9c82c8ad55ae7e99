package graft.wasm

import scala.collection.mutable.ArrayBuffer

/**
 * WASM binary emitter — the JVM analogue of the reference's build helper
 * (`arrow-udf-runtime/src/wasm/build.rs:36-161`, which shells out to cargo to
 * produce a `.wasm` cdylib). There is no wasm toolchain in a Spark executor
 * image, so graft builds spec-compliant module bytes directly: tests and
 * users author kernels with the [[Asm]] opcode DSL, and [[WasmUdfBuilder]]
 * attaches the reference's export conventions
 * (`arrowudf_<base64(signature)>` + `ARROWUDF_VERSION_3_0`,
 * `wasm/mod.rs:107-125`) so [[WasmUdf.load]] can discover functions exactly
 * like the reference runtime does.
 */
final class WasmBuilder {
  import WasmBuilder._

  private val types = ArrayBuffer.empty[(Seq[Byte], Seq[Byte])]
  private val funcs = ArrayBuffer.empty[(Int, Seq[Byte], Array[Byte])] // (type, locals, body)
  private val exports = ArrayBuffer.empty[(String, Int, Int)]          // (name, kind, idx)
  private val globals = ArrayBuffer.empty[(Byte, Boolean, Array[Byte])]
  private val data = ArrayBuffer.empty[(Int, Array[Byte])]            // offset -1 = passive
  private val imports = ArrayBuffer.empty[(String, String, Array[Byte])] // (module, name, descriptor bytes)
  private var importedGlobalCount = 0
  private val elems = ArrayBuffer.empty[(Int, Seq[Int])]               // (offset, func idxs; -1 = passive)
  private var tableMin: Option[Int] = None
  private var tableMaxOpt: Option[Int] = None
  private var startIdx: Option[Int] = None
  private var memLimits: Option[(Int, Option[Int])] = None

  /** Intern a function type; exposed so `call_indirect` bodies can name the
    * expected signature's type index. */
  def typeIdx(params: Seq[Byte], results: Seq[Byte]): Int = {
    val i = types.indexOf((params, results))
    if (i >= 0) i else { types += ((params, results)); types.length - 1 }
  }

  /** Declare an imported function (must precede every `func` call — imports
    * occupy the front of the function index space). Returns its index. */
  def importFunc(module: String, name: String, params: Seq[Byte], results: Seq[Byte]): Int = {
    require(funcs.isEmpty, "declare imports before local functions")
    imports += ((module, name, (Seq(0x00.toByte) ++ lebU(typeIdx(params, results))).toArray))
    imports.count(_._3(0) == 0x00) - 1
  }

  /** Import a linear memory (the `--import-memory` linking mode). */
  def importMemory(module: String, name: String, minPages: Int, maxPages: Option[Int] = None): Unit = {
    val desc = maxPages match {
      case Some(mx) => Seq(0x02.toByte, 0x01.toByte) ++ lebU(minPages) ++ lebU(mx)
      case None     => Seq(0x02.toByte, 0x00.toByte) ++ lebU(minPages)
    }
    imports += ((module, name, desc.toArray))
  }

  /** Import a funcref table. */
  def importTable(module: String, name: String, min: Int, max: Option[Int] = None): Unit = {
    val desc = max match {
      case Some(mx) => Seq(0x01.toByte, 0x70.toByte, 0x01.toByte) ++ lebU(min) ++ lebU(mx)
      case None     => Seq(0x01.toByte, 0x70.toByte, 0x00.toByte) ++ lebU(min)
    }
    imports += ((module, name, desc.toArray))
  }

  /** Import a global (must precede every local `global`, which shifts the
    * index space). Returns its global index. */
  def importGlobal(module: String, name: String, valType: Byte, mutable: Boolean): Int = {
    require(globals.isEmpty, "declare global imports before local globals")
    imports += ((module, name, Array(0x03.toByte, valType, (if (mutable) 1 else 0).toByte)))
    importedGlobalCount += 1
    importedGlobalCount - 1
  }

  /** Add a function; returns its index (for `call`). `body` must NOT include
    * the trailing `end` — it is appended here. */
  def func(params: Seq[Byte], results: Seq[Byte], locals: Seq[Byte], body: Array[Byte],
           exportAs: Option[String] = None): Int = {
    val idx = imports.count(_._3(0) == 0x00) + funcs.length
    funcs += ((typeIdx(params, results), locals, body))
    exportAs.foreach(n => exports += ((n, 0, idx)))
    idx
  }

  /** Declare the funcref table (for `call_indirect`); `max` bounds
    * `table.grow`. */
  def table(min: Int, max: Option[Int] = None): Unit = {
    tableMin = Some(min); tableMaxOpt = max
  }

  /** Declare the start function (runs once at instantiation). */
  def start(funcIdx: Int): Unit = startIdx = Some(funcIdx)

  /** Active element segment: seed `table[offset..]` with function indices. */
  def elem(offset: Int, funcIdxs: Seq[Int]): Unit = elems += ((offset, funcIdxs))

  /** Passive element segment (a `table.init` source). Returns the segment
    * index for `Asm.tableInit`/`Asm.elemDrop` — NOTE element indices count
    * active and passive segments together, in declaration order. */
  def elemPassive(funcIdxs: Seq[Int]): Int = {
    elems += ((-1, funcIdxs))
    elems.length - 1
  }

  /** Passive data segment (a `memory.init` source). Returns the segment
    * index for `Asm.memoryInit`/`Asm.dataDrop` — data indices count active
    * and passive segments together, in declaration order. */
  def dataPassive(bytes: Array[Byte]): Int = {
    data += ((-1, bytes))
    data.length - 1
  }

  def memory(minPages: Int, maxPages: Option[Int] = None, exportAs: Option[String] = None): Unit = {
    memLimits = Some((minPages, maxPages))
    exportAs.foreach(n => exports += ((n, 2, 0)))
  }

  def global(valType: Byte, mutable: Boolean, initExpr: Array[Byte], exportAs: Option[String] = None): Int = {
    globals += ((valType, mutable, initExpr))
    val idx = importedGlobalCount + globals.length - 1
    exportAs.foreach(n => exports += ((n, 3, idx)))
    idx
  }

  def dataSegment(offset: Int, bytes: Array[Byte]): Unit = data += ((offset, bytes))

  /** Emit the reference FFI allocator surface (`arrow-udf/src/ffi.rs:32-234`
    * exports `alloc`/`dealloc` so the host can place argument buffers in
    * guest memory): a bump allocator over a mutable heap-pointer global,
    * 8-byte aligned, growing memory on demand (trapping if the configured
    * cap refuses the grow), plus `reset_heap` — the dealloc analogue the
    * host calls between pooled-instance calls. Returns the `alloc` function
    * index so later-built kernels can allocate guest-side (e.g. blob
    * aggregate states and string results). */
  def addBumpAllocator(heapBase: Int): Int = {
    import Asm._
    val gHeap = global(i32, mutable = true, i32Const(heapBase))
    // alloc(size: i32) -> i32
    val allocIdx = func(Seq(i32), Seq(i32), Seq(i32), concat(
      globalGet(gHeap), localSet(1),                       // r = heap
      localGet(1),
      localGet(0), i32Const(7), i32Add, i32Const(-8), i32And,
      i32Add, globalSet(gHeap),                            // heap = r + align8(size)
      block(
        loop(concat(
          globalGet(gHeap), memorySize, i32Const(65536), i32Mul, i32LeS,
          brIf(1),                                         // fits → done
          i32Const(1), memoryGrow, i32Const(0), i32LtS,
          ifVoid(unreachable),                             // cap refused the grow
          br(0)))),
      localGet(1)),
      exportAs = Some("alloc"))
    // reset_heap() — frees everything the host placed since instantiation
    func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(heapBase), globalSet(gHeap)),
      exportAs = Some("reset_heap"))
    allocIdx
  }

  def exportFunc(name: String, idx: Int): Unit = exports += ((name, 0, idx))

  def build(): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    out ++= Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)

    def section(id: Int, body: ArrayBuffer[Byte]): Unit = {
      out += id.toByte
      out ++= lebU(body.length)
      out ++= body
    }

    if (types.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(types.length)
      types.foreach { case (p, r) =>
        b += 0x60
        b ++= lebU(p.length); b ++= p
        b ++= lebU(r.length); b ++= r
      }
      section(1, b)
    }
    if (imports.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(imports.length)
      imports.foreach { case (m, n, desc) =>
        val mb = m.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val nb = n.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        b ++= lebU(mb.length); b ++= mb
        b ++= lebU(nb.length); b ++= nb
        b ++= desc
      }
      section(2, b)
    }
    if (funcs.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(funcs.length)
      funcs.foreach { case (t, _, _) => b ++= lebU(t) }
      section(3, b)
    }
    tableMin.foreach { min =>
      val b = ArrayBuffer.empty[Byte] ++= lebU(1)
      b += 0x70
      tableMaxOpt match {
        case Some(mx) => b += 0x01; b ++= lebU(min); b ++= lebU(mx)
        case None     => b += 0x00; b ++= lebU(min)
      }
      section(4, b)
    }
    memLimits.foreach { case (min, max) =>
      val b = ArrayBuffer.empty[Byte] ++= lebU(1)
      max match {
        case Some(m) => b += 0x01; b ++= lebU(min); b ++= lebU(m)
        case None    => b += 0x00; b ++= lebU(min)
      }
      section(5, b)
    }
    if (globals.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(globals.length)
      globals.foreach { case (vt, mut, init) =>
        b += vt; b += (if (mut) 1 else 0).toByte
        b ++= init; b += 0x0B
      }
      section(6, b)
    }
    if (exports.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(exports.length)
      exports.foreach { case (name, kind, idx) =>
        val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        b ++= lebU(nb.length); b ++= nb
        b += kind.toByte; b ++= lebU(idx)
      }
      section(7, b)
    }
    startIdx.foreach { si =>
      val b = ArrayBuffer.empty[Byte] ++= lebU(si)
      section(8, b)
    }
    if (elems.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(elems.length)
      elems.foreach { case (off, idxs) =>
        if (off < 0) { // passive: flavor 1, elemkind 0x00
          b ++= lebU(1); b += 0x00
        } else {       // active on table 0: flavor 0, i32.const offset
          b ++= lebU(0)
          b += 0x41; b ++= lebS(off.toLong); b += 0x0B
        }
        b ++= lebU(idxs.length)
        idxs.foreach(i => b ++= lebU(i))
      }
      section(9, b)
    }
    if (data.exists(_._1 < 0)) { // datacount — required when memory.init is used
      val b = ArrayBuffer.empty[Byte] ++= lebU(data.length)
      section(12, b)
    }
    if (funcs.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(funcs.length)
      funcs.foreach { case (_, locals, body) =>
        val fb = ArrayBuffer.empty[Byte]
        // compress locals into (count, type) runs
        val runs = ArrayBuffer.empty[(Int, Byte)]
        locals.foreach { vt =>
          if (runs.nonEmpty && runs.last._2 == vt) runs(runs.length - 1) = (runs.last._1 + 1, vt)
          else runs += ((1, vt))
        }
        fb ++= lebU(runs.length)
        runs.foreach { case (n, vt) => fb ++= lebU(n); fb += vt }
        fb ++= body
        fb += 0x0B
        b ++= lebU(fb.length); b ++= fb
      }
      section(10, b)
    }
    if (data.nonEmpty) {
      val b = ArrayBuffer.empty[Byte] ++= lebU(data.length)
      data.foreach { case (off, bytes) =>
        if (off < 0) b ++= lebU(1) // passive
        else {
          b ++= lebU(0)
          b += 0x41; b ++= lebS(off.toLong); b += 0x0B
        }
        b ++= lebU(bytes.length); b ++= bytes
      }
      section(11, b)
    }
    out.toArray
  }
}

object WasmBuilder {
  def lebU(v0: Long): Seq[Byte] = {
    var v = v0
    val out = ArrayBuffer.empty[Byte]
    var continue = true
    while (continue) {
      val b = (v & 0x7F).toInt
      v >>>= 7
      if (v == 0) { out += b.toByte; continue = false }
      else out += (b | 0x80).toByte
    }
    out.toSeq
  }
  def lebU(v: Int): Seq[Byte] = lebU(v.toLong & 0xFFFFFFFFL)
  def lebS(v0: Long): Seq[Byte] = {
    var v = v0
    val out = ArrayBuffer.empty[Byte]
    var continue = true
    while (continue) {
      val b = (v & 0x7F).toInt
      v >>= 7
      if ((v == 0 && (b & 0x40) == 0) || (v == -1 && (b & 0x40) != 0)) {
        out += b.toByte; continue = false
      } else out += (b | 0x80).toByte
    }
    out.toSeq
  }
}

/** Opcode DSL: composable byte fragments for function bodies. Names mirror
  * the WAT mnemonics (`local.get` → `localGet`). */
object Asm {
  import WasmBuilder.{lebU, lebS}
  val i32: Byte = 0x7F
  val i64: Byte = 0x7E
  val f32: Byte = 0x7D
  val f64: Byte = 0x7C
  val funcref: Byte = 0x70

  type Code = Array[Byte]
  private def b(xs: Int*): Code = xs.map(_.toByte).toArray
  private implicit class Cat(val a: Code) extends AnyVal { def +(o: Code): Code = a ++ o }

  def unreachable: Code = b(0x00)
  /** block with no result */
  def block(body: Code): Code = b(0x02, 0x40) + body + b(0x0B)
  def block(resultType: Byte, body: Code): Code = b(0x02, resultType) + body + b(0x0B)
  def loop(body: Code): Code = b(0x03, 0x40) + body + b(0x0B)
  def ifElse(resultType: Byte, thn: Code, els: Code): Code =
    b(0x04, resultType) + thn + b(0x05) + els + b(0x0B)
  def ifVoid(thn: Code): Code = b(0x04, 0x40) + thn + b(0x0B)
  // multi-value (type-index) block types: params come off the stack into the
  // frame, results may number several — pass a WasmBuilder.typeIdx
  def blockOfType(typeIdx: Int, body: Code): Code = b(0x02) ++ lebS(typeIdx.toLong) ++ body ++ b(0x0B)
  def loopOfType(typeIdx: Int, body: Code): Code = b(0x03) ++ lebS(typeIdx.toLong) ++ body ++ b(0x0B)
  def ifOfType(typeIdx: Int, thn: Code, els: Code): Code =
    b(0x04) ++ lebS(typeIdx.toLong) ++ thn ++ b(0x05) ++ els ++ b(0x0B)
  def br(d: Int): Code = b(0x0C) ++ lebU(d)
  def brIf(d: Int): Code = b(0x0D) ++ lebU(d)
  def ret: Code = b(0x0F)
  def call(f: Int): Code = b(0x10) ++ lebU(f)
  def callIndirect(typeIdx: Int): Code = b(0x11) ++ lebU(typeIdx) ++ lebU(0)
  def memoryCopy: Code = b(0xFC) ++ lebU(10) ++ b(0x00, 0x00)
  def memoryFill: Code = b(0xFC) ++ lebU(11) ++ b(0x00)
  def memoryInit(dataIdx: Int): Code = b(0xFC) ++ lebU(8) ++ lebU(dataIdx) ++ b(0x00)
  def dataDrop(dataIdx: Int): Code = b(0xFC) ++ lebU(9) ++ lebU(dataIdx)
  def tableGet: Code = b(0x25) ++ lebU(0)
  def tableSet: Code = b(0x26) ++ lebU(0)
  def tableInit(elemIdx: Int): Code = b(0xFC) ++ lebU(12) ++ lebU(elemIdx) ++ lebU(0)
  def elemDrop(elemIdx: Int): Code = b(0xFC) ++ lebU(13) ++ lebU(elemIdx)
  def tableCopy: Code = b(0xFC) ++ lebU(14) ++ lebU(0) ++ lebU(0)
  def tableGrow: Code = b(0xFC) ++ lebU(15) ++ lebU(0)
  def tableSize: Code = b(0xFC) ++ lebU(16) ++ lebU(0)
  def tableFill: Code = b(0xFC) ++ lebU(17) ++ lebU(0)
  def refNullFunc: Code = b(0xD0, 0x70)
  def refIsNull: Code = b(0xD1)
  def refFunc(funcIdx: Int): Code = b(0xD2) ++ lebU(funcIdx)
  def i32TruncSatF64S: Code = b(0xFC) ++ lebU(2)
  def i64TruncSatF64S: Code = b(0xFC) ++ lebU(6)
  def drop: Code = b(0x1A)
  def select: Code = b(0x1B)
  def localGet(i: Int): Code = b(0x20) ++ lebU(i)
  def localSet(i: Int): Code = b(0x21) ++ lebU(i)
  def localTee(i: Int): Code = b(0x22) ++ lebU(i)
  def globalGet(i: Int): Code = b(0x23) ++ lebU(i)
  def globalSet(i: Int): Code = b(0x24) ++ lebU(i)
  def i32Load(offset: Int = 0): Code = b(0x28, 0x02) ++ lebU(offset)
  def i64Load(offset: Int = 0): Code = b(0x29, 0x03) ++ lebU(offset)
  def f64Load(offset: Int = 0): Code = b(0x2B, 0x03) ++ lebU(offset)
  def i32Load8U(offset: Int = 0): Code = b(0x2D, 0x00) ++ lebU(offset)
  def i32Store(offset: Int = 0): Code = b(0x36, 0x02) ++ lebU(offset)
  def i64Store(offset: Int = 0): Code = b(0x37, 0x03) ++ lebU(offset)
  def f64Store(offset: Int = 0): Code = b(0x39, 0x03) ++ lebU(offset)
  def memorySize: Code = b(0x3F, 0x00)
  def memoryGrow: Code = b(0x40, 0x00)
  def i32Const(v: Int): Code = b(0x41) ++ lebS(v.toLong)
  def i64Const(v: Long): Code = b(0x42) ++ lebS(v)
  def f32Const(v: Float): Code = {
    val bits = java.lang.Float.floatToRawIntBits(v)
    b(0x43, bits & 0xFF, (bits >> 8) & 0xFF, (bits >> 16) & 0xFF, (bits >> 24) & 0xFF)
  }
  def f64Const(v: Double): Code = {
    val bits = java.lang.Double.doubleToRawLongBits(v)
    b(0x44) ++ (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte)
  }
  // comparisons / arithmetic — raw mnemonic helpers
  def i32Eqz: Code = b(0x45)
  def i32Eq: Code = b(0x46)
  def i32LeS: Code = b(0x4C)
  def i32GeS: Code = b(0x4E)
  def i64Eqz: Code = b(0x50)
  def i64Eq: Code = b(0x51)
  def i64Ne: Code = b(0x52)
  def i64LtS: Code = b(0x53)
  def i64LtU: Code = b(0x54)
  def i64GtS: Code = b(0x55)
  def i64LeS: Code = b(0x57)
  def i64GeS: Code = b(0x59)
  def i32LtS: Code = b(0x48)
  def i32GtS: Code = b(0x4A)
  def i32Add: Code = b(0x6A)
  def i32Sub: Code = b(0x6B)
  def i32Mul: Code = b(0x6C)
  def i32DivS: Code = b(0x6D)
  def i32And: Code = b(0x71)
  def i64Clz: Code = b(0x79)
  def i64Ctz: Code = b(0x7A)
  def i64Popcnt: Code = b(0x7B)
  def i64Add: Code = b(0x7C)
  def i64Sub: Code = b(0x7D)
  def i64Mul: Code = b(0x7E)
  def i64DivS: Code = b(0x7F)
  def i64DivU: Code = b(0x80)
  def i64RemS: Code = b(0x81)
  def i64RemU: Code = b(0x82)
  def i64And: Code = b(0x83)
  def i64Or: Code = b(0x84)
  def i64Xor: Code = b(0x85)
  def i64Shl: Code = b(0x86)
  def i64ShrS: Code = b(0x87)
  def i64ShrU: Code = b(0x88)
  def f64Abs: Code = b(0x99)
  def f64Neg: Code = b(0x9A)
  def f64Sqrt: Code = b(0x9F)
  def f64Add: Code = b(0xA0)
  def f64Sub: Code = b(0xA1)
  def f64Mul: Code = b(0xA2)
  def f64Div: Code = b(0xA3)
  def f64Min: Code = b(0xA4)
  def f64Max: Code = b(0xA5)
  def i32WrapI64: Code = b(0xA7)
  def i64ExtendI32S: Code = b(0xAC)
  def i64ExtendI32U: Code = b(0xAD)
  def i64TruncF64S: Code = b(0xB0)
  def f64ConvertI64S: Code = b(0xB9)
  def f64ConvertI64U: Code = b(0xBA)

  def concat(parts: Code*): Code = parts.flatten.toArray

  // ---- SIMD (v128) ---------------------------------------------------------
  val v128: Byte = 0x7B
  private def simd(sub: Int): Code = b(0xFD) ++ lebU(sub)
  private def simdMem(sub: Int, align: Int, offset: Int): Code =
    simd(sub) ++ lebU(align) ++ lebU(offset)
  def v128Load(offset: Int = 0): Code = simdMem(0x00, 4, offset)
  def v128Load8x8S(offset: Int = 0): Code = simdMem(0x01, 3, offset)
  def v128Load8x8U(offset: Int = 0): Code = simdMem(0x02, 3, offset)
  def v128Load32Splat(offset: Int = 0): Code = simdMem(0x09, 2, offset)
  def v128Load64Splat(offset: Int = 0): Code = simdMem(0x0A, 3, offset)
  def v128Load32Zero(offset: Int = 0): Code = simdMem(0x5C, 2, offset)
  def v128Load64Zero(offset: Int = 0): Code = simdMem(0x5D, 3, offset)
  def v128Store(offset: Int = 0): Code = simdMem(0x0B, 4, offset)
  def v128Load32Lane(offset: Int, lane: Int): Code = simdMem(0x56, 2, offset) ++ b(lane)
  def v128Store64Lane(offset: Int, lane: Int): Code = simdMem(0x5B, 3, offset) ++ b(lane)
  def v128ConstBytes(bytes: Seq[Int]): Code = {
    require(bytes.length == 16, "v128.const takes 16 bytes")
    simd(0x0C) ++ bytes.map(_.toByte).toArray
  }
  def i8x16Shuffle(lanes: Seq[Int]): Code = {
    require(lanes.length == 16, "shuffle takes 16 lane selectors")
    simd(0x0D) ++ lanes.map(_.toByte).toArray
  }
  def i8x16Swizzle: Code = simd(0x0E)
  def i8x16Splat: Code = simd(0x0F)
  def i16x8Splat: Code = simd(0x10)
  def i32x4Splat: Code = simd(0x11)
  def i64x2Splat: Code = simd(0x12)
  def f32x4Splat: Code = simd(0x13)
  def f64x2Splat: Code = simd(0x14)
  def i8x16ExtractLaneS(l: Int): Code = simd(0x15) ++ b(l)
  def i8x16ExtractLaneU(l: Int): Code = simd(0x16) ++ b(l)
  def i8x16ReplaceLane(l: Int): Code = simd(0x17) ++ b(l)
  def i16x8ExtractLaneS(l: Int): Code = simd(0x18) ++ b(l)
  def i16x8ExtractLaneU(l: Int): Code = simd(0x19) ++ b(l)
  def i16x8ReplaceLane(l: Int): Code = simd(0x1A) ++ b(l)
  def i32x4ExtractLane(l: Int): Code = simd(0x1B) ++ b(l)
  def i32x4ReplaceLane(l: Int): Code = simd(0x1C) ++ b(l)
  def i64x2ExtractLane(l: Int): Code = simd(0x1D) ++ b(l)
  def i64x2ReplaceLane(l: Int): Code = simd(0x1E) ++ b(l)
  def f32x4ExtractLane(l: Int): Code = simd(0x1F) ++ b(l)
  def f32x4ReplaceLane(l: Int): Code = simd(0x20) ++ b(l)
  def f64x2ExtractLane(l: Int): Code = simd(0x21) ++ b(l)
  def f64x2ReplaceLane(l: Int): Code = simd(0x22) ++ b(l)
  def i8x16Eq: Code = simd(0x23)
  def i8x16LtS: Code = simd(0x25)
  def i8x16LtU: Code = simd(0x26)
  def i16x8Eq: Code = simd(0x2D)
  def i32x4Eq: Code = simd(0x37)
  def i32x4GtS: Code = simd(0x3B)
  def f32x4Eq: Code = simd(0x41)
  def f32x4Lt: Code = simd(0x43)
  def f64x2Lt: Code = simd(0x49)
  def v128Not: Code = simd(0x4D)
  def v128And: Code = simd(0x4E)
  def v128AndNot: Code = simd(0x4F)
  def v128Or: Code = simd(0x50)
  def v128Xor: Code = simd(0x51)
  def v128Bitselect: Code = simd(0x52)
  def v128AnyTrue: Code = simd(0x53)
  def f32x4DemoteF64x2Zero: Code = simd(0x5E)
  def f64x2PromoteLowF32x4: Code = simd(0x5F)
  def i8x16Abs: Code = simd(0x60)
  def i8x16Neg: Code = simd(0x61)
  def i8x16Popcnt: Code = simd(0x62)
  def i8x16AllTrue: Code = simd(0x63)
  def i8x16Bitmask: Code = simd(0x64)
  def i8x16NarrowI16x8S: Code = simd(0x65)
  def i8x16NarrowI16x8U: Code = simd(0x66)
  def i8x16Shl: Code = simd(0x6B)
  def i8x16Add: Code = simd(0x6E)
  def i8x16AddSatS: Code = simd(0x6F)
  def i8x16AddSatU: Code = simd(0x70)
  def i8x16Sub: Code = simd(0x71)
  def i8x16SubSatS: Code = simd(0x72)
  def i8x16SubSatU: Code = simd(0x73)
  def i8x16MinS: Code = simd(0x76)
  def i8x16MinU: Code = simd(0x77)
  def i8x16MaxS: Code = simd(0x78)
  def i8x16MaxU: Code = simd(0x79)
  def i8x16AvgrU: Code = simd(0x7B)
  def i16x8ExtAddPairwiseI8x16S: Code = simd(0x7C)
  def i32x4ExtAddPairwiseI16x8S: Code = simd(0x7E)
  def i16x8AllTrue: Code = simd(0x83)
  def i16x8Bitmask: Code = simd(0x84)
  def i16x8NarrowI32x4S: Code = simd(0x85)
  def i16x8ExtendLowI8x16S: Code = simd(0x87)
  def i16x8ExtendHighI8x16S: Code = simd(0x88)
  def i16x8ExtendLowI8x16U: Code = simd(0x89)
  def i16x8ExtendHighI8x16U: Code = simd(0x8A)
  def i16x8Shl: Code = simd(0x8B)
  def i16x8ShrS: Code = simd(0x8C)
  def i16x8Add: Code = simd(0x8E)
  def i16x8AddSatS: Code = simd(0x8F)
  def i16x8Sub: Code = simd(0x91)
  def i16x8Mul: Code = simd(0x95)
  def i16x8MinS: Code = simd(0x96)
  def i16x8MaxS: Code = simd(0x98)
  def i16x8ExtMulLowI8x16S: Code = simd(0x9C)
  def i32x4Abs: Code = simd(0xA0)
  def i32x4Neg: Code = simd(0xA1)
  def i32x4AllTrue: Code = simd(0xA3)
  def i32x4Bitmask: Code = simd(0xA4)
  def i32x4ExtendLowI16x8S: Code = simd(0xA7)
  def i32x4Shl: Code = simd(0xAB)
  def i32x4ShrS: Code = simd(0xAC)
  def i32x4ShrU: Code = simd(0xAD)
  def i32x4Add: Code = simd(0xAE)
  def i32x4Sub: Code = simd(0xB1)
  def i32x4Mul: Code = simd(0xB5)
  def i32x4MinS: Code = simd(0xB6)
  def i32x4MaxS: Code = simd(0xB8)
  def i32x4DotI16x8S: Code = simd(0xBA)
  def i32x4ExtMulLowI16x8S: Code = simd(0xBC)
  def i64x2Abs: Code = simd(0xC0)
  def i64x2Neg: Code = simd(0xC1)
  def i64x2AllTrue: Code = simd(0xC3)
  def i64x2Bitmask: Code = simd(0xC4)
  def i64x2ExtendLowI32x4S: Code = simd(0xC7)
  def i64x2Shl: Code = simd(0xCB)
  def i64x2Add: Code = simd(0xCE)
  def i64x2Sub: Code = simd(0xD1)
  def i64x2Mul: Code = simd(0xD5)
  def i64x2Eq: Code = simd(0xD6)
  def i64x2ExtMulLowI32x4S: Code = simd(0xDC)
  def f32x4Abs: Code = simd(0xE0)
  def f32x4Neg: Code = simd(0xE1)
  def f32x4Sqrt: Code = simd(0xE3)
  def f32x4Add: Code = simd(0xE4)
  def f32x4Sub: Code = simd(0xE5)
  def f32x4Mul: Code = simd(0xE6)
  def f32x4Div: Code = simd(0xE7)
  def f32x4Min: Code = simd(0xE8)
  def f32x4Max: Code = simd(0xE9)
  def f32x4PMin: Code = simd(0xEA)
  def f64x2Abs: Code = simd(0xEC)
  def f64x2Neg: Code = simd(0xED)
  def f64x2Sqrt: Code = simd(0xEF)
  def f64x2Add: Code = simd(0xF0)
  def f64x2Sub: Code = simd(0xF1)
  def f64x2Mul: Code = simd(0xF2)
  def f64x2Div: Code = simd(0xF3)
  def f64x2Min: Code = simd(0xF4)
  def f64x2Max: Code = simd(0xF5)
  def i32x4TruncSatF32x4S: Code = simd(0xF8)
  def i32x4TruncSatF32x4U: Code = simd(0xF9)
  def f32x4ConvertI32x4S: Code = simd(0xFA)
  def f32x4ConvertI32x4U: Code = simd(0xFB)
  def i32x4TruncSatF64x2SZero: Code = simd(0xFC)
  def f64x2ConvertLowI32x4S: Code = simd(0xFE)
  def i32Popcnt: Code = b(0x69)
}
