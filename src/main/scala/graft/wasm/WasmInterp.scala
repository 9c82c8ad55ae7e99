package graft.wasm

/** Per-call resource limits (reference `wasm/mod.rs:54-58` `Config`; fuel is
  * the JS timeout analogue, `javascript/mod.rs:229-260`). */
final case class WasmConfig(
    fuel: Long = 10_000_000L,        // interpreter steps per exported call
    memoryLimitBytes: Long = 64L << 20, // hard cap regardless of module max
    maxCallDepth: Int = 512) extends Serializable

/**
 * One instantiated module: its own linear memory + mutable globals.
 * NOT thread-safe — callers pool instances and borrow one per call
 * (reference pool semantics `wasm/mod.rs:263-278`: pop-or-create, return
 * only on success; a trapped instance is discarded).
 *
 * Value representation: a uniform `Long` slot stack; f32/f64 travel as raw
 * IEEE bits (`floatToRawIntBits`/`doubleToRawLongBits`), i32 is kept
 * sign-extended. This is the standard untyped-interpreter design — types are
 * a property of the instruction, not the slot.
 */
final class WasmInstance(val module: WasmModule, val config: WasmConfig) {
  import Insn._
  import WasmModule.PageSize

  private val hardMaxPages: Int =
    math.min(module.memMax.toLong, config.memoryLimitBytes / PageSize).toInt

  private var memPages: Int = if (module.memMin < 0) 0 else module.memMin
  private var mem: Array[Byte] =
    if (module.memMin <= 0) new Array[Byte](math.max(0, memPages) * PageSize)
    else {
      if (module.memMin > hardMaxPages)
        throw new WasmTrap(s"module min memory ${module.memMin} pages exceeds limit $hardMaxPages")
      new Array[Byte](module.memMin * PageSize)
    }

  private val globals: Array[Long] = module.globals.map { g =>
    g.init match {
      case Array(I32Const(v)) => v.toLong
      case Array(I64Const(v)) => v
      case Array(F32Const(v)) => java.lang.Float.floatToRawIntBits(v).toLong & 0xFFFFFFFFL
      case Array(F64Const(v)) => java.lang.Double.doubleToRawLongBits(v)
      case Array(RefNull)     => -1L
      case Array(RefFunc(i))  => i.toLong
      case Array(V128Const(lo, _)) => lo // high bits in vglobals
      case _ => throw new WasmTrap("global init must be a single const")
    }
  }
  /** Shadow of `globals` carrying the HIGH 64 bits of v128 globals (the
    * same blind-copy design as the shadow stack below). */
  private val vglobals: Array[Long] = module.globals.map { g =>
    g.init match {
      case Array(V128Const(_, hi)) => hi
      case _ => 0L
    }
  }

  // active data segments are copied in at instantiation; passive ones wait
  // for memory.init
  module.data.foreach { seg =>
    if (!seg.passive) {
      if (seg.offset < 0 || seg.offset.toLong + seg.bytes.length > mem.length)
        throw new WasmTrap("data segment out of bounds")
      System.arraycopy(seg.bytes, 0, mem, seg.offset, seg.bytes.length)
    }
  }

  /** Funcref table is PER-INSTANCE state (table.set/grow/init mutate it);
    * the module's resolved active-segment layout is the starting point. */
  private var table: Array[Int] =
    if (module.tableSize == 0) Array.emptyIntArray else module.table.clone()

  // spec: active (and declared) element/data segments behave as dropped once
  // instantiation completes; only passive ones are table.init/memory.init
  // sources
  private val elemDropped: Array[Boolean] = module.elems.map(_.kind != 1)
  private val dataDropped: Array[Boolean] = module.data.map(!_.passive)

  // ---- per-call state ------------------------------------------------------
  private var fuel: Long = 0L
  private var depth: Int = 0
  private var nesting: Int = 0 // block-structure activations (separate budget)
  private var stack = new Array[Long](256)
  private var sp = 0
  // v128 SHADOW stack: slot i of a v128 value holds its LOW 64 bits in
  // stack(i) and its HIGH 64 bits in vstack(i). Scalar slots leave their
  // shadow as garbage — it is only ever read along well-typed v128 dataflow.
  // Every slot-MOVING operation (select, truncate, locals, globals, call
  // frames) copies the shadow blindly (one extra long store), so all
  // width-polymorphic instructions work for v128 without type tracking.
  private var vstack = new Array[Long](256)
  // scratch shadow-locals for modules with no v128 anywhere (never read);
  // SIMD modules allocate real per-call arrays (recursion safety)
  private var scratchVLocals = new Array[Long](64)
  // SIMD pop registers (avoids a tuple allocation per vector operand)
  private var xLo = 0L
  private var xHi = 0L

  // the start function (LLVM ctor shape) runs once at instantiation — after
  // every field above initializes — under the SAME fuel/depth containment as
  // any call: a hostile ctor traps here and the instance is never handed out
  module.startIdx.foreach(si => invokeBound(new Bound(si, 0, false), Array.empty))

  // ---- pristine snapshot (restore-on-trap) ---------------------------------
  // Freshly-instantiated state, captured AFTER active segments copy in and
  // the start function runs: linear memory + page count, mutable globals
  // (both shadow halves), the funcref table, and the segment-dropped flags.
  // A trapped call leaves any of these possibly corrupt; restoring from the
  // snapshot is a few System.arraycopys — orders of magnitude cheaper than
  // the re-decode + re-instantiate the pool otherwise pays per trapped row
  // (a planted-error gate at sf0.1 is ~86K traps: per-trap rebuild made it
  // a 46 s query; restore makes a trap cost ~a memcpy of the module's BSS).
  // The WASI shims above are stateless and the interpreter keeps no other
  // cross-call state, so restored ≡ fresh (WasmSpec proves it with a dirty
  // mutable-global + dirty-heap + dropped-segment probe).
  private val snapMem: Array[Byte] = mem.clone()
  private val snapPages: Int = memPages
  private val snapGlobals: Array[Long] = globals.clone()
  private val snapVGlobals: Array[Long] = vglobals.clone()
  private val snapTable: Array[Int] = table.clone()
  private val snapElemDropped: Array[Boolean] = elemDropped.clone()
  private val snapDataDropped: Array[Boolean] = dataDropped.clone()

  /** Restores freshly-instantiated state after a trap so the pool can reuse
    * this instance instead of dropping it and re-instantiating the module. */
  def restorePristine(): Unit = {
    if (mem.length == snapMem.length)
      System.arraycopy(snapMem, 0, mem, 0, snapMem.length)
    else mem = snapMem.clone() // memory.grow happened: shed the growth
    memPages = snapPages
    System.arraycopy(snapGlobals, 0, globals, 0, globals.length)
    System.arraycopy(snapVGlobals, 0, vglobals, 0, vglobals.length)
    if (table.length == snapTable.length)
      System.arraycopy(snapTable, 0, table, 0, table.length)
    else table = snapTable.clone() // table.grow happened
    System.arraycopy(snapElemDropped, 0, elemDropped, 0, elemDropped.length)
    System.arraycopy(snapDataDropped, 0, dataDropped, 0, dataDropped.length)
    sp = 0; depth = 0; nesting = 0 // trap unwound mid-call: clear the frame
  }

  private def push(v: Long): Unit = {
    if (sp == stack.length) {
      stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      vstack = java.util.Arrays.copyOf(vstack, vstack.length * 2)
    }
    stack(sp) = v; sp += 1
  }
  private def pop(): Long = {
    // malformed (unvalidated) modules can underflow the operand stack; trap
    // instead of surfacing an ArrayIndexOutOfBoundsException
    if (sp == 0) throw new WasmTrap("operand stack underflow (malformed module)")
    sp -= 1; stack(sp)
  }
  private def pushV(lo: Long, hi: Long): Unit = {
    if (sp == stack.length) {
      stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      vstack = java.util.Arrays.copyOf(vstack, vstack.length * 2)
    }
    stack(sp) = lo; vstack(sp) = hi; sp += 1
  }
  /** Pops a v128 into (xLo, xHi). */
  private def popV(): Unit = {
    if (sp == 0) throw new WasmTrap("operand stack underflow (malformed module)")
    sp -= 1; xLo = stack(sp); xHi = vstack(sp)
  }

  /** Host-side write into guest linear memory — the copy-in half of the
    * reference's FFI ABI (`ffi.rs:114-130`: host writes argument buffers into
    * guest-allocated regions). Bounds-checked like any guest store. */
  def writeBytes(ptr: Int, bytes: Array[Byte]): Unit = {
    if (ptr < 0 || ptr.toLong + bytes.length > mem.length)
      throw new WasmTrap("host write out of bounds guest memory")
    System.arraycopy(bytes, 0, mem, ptr, bytes.length)
  }

  /** Zero-intermediate copy-in of a Tungsten string: the UTF8String's bytes
    * land straight in guest memory (one `Platform.copyMemory`), skipping the
    * `getBytes` materialization — the batched arena path's hot write. */
  def writeUtf8(ptr: Int, s: org.apache.spark.unsafe.types.UTF8String): Unit = {
    val n = s.numBytes()
    if (ptr < 0 || ptr.toLong + n > mem.length)
      throw new WasmTrap("host write out of bounds guest memory")
    s.writeToMemory(mem, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + ptr)
  }

  def hasExport(name: String): Boolean = module.exportedFunc(name).isDefined

  /** Host-side read of an 8-byte slot from guest memory (the copy-out half
    * of the FFI ABI: table-function results are written by the guest into a
    * host-allocated out-buffer). */
  def readSlot(ptr: Int): Long = {
    if (ptr < 0 || ptr.toLong + 8 > mem.length)
      throw new WasmTrap("host read out of bounds guest memory")
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (mem(ptr + i) & 0xFFL); i -= 1 }
    v
  }

  /** Host-side copy-out of a guest buffer — how string/binary RESULTS leave
    * guest memory: the guest returns a packed (ptr << 32 | len) i64 and the
    * host copies the bytes before the instance is released (reference:
    * results read back out of guest linear memory, `wasm/mod.rs:409-460`). */
  def readBytes(ptr: Int, len: Int): Array[Byte] = {
    if (len < 0 || ptr < 0 || ptr.toLong + len > mem.length)
      throw new WasmTrap("host read out of bounds guest memory")
    java.util.Arrays.copyOfRange(mem, ptr, ptr + len)
  }

  /** Direct reference to guest linear memory for ZERO-INTERMEDIATE copy-out
    * (the output half of the batched arena discipline: a result buffer lands
    * straight in the columnar output vector, one copy instead of
    * readBytes' alloc+copy+copy). Re-fetch after every guest call — a
    * `memory.grow` replaces the array — and bounds-check against its length
    * before reading. */
  private[wasm] def memRef: Array[Byte] = mem

  /** Precomputed call handle for hot batch loops: the export-name hash
    * lookup and arity check happen ONCE per borrow instead of per row. */
  final class Bound private[WasmInstance] (val fidx: Int, val nParams: Int,
                                           val hasResult: Boolean)

  def bind(exportName: String): Bound = {
    val fidx = module.exportedFunc(exportName)
      .getOrElse(throw new WasmTrap(s"function not found: $exportName"))
    val ft = module.funcType(fidx)
    if (ft.results.length > 1)
      throw new WasmTrap(s"$exportName returns ${ft.results.length} values; " +
        "multi-value is internal-only (host calls take at most one result)")
    if (ft.params.contains(WasmModule.V128) || ft.results.contains(WasmModule.V128))
      throw new WasmTrap(s"$exportName takes/returns v128; " +
        "v128 is internal-only (host calls pass scalars or memory pointers)")
    new Bound(fidx, ft.params.length, ft.results.length == 1)
  }

  /** Invoke through a pre-bound handle — the per-row path of the batched
    * columnar kernel. Callers guarantee `args.length == b.nParams`. */
  def invokeBound(b: Bound, args: Array[Long]): Long = {
    fuel = config.fuel
    depth = 0
    nesting = 0
    sp = 0
    var i = 0
    while (i < args.length) { push(args(i)); i += 1 }
    try callFunc(b.fidx)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new WasmTrap(s"malformed module: index out of range (${e.getMessage})")
      case _: NegativeArraySizeException =>
        throw new WasmTrap("malformed module: negative allocation")
      // backstop when a configured maxCallDepth outruns the JVM thread
      // stack: the recursion is all interpreter frames and per-call state
      // is reset on the next invoke, so converting to a trap is safe (the
      // instance is discarded, never released back to the pool)
      case _: StackOverflowError =>
        throw new WasmTrap("call depth exceeded (JVM stack)")
    }
    if (b.hasResult) pop() else 0L
  }

  /** Invoke an exported function. `args`/result use the slot encoding. */
  def invoke(exportName: String, args: Array[Long]): Long = {
    val fidx = module.exportedFunc(exportName)
      .getOrElse(throw new WasmTrap(s"function not found: $exportName"))
    fuel = config.fuel
    depth = 0
    nesting = 0
    sp = 0
    val ft = module.funcType(fidx)
    if (ft.params.length != args.length)
      throw new WasmTrap(s"$exportName expects ${ft.params.length} args, got ${args.length}")
    if (ft.results.length > 1)
      throw new WasmTrap(s"$exportName returns ${ft.results.length} values; " +
        "multi-value is internal-only (host calls take at most one result)")
    if (ft.params.contains(WasmModule.V128) || ft.results.contains(WasmModule.V128))
      throw new WasmTrap(s"$exportName takes/returns v128; " +
        "v128 is internal-only (host calls pass scalars or memory pointers)")
    args.foreach(push)
    // unvalidated modules can index locals/globals out of range — surface
    // every malformed-module failure as a trap, never a JVM error
    try callFunc(fidx)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new WasmTrap(s"malformed module: index out of range (${e.getMessage})")
      case _: NegativeArraySizeException =>
        throw new WasmTrap("malformed module: negative allocation")
      // backstop when a configured maxCallDepth outruns the JVM thread
      // stack: the recursion is all interpreter frames and per-call state
      // is reset on the next invoke, so converting to a trap is safe (the
      // instance is discarded, never released back to the pool)
      case _: StackOverflowError =>
        throw new WasmTrap("call depth exceeded (JVM stack)")
    }
    if (ft.results.length == 1) pop() else 0L
  }

  /** Pops args from the operand stack, runs the body, leaves results on it. */
  private def callFunc(fidx: Int): Unit = {
    if (fidx < 0 || fidx >= module.funcs.length) throw new WasmTrap("bad function index")
    depth += 1
    if (depth > config.maxCallDepth) throw new WasmTrap("call depth exceeded")
    val fd = module.funcs(fidx)
    val ft = module.types(fd.typeIdx)
    val nParams = ft.params.length
    val nLocals = nParams + fd.locals.length
    val locals = new Array[Long](nLocals)
    // shadow locals: real per-call array only when the module uses v128
    // anywhere (recursion-safe); otherwise a shared never-read scratch
    val vlocals =
      if (module.hasV128) new Array[Long](nLocals)
      else {
        if (scratchVLocals.length < nLocals)
          scratchVLocals = new Array[Long](Integer.highestOneBit(nLocals) * 2)
        scratchVLocals
      }
    if (sp < nParams) throw new WasmTrap("operand stack underflow (malformed module)")
    var i = nParams - 1
    while (i >= 0) { sp -= 1; locals(i) = stack(sp); vlocals(i) = vstack(sp); i -= 1 }
    // reference-typed locals default to NULL (-1), not 0
    val rl = fd.refLocals
    var k = 0
    while (k < rl.length) { locals(nParams + rl(k)) = -1L; k += 1 }
    val base = sp
    val r = exec(fd.body, locals, vlocals)
    // normalize the frame: keep the declared results, discard the rest
    val nRes = ft.results.length
    if (r != FALL || sp != base + nRes) truncate(base, nRes)
    depth -= 1
  }

  private final val FALL = -1 // fallthrough marker for exec()
  /** Hard host cap on funcref table entries regardless of the module's
    * declared max — same role as `memoryLimitBytes` for linear memory. */
  private final val MaxTableEntries = 1 << 20

  /** Execute a sequence; returns FALL or a branch depth relative to the
    * *enclosing* label after this sequence's own labels are consumed.
    * Activations count against their OWN budget (4 x maxCallDepth — blocks
    * nest deeper than calls, and sharing the call counter would silently
    * halve the legal recursion depth), so a hostile module of tens of
    * thousands of nested `block`s traps (WasmTrap) instead of overflowing
    * the JVM stack — a StackOverflowError would escape the error-column
    * containment, which only catches Exception. */
  private def exec(body: Array[Insn], locals: Array[Long], vlocals: Array[Long]): Int = {
    // counter check inlined in THIS frame — a wrapper method would add one
    // JVM frame per activation, which at a legal 1000-deep call recursion
    // is the difference between fitting the thread stack and SOE
    nesting += 1
    if (nesting > config.maxCallDepth * 4)
      throw new WasmTrap("block nesting depth exceeded")
    try {
    var pc = 0
    while (pc < body.length) {
      fuel -= 1
      if (fuel <= 0) throw new WasmTrap("fuel exhausted (runaway guest)")
      body(pc) match {
        case Nop =>
        case Unreachable => throw new WasmTrap("unreachable executed")
        case Block(params, results, inner) =>
          // the top `params` slots belong to the block's frame (multi-value)
          val base = sp - params
          if (base < 0) throw new WasmTrap("operand stack underflow (malformed module)")
          val r = exec(inner, locals, vlocals)
          if (r == 0 || r == FALL) truncate(base, results)
          else if (r == Int.MaxValue) return Int.MaxValue
          else return r - 1
        case Loop(params, inner) =>
          val base = sp - params
          if (base < 0) throw new WasmTrap("operand stack underflow (malformed module)")
          var continue = true
          while (continue) {
            val r = exec(inner, locals, vlocals)
            if (r == 0) truncate(base, params) // br to head: re-supply the params, restart
            else if (r == FALL) continue = false
            else if (r == Int.MaxValue) return Int.MaxValue
            else return r - 1
          }
        case If(params, results, thn, els) =>
          val cond = pop()
          val base = sp - params
          if (base < 0) throw new WasmTrap("operand stack underflow (malformed module)")
          val r = exec(if (cond != 0) thn else els, locals, vlocals)
          if (r == 0 || r == FALL) truncate(base, results)
          else if (r == Int.MaxValue) return Int.MaxValue
          else return r - 1
        case CallIndirect(ti) =>
          val idx = pop().toInt
          if (idx < 0 || idx >= table.length)
            throw new WasmTrap("undefined element (call_indirect out of table bounds)")
          val target = table(idx)
          if (target < 0) throw new WasmTrap("uninitialized element")
          if (ti < 0 || ti >= module.types.length ||
              !module.types(ti).sameAs(module.funcType(target)))
            throw new WasmTrap("indirect call type mismatch")
          callFunc(target)
        case ImportedCall(m, n) =>
          if (m == "wasi_snapshot_preview1" || m == "wasi_unstable") wasiShim(n, locals)
          else throw new WasmTrap(s"unresolved import called: $m.$n " +
            "(imports load as stubs; kernels must not reach them)")
        case MemCopy =>
          val len = popI32(); val src = popI32(); val dst = popI32()
          if (len < 0 || src < 0 || dst < 0 ||
              src.toLong + len > mem.length || dst.toLong + len > mem.length)
            throw new WasmTrap("out of bounds memory.copy")
          System.arraycopy(mem, src, mem, dst, len) // overlap-safe
        case MemFill =>
          val len = popI32(); val v = popI32(); val dst = popI32()
          if (len < 0 || dst < 0 || dst.toLong + len > mem.length)
            throw new WasmTrap("out of bounds memory.fill")
          java.util.Arrays.fill(mem, dst, dst + len, v.toByte)
        case MemInit(d) =>
          val len = popI32(); val src = popI32(); val dst = popI32()
          if (d < 0 || d >= module.data.length) throw new WasmTrap("bad data segment index")
          val seg = if (dataDropped(d)) Array.emptyByteArray else module.data(d).bytes
          if (len < 0 || src < 0 || dst < 0 ||
              src.toLong + len > seg.length || dst.toLong + len > mem.length)
            throw new WasmTrap("out of bounds memory.init")
          System.arraycopy(seg, src, mem, dst, len)
        case DataDrop(d) =>
          if (d < 0 || d >= dataDropped.length) throw new WasmTrap("bad data segment index")
          dataDropped(d) = true
        case TableGet =>
          val i = popI32()
          if (i < 0 || i >= table.length) throw new WasmTrap("out of bounds table access")
          push(table(i).toLong)
        case TableSet =>
          val v = pop(); val i = popI32()
          if (i < 0 || i >= table.length) throw new WasmTrap("out of bounds table access")
          table(i) = v.toInt
        case TableSize => push(table.length.toLong)
        case TableGrow =>
          val delta = popI32(); val init = pop()
          val newSize = table.length.toLong + delta
          // cap like memory.grow: the module's declared max AND a hard host
          // limit — a hostile guest growing the table is an allocation bomb
          if (delta < 0 || newSize > math.min(module.tableMax.toLong, MaxTableEntries))
            push(-1L)
          else {
            val old = table.length
            table = java.util.Arrays.copyOf(table, newSize.toInt)
            java.util.Arrays.fill(table, old, newSize.toInt, init.toInt)
            push(old.toLong)
          }
        case TableFill =>
          val len = popI32(); val v = pop(); val dst = popI32()
          if (len < 0 || dst < 0 || dst.toLong + len > table.length)
            throw new WasmTrap("out of bounds table.fill")
          java.util.Arrays.fill(table, dst, dst + len, v.toInt)
        case TableCopy =>
          val len = popI32(); val src = popI32(); val dst = popI32()
          if (len < 0 || src < 0 || dst < 0 ||
              src.toLong + len > table.length || dst.toLong + len > table.length)
            throw new WasmTrap("out of bounds table.copy")
          System.arraycopy(table, src, table, dst, len) // overlap-safe
        case TableInit(e) =>
          val len = popI32(); val src = popI32(); val dst = popI32()
          if (e < 0 || e >= module.elems.length) throw new WasmTrap("bad element segment index")
          val seg = if (elemDropped(e)) Array.emptyIntArray else module.elems(e).funcIdxs
          if (len < 0 || src < 0 || dst < 0 ||
              src.toLong + len > seg.length || dst.toLong + len > table.length)
            throw new WasmTrap("out of bounds table.init")
          System.arraycopy(seg, src, table, dst, len)
        case ElemDrop(e) =>
          if (e < 0 || e >= elemDropped.length) throw new WasmTrap("bad element segment index")
          elemDropped(e) = true
        case RefNull => push(-1L)
        case RefFunc(i) =>
          if (i < 0 || i >= module.funcs.length) throw new WasmTrap("bad function index in ref.func")
          push(i.toLong)
        case RefIsNull => pushB(pop() == -1L)
        case NumSat(op) => satTrunc(op)
        case Br(d) => return d
        case BrIf(d) => if (pop() != 0) return d
        case BrTable(targets, default) =>
          val idx = pop().toInt
          return if (idx >= 0 && idx < targets.length) targets(idx) else default
        case Return => return Int.MaxValue
        case Call(f) => callFunc(f)
        case Drop => sp -= 1
        case Select =>
          // keep operands in place: result lands in a's slot (shadow too, so
          // v128 select works without knowing the width)
          val c = pop()
          if (sp < 2) throw new WasmTrap("operand stack underflow (malformed module)")
          sp -= 1 // b at sp, a at sp - 1
          if (c == 0) { stack(sp - 1) = stack(sp); vstack(sp - 1) = vstack(sp) }
        case LocalGet(i) => push(locals(i)); vstack(sp - 1) = vlocals(i)
        case LocalSet(i) => locals(i) = pop(); vlocals(i) = vstack(sp)
        case LocalTee(i) => locals(i) = stack(sp - 1); vlocals(i) = vstack(sp - 1)
        case GlobalGet(i) => push(globals(i)); vstack(sp - 1) = vglobals(i)
        case GlobalSet(i) =>
          if (!module.globals(i).mutable) throw new WasmTrap("set of immutable global")
          globals(i) = pop(); vglobals(i) = vstack(sp)
        case Load(op, off) => load(op, off)
        case Store(op, off) => store(op, off)
        case MemorySize => push(memPages.toLong)
        case MemoryGrow =>
          val delta = pop().toInt
          val newPages = memPages.toLong + delta
          if (delta < 0 || newPages > hardMaxPages) push(-1L)
          else {
            mem = java.util.Arrays.copyOf(mem, (newPages * PageSize).toInt)
            push(memPages.toLong)
            memPages = newPages.toInt
          }
        case I32Const(v) => push(v.toLong)
        case I64Const(v) => push(v)
        case F32Const(v) => pushF32(v)
        case F64Const(v) => pushF64(v)
        case Num(op) => numeric(op)
        case V128Const(lo, hi) => pushV(lo, hi)
        case SimdLoad(sub, off) => simdLoad(sub, off)
        case SimdStore(off) =>
          popV()
          val lo = xLo; val hi = xHi
          val a = addr(off, 16)
          wr(a, 8, lo); wr(a + 8, 8, hi)
        case SimdLoadLane(sub, off, lane) => simdLoadLane(sub, off, lane)
        case SimdStoreLane(sub, off, lane) => simdStoreLane(sub, off, lane)
        case Shuffle(lanes) => shuffle(lanes)
        case SimdLane(sub, lane) => simdLane(sub, lane)
        case Simd(sub) => simd(sub)
      }
      pc += 1
    }
    FALL
    } finally nesting -= 1
  }

  /** Keep the top `arity` slots, reset to `base`, push them back — the
    * label-exit stack discipline for both branch and fallthrough (arity may
    * exceed 1 since multi-value). */
  private def truncate(base: Int, arity: Int): Unit = {
    if (sp != base + arity) {
      if (sp - arity < base) throw new WasmTrap("operand stack underflow (malformed module)")
      var j = 0
      while (j < arity) {
        stack(base + j) = stack(sp - arity + j)
        vstack(base + j) = vstack(sp - arity + j) // v128 shadow travels with the slot
        j += 1
      }
      sp = base + arity
    }
  }

  // ---- memory --------------------------------------------------------------
  private def addr(offset: Long, width: Int): Int = {
    val a = (pop() & 0xFFFFFFFFL) + offset
    if (a < 0 || a + width > mem.length) throw new WasmTrap("out of bounds memory access")
    a.toInt
  }
  private def rd(a: Int, w: Int): Long = {
    var v = 0L; var i = w - 1
    while (i >= 0) { v = (v << 8) | (mem(a + i) & 0xFFL); i -= 1 }
    v
  }
  private def wr(a: Int, w: Int, v: Long): Unit = {
    var i = 0
    while (i < w) { mem(a + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
  }

  /** Deterministic host shims for the WASI preview1 imports a pure-compute
    * wasip1 cdylib actually reaches (libc startup and panic plumbing): empty
    * environment/args, swallowed `fd_write` (panic messages — byte counts
    * are still honored), fixed-seed `random_get`, epoch `clock_time_get`,
    * and `proc_exit` as a contained trap. Everything is reproducible by
    * construction — no wall clock, no OS entropy — so wasm results stay
    * bit-stable across runs and executors. File/socket descriptors answer
    * WASI `badf`; any OTHER wasi name still traps like an unresolved import.
    * Argument values arrive as the stub function's locals (the import's
    * declared signature); the errno push is frame-normalized by callFunc. */
  private def wasiShim(name: String, locals: Array[Long]): Unit = {
    def chk(a: Long, len: Long): Int = {
      if (a < 0 || len < 0 || a + len > mem.length)
        throw new WasmTrap(s"wasi $name out of bounds memory access")
      a.toInt
    }
    def wrU32(a: Long, v: Long): Unit = wr(chk(a, 4), 4, v & 0xFFFFFFFFL)
    def rdU32(a: Long): Long = rd(chk(a, 4), 4) & 0xFFFFFFFFL
    val ErrnoBadf = 8L // WASI errno: bad file descriptor
    name match {
      case "environ_sizes_get" | "args_sizes_get" =>
        wrU32(locals(0), 0L); wrU32(locals(1), 0L); push(0L)
      case "environ_get" | "args_get" =>
        push(0L) // zero entries: nothing to copy
      case "fd_write" =>
        // iovec array: {buf_ptr u32, buf_len u32} pairs; content (panic
        // messages, println) is swallowed, the byte count is truthful
        val iovs = locals(1); val n = locals(2).toInt
        if (n < 0 || n > 1024) throw new WasmTrap("wasi fd_write absurd iovec count")
        var total = 0L; var i = 0
        while (i < n) {
          val ptr = rdU32(iovs + i * 8L); val len = rdU32(iovs + i * 8L + 4L)
          chk(ptr, len); total += len; i += 1
        }
        wrU32(locals(3), total); push(0L)
      case "random_get" =>
        // deterministic xorshift keyed on length: reproducible across runs
        val len = locals(1); val base = chk(locals(0), len)
        var x = 0x9E3779B97F4A7C15L ^ (len * 0x632BE59BD9B4E019L + 1)
        var i = 0
        while (i < len) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          mem(base + i) = x.toByte; i += 1
        }
        push(0L)
      case "clock_time_get" =>
        wr(chk(locals(2), 8), 8, 0L); push(0L) // fixed epoch: deterministic
      case "sched_yield" => push(0L)
      case "proc_exit" =>
        throw new WasmTrap(s"proc_exit(${locals(0).toInt})")
      case "fd_close" | "fd_seek" | "fd_fdstat_get" | "fd_fdstat_set_flags" |
           "fd_prestat_get" | "fd_prestat_dir_name" | "fd_read" =>
        push(ErrnoBadf) // no filesystem: every descriptor is closed
      case other =>
        throw new WasmTrap(s"unresolved import called: wasi_snapshot_preview1.$other " +
          "(imports load as stubs; kernels must not reach them)")
    }
  }
  private def signExtend(v: Long, bits: Int): Long = (v << (64 - bits)) >> (64 - bits)

  private def load(op: Int, off: Long): Unit = op match {
    case 0x28 => push(signExtend(rd(addr(off, 4), 4), 32))        // i32.load
    case 0x29 => push(rd(addr(off, 8), 8))                        // i64.load
    case 0x2A => push(rd(addr(off, 4), 4))                        // f32.load (raw bits)
    case 0x2B => push(rd(addr(off, 8), 8))                        // f64.load
    case 0x2C => push(signExtend(rd(addr(off, 1), 1), 8))         // i32.load8_s
    case 0x2D => push(rd(addr(off, 1), 1))                        // i32.load8_u
    case 0x2E => push(signExtend(rd(addr(off, 2), 2), 16))        // i32.load16_s
    case 0x2F => push(rd(addr(off, 2), 2))                        // i32.load16_u
    case 0x30 => push(signExtend(rd(addr(off, 1), 1), 8))         // i64.load8_s
    case 0x31 => push(rd(addr(off, 1), 1))                        // i64.load8_u
    case 0x32 => push(signExtend(rd(addr(off, 2), 2), 16))        // i64.load16_s
    case 0x33 => push(rd(addr(off, 2), 2))                        // i64.load16_u
    case 0x34 => push(signExtend(rd(addr(off, 4), 4), 32))        // i64.load32_s
    case 0x35 => push(rd(addr(off, 4), 4))                        // i64.load32_u
    case _ => throw new WasmTrap(f"bad load 0x$op%02x")
  }

  private def store(op: Int, off: Long): Unit = {
    val v = pop()
    op match {
      case 0x36 => wr(addr(off, 4), 4, v)  // i32.store
      case 0x37 => wr(addr(off, 8), 8, v)  // i64.store
      case 0x38 => wr(addr(off, 4), 4, v)  // f32.store (raw bits already)
      case 0x39 => wr(addr(off, 8), 8, v)  // f64.store
      case 0x3A => wr(addr(off, 1), 1, v)
      case 0x3B => wr(addr(off, 2), 2, v)
      case 0x3C => wr(addr(off, 1), 1, v)
      case 0x3D => wr(addr(off, 2), 2, v)
      case 0x3E => wr(addr(off, 4), 4, v)
      case _ => throw new WasmTrap(f"bad store 0x$op%02x")
    }
  }

  // ---- numeric core --------------------------------------------------------
  private def popF32(): Float = java.lang.Float.intBitsToFloat(pop().toInt)
  private def popF64(): Double = java.lang.Double.longBitsToDouble(pop())
  private def pushF32(v: Float): Unit =
    push(java.lang.Float.floatToRawIntBits(v).toLong & 0xFFFFFFFFL)
  private def pushF64(v: Double): Unit = push(java.lang.Double.doubleToRawLongBits(v))
  private def pushB(b: Boolean): Unit = push(if (b) 1L else 0L)
  private def popI32(): Int = pop().toInt

  private def truncChecked(d: Double, lo: Double, hi: Double): Long = {
    if (d.isNaN) throw new WasmTrap("invalid conversion to integer (NaN)")
    val t = if (d < 0) math.ceil(d) else math.floor(d)
    if (t < lo || t > hi) throw new WasmTrap("integer overflow in trunc")
    t.toLong
  }

  private def numeric(op: Int): Unit = (op: @annotation.switch) match {
    // i32 compare
    case 0x45 => pushB(popI32() == 0)
    case 0x46 => { val b = popI32(); val a = popI32(); pushB(a == b) }
    case 0x47 => { val b = popI32(); val a = popI32(); pushB(a != b) }
    case 0x48 => { val b = popI32(); val a = popI32(); pushB(a < b) }
    case 0x49 => { val b = popI32(); val a = popI32(); pushB(java.lang.Integer.compareUnsigned(a, b) < 0) }
    case 0x4A => { val b = popI32(); val a = popI32(); pushB(a > b) }
    case 0x4B => { val b = popI32(); val a = popI32(); pushB(java.lang.Integer.compareUnsigned(a, b) > 0) }
    case 0x4C => { val b = popI32(); val a = popI32(); pushB(a <= b) }
    case 0x4D => { val b = popI32(); val a = popI32(); pushB(java.lang.Integer.compareUnsigned(a, b) <= 0) }
    case 0x4E => { val b = popI32(); val a = popI32(); pushB(a >= b) }
    case 0x4F => { val b = popI32(); val a = popI32(); pushB(java.lang.Integer.compareUnsigned(a, b) >= 0) }
    // i64 compare
    case 0x50 => pushB(pop() == 0L)
    case 0x51 => { val b = pop(); val a = pop(); pushB(a == b) }
    case 0x52 => { val b = pop(); val a = pop(); pushB(a != b) }
    case 0x53 => { val b = pop(); val a = pop(); pushB(a < b) }
    case 0x54 => { val b = pop(); val a = pop(); pushB(java.lang.Long.compareUnsigned(a, b) < 0) }
    case 0x55 => { val b = pop(); val a = pop(); pushB(a > b) }
    case 0x56 => { val b = pop(); val a = pop(); pushB(java.lang.Long.compareUnsigned(a, b) > 0) }
    case 0x57 => { val b = pop(); val a = pop(); pushB(a <= b) }
    case 0x58 => { val b = pop(); val a = pop(); pushB(java.lang.Long.compareUnsigned(a, b) <= 0) }
    case 0x59 => { val b = pop(); val a = pop(); pushB(a >= b) }
    case 0x5A => { val b = pop(); val a = pop(); pushB(java.lang.Long.compareUnsigned(a, b) >= 0) }
    // f32 compare
    case 0x5B => { val b = popF32(); val a = popF32(); pushB(a == b) }
    case 0x5C => { val b = popF32(); val a = popF32(); pushB(a != b) }
    case 0x5D => { val b = popF32(); val a = popF32(); pushB(a < b) }
    case 0x5E => { val b = popF32(); val a = popF32(); pushB(a > b) }
    case 0x5F => { val b = popF32(); val a = popF32(); pushB(a <= b) }
    case 0x60 => { val b = popF32(); val a = popF32(); pushB(a >= b) }
    // f64 compare
    case 0x61 => { val b = popF64(); val a = popF64(); pushB(a == b) }
    case 0x62 => { val b = popF64(); val a = popF64(); pushB(a != b) }
    case 0x63 => { val b = popF64(); val a = popF64(); pushB(a < b) }
    case 0x64 => { val b = popF64(); val a = popF64(); pushB(a > b) }
    case 0x65 => { val b = popF64(); val a = popF64(); pushB(a <= b) }
    case 0x66 => { val b = popF64(); val a = popF64(); pushB(a >= b) }
    // i32 arithmetic
    case 0x67 => push(java.lang.Integer.numberOfLeadingZeros(popI32()).toLong)
    case 0x68 => push(java.lang.Integer.numberOfTrailingZeros(popI32()).toLong)
    case 0x69 => push(java.lang.Integer.bitCount(popI32()).toLong)
    case 0x6A => { val b = popI32(); val a = popI32(); push((a + b).toLong) }
    case 0x6B => { val b = popI32(); val a = popI32(); push((a - b).toLong) }
    case 0x6C => { val b = popI32(); val a = popI32(); push((a * b).toLong) }
    case 0x6D =>
      val b = popI32(); val a = popI32()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      if (a == Int.MinValue && b == -1) throw new WasmTrap("integer overflow")
      push((a / b).toLong)
    case 0x6E =>
      val b = popI32(); val a = popI32()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      push(java.lang.Integer.divideUnsigned(a, b).toLong)
    case 0x6F =>
      val b = popI32(); val a = popI32()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      push((if (a == Int.MinValue && b == -1) 0 else a % b).toLong)
    case 0x70 =>
      val b = popI32(); val a = popI32()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      push(java.lang.Integer.remainderUnsigned(a, b).toLong)
    case 0x71 => { val b = popI32(); val a = popI32(); push((a & b).toLong) }
    case 0x72 => { val b = popI32(); val a = popI32(); push((a | b).toLong) }
    case 0x73 => { val b = popI32(); val a = popI32(); push((a ^ b).toLong) }
    case 0x74 => { val b = popI32(); val a = popI32(); push((a << (b & 31)).toLong) }
    case 0x75 => { val b = popI32(); val a = popI32(); push((a >> (b & 31)).toLong) }
    case 0x76 => { val b = popI32(); val a = popI32(); push((a >>> (b & 31)).toLong) }
    case 0x77 => { val b = popI32(); val a = popI32(); push(java.lang.Integer.rotateLeft(a, b).toLong) }
    case 0x78 => { val b = popI32(); val a = popI32(); push(java.lang.Integer.rotateRight(a, b).toLong) }
    // i64 arithmetic
    case 0x79 => push(java.lang.Long.numberOfLeadingZeros(pop()).toLong)
    case 0x7A => push(java.lang.Long.numberOfTrailingZeros(pop()).toLong)
    case 0x7B => push(java.lang.Long.bitCount(pop()).toLong)
    case 0x7C => { val b = pop(); val a = pop(); push(a + b) }
    case 0x7D => { val b = pop(); val a = pop(); push(a - b) }
    case 0x7E => { val b = pop(); val a = pop(); push(a * b) }
    case 0x7F =>
      val b = pop(); val a = pop()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      if (a == Long.MinValue && b == -1) throw new WasmTrap("integer overflow")
      push(a / b)
    case 0x80 =>
      val b = pop(); val a = pop()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      push(java.lang.Long.divideUnsigned(a, b))
    case 0x81 =>
      val b = pop(); val a = pop()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      push(if (a == Long.MinValue && b == -1) 0L else a % b)
    case 0x82 =>
      val b = pop(); val a = pop()
      if (b == 0) throw new WasmTrap("integer divide by zero")
      push(java.lang.Long.remainderUnsigned(a, b))
    case 0x83 => { val b = pop(); val a = pop(); push(a & b) }
    case 0x84 => { val b = pop(); val a = pop(); push(a | b) }
    case 0x85 => { val b = pop(); val a = pop(); push(a ^ b) }
    case 0x86 => { val b = pop(); val a = pop(); push(a << (b & 63)) }
    case 0x87 => { val b = pop(); val a = pop(); push(a >> (b & 63)) }
    case 0x88 => { val b = pop(); val a = pop(); push(a >>> (b & 63)) }
    case 0x89 => { val b = pop(); val a = pop(); push(java.lang.Long.rotateLeft(a, b.toInt)) }
    case 0x8A => { val b = pop(); val a = pop(); push(java.lang.Long.rotateRight(a, b.toInt)) }
    // f32
    case 0x8B => pushF32(math.abs(popF32()))
    case 0x8C => pushF32(-popF32())
    case 0x8D => pushF32(math.ceil(popF32().toDouble).toFloat)
    case 0x8E => pushF32(math.floor(popF32().toDouble).toFloat)
    case 0x8F => { val v = popF32(); pushF32(if (v < 0) math.ceil(v.toDouble).toFloat else math.floor(v.toDouble).toFloat) }
    case 0x90 => pushF32(math.rint(popF32().toDouble).toFloat)
    case 0x91 => pushF32(math.sqrt(popF32().toDouble).toFloat)
    case 0x92 => { val b = popF32(); val a = popF32(); pushF32(a + b) }
    case 0x93 => { val b = popF32(); val a = popF32(); pushF32(a - b) }
    case 0x94 => { val b = popF32(); val a = popF32(); pushF32(a * b) }
    case 0x95 => { val b = popF32(); val a = popF32(); pushF32(a / b) }
    case 0x96 => { val b = popF32(); val a = popF32(); pushF32(java.lang.Math.min(a, b)) }
    case 0x97 => { val b = popF32(); val a = popF32(); pushF32(java.lang.Math.max(a, b)) }
    case 0x98 => { val b = popF32(); val a = popF32(); pushF32(java.lang.Math.copySign(a, b)) }
    // f64
    case 0x99 => pushF64(math.abs(popF64()))
    case 0x9A => pushF64(-popF64())
    case 0x9B => pushF64(math.ceil(popF64()))
    case 0x9C => pushF64(math.floor(popF64()))
    case 0x9D => { val v = popF64(); pushF64(if (v < 0) math.ceil(v) else math.floor(v)) }
    case 0x9E => pushF64(math.rint(popF64()))
    case 0x9F => pushF64(math.sqrt(popF64()))
    case 0xA0 => { val b = popF64(); val a = popF64(); pushF64(a + b) }
    case 0xA1 => { val b = popF64(); val a = popF64(); pushF64(a - b) }
    case 0xA2 => { val b = popF64(); val a = popF64(); pushF64(a * b) }
    case 0xA3 => { val b = popF64(); val a = popF64(); pushF64(a / b) }
    case 0xA4 => { val b = popF64(); val a = popF64(); pushF64(java.lang.Math.min(a, b)) }
    case 0xA5 => { val b = popF64(); val a = popF64(); pushF64(java.lang.Math.max(a, b)) }
    case 0xA6 => { val b = popF64(); val a = popF64(); pushF64(java.lang.Math.copySign(a, b)) }
    // conversions
    case 0xA7 => push(signExtend(pop(), 32))                               // i32.wrap_i64
    case 0xA8 => push(signExtend(truncChecked(popF32().toDouble, Int.MinValue.toDouble, Int.MaxValue.toDouble), 32))
    case 0xA9 => push(signExtend(truncChecked(popF32().toDouble, 0, 4294967295.0), 32))
    case 0xAA => push(signExtend(truncChecked(popF64(), Int.MinValue.toDouble, Int.MaxValue.toDouble), 32))
    case 0xAB => push(signExtend(truncChecked(popF64(), 0, 4294967295.0), 32))
    case 0xAC => push(popI32().toLong)                                     // i64.extend_i32_s
    case 0xAD => push(pop() & 0xFFFFFFFFL)                                 // i64.extend_i32_u
    case 0xAE => push(truncChecked(popF32().toDouble, Long.MinValue.toDouble, 9.223372036854775E18))
    case 0xAF => pushTruncU64(popF32().toDouble)
    case 0xB0 => push(truncChecked(popF64(), Long.MinValue.toDouble, 9.223372036854775E18))
    case 0xB1 => pushTruncU64(popF64())
    case 0xB2 => pushF32(popI32().toFloat)
    case 0xB3 => pushF32((pop() & 0xFFFFFFFFL).toFloat)
    case 0xB4 => pushF32(pop().toFloat)
    case 0xB5 => { val v = pop(); pushF32(if (v >= 0) v.toFloat else ((v >>> 1) | (v & 1)).toFloat * 2.0f) }
    case 0xB6 => pushF32(popF64().toFloat)                                 // f32.demote_f64
    case 0xB7 => pushF64(popI32().toDouble)
    case 0xB8 => pushF64((pop() & 0xFFFFFFFFL).toDouble)
    case 0xB9 => pushF64(pop().toDouble)
    case 0xBA => { val v = pop(); pushF64(if (v >= 0) v.toDouble else ((v >>> 1) | (v & 1)).toDouble * 2.0) }
    case 0xBB => pushF64(popF32().toDouble)                                // f64.promote_f32
    case 0xBC => push(pop() & 0xFFFFFFFFL)                                 // i32.reinterpret_f32
    case 0xBD =>                                                           // i64.reinterpret_f64
    case 0xBE =>                                                           // f32.reinterpret_i32
    case 0xBF =>                                                           // f64.reinterpret_i64
    // sign extension
    case 0xC0 => push(signExtend(pop(), 8))
    case 0xC1 => push(signExtend(pop(), 16))
    case 0xC2 => push(signExtend(pop(), 8))
    case 0xC3 => push(signExtend(pop(), 16))
    case 0xC4 => push(signExtend(pop(), 32))
    case other => throw new WasmTrap(f"unsupported numeric opcode 0x$other%02x")
  }

  /** 0xFC 0..7 — saturating float→int: NaN → 0, out-of-range clamps. */
  private def satTrunc(op: Int): Unit = {
    def sat(d: Double, lo: Long, hi: Long): Long =
      if (d.isNaN) 0L
      else if (d <= lo.toDouble) lo
      else if (d >= hi.toDouble) hi
      else (if (d < 0) math.ceil(d) else math.floor(d)).toLong
    def satU(d: Double, hiAll: Boolean): Long = { // unsigned: clamp to [0, 2^w)
      if (d.isNaN || d <= 0) 0L
      else if (!hiAll && d >= 4294967295.0) 4294967295L
      else if (hiAll && d >= 1.8446744073709552E19) -1L // u64 max bit pattern
      else if (hiAll && d >= 9.223372036854776E18)
        (d - 9.223372036854776E18).toLong + Long.MinValue
      else math.floor(d).toLong
    }
    (op: @annotation.switch) match {
      case 0 => push(signExtend(sat(popF32().toDouble, Int.MinValue, Int.MaxValue), 32))
      case 1 => push(signExtend(satU(popF32().toDouble, hiAll = false), 32))
      case 2 => push(signExtend(sat(popF64(), Int.MinValue, Int.MaxValue), 32))
      case 3 => push(signExtend(satU(popF64(), hiAll = false), 32))
      case 4 => push(sat(popF32().toDouble, Long.MinValue, Long.MaxValue))
      case 5 => push(satU(popF32().toDouble, hiAll = true))
      case 6 => push(sat(popF64(), Long.MinValue, Long.MaxValue))
      case 7 => push(satU(popF64(), hiAll = true))
      case other => throw new WasmTrap(s"bad saturating trunc $other")
    }
  }

  private def pushTruncU64(d: Double): Unit = {
    if (d.isNaN) throw new WasmTrap("invalid conversion to integer (NaN)")
    val t = if (d < 0) math.ceil(d) else math.floor(d)
    if (t < 0 || t >= 1.8446744073709552E19) throw new WasmTrap("integer overflow in trunc")
    push(if (t < 9.223372036854776E18) t.toLong
         else (t - 9.223372036854776E18).toLong + Long.MinValue)
  }

  // ---- SIMD (v128) evaluation ----------------------------------------------
  // A v128 is a (lo, hi) pair of longs, lanes little-endian within each long
  // (lane 0 = low bits of lo). Lane-generic helpers keep the 230-op dispatch
  // mechanical; `signed` controls whether a lane reaches the combiner
  // sign-extended or zero-extended. Fully interpreter-portable — lane math is
  // plain 64-bit arithmetic, no host SIMD dependency.

  private def laneMask(bits: Int): Long = if (bits == 64) -1L else (1L << bits) - 1

  /** Lane-wise binary combine over one 64-bit half. */
  private def halfBin(bits: Int, signed: Boolean, a: Long, b: Long,
      f: (Long, Long) => Long): Long = {
    val m = laneMask(bits)
    val n = 64 / bits
    var out = 0L
    var i = 0
    while (i < n) {
      val sh = bits * i
      var av = (a >>> sh) & m
      var bv = (b >>> sh) & m
      if (signed) { av = signExtend(av, bits); bv = signExtend(bv, bits) }
      out |= (f(av, bv) & m) << sh
      i += 1
    }
    out
  }
  private def halfUn(bits: Int, signed: Boolean, a: Long, f: Long => Long): Long = {
    val m = laneMask(bits)
    val n = 64 / bits
    var out = 0L
    var i = 0
    while (i < n) {
      val sh = bits * i
      var av = (a >>> sh) & m
      if (signed) av = signExtend(av, bits)
      out |= (f(av) & m) << sh
      i += 1
    }
    out
  }
  private def vBin(bits: Int, signed: Boolean)(f: (Long, Long) => Long): Unit = {
    popV(); val bl = xLo; val bh = xHi
    popV()
    pushV(halfBin(bits, signed, xLo, bl, f), halfBin(bits, signed, xHi, bh, f))
  }
  private def vUn(bits: Int, signed: Boolean)(f: Long => Long): Unit = {
    popV()
    pushV(halfUn(bits, signed, xLo, f), halfUn(bits, signed, xHi, f))
  }
  /** Shift ops: scalar count on top (taken mod lane width, per spec). */
  private def vShift(bits: Int, signed: Boolean)(f: (Long, Int) => Long): Unit = {
    val k = ((pop().toInt % bits) + bits) % bits
    popV()
    pushV(halfUn(bits, signed, xLo, v => f(v, k)), halfUn(bits, signed, xHi, v => f(v, k)))
  }

  private def f32FromBits(v: Long): Float = java.lang.Float.intBitsToFloat(v.toInt)
  private def f32Bits(v: Float): Long =
    java.lang.Float.floatToRawIntBits(v).toLong & 0xFFFFFFFFL
  private def dOf(v: Long): Double = java.lang.Double.longBitsToDouble(v)
  private def dBits(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)
  private def vBinF32(f: (Float, Float) => Float): Unit =
    vBin(32, signed = false)((a, b) => f32Bits(f(f32FromBits(a), f32FromBits(b))))
  private def vUnF32(f: Float => Float): Unit =
    vUn(32, signed = false)(a => f32Bits(f(f32FromBits(a))))
  private def vCmpF32(f: (Float, Float) => Boolean): Unit =
    vBin(32, signed = false)((a, b) =>
      if (f(f32FromBits(a), f32FromBits(b))) 0xFFFFFFFFL else 0L)
  private def vBinF64(f: (Double, Double) => Double): Unit = {
    popV(); val bl = xLo; val bh = xHi
    popV()
    pushV(dBits(f(dOf(xLo), dOf(bl))), dBits(f(dOf(xHi), dOf(bh))))
  }
  private def vUnF64(f: Double => Double): Unit = {
    popV(); pushV(dBits(f(dOf(xLo))), dBits(f(dOf(xHi))))
  }
  private def vCmpF64(f: (Double, Double) => Boolean): Unit = {
    popV(); val bl = xLo; val bh = xHi
    popV()
    pushV(if (f(dOf(xLo), dOf(bl))) -1L else 0L, if (f(dOf(xHi), dOf(bh))) -1L else 0L)
  }

  private def getLane(lo: Long, hi: Long, bits: Int, lane: Int, signed: Boolean): Long = {
    val perHalf = 64 / bits
    val src = if (lane < perHalf) lo else hi
    val sh = bits * (lane % perHalf)
    val raw = (src >>> sh) & laneMask(bits)
    if (signed) signExtend(raw, bits) else raw
  }
  /** Replaces `lane`; result lands in (xLo, xHi). */
  private def setLane(lo: Long, hi: Long, bits: Int, lane: Int, v: Long): Unit = {
    val perHalf = 64 / bits
    val m = laneMask(bits)
    val sh = bits * (lane % perHalf)
    if (lane < perHalf) { xLo = (lo & ~(m << sh)) | ((v & m) << sh); xHi = hi }
    else { xLo = lo; xHi = (hi & ~(m << sh)) | ((v & m) << sh) }
  }
  private def byteOf(lo: Long, hi: Long, i: Int): Long =
    getLane(lo, hi, 8, i, signed = false)
  private def checkLane(lane: Int, n: Int): Unit =
    if (lane < 0 || lane >= n) throw new WasmTrap("SIMD lane index out of range")

  private def splat8(v0: Long): Long = (v0 & 0xFF) * 0x0101010101010101L
  private def splat16(v0: Long): Long = (v0 & 0xFFFF) * 0x0001000100010001L
  private def splat32(v0: Long): Long = { val v = v0 & 0xFFFFFFFFL; v | (v << 32) }

  private def satLane(v: Long, bits: Int, signed: Boolean): Long =
    if (signed) {
      val max = laneMask(bits) >>> 1
      val min = -max - 1
      if (v > max) max else if (v < min) min else v
    } else {
      val max = laneMask(bits)
      if (v > max) max else if (v < 0) 0L else v
    }

  private def simdLoad(sub: Int, off: Long): Unit = (sub: @annotation.switch) match {
    case 0x00 => val a = addr(off, 16); pushV(rd(a, 8), rd(a + 8, 8))
    case 0x01 | 0x02 => // load8x8_s/u -> i16x8
      val a = addr(off, 8)
      val signed = sub == 0x01
      var lo = 0L; var hi = 0L; var i = 0
      while (i < 8) {
        var v = mem(a + i) & 0xFFL
        if (signed) v = signExtend(v, 8)
        v &= 0xFFFFL
        if (i < 4) lo |= v << (16 * i) else hi |= v << (16 * (i - 4))
        i += 1
      }
      pushV(lo, hi)
    case 0x03 | 0x04 => // load16x4_s/u -> i32x4
      val a = addr(off, 8)
      val signed = sub == 0x03
      var lo = 0L; var hi = 0L; var i = 0
      while (i < 4) {
        var v = rd(a + 2 * i, 2)
        if (signed) v = signExtend(v, 16)
        v &= 0xFFFFFFFFL
        if (i < 2) lo |= v << (32 * i) else hi |= v << (32 * (i - 2))
        i += 1
      }
      pushV(lo, hi)
    case 0x05 | 0x06 => // load32x2_s/u -> i64x2
      val a = addr(off, 8)
      val signed = sub == 0x05
      def w(o: Int): Long = { val v = rd(o, 4); if (signed) signExtend(v, 32) else v }
      pushV(w(a), w(a + 4))
    case 0x07 => val v = splat8(mem(addr(off, 1)) & 0xFFL); pushV(v, v)
    case 0x08 => val v = splat16(rd(addr(off, 2), 2)); pushV(v, v)
    case 0x09 => val v = splat32(rd(addr(off, 4), 4)); pushV(v, v)
    case 0x0A => val v = rd(addr(off, 8), 8); pushV(v, v)
    case 0x5C => pushV(rd(addr(off, 4), 4), 0L) // load32_zero
    case 0x5D => pushV(rd(addr(off, 8), 8), 0L) // load64_zero
    case other => throw new WasmTrap(s"bad SIMD load $other")
  }

  private def simdLoadLane(sub: Int, off: Long, lane: Int): Unit = {
    popV()
    val lo = xLo; val hi = xHi
    val bits = 8 << (sub - 0x54)
    checkLane(lane, 128 / bits)
    val a = addr(off, bits / 8)
    setLane(lo, hi, bits, lane, rd(a, bits / 8))
    pushV(xLo, xHi)
  }
  private def simdStoreLane(sub: Int, off: Long, lane: Int): Unit = {
    popV()
    val lo = xLo; val hi = xHi
    val bits = 8 << (sub - 0x58)
    checkLane(lane, 128 / bits)
    wr(addr(off, bits / 8), bits / 8, getLane(lo, hi, bits, lane, signed = false))
  }

  private def shuffle(lanes: Array[Byte]): Unit = {
    popV(); val bl = xLo; val bh = xHi
    popV(); val al = xLo; val ah = xHi
    var lo = 0L; var hi = 0L; var i = 0
    while (i < 16) {
      val s = lanes(i) & 0xFF
      val v = if (s < 16) byteOf(al, ah, s) else byteOf(bl, bh, s - 16)
      if (i < 8) lo |= v << (8 * i) else hi |= v << (8 * (i - 8))
      i += 1
    }
    pushV(lo, hi)
  }

  private def simdLane(sub: Int, lane: Int): Unit = (sub: @annotation.switch) match {
    case 0x15 => checkLane(lane, 16); popV(); push(getLane(xLo, xHi, 8, lane, signed = true))
    case 0x16 => checkLane(lane, 16); popV(); push(getLane(xLo, xHi, 8, lane, signed = false))
    case 0x17 => checkLane(lane, 16)
      val v = pop(); popV(); setLane(xLo, xHi, 8, lane, v); pushV(xLo, xHi)
    case 0x18 => checkLane(lane, 8); popV(); push(getLane(xLo, xHi, 16, lane, signed = true))
    case 0x19 => checkLane(lane, 8); popV(); push(getLane(xLo, xHi, 16, lane, signed = false))
    case 0x1A => checkLane(lane, 8)
      val v = pop(); popV(); setLane(xLo, xHi, 16, lane, v); pushV(xLo, xHi)
    case 0x1B => checkLane(lane, 4) // i32 slots stay sign-extended
      popV(); push(signExtend(getLane(xLo, xHi, 32, lane, signed = false), 32))
    case 0x1C => checkLane(lane, 4)
      val v = pop(); popV(); setLane(xLo, xHi, 32, lane, v); pushV(xLo, xHi)
    case 0x1D => checkLane(lane, 2); popV(); push(if (lane == 0) xLo else xHi)
    case 0x1E => checkLane(lane, 2)
      val v = pop(); popV(); if (lane == 0) xLo = v else xHi = v; pushV(xLo, xHi)
    case 0x1F => checkLane(lane, 4) // f32 slots are zero-extended raw bits
      popV(); push(getLane(xLo, xHi, 32, lane, signed = false))
    case 0x20 => checkLane(lane, 4)
      val v = pop(); popV(); setLane(xLo, xHi, 32, lane, v); pushV(xLo, xHi)
    case 0x21 => checkLane(lane, 2); popV(); push(if (lane == 0) xLo else xHi)
    case 0x22 => checkLane(lane, 2)
      val v = pop(); popV(); if (lane == 0) xLo = v else xHi = v; pushV(xLo, xHi)
    case other => throw new WasmTrap(s"bad SIMD lane op $other")
  }

  private def vAllTrue(bits: Int): Unit = {
    popV()
    val n = 128 / bits
    var ok = true
    var i = 0
    while (i < n) { if (getLane(xLo, xHi, bits, i, signed = false) == 0) ok = false; i += 1 }
    pushB(ok)
  }
  private def vBitmask(bits: Int): Unit = {
    popV()
    val n = 128 / bits
    var m = 0L
    var i = 0
    while (i < n) {
      if ((getLane(xLo, xHi, bits, i, signed = false) >>> (bits - 1)) != 0) m |= 1L << i
      i += 1
    }
    push(m)
  }
  /** narrow: one source's lanes saturated into the returned 64-bit half. */
  private def narrowHalf(lo: Long, hi: Long, srcBits: Int, signedRange: Boolean): Long = {
    val dstBits = srcBits / 2
    val n = 128 / srcBits
    var out = 0L
    var i = 0
    while (i < n) {
      val v = satLane(getLane(lo, hi, srcBits, i, signed = true), dstBits, signedRange)
      out |= (v & laneMask(dstBits)) << (dstBits * i)
      i += 1
    }
    out
  }
  private def vNarrow(srcBits: Int, signedRange: Boolean): Unit = {
    popV(); val bl = xLo; val bh = xHi
    popV()
    pushV(narrowHalf(xLo, xHi, srcBits, signedRange), narrowHalf(bl, bh, srcBits, signedRange))
  }
  private def vExtend(srcBits: Int, high: Boolean, signed: Boolean): Unit = {
    popV()
    val dstBits = srcBits * 2
    val n = 128 / dstBits
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < n) {
      val v = getLane(xLo, xHi, srcBits, if (high) n + i else i, signed) & laneMask(dstBits)
      if (i < n / 2) lo |= v << (dstBits * i) else hi |= v << (dstBits * (i - n / 2))
      i += 1
    }
    pushV(lo, hi)
  }
  private def vExtMul(srcBits: Int, high: Boolean, signed: Boolean): Unit = {
    popV(); val bl = xLo; val bh = xHi
    popV()
    val dstBits = srcBits * 2
    val n = 128 / dstBits
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < n) {
      val s = if (high) n + i else i
      val v = (getLane(xLo, xHi, srcBits, s, signed) *
        getLane(bl, bh, srcBits, s, signed)) & laneMask(dstBits)
      if (i < n / 2) lo |= v << (dstBits * i) else hi |= v << (dstBits * (i - n / 2))
      i += 1
    }
    pushV(lo, hi)
  }
  private def vExtAddPairwise(srcBits: Int, signed: Boolean): Unit = {
    popV()
    val dstBits = srcBits * 2
    val n = 128 / dstBits
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < n) {
      val v = (getLane(xLo, xHi, srcBits, 2 * i, signed) +
        getLane(xLo, xHi, srcBits, 2 * i + 1, signed)) & laneMask(dstBits)
      if (i < n / 2) lo |= v << (dstBits * i) else hi |= v << (dstBits * (i - n / 2))
      i += 1
    }
    pushV(lo, hi)
  }
  private def satI32(d: Double, unsigned: Boolean): Long =
    if (d.isNaN) 0L
    else if (unsigned) {
      if (d <= 0) 0L else if (d >= 4294967295.0) 4294967295L else d.toLong
    } else {
      if (d <= Int.MinValue.toDouble) Int.MinValue.toLong
      else if (d >= Int.MaxValue.toDouble) Int.MaxValue.toLong
      else d.toLong // toward zero
    }

  /** Pure SIMD ops by subopcode — the full fixed-width SIMD proposal set;
    * unassigned gaps trap (contained). */
  private def simd(sub: Int): Unit = (sub: @annotation.switch) match {
    case 0x0E => // i8x16.swizzle: out[i] = s[i] < 16 ? a[s[i]] : 0
      popV(); val sl = xLo; val sh = xHi
      popV(); val al = xLo; val ah = xHi
      var lo = 0L; var hi = 0L; var i = 0
      while (i < 16) {
        val s = byteOf(sl, sh, i)
        val v = if (s < 16) byteOf(al, ah, s.toInt) else 0L
        if (i < 8) lo |= v << (8 * i) else hi |= v << (8 * (i - 8))
        i += 1
      }
      pushV(lo, hi)
    case 0x0F => val v = splat8(pop()); pushV(v, v)
    case 0x10 => val v = splat16(pop()); pushV(v, v)
    case 0x11 => val v = splat32(pop()); pushV(v, v)
    case 0x12 => val v = pop(); pushV(v, v)
    case 0x13 => val v = splat32(pop()); pushV(v, v) // f32 slots are raw bits
    case 0x14 => val v = pop(); pushV(v, v)
    // integer compares -> all-ones/all-zeros lane masks
    case 0x23 => vBin(8, signed = true)((a, b) => if (a == b) -1L else 0L)
    case 0x24 => vBin(8, signed = true)((a, b) => if (a != b) -1L else 0L)
    case 0x25 => vBin(8, signed = true)((a, b) => if (a < b) -1L else 0L)
    case 0x26 => vBin(8, signed = false)((a, b) => if (a < b) -1L else 0L)
    case 0x27 => vBin(8, signed = true)((a, b) => if (a > b) -1L else 0L)
    case 0x28 => vBin(8, signed = false)((a, b) => if (a > b) -1L else 0L)
    case 0x29 => vBin(8, signed = true)((a, b) => if (a <= b) -1L else 0L)
    case 0x2A => vBin(8, signed = false)((a, b) => if (a <= b) -1L else 0L)
    case 0x2B => vBin(8, signed = true)((a, b) => if (a >= b) -1L else 0L)
    case 0x2C => vBin(8, signed = false)((a, b) => if (a >= b) -1L else 0L)
    case 0x2D => vBin(16, signed = true)((a, b) => if (a == b) -1L else 0L)
    case 0x2E => vBin(16, signed = true)((a, b) => if (a != b) -1L else 0L)
    case 0x2F => vBin(16, signed = true)((a, b) => if (a < b) -1L else 0L)
    case 0x30 => vBin(16, signed = false)((a, b) => if (a < b) -1L else 0L)
    case 0x31 => vBin(16, signed = true)((a, b) => if (a > b) -1L else 0L)
    case 0x32 => vBin(16, signed = false)((a, b) => if (a > b) -1L else 0L)
    case 0x33 => vBin(16, signed = true)((a, b) => if (a <= b) -1L else 0L)
    case 0x34 => vBin(16, signed = false)((a, b) => if (a <= b) -1L else 0L)
    case 0x35 => vBin(16, signed = true)((a, b) => if (a >= b) -1L else 0L)
    case 0x36 => vBin(16, signed = false)((a, b) => if (a >= b) -1L else 0L)
    case 0x37 => vBin(32, signed = true)((a, b) => if (a == b) -1L else 0L)
    case 0x38 => vBin(32, signed = true)((a, b) => if (a != b) -1L else 0L)
    case 0x39 => vBin(32, signed = true)((a, b) => if (a < b) -1L else 0L)
    case 0x3A => vBin(32, signed = false)((a, b) => if (a < b) -1L else 0L)
    case 0x3B => vBin(32, signed = true)((a, b) => if (a > b) -1L else 0L)
    case 0x3C => vBin(32, signed = false)((a, b) => if (a > b) -1L else 0L)
    case 0x3D => vBin(32, signed = true)((a, b) => if (a <= b) -1L else 0L)
    case 0x3E => vBin(32, signed = false)((a, b) => if (a <= b) -1L else 0L)
    case 0x3F => vBin(32, signed = true)((a, b) => if (a >= b) -1L else 0L)
    case 0x40 => vBin(32, signed = false)((a, b) => if (a >= b) -1L else 0L)
    case 0x41 => vCmpF32((a, b) => a == b)
    case 0x42 => vCmpF32((a, b) => a != b)
    case 0x43 => vCmpF32((a, b) => a < b)
    case 0x44 => vCmpF32((a, b) => a > b)
    case 0x45 => vCmpF32((a, b) => a <= b)
    case 0x46 => vCmpF32((a, b) => a >= b)
    case 0x47 => vCmpF64((a, b) => a == b)
    case 0x48 => vCmpF64((a, b) => a != b)
    case 0x49 => vCmpF64((a, b) => a < b)
    case 0x4A => vCmpF64((a, b) => a > b)
    case 0x4B => vCmpF64((a, b) => a <= b)
    case 0x4C => vCmpF64((a, b) => a >= b)
    case 0x4D => popV(); pushV(~xLo, ~xHi)
    case 0x4E => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo & bl, xHi & bh)
    case 0x4F => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo & ~bl, xHi & ~bh)
    case 0x50 => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo | bl, xHi | bh)
    case 0x51 => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo ^ bl, xHi ^ bh)
    case 0x52 => // bitselect: (a & c) | (b & ~c)
      popV(); val cl = xLo; val ch = xHi
      popV(); val bl = xLo; val bh = xHi
      popV()
      pushV((xLo & cl) | (bl & ~cl), (xHi & ch) | (bh & ~ch))
    case 0x53 => popV(); pushB(xLo != 0 || xHi != 0) // v128.any_true
    case 0x5E => // f32x4.demote_f64x2_zero
      popV()
      pushV(f32Bits(dOf(xLo).toFloat) | (f32Bits(dOf(xHi).toFloat) << 32), 0L)
    case 0x5F => // f64x2.promote_low_f32x4
      popV()
      pushV(dBits(f32FromBits(xLo & 0xFFFFFFFFL).toDouble),
        dBits(f32FromBits(xLo >>> 32).toDouble))
    // ---- i8x16
    case 0x60 => vUn(8, signed = true)(a => if (a < 0) -a else a)
    case 0x61 => vUn(8, signed = true)(a => -a)
    case 0x62 => vUn(8, signed = false)(a => java.lang.Long.bitCount(a).toLong)
    case 0x63 => vAllTrue(8)
    case 0x64 => vBitmask(8)
    case 0x65 => vNarrow(16, signedRange = true)
    case 0x66 => vNarrow(16, signedRange = false)
    case 0x67 => vUnF32(v => math.ceil(v.toDouble).toFloat)
    case 0x68 => vUnF32(v => math.floor(v.toDouble).toFloat)
    case 0x69 => vUnF32(v => (if (v < 0) math.ceil(v.toDouble) else math.floor(v.toDouble)).toFloat)
    case 0x6A => vUnF32(v => math.rint(v.toDouble).toFloat)
    case 0x6B => vShift(8, signed = false)((v, k) => v << k)
    case 0x6C => vShift(8, signed = true)((v, k) => v >> k)
    case 0x6D => vShift(8, signed = false)((v, k) => v >>> k)
    case 0x6E => vBin(8, signed = false)((a, b) => a + b)
    case 0x6F => vBin(8, signed = true)((a, b) => satLane(a + b, 8, signed = true))
    case 0x70 => vBin(8, signed = false)((a, b) => satLane(a + b, 8, signed = false))
    case 0x71 => vBin(8, signed = false)((a, b) => a - b)
    case 0x72 => vBin(8, signed = true)((a, b) => satLane(a - b, 8, signed = true))
    case 0x73 => vBin(8, signed = false)((a, b) => satLane(a - b, 8, signed = false))
    case 0x74 => vUnF64(math.ceil)
    case 0x75 => vUnF64(math.floor)
    case 0x76 => vBin(8, signed = true)(math.min)
    case 0x77 => vBin(8, signed = false)(math.min)
    case 0x78 => vBin(8, signed = true)(math.max)
    case 0x79 => vBin(8, signed = false)(math.max)
    case 0x7A => vUnF64(v => if (v < 0) math.ceil(v) else math.floor(v))
    case 0x7B => vBin(8, signed = false)((a, b) => (a + b + 1) >>> 1)
    case 0x7C => vExtAddPairwise(8, signed = true)
    case 0x7D => vExtAddPairwise(8, signed = false)
    case 0x7E => vExtAddPairwise(16, signed = true)
    case 0x7F => vExtAddPairwise(16, signed = false)
    // ---- i16x8
    case 0x80 => vUn(16, signed = true)(a => if (a < 0) -a else a)
    case 0x81 => vUn(16, signed = true)(a => -a)
    case 0x82 => vBin(16, signed = true)((a, b) =>
      satLane((a * b + 0x4000L) >> 15, 16, signed = true)) // q15mulr_sat_s
    case 0x83 => vAllTrue(16)
    case 0x84 => vBitmask(16)
    case 0x85 => vNarrow(32, signedRange = true)
    case 0x86 => vNarrow(32, signedRange = false)
    case 0x87 => vExtend(8, high = false, signed = true)
    case 0x88 => vExtend(8, high = true, signed = true)
    case 0x89 => vExtend(8, high = false, signed = false)
    case 0x8A => vExtend(8, high = true, signed = false)
    case 0x8B => vShift(16, signed = false)((v, k) => v << k)
    case 0x8C => vShift(16, signed = true)((v, k) => v >> k)
    case 0x8D => vShift(16, signed = false)((v, k) => v >>> k)
    case 0x8E => vBin(16, signed = false)((a, b) => a + b)
    case 0x8F => vBin(16, signed = true)((a, b) => satLane(a + b, 16, signed = true))
    case 0x90 => vBin(16, signed = false)((a, b) => satLane(a + b, 16, signed = false))
    case 0x91 => vBin(16, signed = false)((a, b) => a - b)
    case 0x92 => vBin(16, signed = true)((a, b) => satLane(a - b, 16, signed = true))
    case 0x93 => vBin(16, signed = false)((a, b) => satLane(a - b, 16, signed = false))
    case 0x94 => vUnF64(math.rint)
    case 0x95 => vBin(16, signed = false)((a, b) => a * b)
    case 0x96 => vBin(16, signed = true)(math.min)
    case 0x97 => vBin(16, signed = false)(math.min)
    case 0x98 => vBin(16, signed = true)(math.max)
    case 0x99 => vBin(16, signed = false)(math.max)
    case 0x9B => vBin(16, signed = false)((a, b) => (a + b + 1) >>> 1)
    case 0x9C => vExtMul(8, high = false, signed = true)
    case 0x9D => vExtMul(8, high = true, signed = true)
    case 0x9E => vExtMul(8, high = false, signed = false)
    case 0x9F => vExtMul(8, high = true, signed = false)
    // ---- i32x4
    case 0xA0 => vUn(32, signed = true)(a => if (a < 0) -a else a)
    case 0xA1 => vUn(32, signed = true)(a => -a)
    case 0xA3 => vAllTrue(32)
    case 0xA4 => vBitmask(32)
    case 0xA7 => vExtend(16, high = false, signed = true)
    case 0xA8 => vExtend(16, high = true, signed = true)
    case 0xA9 => vExtend(16, high = false, signed = false)
    case 0xAA => vExtend(16, high = true, signed = false)
    case 0xAB => vShift(32, signed = false)((v, k) => v << k)
    case 0xAC => vShift(32, signed = true)((v, k) => v >> k)
    case 0xAD => vShift(32, signed = false)((v, k) => v >>> k)
    case 0xAE => vBin(32, signed = false)((a, b) => a + b)
    case 0xB1 => vBin(32, signed = false)((a, b) => a - b)
    case 0xB5 => vBin(32, signed = false)((a, b) => a * b)
    case 0xB6 => vBin(32, signed = true)(math.min)
    case 0xB7 => vBin(32, signed = false)(math.min)
    case 0xB8 => vBin(32, signed = true)(math.max)
    case 0xB9 => vBin(32, signed = false)(math.max)
    case 0xBA => // i32x4.dot_i16x8_s
      popV(); val bl = xLo; val bh = xHi
      popV()
      var lo = 0L; var hi = 0L; var i = 0
      while (i < 4) {
        val v = (getLane(xLo, xHi, 16, 2 * i, signed = true) *
          getLane(bl, bh, 16, 2 * i, signed = true) +
          getLane(xLo, xHi, 16, 2 * i + 1, signed = true) *
            getLane(bl, bh, 16, 2 * i + 1, signed = true)) & 0xFFFFFFFFL
        if (i < 2) lo |= v << (32 * i) else hi |= v << (32 * (i - 2))
        i += 1
      }
      pushV(lo, hi)
    case 0xBC => vExtMul(16, high = false, signed = true)
    case 0xBD => vExtMul(16, high = true, signed = true)
    case 0xBE => vExtMul(16, high = false, signed = false)
    case 0xBF => vExtMul(16, high = true, signed = false)
    // ---- i64x2 (lanes are the two halves directly)
    case 0xC0 => popV(); pushV(math.abs(xLo), math.abs(xHi))
    case 0xC1 => popV(); pushV(-xLo, -xHi)
    case 0xC3 => popV(); pushB(xLo != 0 && xHi != 0)
    case 0xC4 => popV(); push(((xLo >>> 63) | ((xHi >>> 63) << 1)))
    case 0xC7 => vExtend(32, high = false, signed = true)
    case 0xC8 => vExtend(32, high = true, signed = true)
    case 0xC9 => vExtend(32, high = false, signed = false)
    case 0xCA => vExtend(32, high = true, signed = false)
    case 0xCB => vShift(64, signed = false)((v, k) => v << k)
    case 0xCC => vShift(64, signed = true)((v, k) => v >> k)
    case 0xCD => vShift(64, signed = false)((v, k) => v >>> k)
    case 0xCE => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo + bl, xHi + bh)
    case 0xD1 => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo - bl, xHi - bh)
    case 0xD5 => popV(); val bl = xLo; val bh = xHi; popV(); pushV(xLo * bl, xHi * bh)
    case 0xD6 => popV(); val bl = xLo; val bh = xHi; popV()
      pushV(if (xLo == bl) -1L else 0L, if (xHi == bh) -1L else 0L)
    case 0xD7 => popV(); val bl = xLo; val bh = xHi; popV()
      pushV(if (xLo != bl) -1L else 0L, if (xHi != bh) -1L else 0L)
    case 0xD8 => popV(); val bl = xLo; val bh = xHi; popV()
      pushV(if (xLo < bl) -1L else 0L, if (xHi < bh) -1L else 0L)
    case 0xD9 => popV(); val bl = xLo; val bh = xHi; popV()
      pushV(if (xLo > bl) -1L else 0L, if (xHi > bh) -1L else 0L)
    case 0xDA => popV(); val bl = xLo; val bh = xHi; popV()
      pushV(if (xLo <= bl) -1L else 0L, if (xHi <= bh) -1L else 0L)
    case 0xDB => popV(); val bl = xLo; val bh = xHi; popV()
      pushV(if (xLo >= bl) -1L else 0L, if (xHi >= bh) -1L else 0L)
    case 0xDC => vExtMul(32, high = false, signed = true)
    case 0xDD => vExtMul(32, high = true, signed = true)
    case 0xDE => vExtMul(32, high = false, signed = false)
    case 0xDF => vExtMul(32, high = true, signed = false)
    // ---- f32x4
    case 0xE0 => vUnF32(math.abs)
    case 0xE1 => vUnF32(v => -v)
    case 0xE3 => vUnF32(v => math.sqrt(v.toDouble).toFloat)
    case 0xE4 => vBinF32((a, b) => a + b)
    case 0xE5 => vBinF32((a, b) => a - b)
    case 0xE6 => vBinF32((a, b) => a * b)
    case 0xE7 => vBinF32((a, b) => a / b)
    case 0xE8 => vBinF32(java.lang.Math.min) // NaN-propagating, -0 < +0
    case 0xE9 => vBinF32(java.lang.Math.max)
    case 0xEA => vBinF32((a, b) => if (b < a) b else a) // pmin
    case 0xEB => vBinF32((a, b) => if (a < b) b else a) // pmax
    // ---- f64x2
    case 0xEC => vUnF64(math.abs)
    case 0xED => vUnF64(v => -v)
    case 0xEF => vUnF64(math.sqrt)
    case 0xF0 => vBinF64((a, b) => a + b)
    case 0xF1 => vBinF64((a, b) => a - b)
    case 0xF2 => vBinF64((a, b) => a * b)
    case 0xF3 => vBinF64((a, b) => a / b)
    case 0xF4 => vBinF64(java.lang.Math.min)
    case 0xF5 => vBinF64(java.lang.Math.max)
    case 0xF6 => vBinF64((a, b) => if (b < a) b else a)
    case 0xF7 => vBinF64((a, b) => if (a < b) b else a)
    // ---- conversions
    case 0xF8 => vUn(32, signed = false)(raw => satI32(f32FromBits(raw).toDouble, unsigned = false))
    case 0xF9 => vUn(32, signed = false)(raw => satI32(f32FromBits(raw).toDouble, unsigned = true))
    case 0xFA => vUn(32, signed = true)(a => f32Bits(a.toFloat))
    case 0xFB => vUn(32, signed = false)(a => f32Bits(a.toFloat))
    case 0xFC => // i32x4.trunc_sat_f64x2_s_zero
      popV()
      pushV((satI32(dOf(xLo), unsigned = false) & 0xFFFFFFFFL) |
        ((satI32(dOf(xHi), unsigned = false) & 0xFFFFFFFFL) << 32), 0L)
    case 0xFD =>
      popV()
      pushV((satI32(dOf(xLo), unsigned = true) & 0xFFFFFFFFL) |
        ((satI32(dOf(xHi), unsigned = true) & 0xFFFFFFFFL) << 32), 0L)
    case 0xFE => // f64x2.convert_low_i32x4_s
      popV()
      pushV(dBits(signExtend(xLo & 0xFFFFFFFFL, 32).toDouble),
        dBits(signExtend(xLo >>> 32, 32).toDouble))
    case 0xFF =>
      popV()
      pushV(dBits((xLo & 0xFFFFFFFFL).toDouble), dBits((xLo >>> 32).toDouble))
    case other => throw new WasmTrap(f"unsupported SIMD subopcode 0x$other%02x")
  }
}
