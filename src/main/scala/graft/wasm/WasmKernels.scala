package graft.wasm

import Asm._

/**
 * The built-in WASM guest module — graft's analogue of the reference's
 * example wasm crate (`arrow-udf-example`, compiled by `wasm/build.rs` and
 * exercised in `tests/wasm.rs`): gcd, fallible div, fib, popcount and a
 * float kernel, authored with the [[Asm]] DSL, exported under the
 * reference's `arrowudf_<base64(sig)>` convention and discovered by
 * [[WasmUdf.load]].
 *
 * Also carries the two sandbox probes the reference tests containment with
 * (`tests/wasm.rs:33-69`): an infinite loop (fuel trap) and a memory bomb
 * (grow-to-limit, then fail).
 */
object WasmKernels {

  /** Build the module bytes. Deterministic — same bytes on driver and executors. */
  lazy val moduleBytes: Array[Byte] = {
    val b = new WasmBuilder
    b.memory(1, Some(256)) // one page is plenty; max 16 MiB

    // wasm_gcd(a: i64, b: i64) -> i64 — Euclid, a loop with locals.
    val gcd = b.func(Seq(i64, i64), Seq(i64), Seq.empty, concat(
      block(concat(
        loop(concat(
          localGet(1), i64Eqz, brIf(1),        // while b != 0
          localGet(0), localGet(1), i64RemU,   // t = a % b  (unsigned: inputs are non-neg keys)
          localGet(1), localSet(0),            // a = b
          localSet(1),                         // b = t
          br(0)))
      )),
      localGet(0)),
      exportAs = Some(WasmUdf.exportName("wasm_gcd(bigint,bigint) -> bigint")))

    // wasm_div(a: i64, b: i64) -> i64 — traps on b == 0 (error-column demo,
    // the reference's `div` example).
    b.func(Seq(i64, i64), Seq(i64), Seq.empty, concat(
      localGet(0), localGet(1), i64DivS),
      exportAs = Some(WasmUdf.exportName("wasm_div(bigint,bigint) -> bigint")))

    // wasm_popcnt(x: i64) -> i64
    b.func(Seq(i64), Seq(i64), Seq.empty, concat(
      localGet(0), i64Popcnt),
      exportAs = Some(WasmUdf.exportName("wasm_popcnt(bigint) -> bigint")))

    // wasm_fib(n: i64) -> i64 — recursion through `call` (self-index = 3).
    val fibIdx = b.func(Seq(i64), Seq(i64), Seq.empty, concat(
      localGet(0), i64Const(2), i64LtS,
      ifElse(i64,
        concat(localGet(0)),
        concat(
          localGet(0), i64Const(1), i64Sub, call(3),
          localGet(0), i64Const(2), i64Sub, call(3),
          i64Add))),
      exportAs = Some(WasmUdf.exportName("wasm_fib(bigint) -> bigint")))
    require(fibIdx == 3, s"fib self-call index drifted: $fibIdx")

    // wasm_hyp(x: f64, y: f64) -> f64 = sqrt(x*x + y*y) — float kernel.
    b.func(Seq(f64, f64), Seq(f64), Seq.empty, concat(
      localGet(0), localGet(0), f64Mul,
      localGet(1), localGet(1), f64Mul,
      f64Add, f64Sqrt),
      exportAs = Some(WasmUdf.exportName("wasm_hyp(double,double) -> double")))

    // wasm_count_byte(s: string, b: i32) -> i64 — string param via the FFI
    // alloc ABI: the host calls the exported bump `alloc`, copies UTF-8
    // bytes into guest memory, and passes (ptr, len). The kernel scans
    // linear memory counting occurrences of byte b.
    b.func(Seq(i32, i32, i32), Seq(i64), Seq(i32, i64), concat(
      block(
        loop(concat(
          localGet(3), localGet(1), i32GeS, brIf(1),      // while i < len
          localGet(0), localGet(3), i32Add, i32Load8U(),  // mem[ptr+i]
          localGet(2), i32Eq, i64ExtendI32U,
          localGet(4), i64Add, localSet(4),               // acc += (== b)
          localGet(3), i32Const(1), i32Add, localSet(3),  // i += 1
          br(0)))),
      localGet(4)),
      exportAs = Some(WasmUdf.exportName("wasm_count_byte(string,int) -> bigint")))

    // wasm_count_simd(s: string, b: i32) -> i64 — the SAME scan vectorized
    // with v128: 16 bytes per iteration through i8x16.eq against a splat of
    // the target, bitmask + popcnt folding the lane mask into a count, plus
    // a scalar tail. ~14× fewer interpreter dispatches per byte than the
    // scalar kernel — the SIMD tier's value inside an interpreter is fewer
    // instruction activations, exactly like hardware SIMD's is fewer µops.
    // Callers pass target bytes in [0, 255] (same contract as count_byte).
    b.func(Seq(i32, i32, i32), Seq(i64), Seq(i32, i64, v128), concat(
      localGet(2), i8x16Splat, localSet(5),             // tv = splat(target)
      block(
        loop(concat(
          localGet(3), i32Const(16), i32Add, localGet(1), i32GtS, brIf(1), // while i+16 <= len
          localGet(0), localGet(3), i32Add, v128Load(), // 16 bytes at ptr+i
          localGet(5), i8x16Eq, i8x16Bitmask, i32Popcnt,
          i64ExtendI32U, localGet(4), i64Add, localSet(4),
          localGet(3), i32Const(16), i32Add, localSet(3),
          br(0)))),
      block(                                            // scalar tail
        loop(concat(
          localGet(3), localGet(1), i32GeS, brIf(1),
          localGet(0), localGet(3), i32Add, i32Load8U(),
          localGet(2), i32Eq, i64ExtendI32U,
          localGet(4), i64Add, localSet(4),
          localGet(3), i32Const(1), i32Add, localSet(3),
          br(0)))),
      localGet(4)),
      exportAs = Some(WasmUdf.exportName("wasm_count_simd(string,int) -> bigint")))

    // wasm_divisors(n) ->> bigint — table function: writes the divisors of n
    // (ascending) into the host-allocated out-buffer, returns the total
    // count (host re-calls with a larger buffer on overflow). Params:
    // (n: i64, outPtr: i32, outCap: i32 entries) -> i64.
    b.func(Seq(i64, i32, i32), Seq(i64), Seq(i64, i32), concat(
      i64Const(1), localSet(3),                          // i = 1
      block(
        loop(concat(
          localGet(3), localGet(0), i64GtS, brIf(1),     // while i <= n
          localGet(0), localGet(3), i64RemS, i64Eqz,
          ifVoid(concat(                                 // n % i == 0:
            localGet(4), localGet(2), i32LtS,
            ifVoid(concat(                               //   cnt < cap → store
              localGet(1), localGet(4), i32Const(8), i32Mul, i32Add,
              localGet(3), i64Store())),
            localGet(4), i32Const(1), i32Add, localSet(4))), // cnt += 1
          localGet(3), i64Const(1), i64Add, localSet(3), // i += 1
          br(0)))),
      localGet(4), i64ExtendI32S),
      exportAs = Some(WasmUdf.exportName("wasm_divisors(bigint) ->> bigint")))

    // FFI allocator surface for string/binary arguments and table-function
    // out-buffers (after the fixed-index functions so wasm_fib's self-call
    // index stays stable)
    val allocIdx = b.addBumpAllocator(heapBase = 1024)

    // wasm_substring(s, start, len) -> string — a STRING-RETURNING kernel
    // (the reference's substring shape, `arrow-udf/tests/tests.rs:121-140`):
    // the result leaves the guest as a packed (ptr << 32 | len) i64 pointing
    // into linear memory — here zero-copy into the argument buffer itself,
    // valid until the host's next reset_heap. Byte-indexed with clamping.
    // Params: (ptr: i32, slen: i32, start: i32, len: i32) -> i64 packed.
    b.func(Seq(i32, i32, i32, i32), Seq(i64), Seq(i32, i32), concat(
      // cs = min(max(start, 0), slen)
      localGet(2), i32Const(0),
      localGet(2), i32Const(0), i32GtS, select,
      localSet(4),
      localGet(4), localGet(1),
      localGet(4), localGet(1), i32LtS, select,
      localSet(4),
      // cl = min(max(len, 0), slen - cs)
      localGet(3), i32Const(0),
      localGet(3), i32Const(0), i32GtS, select,
      localSet(5),
      localGet(5), localGet(1), localGet(4), i32Sub,
      localGet(5), localGet(1), localGet(4), i32Sub, i32LtS, select,
      localSet(5),
      // packed = ((ptr + cs) zext << 32) | (cl zext)
      localGet(0), localGet(4), i32Add, i64ExtendI32U, i64Const(32), i64Shl,
      localGet(5), i64ExtendI32U, i64Or),
      exportAs = Some(WasmUdf.exportName("wasm_substring(string,int,int) -> string")))

    // Weighted-average aggregate with BLOB state (two i64 accumulators:
    // sum(v*w) at offset 0, sum(w) at offset 8 — 16 bytes, integer-exact;
    // bound by WasmUdf.loadAggregateBlob). Phases take/return the state as
    // (ptr, len) / packed i64 through the alloc ABI.
    def packed16(ptrLocal: Int) = concat(
      localGet(ptrLocal), i64ExtendI32U, i64Const(32), i64Shl, i64Const(16L), i64Or)
    // wavg_create() -> packed: alloc(16), zero both slots
    b.func(Seq.empty, Seq(i64), Seq(i32), concat(
      i32Const(16), call(allocIdx), localSet(0),
      localGet(0), i64Const(0L), i64Store(),
      localGet(0), i64Const(0L), i64Store(8),
      packed16(0)), exportAs = Some("wavg_create"))
    // wavg_acc(sp, slen, v, w) -> packed: state += (v*w, w), in place
    b.func(Seq(i32, i32, i64, i64), Seq(i64), Seq.empty, concat(
      localGet(0), localGet(0), i64Load(),
      localGet(2), localGet(3), i64Mul, i64Add, i64Store(),
      localGet(0), localGet(0), i64Load(8),
      localGet(3), i64Add, i64Store(8),
      packed16(0)), exportAs = Some("wavg_acc"))
    // wavg_retract(sp, slen, v, w) -> packed: the inverse
    b.func(Seq(i32, i32, i64, i64), Seq(i64), Seq.empty, concat(
      localGet(0), localGet(0), i64Load(),
      localGet(2), localGet(3), i64Mul, i64Sub, i64Store(),
      localGet(0), localGet(0), i64Load(8),
      localGet(3), i64Sub, i64Store(8),
      packed16(0)), exportAs = Some("wavg_retract"))
    // wavg_merge(ap, alen, bp, blen) -> packed: a += b, return a
    b.func(Seq(i32, i32, i32, i32), Seq(i64), Seq.empty, concat(
      localGet(0), localGet(0), i64Load(),
      localGet(2), i64Load(), i64Add, i64Store(),
      localGet(0), localGet(0), i64Load(8),
      localGet(2), i64Load(8), i64Add, i64Store(8),
      packed16(0)), exportAs = Some("wavg_merge"))
    // wavg_finish(sp, slen) -> f64 = sum_vw / sum_w
    b.func(Seq(i32, i32), Seq(f64), Seq.empty, concat(
      localGet(0), i64Load(), f64ConvertI64S,
      localGet(0), i64Load(8), f64ConvertI64S,
      f64Div), exportAs = Some("wavg_finish"))

    // Five-phase aggregate, every phase a guest function (plain-named
    // exports, bound by WasmUdf.loadAggregate): retractable i64 sum.
    b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(0L),
      exportAs = Some("sumagg_create"))
    b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Add), exportAs = Some("sumagg_acc"))
    b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Sub), exportAs = Some("sumagg_retract"))
    b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Add), exportAs = Some("sumagg_merge"))
    b.func(Seq(i64), Seq(i64), Seq.empty, localGet(0),
      exportAs = Some("sumagg_finish"))

    // Sandbox probes (reference `arrow-udf-example/src/lib.rs:33-52`:
    // segfault/oom/sleep): not registered as Spark functions — the spec
    // drives them directly.
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      loop(br(0)), i64Const(0)),
      exportAs = Some("probe_spin")) // infinite loop → fuel trap
    b.func(Seq.empty, Seq(i64), Seq.empty, concat(
      block(concat(
        loop(concat(
          i32Const(1), memoryGrow,             // grow one 64 KiB page at a time
          i32Const(0), i32LtS,
          brIf(1),                             // grow returned -1: cap reached → exit
          br(0)))
      )),
      memorySize, i64ExtendI32U),
      exportAs = Some("probe_oom")) // grows until the configured cap, then stops

    // Table-dispatched operator select — the compiled function-pointer /
    // trait-object shape (kernels compiled from Rust dispatch through the
    // funcref table the same way): a PASSIVE element segment seeds the table
    // via table.init in the START function (LLVM's __wasm_call_ctors shape),
    // and wasm_sel picks add/sub/mul by index through call_indirect.
    val selTy = b.typeIdx(Seq(i64, i64), Seq(i64))
    val addF = b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Add))
    val subF = b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Sub))
    val mulF = b.func(Seq(i64, i64), Seq(i64), Seq.empty,
      concat(localGet(0), localGet(1), i64Mul))
    b.table(3, Some(3))
    val opsSeg = b.elemPassive(Seq(addF, subF, mulF))
    val ctor = b.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(0), i32Const(0), i32Const(3), tableInit(opsSeg)))
    b.start(ctor)
    b.func(Seq(i64, i64, i64), Seq(i64), Seq.empty, concat(
      localGet(1), localGet(2),
      localGet(0), i64Const(3), i64RemU, i32WrapI64,
      callIndirect(selTy)),
      exportAs = Some(WasmUdf.exportName("wasm_sel(bigint,bigint,bigint) -> bigint")))

    // a module-level constant through a global, exercised by the spec
    b.global(i64, mutable = false, i64Const(42L), exportAs = Some("answer"))

    // ABI version marker (reference `wasm/mod.rs:107-114`)
    b.func(Seq.empty, Seq(i64), Seq.empty, i64Const(3L), exportAs = Some(WasmUdf.VersionExport))

    b.build()
  }

  /** Register every exported wasm function into the global registry.
    * `wasm_div` is fallible: a divide-by-zero trap becomes an error-column
    * entry, not a task failure. */
  def registerAll(): Unit = {
    WasmUdf.load(moduleBytes, fallible = Set("wasm_div"))
    // retractable sum with all five phases in the guest
    WasmUdf.loadAggregate(moduleBytes, "wasm_sum(bigint) -> bigint",
      createFn = "sumagg_create", accFn = "sumagg_acc",
      retractFn = Some("sumagg_retract"), mergeFn = "sumagg_merge",
      finishFn = "sumagg_finish")
    // blob-state weighted average: two accumulators through the alloc ABI
    WasmUdf.loadAggregateBlob(moduleBytes, "wasm_wavg(int,bigint) -> double",
      createFn = "wavg_create", accFn = "wavg_acc",
      retractFn = Some("wavg_retract"), mergeFn = "wavg_merge",
      finishFn = "wavg_finish")
    ()
  }
}
