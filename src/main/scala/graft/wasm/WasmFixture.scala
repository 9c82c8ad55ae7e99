package graft.wasm

/**
 * Foreign-binary conformance fixture: a checked-in `.wasm` module that was
 * NOT produced by [[WasmBuilder]] — it is hand-assembled against the
 * WebAssembly 1.0 + SIMD binary spec (`tools/make_wasm_fixture.py`,
 * deterministic, byte-identical on every run) in the layout LLVM emits for
 * `wasm32-wasip1` cdylibs: funcref table, 2 MiB memory, a mutable
 * `__stack_pointer`-style global, an active data segment at offset 1024,
 * and trailing `name`/`producers`/`target_features` custom sections.
 *
 * Loading it drives [[WasmUdf.load]]/[[WasmInterp]] against a binary whose
 * section order, custom sections, and v128 sub-opcode LEB encodings come
 * from a foreign emitter — the conformance axis the WasmBuilder-built
 * kernels cannot cover (reference ABI shape: `arrow-udf/wasm/build.rs` +
 * `arrow-udf-runtime/src/wasm/mod.rs:107-125` export discovery).
 *
 * Carries the full export ABI: `arrowudf_<b64>` scalars (plain ints, a
 * string→string through the alloc FFI with a packed (ptr<<32|len) return,
 * i64x2 and f32x4 SIMD kernels, f64 math, and a bigint spread that consumes
 * an INTERNAL multi-value `(i64, i64)` call — the shape LLVM emits for small
 * struct returns), a `setof` TABLE function through the out-buffer ABI, an
 * i64-state aggregate, `ARROWUDF_VERSION_3_0`, `alloc` + `reset_heap`.
 */
object WasmFixture {

  lazy val bytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixture_llvm_shape.wasm")
    require(in != null, "fixture_llvm_shape.wasm missing from resources")
    try in.readAllBytes() finally in.close()
  }

  /** COMPILER-built conformance fixture: real rustc/LLVM output for
    * wasm32-unknown-unknown (`tools/wasm_conformance.rs`, a `#![no_core]`
    * crate — the container ships no wasm32 std/rust-src/crates.io, but the
    * nightly compiler's own LLVM backend needs none of them; built by
    * `tools/build_wasm_conformance.sh`, committed like the hand-assembled
    * fixture). Register allocation, block layout, and instruction selection
    * here are LLVM's — the conformance axis neither graft's WasmBuilder nor
    * the hand-written byte script can provide, closing the "compiler-built
    * binary" gap against the reference's cargo-built guests
    * (`arrow-udf-runtime/src/wasm/build.rs:36-161`). */
  lazy val rustcBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixture_rustc.wasm")
    require(in != null, "fixture_rustc.wasm missing from resources")
    try in.readAllBytes() finally in.close()
  }

  /** Registers wasm_fx_gcd / wasm_fx_upper / wasm_fx_vadd (discovered from
    * the binary's own exports) and the wasm_fx_sumsq aggregate, plus the
    * rustc-built wasm_rs_* family and its wasm_rs_sumsq aggregate. */
  def registerAll(): Unit = {
    WasmUdf.load(bytes)
    WasmUdf.loadAggregate(bytes, "wasm_fx_sumsq(int) -> bigint",
      createFn = "fx_create", accFn = "fx_acc", retractFn = None,
      mergeFn = "fx_merge", finishFn = "fx_finish")
    // wasm_rs_div is FALLIBLE: LLVM's zero-divisor guard calls the crate's
    // trap shim (an immediate OOB store), which the error column surfaces
    // as "out of bounds memory access" — the compiled-guest analogue of a
    // Rust panic-as-trap in the reference's wasmtime runtime
    WasmUdf.load(rustcBytes, fallible = Set("wasm_rs_div"))
    WasmUdf.loadAggregate(rustcBytes, "wasm_rs_sumsq(int) -> bigint",
      createFn = "rs_create", accFn = "rs_acc", retractFn = None,
      mergeFn = "rs_merge", finishFn = "rs_finish")
    ()
  }
}
