#!/bin/sh
# Builds the compiler-built WASM conformance fixture (tools/wasm_conformance.rs
# — see its header) with the container's nightly rustc and checks the result
# in at src/main/resources/graft/fixture_rustc.wasm, the same committed-binary
# convention as the hand-assembled fixture_llvm_shape.wasm.
#
# wasm32-unknown-unknown needs NO wasm32 std / rust-src / crates.io access:
# the source is #![no_core]. panic=abort + opt-level=2 match what the
# reference's build helper passes to cargo (arrow-udf-runtime/src/wasm/
# build.rs:36-161: release profile).
set -eu
cd "$(dirname "$0")/.."
# -zstack-size: wasm-ld's default shadow stack is 1 MiB — these functions
# use bytes of it, and a fallible workload rebuilds one instance per
# trapping row (the pool discards trapped instances), so minimum memory is
# rebuild cost: 64 KiB stack + 64 KiB arena keeps instantiation cheap.
# -C target-feature=+simd128: lets LLVM's loop vectorizer emit real v128
# instruction selection (rs_count_eq's byte-compare loop becomes i8x16
# compares) — the compiler-chosen SIMD axis the hand-assembled fixture's
# scripted v128 bytes cannot provide.
rustc +nightly --target wasm32-unknown-unknown --crate-type cdylib \
  -C opt-level=2 -C panic=abort -C link-arg=-zstack-size=65536 \
  -C target-feature=+simd128 \
  -o src/main/resources/graft/fixture_rustc.wasm tools/wasm_conformance.rs
ls -la src/main/resources/graft/fixture_rustc.wasm
# the SIMD claim must be true of the committed binary: require v128.const
# (0xFD 0x0C) and i8x16.eq (0xFD 0x23) in the emitted code
python3 - <<'PYEOF'
b = open('src/main/resources/graft/fixture_rustc.wasm', 'rb').read()
assert b.count(b'\xfd\x0c') >= 1, 'no v128.const: LLVM did not vectorize'
assert b.count(b'\xfd\x23') >= 1, 'no i8x16.eq: LLVM did not vectorize'
print('v128 instruction selection confirmed in the binary')
PYEOF
