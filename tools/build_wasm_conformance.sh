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
rustc +nightly --target wasm32-unknown-unknown --crate-type cdylib \
  -C opt-level=2 -C panic=abort -C link-arg=-zstack-size=65536 \
  -o src/main/resources/graft/fixture_rustc.wasm tools/wasm_conformance.rs
ls -la src/main/resources/graft/fixture_rustc.wasm
