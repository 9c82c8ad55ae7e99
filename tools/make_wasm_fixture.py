#!/usr/bin/env python3
"""Hand-assembles the LLVM-shaped WASM conformance fixture.

Emits src/main/resources/graft/fixture_llvm_shape.wasm: a wasm32 module laid
out the way LLVM emits `wasm32-wasip1` cdylibs — funcref table, 2 MiB linear
memory, a mutable `__stack_pointer` global, an active data segment at offset
1024, and trailing `name` / `producers` / `target_features` custom sections —
carrying the arrow-udf export ABI (`arrowudf_<base64(sig)>` with `+/`→`$_`,
an `ARROWUDF_VERSION_3_0` marker export, bump `alloc` + `reset_heap` for the
FFI buffer ABI, packed (ptr<<32|len) string returns).

The module is deliberately NOT produced by graft's WasmBuilder: every byte
below is written against the WebAssembly 1.0 + SIMD binary spec directly, so
loading it proves the interpreter/loader against a foreign binary layout
(section order, custom-section skipping, v128 sub-opcode LEBs) rather than
against graft's own emitter conventions.

Functions:
  wasm_fx_gcd(int, int) -> int            euclid loop (rem_u)
  wasm_fx_upper(string) -> string         ASCII upcase via the alloc ABI
  wasm_fx_vadd(bigint, bigint) -> bigint  i64x2 splat/add/extract (SIMD)
  wasm_fx_hypot(double, double) -> double f64 mul/add/sqrt
  wasm_fx_fma(float,float,float) -> float f32x4 splat/mul/add/extract (SIMD)
  wasm_fx_divisors(int) -> setof int      table fn via the out-buffer ABI
  wasm_fx_spread(bigint,bigint) -> bigint max-min through an INTERNAL
                                          multi-value call (minmax returns
                                          (i64, i64) — the multi-value shape
                                          LLVM emits for small struct returns)
  fx_create/fx_acc/fx_merge/fx_finish     i64-state sum-of-squares aggregate

Deterministic: running this script always yields byte-identical output.
"""
import base64
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft",
                   "fixture_llvm_shape.wasm")

I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C


def uleb(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not (b & 0x40)) or (n == -1 and (b & 0x40)):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def vec(items):
    return uleb(len(items)) + b"".join(items)


def name(s):
    b = s.encode("utf-8")
    return uleb(len(b)) + b


def section(sid, payload):
    return bytes([sid]) + uleb(len(payload)) + payload


def functype(params, results):
    return b"\x60" + vec([bytes([p]) for p in params]) + \
        vec([bytes([r]) for r in results])


def code(local_groups, body):
    # local_groups: list of (count, valtype)
    locs = vec([uleb(c) + bytes([t]) for c, t in local_groups])
    payload = locs + body + b"\x0b"
    return uleb(len(payload)) + payload


def sym(sig):
    return "arrowudf_" + base64.b64encode(sig.encode()).decode() \
        .replace("+", "$").replace("/", "_").rstrip("=")


# opcode helpers
def local_get(i): return b"\x20" + uleb(i)
def local_set(i): return b"\x21" + uleb(i)
def global_get(i): return b"\x23" + uleb(i)
def global_set(i): return b"\x24" + uleb(i)
def i32c(v): return b"\x41" + sleb(v)
def i64c(v): return b"\x42" + sleb(v)
def call(i): return b"\x10" + uleb(i)
def simd(sub, *imm): return b"\xfd" + uleb(sub) + bytes(imm)


HEAP_BASE = 1049600  # 1 MiB stack region + 1 KiB data, LLVM-style layout

types = [
    functype([I32], [I32]),            # 0 alloc
    functype([], []),                  # 1 reset_heap
    functype([I32, I32], [I32]),       # 2 gcd
    functype([I32, I32], [I64]),       # 3 upper (ptr, len) -> packed
    functype([I64, I64], [I64]),       # 4 vadd / fx_merge / fx_spread
    functype([], [I64]),               # 5 fx_create / version
    functype([I64, I32], [I64]),       # 6 fx_acc
    functype([I64], [I64]),            # 7 fx_finish
    functype([F64, F64], [F64]),       # 8 hypot
    functype([F32, F32, F32], [F32]),  # 9 fma
    functype([I32, I32, I32], [I64]),  # 10 divisors (n, outPtr, outCap)
    functype([I64, I64], [I64, I64]),  # 11 minmax — MULTI-VALUE result
]
# function index -> type index (defined functions only; no imports)
func_types = [0, 1, 2, 3, 4, 5, 6, 4, 7, 5, 8, 9, 10, 11, 4]
(F_ALLOC, F_RESET, F_GCD, F_UPPER, F_VADD, F_CREATE, F_ACC, F_MERGE,
 F_FINISH, F_VERSION, F_HYPOT, F_FMA, F_DIVISORS, F_MINMAX,
 F_SPREAD) = range(15)

# ---- bodies --------------------------------------------------------------

# alloc(n): ptr = heap; heap += (n + 7) & ~7; return ptr
alloc_body = (
    global_get(1) + local_set(1) +
    global_get(1) + local_get(0) + i32c(7) + b"\x6a" + i32c(-8) + b"\x71" +
    b"\x6a" + global_set(1) +
    local_get(1)
)

reset_body = i32c(HEAP_BASE) + global_set(1)

# gcd(a, b): while b != 0 { t = a % b; a = b; b = t }; a
gcd_body = (
    b"\x02\x40" +                      # block
    b"\x03\x40" +                      # loop
    local_get(1) + b"\x45" +           # b == 0 ?
    b"\x0d" + uleb(1) +                # br_if block
    local_get(0) + local_get(1) + b"\x70" +  # a rem_u b
    local_get(1) + local_set(0) +      # a = b
    local_set(1) +                     # b = t
    b"\x0c" + uleb(0) +                # br loop
    b"\x0b\x0b" +
    local_get(0)
)

# upper(ptr, len): out = alloc(len); bytes 'a'..'z' -= 32; pack (out<<32|len)
upper_body = (
    local_get(1) + call(F_ALLOC) + local_set(2) +
    b"\x02\x40" + b"\x03\x40" +
    local_get(3) + local_get(1) + b"\x4f" +      # i >= len ?
    b"\x0d" + uleb(1) +
    local_get(0) + local_get(3) + b"\x6a" +
    b"\x2d\x00\x00" + local_set(4) +             # c = load8_u(ptr+i)
    local_get(4) + i32c(97) + b"\x4f" +          # c >= 'a'
    local_get(4) + i32c(122) + b"\x4d" +         # c <= 'z'
    b"\x71" +                                    # and
    b"\x04\x40" +                                # if
    local_get(4) + i32c(32) + b"\x6b" + local_set(4) +
    b"\x0b" +
    local_get(2) + local_get(3) + b"\x6a" +
    local_get(4) + b"\x3a\x00\x00" +             # store8(out+i, c)
    local_get(3) + i32c(1) + b"\x6a" + local_set(3) +
    b"\x0c" + uleb(0) +
    b"\x0b\x0b" +
    local_get(2) + b"\xad" + i64c(32) + b"\x86" +  # out as i64 << 32
    local_get(1) + b"\xad" + b"\x84"               # | len
)

# vadd(a, b) via v128: extract_lane0(i64x2.add(splat(a), splat(b)))
vadd_body = (
    local_get(0) + simd(0x12) +        # i64x2.splat
    local_get(1) + simd(0x12) +
    simd(0xCE) +                       # i64x2.add (2-byte LEB sub-opcode)
    simd(0x1D, 0)                      # i64x2.extract_lane 0
)

# hypot(a, b) = f64.sqrt(a*a + b*b)
hypot_body = (
    local_get(0) + local_get(0) + b"\xa2" +      # a * a
    local_get(1) + local_get(1) + b"\xa2" +      # b * b
    b"\xa0" +                                    # +
    b"\x9f"                                      # f64.sqrt
)

# fma(a, b, c) = extract_lane0(f32x4.add(f32x4.mul(splat a, splat b), splat c))
fma_body = (
    local_get(0) + simd(0x13) +        # f32x4.splat
    local_get(1) + simd(0x13) +
    simd(0xE6) +                       # f32x4.mul
    local_get(2) + simd(0x13) +
    simd(0xE4) +                       # f32x4.add
    simd(0x1F, 0)                      # f32x4.extract_lane 0
)

# divisors(n, outPtr, outCap): table fn — write each d | n as an i64 slot
# while cnt < cap, always count; return the TOTAL so the host can re-call
# with a larger buffer (the out-buffer ABI's overflow handshake)
divisors_body = (
    i32c(1) + local_set(3) +                           # d = 1
    b"\x02\x40" + b"\x03\x40" +                        # block loop
    local_get(3) + local_get(0) + b"\x4a" +            # d > n ?
    b"\x0d" + uleb(1) +                                # br_if block
    local_get(0) + local_get(3) + b"\x70" + b"\x45" +  # (n rem_u d) == 0 ?
    b"\x04\x40" +                                      # if
    local_get(4) + local_get(2) + b"\x48" +            #   cnt < cap ?
    b"\x04\x40" +                                      #   if
    local_get(1) + local_get(4) + i32c(8) + b"\x6c" + b"\x6a" +  # outPtr+cnt*8
    local_get(3) + b"\xad" +                           #     d as i64
    b"\x37\x03\x00" +                                  #     i64.store align=8
    b"\x0b" +
    local_get(4) + i32c(1) + b"\x6a" + local_set(4) +  #   cnt++
    b"\x0b" +
    local_get(3) + i32c(1) + b"\x6a" + local_set(3) +  # d++
    b"\x0c" + uleb(0) +                                # br loop
    b"\x0b\x0b" +
    local_get(4) + b"\xad"                             # total as i64
)

# minmax(a, b) -> (min, max): a MULTI-VALUE functype — internal only (the
# export ABI is single-value); proves the interpreter handles multi-result
# calls from a foreign emitter
minmax_body = (
    local_get(0) + local_get(1) +
    local_get(0) + local_get(1) + b"\x53" + b"\x1b" +  # select(a, b, a<b) = min
    local_get(0) + local_get(1) +
    local_get(0) + local_get(1) + b"\x55" + b"\x1b"    # select(a, b, a>=b) = max
)

# spread(a, b) = max - min, consuming BOTH results of the multi-value call
spread_body = (
    local_get(0) + local_get(1) + call(F_MINMAX) +
    local_set(2) +                                     # max (top)
    local_set(3) +                                     # min
    local_get(2) + local_get(3) + b"\x7d"              # max - min
)

create_body = i64c(0)
acc_body = (local_get(0) +
            local_get(1) + b"\xac" + local_get(1) + b"\xac" + b"\x7e" +
            b"\x7c")
merge_body = local_get(0) + local_get(1) + b"\x7c"
finish_body = local_get(0)
version_body = i64c(3)

codes = [
    code([(1, I32)], alloc_body),
    code([], reset_body),
    code([], gcd_body),
    code([(3, I32)], upper_body),
    code([], vadd_body),
    code([], create_body),
    code([], acc_body),
    code([], merge_body),
    code([], finish_body),
    code([], version_body),
    code([], hypot_body),
    code([], fma_body),
    code([(2, I32)], divisors_body),
    code([], minmax_body),
    code([(2, I64)], spread_body),
]

# ---- sections ------------------------------------------------------------

SIG_GCD = "wasm_fx_gcd(int, int) -> int"
SIG_UPPER = "wasm_fx_upper(string) -> string"
SIG_VADD = "wasm_fx_vadd(bigint, bigint) -> bigint"
SIG_HYPOT = "wasm_fx_hypot(double, double) -> double"
SIG_FMA = "wasm_fx_fma(float, float, float) -> float"
SIG_DIVISORS = "wasm_fx_divisors(int) -> setof int"
SIG_SPREAD = "wasm_fx_spread(bigint, bigint) -> bigint"

exports = [
    ("memory", 2, 0),
    ("alloc", 0, F_ALLOC),
    ("reset_heap", 0, F_RESET),
    (sym(SIG_GCD), 0, F_GCD),
    (sym(SIG_UPPER), 0, F_UPPER),
    (sym(SIG_VADD), 0, F_VADD),
    (sym(SIG_HYPOT), 0, F_HYPOT),
    (sym(SIG_FMA), 0, F_FMA),
    (sym(SIG_DIVISORS), 0, F_DIVISORS),
    (sym(SIG_SPREAD), 0, F_SPREAD),
    ("fx_create", 0, F_CREATE),
    ("fx_acc", 0, F_ACC),
    ("fx_merge", 0, F_MERGE),
    ("fx_finish", 0, F_FINISH),
    ("ARROWUDF_VERSION_3_0", 0, F_VERSION),
]

fn_names = ["alloc", "reset_heap", "fx_gcd_impl", "fx_upper_impl",
            "fx_vadd_impl", "fx_create", "fx_acc", "fx_merge", "fx_finish",
            "abi_version", "fx_hypot_impl", "fx_fma_impl",
            "fx_divisors_impl", "fx_minmax_impl", "fx_spread_impl"]
name_payload = name("name") + b"\x01" + (lambda p: uleb(len(p)) + p)(
    vec([uleb(i) + name(n) for i, n in enumerate(fn_names)]))

producers_payload = name("producers") + vec([
    name("processed-by") + vec([name("graft-fixture-assembler") + name("1.0")]),
])

features_payload = name("target_features") + vec([
    b"\x2b" + name("simd128"),
    b"\x2b" + name("bulk-memory"),
])

module = b"\x00asm\x01\x00\x00\x00"
module += section(1, vec(types))
module += section(3, vec([uleb(t) for t in func_types]))
module += section(4, vec([b"\x70\x00" + uleb(1)]))          # funcref table
module += section(5, vec([b"\x00" + uleb(32)]))             # 32 pages = 2 MiB
module += section(6, vec([
    bytes([I32, 0x01]) + i32c(1048576) + b"\x0b",           # __stack_pointer
    bytes([I32, 0x01]) + i32c(HEAP_BASE) + b"\x0b",         # bump heap ptr
]))
module += section(7, vec([name(n) + bytes([k]) + uleb(i)
                          for n, k, i in exports]))
module += section(10, vec(codes))
data_bytes = b"graft wasm conformance fixture v2\x00"
module += section(11, vec([b"\x00" + i32c(1024) + b"\x0b" +
                           uleb(len(data_bytes)) + data_bytes]))
module += section(0, name_payload)
module += section(0, producers_payload)
module += section(0, features_payload)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "wb") as f:
    f.write(module)
print(f"wrote {OUT}: {len(module)} bytes")
print("exports:", [e[0] for e in exports])
