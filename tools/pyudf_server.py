#!/usr/bin/env python3
"""CPython guest UDF worker for the graft engine.

Speaks the same wire protocol as the JVM `UdfServer`
(src/main/scala/graft/remote/RemoteUdf.scala): each request is a UTF-8
command line — `VERSION` / `LIST` / `GET <f>` / `CALL <f>` / `CALLTABLE <f>`
— where the CALL forms are followed by one complete Arrow IPC stream of
argument batches.  The response is a status line (`OK` / `ERR msg`) followed
by, for LIST/GET, signature text lines ending in a blank line, or, for the
CALL forms, an Arrow IPC stream of results (one result batch per input
batch, streamed as they are evaluated).

User functions are declared with the `@udf` decorator using graft's
signature grammar, mirroring the reference's Python UDF server surface
(arrow-udf-remote/python/README.md:14-56 — `@udf(input_types=..,
result_type=..)` / `@udtf`):

    @udf("gcd(int, int) -> int")
    def gcd(a, b): ...

    @udf("py_series(int) ->> int")     # table function: yields rows
    def py_series(n):
        yield from range(n)

Null handling is ReturnNullOnNullInput (any NULL argument row yields NULL /
no table rows), matching the JVM server.  A per-row exception yields NULL
for that row — the guest must never kill the exchange.

Usage:
    python3 tools/pyudf_server.py --port 0 [--load extra_funcs.py]
Prints `PORT <bound-port>` on stdout once listening.
"""

import argparse
import math
import pickle
import socket
import struct
import sys
import threading

import pyarrow as pa

PROTOCOL_VERSION = 4  # lockstep with RemoteProtocol.Version (one deployable unit)
# v4: ERR lines may be structured JSON objects; guest deadlines (JS worker)
EXT_KEY = b"ARROW:extension:name"

# ---------------------------------------------------------------------------
# Signature grammar (mirrors graft.sig.Signature / graft.types.GraftType)
# ---------------------------------------------------------------------------

_ALIASES = {
    "bool": "boolean",
    "tinyint": "int8", "int1": "int8",
    "smallint": "int16", "int2": "int16",
    "int": "int32", "int4": "int32", "integer": "int32",
    "bigint": "int64", "long": "int64",
    "real": "float32", "float": "float32", "float4": "float32",
    "double": "float64", "float8": "float64",
    "date": "date32",
    "datetime": "timestamp",
    "jsonb": "json",
    "varchar": "string", "text": "string",
    "bytea": "binary", "bytes": "binary",
}

_PRIMITIVES = {
    "boolean": pa.bool_(),
    "int8": pa.int8(), "int16": pa.int16(),
    "int32": pa.int32(), "int64": pa.int64(),
    "float32": pa.float32(), "float64": pa.float64(),
    "string": pa.utf8(), "binary": pa.binary(),
    "date32": pa.date32(), "timestamp": pa.timestamp("us"),
}

# grammar names carried as extension metadata on a storage type
_EXTENSIONS = {"json": pa.utf8()}


def _normalize(name):
    n = name.strip().lower()
    return _ALIASES.get(n, n)


def parse_type(raw):
    """Parse one grammar type name -> (pa.DataType, extension-name-or-None)."""
    n = _normalize(raw)
    if n.endswith("[]"):
        inner, _ = parse_type(n[:-2])
        return pa.list_(inner), None
    if n.startswith("struct<") and n.endswith(">"):
        fields = []
        for part in _split_top(n[len("struct<"):-1]):
            fname, _, ftype = part.strip().partition(" ")
            dt, ext = parse_type(ftype)
            fields.append(_field(fname.strip(), dt, ext))
        return pa.struct(fields), None
    if n.startswith("decimal(") and n.endswith(")"):
        p, _, s = n[len("decimal("):-1].partition(",")
        return pa.decimal128(int(p), int(s)), None
    if n in _EXTENSIONS:
        return _EXTENSIONS[n], n
    if n in _PRIMITIVES:
        return _PRIMITIVES[n], None
    raise ValueError("pyudf: unsupported type '%s'" % raw)


def _split_top(s):
    out, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "<(":
            depth += 1
        elif c in ">)":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p for p in out if p.strip()]


def _field(name, dt, ext):
    md = {EXT_KEY: ext.encode()} if ext else None
    return pa.field(name, dt, nullable=True, metadata=md)


class Sig:
    def __init__(self, text):
        if "->>" in text:
            head, ret = text.split("->>", 1)
            self.is_table = True
        else:
            head, ret = text.split("->", 1)
            ret = ret.strip()
            self.is_table = ret.lower().startswith("setof ")
            if self.is_table:
                ret = ret[len("setof "):]
        open_i, close_i = head.index("("), head.rindex(")")
        self.name = head[:open_i].strip().lower()
        self.arg_names = [_normalize(a) for a in _split_top(head[open_i + 1:close_i])]
        self.ret_name = _normalize(ret.strip())
        self.ret_type, self.ret_ext = parse_type(self.ret_name)

    def render(self):
        arrow = "->>" if self.is_table else "->"
        return "%s(%s) %s %s" % (self.name, ",".join(self.arg_names), arrow, self.ret_name)


# ---------------------------------------------------------------------------
# Registry + @udf decorator
# ---------------------------------------------------------------------------

REGISTRY = {}  # name -> [(Sig, fn)]
AGG_REGISTRY = {}  # name -> (Sig, instance with create_state/accumulate/..)


def udf(signature):
    sig = Sig(signature)

    def deco(fn):
        REGISTRY.setdefault(sig.name, []).append((sig, fn))
        return fn

    return deco


def udaf(signature):
    """Aggregate UDF: decorate a class with create_state / accumulate /
    retract (optional) / merge / finish methods — the reference's five-phase
    Python aggregate surface (arrow-udf-runtime/src/python/mod.rs:229-309).
    State is pickled between exchanges (the arrowudf.pickle contract)."""
    sig = Sig(signature)

    def deco(cls):
        AGG_REGISTRY[sig.name] = (sig, cls())
        return cls

    return deco


def resolve(name, arity, table):
    for sig, fn in REGISTRY.get(name.lower(), []):
        if sig.is_table == table and len(sig.arg_names) == arity:
            return sig, fn
    return None


# ---------------------------------------------------------------------------
# Built-in demo functions (the worker's conformance set)
# ---------------------------------------------------------------------------

@udf("gcd(int, int) -> int")
def gcd(a, b):
    return math.gcd(a, b)


@udf("py_upper(string) -> string")
def py_upper(s):
    return s.upper()


@udf("py_div(int, int) -> int")
def py_div(a, b):
    # integer division: b == 0 raises ZeroDivisionError -> error column
    return a // b


@udf("py_weight(float8[]) -> float8")
def py_weight(xs):
    # left-fold sum — matches DuckDB list_reduce evaluation order bit-exactly
    acc = 0.0
    for x in xs:
        acc += 0.0 if x is None else x
    return acc


@udf("py_series(int) ->> int")
def py_series(n):
    yield from range(n)


@udf("py_split(string) ->> string")
def py_split(s):
    for tok in s.split():
        if tok:
            yield tok


@udaf("sum_i64(int64) -> int64")
class SumI64:
    """Reference python.rs sum aggregate, int64 so the fold is exact."""

    def create_state(self):
        return 0

    def accumulate(self, state, x):
        return state if x is None else state + x

    def retract(self, state, x):
        return state if x is None else state - x

    def merge(self, a, b):
        return a + b

    def finish(self, state):
        return state


@udaf("py_weighted_avg(int32, int32) -> float64")
class PyWeightedAvg:
    """Two-argument aggregate with struct-like tuple state (reference
    tests/python.rs:746-913 weighted_avg)."""

    def create_state(self):
        return (0, 0)  # (sum, weight)

    def accumulate(self, state, v, w):
        if v is None or w is None:
            return state
        return (state[0] + v * w, state[1] + w)

    def retract(self, state, v, w):
        if v is None or w is None:
            return state
        return (state[0] - v * w, state[1] - w)

    def merge(self, a, b):
        return (a[0] + b[0], a[1] + b[1])

    def finish(self, state):
        return float("nan") if state[1] == 0 else state[0] / state[1]


# ---------------------------------------------------------------------------
# Wire protocol
# ---------------------------------------------------------------------------

def _rows_of(batch):
    cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
    if not cols:
        return [()] * batch.num_rows
    return list(zip(*cols))


def _serve_call(fname, is_table, rf, wf, with_errors=False):
    reader = pa.ipc.open_stream(rf)
    fd = resolve(fname, len(reader.schema), is_table)
    if fd is None:
        for _ in reader:  # drain, then report (JVM server does the same)
            pass
        kind = "table function" if is_table else "scalar function"
        wf.write(b"ERR no %s %s\n" % (kind.encode(), fname.encode()))
        return
    sig, fn = fd
    wf.write(b"OK\n")
    if is_table:
        out_schema = pa.schema([
            pa.field("row", pa.int32(), nullable=True),
            _field("value", sig.ret_type, sig.ret_ext),
        ])
        writer = pa.ipc.new_stream(wf, out_schema)
        row_base = 0
        for batch in reader:
            idxs, vals = [], []
            for i, row in enumerate(_rows_of(batch)):
                if any(v is None for v in row):
                    continue
                try:
                    produced = list(fn(*row))
                except Exception:
                    continue
                idxs.extend(row_base + i for _ in produced)
                vals.extend(produced)
            writer.write_batch(pa.record_batch(
                [pa.array(idxs, type=pa.int32()), pa.array(vals, type=sig.ret_type)],
                schema=out_schema))
            row_base += batch.num_rows
    else:
        # fallible (CALLERR): value + error columns, matching the reference
        # runtime's append_error_to_schema (python/mod.rs:382-390); messages
        # are "ExcType: msg" like PyErr Display.
        fields = [_field("value", sig.ret_type, sig.ret_ext)]
        if with_errors:
            fields.append(pa.field("error", pa.string(), nullable=True))
        out_schema = pa.schema(fields)
        writer = pa.ipc.new_stream(wf, out_schema)
        for batch in reader:
            vals, errs = [], []
            for row in _rows_of(batch):
                if any(v is None for v in row):
                    vals.append(None)
                    errs.append(None)
                    continue
                try:
                    vals.append(fn(*row))
                    errs.append(None)
                except Exception as e:
                    vals.append(None)
                    errs.append("%s: %s" % (type(e).__name__, e))
            cols = [pa.array(vals, type=sig.ret_type)]
            if with_errors:
                cols.append(pa.array(errs, type=pa.string()))
            writer.write_batch(pa.record_batch(cols, schema=out_schema))
    writer.close()  # end-of-stream marker; leaves the socket open


def _write_blob(wf, b):
    wf.write(struct.pack(">i", len(b)))
    wf.write(b)


MAX_BLOB = 64 * 1024 * 1024  # framing cap: a corrupt/hostile length prefix
MAX_LINE = 1 * 1024 * 1024   # command lines are verbs + names, never data


class FramingError(Exception):
    """Malformed wire framing: answered with ERR, then the connection is
    closed (the stream position is unrecoverable past a bad length)."""


def _read_blob(rf):
    hdr = rf.read(4)
    if len(hdr) != 4:
        raise EOFError("short blob header")
    (n,) = struct.unpack(">i", hdr)
    if n < 0 or n > MAX_BLOB:
        # a negative length would turn rf.read(n) into read-to-EOF — an
        # unbounded allocation driven by 4 attacker-controlled bytes
        raise FramingError("blob length %d outside [0, %d]" % (n, MAX_BLOB))
    b = rf.read(n)
    if len(b) != n:
        raise EOFError("short blob body")
    return b


def _serve_agg(verb, fname, rf, wf):
    """Aggregate lifecycle verbs: ACCCREATE / ACC / ACCRETRACT / ACCMERGE /
    ACCFINISH — state travels as a length-prefixed pickle blob, args as one
    Arrow IPC stream (mirrors python/mod.rs create_state..finish)."""
    entry = AGG_REGISTRY.get(fname.lower())

    def err():
        wf.write(b"ERR no aggregate %s\n" % fname.encode())

    if verb == "ACCCREATE":
        if entry is None:
            return err()
        _, impl = entry
        wf.write(b"OK\n")
        _write_blob(wf, pickle.dumps(impl.create_state()))
    elif verb in ("ACC", "ACCRETRACT"):
        state_b = _read_blob(rf)
        reader = pa.ipc.open_stream(rf)
        if entry is None:
            for _ in reader:  # drain, then report
                pass
            return err()
        _, impl = entry
        state = pickle.loads(state_b)
        fn = impl.retract if verb == "ACCRETRACT" else impl.accumulate
        for batch in reader:
            for row in _rows_of(batch):
                state = fn(state, *row)
        wf.write(b"OK\n")
        _write_blob(wf, pickle.dumps(state))
    elif verb == "ACCMERGE":
        a, b = _read_blob(rf), _read_blob(rf)
        if entry is None:
            return err()
        _, impl = entry
        wf.write(b"OK\n")
        _write_blob(wf, pickle.dumps(impl.merge(pickle.loads(a), pickle.loads(b))))
    elif verb == "ACCFINISH":
        state_b = _read_blob(rf)
        if entry is None:
            return err()
        sig, impl = entry
        result = impl.finish(pickle.loads(state_b))
        wf.write(b"OK\n")
        out_schema = pa.schema([_field("value", sig.ret_type, sig.ret_ext)])
        writer = pa.ipc.new_stream(wf, out_schema)
        writer.write_batch(pa.record_batch(
            [pa.array([result], type=sig.ret_type)], schema=out_schema))
        writer.close()
    else:
        wf.write(b"ERR bad agg verb %s\n" % verb.encode())


def _serve_conn(sock):
    rf = sock.makefile("rb")
    wf = sock.makefile("wb")
    try:
        while True:
            line = rf.readline(MAX_LINE + 1)
            if not line:
                return
            if len(line) > MAX_LINE:
                raise FramingError("command line exceeds %d bytes" % MAX_LINE)
            line = line.decode("utf-8").strip()
            if not line:
                return
            if line.startswith("VERSION"):
                wf.write(b"OK\n%d\n\n" % PROTOCOL_VERSION)
            elif line.startswith("LIST"):
                wf.write(b"OK\n")
                for name in sorted(REGISTRY):
                    for sig, _ in REGISTRY[name]:
                        wf.write(sig.render().encode() + b"\n")
                for name in sorted(AGG_REGISTRY):
                    wf.write(AGG_REGISTRY[name][0].render().encode() + b"\n")
                wf.write(b"\n")
            elif line.startswith("GET "):
                name = line[4:].strip().lower()
                defs = REGISTRY.get(name, [])
                if not defs:
                    wf.write(b"ERR no function %s\n" % name.encode())
                else:
                    wf.write(b"OK\n")
                    for sig, _ in defs:
                        wf.write(sig.render().encode() + b"\n")
                    wf.write(b"\n")
            elif line.startswith("DEFINE"):
                # dynamic registration from source — the reference's core
                # Runtime.add_function(name, type, mode, code) surface
                # (python/mod.rs add_function_with_handler): signature,
                # module source and handler name arrive as three blobs.
                is_agg = line.startswith("DEFINEAGG")
                sig_b, code_b, handler_b = _read_blob(rf), _read_blob(rf), _read_blob(rf)
                try:
                    sig = Sig(sig_b.decode("utf-8"))
                    ns = {"udf": udf, "udaf": udaf, "pa": pa}
                    exec(compile(code_b.decode("utf-8"), "<define:%s>" % sig.name, "exec"), ns)
                    handler = handler_b.decode("utf-8") or sig.name
                    target = ns[handler]
                    if is_agg:
                        AGG_REGISTRY[sig.name] = (sig, target())
                    else:
                        # redefinition REPLACES the matching signature (one
                        # live entry per sig) instead of shadow-stacking —
                        # the list stays bounded by distinct signatures
                        lst = REGISTRY.setdefault(sig.name, [])
                        rendered = sig.render()
                        lst[:] = [e for e in lst if e[0].render() != rendered]
                        lst.insert(0, (sig, target))
                    wf.write(b"OK\n")
                except Exception as e:
                    wf.write(("ERR %s: %s\n" % (type(e).__name__, e)).encode("utf-8"))
            elif line.startswith("CALLERR "):
                _serve_call(line[8:].strip(), False, rf, wf, with_errors=True)
            elif line.startswith("CALL ") or line.startswith("CALLTABLE "):
                is_table = line.startswith("CALLTABLE ")
                fname = line[10 if is_table else 5:].strip()
                _serve_call(fname, is_table, rf, wf)
            elif line.startswith("ACC"):
                verb, _, fname = line.partition(" ")
                _serve_agg(verb, fname.strip(), rf, wf)
            else:
                wf.write(b"ERR bad command %s\n" % line.encode())
            wf.flush()
    except FramingError as e:
        try:
            wf.write(("ERR FramingError: %s\n" % e).encode("utf-8"))
            wf.flush()
        except OSError:
            pass
    except (ConnectionResetError, BrokenPipeError, EOFError):
        pass
    finally:
        try:
            sock.close()
        except OSError:
            pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--load", action="append", default=[],
                    help="extra python file(s) defining @udf functions")
    args = ap.parse_args()
    for path in args.load:
        with open(path) as fh:
            exec(compile(fh.read(), path, "exec"), {"udf": udf, "pa": pa})
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", args.port))
    srv.listen(64)
    print("PORT %d" % srv.getsockname()[1], flush=True)
    while True:
        conn, _ = srv.accept()
        # write-write-read exchange: Nagle x delayed-ACK would add ~40ms per
        # chunk; the protocol is latency-bound, so disable coalescing.
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        t = threading.Thread(target=_serve_conn, args=(conn,), daemon=True)
        t.start()


if __name__ == "__main__":
    main()
