# Reverse-direction Flight interop probe: a REAL pyarrow.flight client
# (grpc-core) calling INTO graft's from-scratch Flight server
# (graft.remote.flight.FlightServer). Driven by FlightServerSpec; prints one
# assertable line per check. Shares zero transport code with the server.

import sys
import pyarrow as pa
import pyarrow.flight as fl


def main():
    port = int(sys.argv[1])
    if "--tls" in sys.argv:
        # --tls <cert.pem>: dial grpc+tls, trusting the given root — the
        # whole probe then runs over the Scala server's TLS+ALPN-h2 listener
        with open(sys.argv[sys.argv.index("--tls") + 1], "rb") as f:
            root = f.read()
        c = fl.FlightClient(f"grpc+tls://127.0.0.1:{port}", tls_root_certs=root)
    else:
        c = fl.FlightClient(f"grpc+tcp://127.0.0.1:{port}")

    # protocol_version action (reference Client::new, remote/mod.rs:53-65)
    r = list(c.do_action(fl.Action("protocol_version", b"")))
    print("VERSION", r[0].body.to_pybytes().hex())

    # discovery
    infos = list(c.list_flights())
    names = sorted(i.descriptor.path[0].decode() for i in infos)
    print("LIST", len(names), "gcd" in names, "range_setof" in names)
    info = c.get_flight_info(fl.FlightDescriptor.for_path("gcd"))
    print("GET", info.total_records, info.schema.field(0).type,
          info.schema.field(info.schema.names.index("value")).type)

    # scalar DoExchange: the native-expression gcd tier, nulls included
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("gcd"))
    schema = pa.schema([("a", pa.int32()), ("b", pa.int32())])
    w.begin(schema)
    w.write_batch(pa.RecordBatch.from_arrays(
        [pa.array([12, 54, None], pa.int32()), pa.array([8, 24, 5], pa.int32())],
        schema=schema))
    w.done_writing()
    print("GCD", r.read_all().to_pydict())

    # scalar at flow-control scale: 50k rows crosses the 64 KiB windows
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("gcd"))
    n = 50000
    w.begin(schema)
    w.write_batch(pa.RecordBatch.from_arrays(
        [pa.array([i * 37 + 1 for i in range(n)], pa.int32()),
         pa.array([i % 97 + 1 for i in range(n)], pa.int32())], schema=schema))
    w.done_writing()
    got = r.read_all().column("value").to_pylist()

    def gcd(a, b):
        while b:
            a, b = b, a % b
        return a
    ok = len(got) == n and all(
        got[i] == gcd(i * 37 + 1, i % 97 + 1) for i in range(0, n, 7919))
    print("GCD50K", ok)

    # table function: range_setof explodes each row into 0..n-1
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("range_setof"))
    s2 = pa.schema([("n", pa.int32())])
    w.begin(s2)
    w.write_batch(pa.RecordBatch.from_arrays([pa.array([3, 0, 2], pa.int32())], schema=s2))
    w.done_writing()
    print("TABLE", r.read_all().to_pydict())

    # fallible scalar: (value, error) columns, per-row containment
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("graft_div"))
    w.begin(schema)
    w.write_batch(pa.RecordBatch.from_arrays(
        [pa.array([10, 7], pa.int32()), pa.array([2, 0], pa.int32())], schema=schema))
    w.done_writing()
    print("DIV", r.read_all().to_pydict())

    # unknown function -> NOT_FOUND status
    w = None
    try:
        w, r = c.do_exchange(fl.FlightDescriptor.for_path("definitely_not_there"))
        w.begin(schema)
        w.write_batch(pa.RecordBatch.from_arrays(
            [pa.array([1], pa.int32()), pa.array([1], pa.int32())], schema=schema))
        w.done_writing()
        r.read_all()
        print("NOTFOUND False")
    except Exception as e:  # pyarrow maps NOT_FOUND to ArrowKeyError
        print("NOTFOUND", "no function" in str(e))
    # the writer teardown re-raises the stream's error status; swallow it so
    # the probe's exit code reflects the CHECKS, not the expected failure
    if w is not None:
        try:
            w.close()
        except Exception:
            pass

    if "--negative" in sys.argv:
        negative(c)
    if "--pingpong" in sys.argv:
        pingpong(c)
    if "--dict" in sys.argv:
        dictionary(c)
    if "--dict-delta" in sys.argv:
        dict_delta(c)

    print("DONE")


def _assert_emits_delta(schema, batches):
    """Self-certification: serialize `batches` with emit_dictionary_deltas
    and hand-walk the flatbuffer Message headers to prove the wire carries a
    DictionaryBatch with isDelta=true (field id 2 of the DictionaryBatch
    table). Guards the probe against a pyarrow that silently falls back to
    replacement dictionaries — the DICTDELTA check below would still pass,
    but would no longer prove delta handling."""
    import struct

    def i32(b, o):
        return struct.unpack_from("<i", b, o)[0]

    def i16(b, o):
        return struct.unpack_from("<h", b, o)[0]

    def fb_field(b, table, fid):
        # flatbuffer: table starts with soffset to vtable; vtable[2+fid]
        # holds the field's offset within the table (0 = absent/default)
        vt = table - i32(b, table)
        nfields = (i16(b, vt) - 4) // 2
        if fid >= nfields:
            return None
        off = i16(b, vt + 4 + 2 * fid)
        return table + off if off else None

    sink = pa.BufferOutputStream()
    w = pa.ipc.new_stream(sink, schema,
                          options=pa.ipc.IpcWriteOptions(emit_dictionary_deltas=True))
    for rb in batches:
        w.write_batch(rb)
    w.close()
    data = sink.getvalue().to_pybytes()
    saw_delta = False
    off = 0
    while off + 8 <= len(data):
        assert data[off:off + 4] == b"\xff\xff\xff\xff", "bad IPC continuation"
        mlen = i32(data, off + 4)
        if mlen == 0:
            break
        fb = data[off + 8:off + 8 + mlen]
        root = i32(fb, 0)
        htype_off = fb_field(fb, root, 1)   # Message.header_type (ubyte)
        htype = fb[htype_off] if htype_off is not None else 0
        if htype == 2:                       # MessageHeader.DictionaryBatch
            hdr_off = fb_field(fb, root, 2)  # Message.header (union value)
            tbl = hdr_off + i32(fb, hdr_off)
            delta_off = fb_field(fb, tbl, 2)  # DictionaryBatch.isDelta
            if delta_off is not None and fb[delta_off] == 1:
                saw_delta = True
        blen_off = fb_field(fb, root, 3)     # Message.bodyLength (long)
        blen = struct.unpack_from("<q", fb, blen_off)[0] if blen_off else 0
        off += 8 + mlen + blen
    assert saw_delta, "pyarrow did not emit an isDelta dictionary message"


def dict_delta(c):
    """DELTA dictionaries mid-exchange: batch 2's dictionary EXTENDS batch
    1's, and with emit_dictionary_deltas the SDK writer ships only the
    appended entries as an isDelta=true DictionaryBatch (Arrow IPC spec) —
    legal from any SDK producer on a long exchange. The server must decode
    batch 2 against the ACCUMULATED dictionary: an implementation that
    treated the delta as a replacement would resolve index 2 out of range
    (or to the wrong string) and diverge."""
    d1 = pa.array(["alpha", "bee"], pa.string())
    a1 = pa.DictionaryArray.from_arrays(pa.array([0, 1, 0, None], pa.int32()), d1)
    schema = pa.schema([("s", a1.type)])
    d2 = pa.array(["alpha", "bee", "gamma-gamma"], pa.string())
    a2 = pa.DictionaryArray.from_arrays(pa.array([2, 0, 2], pa.int32()), d2)
    b1 = pa.RecordBatch.from_arrays([a1], schema=schema)
    b2 = pa.RecordBatch.from_arrays([a2], schema=schema)
    _assert_emits_delta(schema, [b1, b2])

    opts = pa.ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("graft_length"))
    w.begin(schema, options=opts)
    w.write_batch(b1)
    v1 = r.read_chunk().data.column(0).to_pylist()
    w.write_batch(b2)  # ships DictionaryBatch(isDelta=true, ["gamma-gamma"])
    v2 = r.read_chunk().data.column(0).to_pylist()
    w.done_writing()
    tail = r.read_all().num_rows
    print("DICTDELTA", v1 == [5, 3, 5, None] and v2 == [11, 5, 11] and tail == 0)


def dictionary(c):
    """Dictionary-encoded ARGUMENT columns: pyarrow writes the batch with a
    dictionary<int32, string> column (schema declares the encoding; a
    DictionaryBatch precedes each RecordBatch on the wire). The server must
    resolve the STRING overload (not the index int's) and evaluate the
    decoded values — the shape parquet dictionary pages produce at scale."""
    texts = ["alpha", "bee", "alpha", None, "gamma-gamma", "bee"]
    arr = pa.array(texts, pa.string()).dictionary_encode()
    schema = pa.schema([("s", arr.type)])
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("graft_length"))
    w.begin(schema)
    w.write_batch(pa.RecordBatch.from_arrays([arr], schema=schema))
    w.done_writing()
    got = r.read_all().column("value").to_pylist()
    print("DICT", got == [len(t) if t is not None else None for t in texts])

    # multi-batch streamed exchange: each batch re-ships its dictionary
    # (pyarrow emits a replacement DictionaryBatch per batch); results
    # ping-pong per batch like the plain streamed mode
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("graft_length"))
    ok = True
    first = True
    for t in range(3):
        batch_texts = [f"word{t}", "x" * (t + 1), None]
        a2 = pa.array(batch_texts, pa.string()).dictionary_encode()
        if first:
            w.begin(pa.schema([("s", a2.type)]))
            first = False
        w.write_batch(pa.RecordBatch.from_arrays(
            [a2], schema=pa.schema([("s", a2.type)])))
        vals = r.read_chunk().data.column(0).to_pylist()
        ok = ok and vals == [len(x) if x is not None else None for x in batch_texts]
    w.done_writing()
    ok = ok and r.read_all().num_rows == 0
    print("DICTSTREAM", ok)


def pingpong(c):
    """Streamed-mode interop: ONE long-lived DoExchange carrying many
    batches, each result read back BEFORE the next batch is written. This
    only completes against a server that evaluates batches incrementally as
    they arrive (the reference UdfProducer loop) — a server that buffered
    the request to end-of-stream would deadlock the first read."""
    def g(a, b):
        while b:
            a, b = b, a % b
        return a

    schema = pa.schema([("a", pa.int32()), ("b", pa.int32())])
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("gcd"))
    w.begin(schema)
    ok = True
    for t in range(5):
        a = [(t + 1) * (i + 1) * 6 for i in range(200)]
        b = [(t + 1) * (i + 1) * 4 for i in range(200)]
        w.write_batch(pa.RecordBatch.from_arrays(
            [pa.array(a, pa.int32()), pa.array(b, pa.int32())], schema=schema))
        vals = r.read_chunk().data.column(0).to_pylist()  # blocks for THIS batch
        ok = ok and vals == [g(x, y) for x, y in zip(a, b)]
    w.done_writing()
    ok = ok and r.read_all().num_rows == 0  # all results already consumed
    print("PINGPONG", ok)

    # table function: explode semantics per ping-ponged batch; the row index
    # keeps counting across batches of one exchange (one logical call)
    s2 = pa.schema([("n", pa.int32())])
    w2, r2 = c.do_exchange(fl.FlightDescriptor.for_path("range_setof"))
    w2.begin(s2)
    w2.write_batch(pa.RecordBatch.from_arrays([pa.array([2, 1], pa.int32())], schema=s2))
    c1 = r2.read_chunk().data.to_pydict()
    w2.write_batch(pa.RecordBatch.from_arrays([pa.array([0, 3], pa.int32())], schema=s2))
    c2 = r2.read_chunk().data.to_pydict()
    w2.done_writing()
    r2.read_all()
    print("PPTABLE",
          c1 == {"row": [0, 0, 1], "value": [0, 1, 0]},
          c2 == {"row": [3, 3, 3], "value": [0, 1, 2]})


def negative(c):
    """Negative-path gates: verbs graft's Flight server does not define must
    fail with CLEAN gRPC statuses a reference client maps to typed errors —
    never a hung stream or a killed connection. After every failure the SAME
    connection keeps working (checked at the end)."""
    schema = pa.schema([("a", pa.int32()), ("b", pa.int32())])

    # aggregate-lifecycle actions (reference protocol v3 DoAction verbs):
    # not defined by this server -> UNIMPLEMENTED
    for act in ("create_state", "accumulate", "merge", "finish"):
        try:
            list(c.do_action(fl.Action(act, b"gcd")))
            print(f"AGG_{act} False")
        except pa.lib.ArrowNotImplementedError as e:
            print(f"AGG_{act}", "unimplemented" in str(e).lower())
        except Exception as e:
            print(f"AGG_{act} WRONGTYPE {type(e).__name__}")

    # list_actions / do_get / do_put: whole verbs outside the UDF protocol
    try:
        list(c.list_actions())
        print("LISTACTIONS False")
    except pa.lib.ArrowNotImplementedError:
        print("LISTACTIONS True")
    except Exception as e:
        print("LISTACTIONS WRONGTYPE", type(e).__name__)
    try:
        r = c.do_get(fl.Ticket(b"gcd"))
        r.read_all()
        print("DOGET False")
    except pa.lib.ArrowNotImplementedError:
        print("DOGET True")
    except Exception as e:
        print("DOGET WRONGTYPE", type(e).__name__)

    # unknown descriptor on discovery -> NOT_FOUND (ArrowKeyError in pyarrow)
    try:
        c.get_flight_info(fl.FlightDescriptor.for_path("definitely_not_there"))
        print("INFO_UNKNOWN False")
    except pa.lib.ArrowKeyError as e:
        print("INFO_UNKNOWN", "no function" in str(e))
    except Exception as e:
        print("INFO_UNKNOWN WRONGTYPE", type(e).__name__)

    # DoExchange with a command descriptor (no path): INVALID_ARGUMENT
    w = None
    try:
        w, r = c.do_exchange(fl.FlightDescriptor.for_command(b"not-a-path"))
        w.begin(schema)
        w.write_batch(pa.RecordBatch.from_arrays(
            [pa.array([1], pa.int32()), pa.array([1], pa.int32())], schema=schema))
        w.done_writing()
        r.read_all()
        print("EXCHANGE_NOPATH False")
    except pa.lib.ArrowInvalid as e:
        print("EXCHANGE_NOPATH", "no FlightDescriptor path" in str(e))
    except Exception as e:
        print("EXCHANGE_NOPATH WRONGTYPE", type(e).__name__, str(e)[:80])
    if w is not None:
        try:
            w.close()
        except Exception:
            pass

    # the connection survived every refused verb: a normal call still works
    w, r = c.do_exchange(fl.FlightDescriptor.for_path("gcd"))
    w.begin(schema)
    w.write_batch(pa.RecordBatch.from_arrays(
        [pa.array([54], pa.int32()), pa.array([24], pa.int32())], schema=schema))
    w.done_writing()
    print("SURVIVES", r.read_all().column("value").to_pylist() == [6])


if __name__ == "__main__":
    main()
