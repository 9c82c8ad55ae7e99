# Arrow Flight UDF server FIXTURE for graft's Flight bridge interop gates.
#
# This is a REAL Arrow Flight server (pyarrow.flight == grpc-core + HTTP/2),
# speaking the same UDF-over-Flight protocol as the reference's server
# packages (arrow-udf-remote: Java UdfServer / Python arrow_udf.UdfServer):
#
#   - DoAction("protocol_version")            -> one Result byte (2)
#   - GetFlightInfo(descriptor.path=[name])   -> FlightInfo whose schema is
#     input-fields ++ result-fields and whose total_records carries the
#     input arity
#   - ListFlights(empty criteria)             -> one FlightInfo per function
#   - DoExchange(descriptor.path=[name])      -> evaluate each input record
#     batch, stream one result batch per input batch; table functions yield
#     (row_index, value) rows
#
# graft's from-scratch gRPC/HTTP2/Flight client (graft.remote.flight) shares
# zero code with this stack — every byte that crosses the socket is produced
# by one side's independent implementation and parsed by the other's, which
# is the point of the gate.
#
# Fixture-only: runs on loopback, driver/test-side python (pyarrow is not a
# dependency of the Scala library).

import sys
import pyarrow as pa
import pyarrow.flight as flight


class Scalar:
    def __init__(self, name, in_schema, out_type, fn):
        self.name = name
        self.input_schema = in_schema
        self.result_schema = pa.schema([(name, out_type)])
        self.fn = fn

    def eval_batch(self, batch):
        cols = [col.to_pylist() for col in batch.columns]
        n = batch.num_rows
        vals = [self.fn(*[c[i] for c in cols]) for i in range(n)]
        arr = pa.array(vals, type=self.result_schema.types[0])
        yield pa.RecordBatch.from_arrays([arr], schema=self.result_schema)


class Table:
    """Table function: fn(*args) is a generator; results are
    (row_index, value) rows, chunked."""

    CHUNK = 1024

    def __init__(self, name, in_schema, out_type, fn):
        self.name = name
        self.input_schema = in_schema
        self.result_schema = pa.schema([("row_index", pa.int32()), (name, out_type)])
        self.fn = fn

    def eval_batch(self, batch):
        cols = [col.to_pylist() for col in batch.columns]
        idxs, vals = [], []
        for i in range(batch.num_rows):
            for v in self.fn(*[c[i] for c in cols]):
                idxs.append(i)
                vals.append(v)
                if len(idxs) == self.CHUNK:
                    yield self._build(idxs, vals)
                    idxs, vals = [], []
        if idxs:
            yield self._build(idxs, vals)

    def _build(self, idxs, vals):
        return pa.RecordBatch.from_arrays(
            [pa.array(idxs, type=pa.int32()),
             pa.array(vals, type=self.result_schema.types[1])],
            schema=self.result_schema)


class DictScalar(Scalar):
    """Scalar whose results come back DICTIONARY-ENCODED (the advertised
    result schema is dictionary<int32, string>; each result batch is a
    DictionaryBatch + an index-typed RecordBatch on the wire) — exercises the
    graft client resolving inline dictionaries from a stock server."""

    def __init__(self, name, in_schema, fn):
        super().__init__(name, in_schema, pa.dictionary(pa.int32(), pa.string()), fn)

    def eval_batch(self, batch):
        cols = [col.to_pylist() for col in batch.columns]
        n = batch.num_rows
        vals = [self.fn(*[c[i] for c in cols]) for i in range(n)]
        arr = pa.array(vals, type=pa.string()).dictionary_encode()
        yield pa.RecordBatch.from_arrays([arr], schema=self.result_schema)


def gcd(x, y):
    if x is None or y is None:
        return None
    while y:
        x, y = y, x % y
    return x


def str_words(s):
    if s is None:
        return
    for w in s.split():
        yield w


def str_len(s):
    return None if s is None else len(s)


def checked_mod(a, b):
    # raises on b == 0: exercises the client surfacing a gRPC error status
    if a is None or b is None:
        return None
    return a % b


def dec_add(a, b):
    # Decimal128 both directions (the reference's decimal_add scenario,
    # arrow-udf-runtime/tests/remote.rs test_decimal_add)
    if a is None or b is None:
        return None
    return a + b


def len_bucket(s):
    # low-cardinality string result: the natural dictionary-encoding shape
    if s is None:
        return None
    n = len(s)
    return "short" if n < 40 else ("medium" if n < 120 else "long")


def divisors(n):
    # list<int64> return: nested vector layout over the wire
    if n is None:
        return None
    return [d for d in range(1, n + 1) if n % d == 0]


FUNCTIONS = [
    Scalar("flight_gcd",
           pa.schema([("x", pa.int32()), ("y", pa.int32())]), pa.int32(), gcd),
    Scalar("flight_len",
           pa.schema([("s", pa.string())]), pa.int32(), str_len),
    Scalar("flight_mod",
           pa.schema([("a", pa.int64()), ("b", pa.int64())]), pa.int64(), checked_mod),
    Table("flight_words",
          pa.schema([("s", pa.string())]), pa.string(), str_words),
    Scalar("flight_dec_add",
           pa.schema([("a", pa.decimal128(18, 2)), ("b", pa.decimal128(18, 2))]),
           pa.decimal128(18, 2), dec_add),
    Scalar("flight_divisors",
           pa.schema([("n", pa.int32())]), pa.list_(pa.int64()), divisors),
    DictScalar("flight_len_bucket",
               pa.schema([("s", pa.string())]), len_bucket),
]


class FixtureServer(flight.FlightServerBase):
    def __init__(self, tls_dir=None, port=0):
        # --port N: bind a FIXED port (default 0 = ephemeral) so a restarted
        # fixture reappears at the same endpoint — the failover gate's shape
        # --tls <dir>: serve grpc+tls with <dir>/cert.pem + <dir>/key.pem —
        # the reference server's TLS deployment shape (UdfServer with
        # tls_certificates); exercises the Scala client's ALPN-h2 TLS path.
        if tls_dir:
            with open(f"{tls_dir}/cert.pem", "rb") as f:
                cert = f.read()
            with open(f"{tls_dir}/key.pem", "rb") as f:
                key = f.read()
            super().__init__(
                f"grpc+tls://127.0.0.1:{port}",
                tls_certificates=[flight.CertKeyPair(cert, key)])
        else:
            super().__init__(f"grpc://127.0.0.1:{port}")
        self.functions = {f.name: f for f in FUNCTIONS}

    def _info(self, udf):
        full = pa.schema(list(udf.input_schema) + list(udf.result_schema))
        return flight.FlightInfo(
            schema=full,
            descriptor=flight.FlightDescriptor.for_path(udf.name),
            endpoints=[],
            total_records=len(udf.input_schema),
            total_bytes=0)

    def get_flight_info(self, context, descriptor):
        return self._info(self.functions[descriptor.path[0].decode()])

    def list_flights(self, context, criteria):
        return [self._info(f) for f in self.functions.values()]

    def do_action(self, context, action):
        if action.type == "protocol_version":
            return [b"\x02"]
        raise NotImplementedError(action.type)

    def do_exchange(self, context, descriptor, reader, writer):
        udf = self.functions[descriptor.path[0].decode()]
        writer.begin(udf.result_schema)
        for chunk in reader:
            for out in udf.eval_batch(chunk.data):
                writer.write_batch(out)


if __name__ == "__main__":
    tls_dir = None
    port = 0
    if "--tls" in sys.argv:
        tls_dir = sys.argv[sys.argv.index("--tls") + 1]
    if "--port" in sys.argv:
        port = int(sys.argv[sys.argv.index("--port") + 1])
    server = FixtureServer(tls_dir, port)
    print(f"PORT {server.port}", flush=True)
    server.serve()
