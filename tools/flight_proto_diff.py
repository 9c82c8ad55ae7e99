# Differential oracle for graft's hand-rolled Flight protobuf codec
# (graft.remote.flight.Pb) against pyarrow's OWN serializers — the reference
# implementation of Flight.proto. Line protocol on stdin/stdout:
#
#   DESC2PY <hex>                       -> DESC <path0>            (parse graft bytes)
#   PY2DESC <name>                      -> HEX <hex>               (serialize here)
#   INFO2PY <hex>                       -> INFO <path0> <records> <f1:t1,f2:t2,...>
#   PY2INFO <name> <records> <f:t,...>  -> HEX <hex>
#   QUIT
#
# Types vocabulary (shared with the Scala side): i32 i64 f32 f64 str bin
# dec  (decimal128(18,2))  li64 (list<int64>)  date  tsu (timestamp us).

import sys
import pyarrow as pa
import pyarrow.flight as fl

TYPES = {
    "i32": pa.int32(), "i64": pa.int64(), "f32": pa.float32(),
    "f64": pa.float64(), "str": pa.string(), "bin": pa.binary(),
    "dec": pa.decimal128(18, 2), "li64": pa.list_(pa.int64()),
    "date": pa.date32(), "tsu": pa.timestamp("us"),
}
RTYPES = {str(v): k for k, v in TYPES.items()}


def type_tag(t):
    return RTYPES.get(str(t), f"?{t}")


def main():
    for line in sys.stdin:
        parts = line.strip().split(" ")
        if not parts or parts[0] == "QUIT":
            break
        cmd = parts[0]
        try:
            if cmd == "DESC2PY":
                d = fl.FlightDescriptor.deserialize(bytes.fromhex(parts[1]))
                print("DESC " + d.path[0].decode(), flush=True)
            elif cmd == "PY2DESC":
                d = fl.FlightDescriptor.for_path(parts[1])
                print("HEX " + d.serialize().hex(), flush=True)
            elif cmd == "INFO2PY":
                info = fl.FlightInfo.deserialize(bytes.fromhex(parts[1]))
                fields = ",".join(
                    f"{f.name}:{type_tag(f.type)}" for f in info.schema)
                print(f"INFO {info.descriptor.path[0].decode()} "
                      f"{info.total_records} {fields}", flush=True)
            elif cmd == "PY2INFO":
                name, records, fieldspec = parts[1], int(parts[2]), parts[3]
                fields = []
                for fs in fieldspec.split(","):
                    fn, ft = fs.split(":")
                    fields.append((fn, TYPES[ft]))
                info = fl.FlightInfo(
                    schema=pa.schema(fields),
                    descriptor=fl.FlightDescriptor.for_path(name),
                    endpoints=[], total_records=records, total_bytes=0)
                print("HEX " + info.serialize().hex(), flush=True)
            else:
                print("ERR unknown " + cmd, flush=True)
        except Exception as e:
            print("ERR " + repr(e).replace("\n", " "), flush=True)


if __name__ == "__main__":
    main()
