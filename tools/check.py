#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate:
run Verify output (parquet per query) against DuckDB oracle SQL and compare.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.001
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main(outdir, sfdir, names=()):
    con = duckdb.connect()
    threads = os.environ.get("CHECK_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # optional 3rd+ args: query-name substring filters (the Verify
    # convention), "^sub" to EXCLUDE matches, or "=name" for an EXACT
    # match — lets a long oracle run (e.g. the sf1 battery, where
    # shingle-heavy oracles take 10+ min each) be split across
    # invocations (see tools/sf1_drive.py for the capped per-query form)
    if names:
        inc = [s for s in names if not s.startswith(("^", "="))]
        exc = [s[1:] for s in names if s.startswith("^")]
        exact = {s[1:] for s in names if s.startswith("=")}
        oracle = {k: v for k, v in oracle.items()
                  if (k in exact if exact else
                      ((not inc or any(s in k for s in inc))
                       and not any(s in k for s in exc)))}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = os.path.join(outdir, name)
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # The DRIVER's checker sort_values-crashes on list/dict cells — warn
        # locally so the gap is caught before the round gate runs.
        for df_, side in ((spark_df, "spark"), (duck_df, "duck")):
            for c in df_.columns:
                if len(df_) and any(isinstance(v, (list, dict)) or type(v).__name__ == "ndarray"
                                    for v in df_[c].head(5)):
                    print(f"WARN {name}: column '{c}' ({side}) holds list/dict cells — "
                          f"the driver's checker would crash on this query")
        sc = sorted(spark_df.columns)
        dc = sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_bad += 1
            continue
        s_rows = sorted((tuple(norm(v) for v in r) for r in spark_df[sc].itertuples(index=False, name=None)), key=repr)
        d_rows = sorted((tuple(norm(v) for v in r) for r in duck_df[dc].itertuples(index=False, name=None)), key=repr)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
            n_bad += 1
            continue
        if s_rows != d_rows:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(s_rows)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
