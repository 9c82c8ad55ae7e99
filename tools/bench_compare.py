#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: python3 tools/bench_compare.py BENCHFULL_r09.json BENCH_r08.json [...]

Reads one or more bench artifacts (each holds a JSON object with a
"queries" map somewhere in the text — BENCH_r*.json files are stdout tails,
so the JSON line is extracted with a brace scan; BENCHFULL_r*.json files
are the complete line) and prints per-query deltas between the FIRST file
and each later one, worst regressions first. Queries absent from a file
(the tail truncation) are skipped.
"""
import json
import re
import sys


def load_queries(path):
    text = open(path, errors="replace").read()
    # the driver's BENCH_r<n>.json is a wrapper {"n":..,"tail":"<escaped
    # stdout tail>"}; unwrap to the raw tail text
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    # complete line (BENCHFULL or untruncated stdout): parse properly
    starts = [m.start() for m in re.finditer(r'\{"metric"', text)]
    for s in reversed(starts):
        try:
            return json.loads(text[s:].strip().splitlines()[0])["queries"]
        except (json.JSONDecodeError, KeyError):
            continue
    # truncated tail: recover "name":secs (queries map) and
    # "name":[r1,r2,...] (reps map -> min) pairs by regex
    out = {}
    for k, arr in re.findall(r'"((?:q|x)[A-Za-z0-9_]+)":\[([0-9.,\-]+)\]', text):
        vals = [float(v) for v in arr.split(",") if v]
        if vals:
            out[k] = min(vals)
    if not out:
        for k, v in re.findall(r'"((?:q|x)[A-Za-z0-9_]+)":(-?\d+\.\d+)', text):
            out[k] = float(v)
    return out


def main(paths):
    base = load_queries(paths[0])
    print(f"{paths[0]}: {len(base)} queries, "
          f"total {sum(v for v in base.values() if v >= 0):.1f}s")
    for other in paths[1:]:
        prev = load_queries(other)
        common = sorted(set(base) & set(prev))
        rows = [(k, prev[k], base[k], base[k] - prev[k])
                for k in common if base[k] >= 0 and prev[k] >= 0]
        rows.sort(key=lambda r: -r[3])
        tb = sum(r[2] for r in rows)
        tp = sum(r[1] for r in rows)
        print(f"\nvs {other}: {len(common)} comparable, "
              f"sum {tp:.1f}s -> {tb:.1f}s ({tb - tp:+.1f}s)")
        print(f"{'query':<28} {'prev':>8} {'now':>8} {'delta':>8}")
        for k, p, b, d in rows:
            if abs(d) >= 0.15 or (p > 0.2 and abs(d) / p >= 0.3):
                print(f"{k:<28} {p:>8.3f} {b:>8.3f} {d:>+8.3f}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: bench_compare.py <base.json> [prev.json ...]\n"
                 "note: truncated BENCH_r*.json tails lose failed-query "
                 "markers (a query that failed on a later rep shows its "
                 "surviving rep's time)")
    main(sys.argv[1:])
