#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: python3 tools/bench_compare.py BENCHFULL_r10.json BENCHFULL_r09.json [...]

Reads one or more bench artifacts (each holds a JSON object with a
"queries" map somewhere in the text — BENCH_r*.json files are stdout tails,
so the JSON line is extracted with a brace scan; BENCHFULL_r*.json files
are the complete line) and prints per-query deltas between the FIRST file
and each later one, worst regressions first. Queries absent from a file
(the tail truncation) are skipped.

Contention-aware: when the artifacts carry per-rep samples ("reps") the
delta is only FLAGGED as a regression if it exceeds the measured rep
spread of BOTH runs (plus an absolute floor) — within-spread wobble is
annotated "~spread" instead. When they carry "loadavg_before/after" (r10+)
the host load is printed next to each file so a contended run is visible
from the artifact alone (loadavg >> ncpus => contended).
"""
import json
import re
import sys

# Baseline resets: queries whose measured cost changed for a DOCUMENTED
# reason — the comparison is meaningless across the reset round, so a
# beyond-spread delta that straddles it is labeled RESET, not REGRESSION.
# Entries: query -> (first round measuring the new baseline, reason).
BASELINE_RESETS = {
    # r10 swapped FakeCodec for real javax.imageio/javax.sound decode:
    # r9 and earlier timed a stub, not the codec (README r10)
    "q_resize":           (10, "r10 real codecs (FakeCodec retired)"),
    "q_extract_features": (10, "r10 real codecs (FakeCodec retired)"),
    "q_frame_sample":     (10, "r10 real codecs (FakeCodec retired)"),
    "q_image_meta":       (10, "r10 real codecs (FakeCodec retired)"),
    # r11 extends the recall gate with refined-PQ passes: two more live
    # retrieval sweeps (refined pqTopK + refined rerank) are now measured
    "x_ann_recall_1m":    (11, "r11 refined-PQ gates (2 extra live passes)"),
}


def round_of(path):
    """Round number parsed from a BENCH*_r<n> artifact name, else None."""
    m = re.search(r"_r(\d+)", path)
    return int(m.group(1)) if m else None


def load_record(path):
    """Return (queries: {name: min_sec}, reps: {name: [sec,...]}, meta)."""
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
            rec = json.loads(text[s:].strip().splitlines()[0])
            meta = {k: rec.get(k) for k in
                    ("loadavg_before", "loadavg_after", "ncpus", "sf")}
            return rec["queries"], rec.get("reps", {}), meta
        except (json.JSONDecodeError, KeyError):
            continue
    # truncated tail: recover "name":[r1,r2,...] (reps map -> min) and
    # "name":secs (queries map) pairs by regex
    out, reps = {}, {}
    for k, arr in re.findall(r'"((?:q|x)[A-Za-z0-9_]+)":\[([0-9.,\-]+)\]', text):
        vals = [float(v) for v in arr.split(",") if v]
        if vals:
            out[k] = min(vals)
            reps[k] = vals
    if not out:
        for k, v in re.findall(r'"((?:q|x)[A-Za-z0-9_]+)":(-?\d+\.\d+)', text):
            out[k] = float(v)
    return out, reps, {}


def spread(samples):
    return (max(samples) - min(samples)) if len(samples) >= 2 else 0.0


def describe(path, queries, meta):
    load = ""
    if meta.get("loadavg_before") is not None:
        load = (f", loadavg {meta['loadavg_before']}->{meta['loadavg_after']}"
                f" on {meta.get('ncpus', '?')} cpus")
    print(f"{path}: {len(queries)} queries, "
          f"total {sum(v for v in queries.values() if v >= 0):.1f}s{load}")


def main(paths):
    base, base_reps, base_meta = load_record(paths[0])
    describe(paths[0], base, base_meta)
    for other in paths[1:]:
        prev, prev_reps, prev_meta = load_record(other)
        describe(other, prev, prev_meta)
        common = sorted(set(base) & set(prev))
        rows = [(k, prev[k], base[k], base[k] - prev[k])
                for k in common if base[k] >= 0 and prev[k] >= 0]
        rows.sort(key=lambda r: -r[3])
        tb = sum(r[2] for r in rows)
        tp = sum(r[1] for r in rows)
        print(f"\nvs {other}: {len(common)} comparable, "
              f"sum {tp:.1f}s -> {tb:.1f}s ({tb - tp:+.1f}s)")
        print(f"{'query':<28} {'prev':>8} {'now':>8} {'delta':>8}  verdict")
        n_real = 0
        for k, p, b, d in rows:
            if not (abs(d) >= 0.15 or (p > 0.2 and abs(d) / p >= 0.3)):
                continue
            # beyond-spread test: a delta inside the rep spread of either
            # run is measurement noise, not a regression
            margin = max(spread(base_reps.get(k, [])),
                         spread(prev_reps.get(k, [])), 0.15)
            reset = BASELINE_RESETS.get(k)
            base_r, prev_r = round_of(paths[0]), round_of(other)
            # RESET applies only when BOTH artifact names parse to a round:
            # an unversioned artifact (no _r<n>) gives no evidence it
            # predates the reset, so a genuine regression between two such
            # artifacts must stay a REGRESSION, not get a permanent pass
            straddles = reset is not None and \
                prev_r is not None and base_r is not None and \
                prev_r < reset[0] and base_r >= reset[0]
            if d > margin and straddles:
                verdict = f"RESET: {reset[1]}"
            elif d > margin:
                verdict = f"REGRESSION (spread {margin:.2f})"
                n_real += 1
            elif d < -margin:
                verdict = "improved"
            else:
                verdict = f"~spread ({margin:.2f})"
            print(f"{k:<28} {p:>8.3f} {b:>8.3f} {d:>+8.3f}  {verdict}")
        print(f"{n_real} beyond-spread regression(s)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: bench_compare.py <base.json> [prev.json ...]\n"
                 "note: truncated BENCH_r*.json tails lose failed-query "
                 "markers (a query that failed on a later rep shows its "
                 "surviving rep's time)")
    main(sys.argv[1:])
