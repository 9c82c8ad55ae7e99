#!/usr/bin/env python3
"""Merge a targeted re-run into a BENCHFULL artifact.

Usage: python3 tools/bench_merge.py BENCHFULL_r13.json rerun_output.json

Closes the loop on beyond-spread outliers: when `bench_compare.py` flags a
REGRESSION on code untouched in the round, re-run JUST those probes on a
quiet host (`runMain graft.Bench <name> ...`, BENCHFULL redirected via
SPARK_GRAFT_BENCHFULL) and merge the fresh samples here. Per merged probe,
the re-run's rep samples are APPENDED to the artifact's rep list and the
headline value becomes the min over all samples — the BASELINE.md min-of-N
methodology: contention only ever inflates a sample, so extra quiet samples
can only refine the estimate, never fake an improvement the hardware can't
produce. The artifact is rewritten in place with its total recomputed, plus
a `merged` note recording which probes carry re-run samples.
"""
import json
import sys


def load_line(path):
    """Parse the complete {"metric":...} JSON line from a bench artifact."""
    text = open(path, errors="replace").read()
    start = text.rfind('{"metric"')
    if start < 0:
        sys.exit(f"{path}: no bench JSON line found")
    return json.loads(text[start:].strip().splitlines()[0])


def main(artifact_path, rerun_path):
    artifact = load_line(artifact_path)
    rerun = load_line(rerun_path)
    merged = []
    for name, reps in rerun.get("reps", {}).items():
        if name not in artifact.get("queries", {}):
            continue  # a probe the artifact never measured: don't invent rows
        if not reps:
            continue
        old = artifact.setdefault("reps", {}).get(name, [])
        artifact["reps"][name] = old + reps
        new_min = min(v for v in artifact["reps"][name] if v >= 0)
        if artifact["queries"][name] != new_min:
            merged.append(
                f"{name}: {artifact['queries'][name]:.3f} -> {new_min:.3f} "
                f"(+{len(reps)} samples)")
        else:
            merged.append(f"{name}: unchanged at {new_min:.3f} "
                          f"(+{len(reps)} samples)")
        artifact["queries"][name] = new_min
    artifact["value"] = round(
        sum(v for v in artifact["queries"].values() if v >= 0), 3)
    artifact.setdefault("merged", []).extend(
        sorted(rerun.get("reps", {}).keys() & artifact["queries"].keys()))
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, separators=(",", ":"))
        f.write("\n")
    for line in merged:
        print("merged", line)
    print(f"total now {artifact['value']:.1f}s "
          f"({len(artifact['queries'])} queries)")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
