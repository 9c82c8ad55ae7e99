#!/usr/bin/env python3
"""Capped per-query driver for the sf1 full-battery value compare.

Runs tools/check.py once per oracle query in a subprocess under a hard
wall-clock cap (`timeout`), so a shingle-heavy DuckDB oracle (10+ min at
50k docs) or a pandas sort over a multi-million-row result set cannot
stall the battery. Every query's Spark output is already on disk (the
engine side completed); the cap only ever cuts the ORACLE's cost.

Usage:
  python3 tools/sf1_drive.py OUTDIR SFDIR [--cap SEC] [--threads N] \
      [--report PATH]

Emits a line per query (OK / FAIL / CUT) and a final JSON report with
ok/fail/cut lists, reproducible per query via
  timeout CAP python3 tools/check.py OUTDIR SFDIR =NAME
"""
import sys, os, json, subprocess, time, argparse

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("sfdir")
    ap.add_argument("--cap", type=int, default=300)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--report", default="/tmp/sf1_report.json")
    args = ap.parse_args()

    oracle = json.load(open(os.path.join(args.outdir, "oracle_sql.json")))
    env = dict(os.environ)
    if args.threads:
        env["CHECK_THREADS"] = str(args.threads)
    check = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check.py")

    ok, fail, cut = [], [], []
    t0 = time.time()
    for i, name in enumerate(sorted(oracle)):
        qt0 = time.time()
        p = subprocess.run(
            ["timeout", str(args.cap), sys.executable, check,
             args.outdir, args.sfdir, "=" + name],
            capture_output=True, text=True, env=env)
        dt = time.time() - qt0
        out = p.stdout + p.stderr
        if p.returncode == 124:
            cut.append(name)
            status = "CUT "
        elif p.returncode == 0 and f"OK   {name}" in out:
            ok.append(name)
            status = "OK  "
        else:
            fail.append(name)
            status = "FAIL"
        first = next((l for l in out.splitlines()
                      if l.startswith(("OK", "FAIL", "WARN"))), "")
        print(f"[{i+1:3d}/{len(oracle)}] {status} {name} ({dt:.1f}s) {first}",
              flush=True)
    report = {
        "cap_sec": args.cap, "threads": args.threads or "all",
        "total": len(oracle), "ok": len(ok), "fail": len(fail),
        "cut": len(cut), "wall_sec": round(time.time() - t0, 1),
        "ok_names": ok, "fail_names": fail, "cut_names": cut,
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print(f"== sf1 battery: {len(ok)} OK, {len(fail)} FAIL, "
          f"{len(cut)} CUT (cap {args.cap}s) in "
          f"{report['wall_sec']}s ==", flush=True)
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main())
