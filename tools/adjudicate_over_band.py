#!/usr/bin/env python3
"""Adjudicate a bench artifact's over_band flags (the recurring r17/r18
gate step, automated per VERDICT r18 ask 2).

A single-pass full-battery run flags every query whose best time exceeds
max(1.5x its recorded band median, 1s). On this host such entries at
1.5-2.0x are usually one hypervisor smear (see BASELINE.md §f); the
repo's protocol says a flag only COUNTS if it reproduces under an
isolated same-JVM REPEAT>=2 run. Rounds 17 and 18 each spent a manual
cycle on exactly that; this tool is that cycle:

  1. read the artifact, extract its over_band set (handles both the raw
     Bench artifact and the driver's BENCH_r{N}.json wrapper whose JSON
     line lives inside a `tail` string);
  2. run ONE isolated `SPARK_GRAFT_ONLY=<the set> SPARK_GRAFT_REPEAT=N`
     bench (default N=3, matching the r18 adjudication of the r17 six);
  3. emit an adjudication JSON quoting, per flagged query, the original
     ratio, the re-run best-of-passes, its band ratio, and the verdict:
     `clean` (over_band {} after re-run) or `reproduced` (investigate as
     a plan regression before recording closing numbers).

Usage:
  python3 tools/adjudicate_over_band.py <bench_artifact.json> \
      [--sf /root/testdata/sf0.1] [--repeat 3] [--out target/bench/adjudication_<ms>.json]

Exit code 0 = clean, 2 = reproduced, 3 = nothing to adjudicate /
artifact unparsable / a flagged query ERRORED in the re-run (an
errored query is unadjudicated, never 'clean' — ADVICE r19). The
closing record in BASELINE.md §f should cite the emitted file.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_over_band(path):
    """Return (over_band dict, source description) from a bench artifact.

    Accepts the raw Bench artifact (target/bench/bench_*.json,
    BENCH_FULL_LATEST.json) or the driver's BENCH_r{N}.json wrapper, in
    which the artifact's summary line is embedded in a `tail` string —
    there we take the LAST {"metric":...} JSON object that parses and
    carries over_band.
    """
    with open(path) as f:
        doc = json.load(f)
    if "over_band" in doc:
        return doc["over_band"], "direct"
    tail = doc.get("tail", "")
    # the tail holds sbt log text with one or more JSON lines in it;
    # scan right-to-left so we adjudicate the FINAL (adjudicated-
    # headline) line, not the per-query dump before it
    for line in reversed(tail.splitlines()):
        start = line.find('{"metric":')
        end = line.rfind("}")
        if start < 0 or end <= start:
            continue
        try:
            d = json.loads(line[start:end + 1])
        except json.JSONDecodeError:
            continue
        if "over_band" in d:
            return d["over_band"], "driver-tail"
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    flagged, how = load_over_band(args.artifact)
    if flagged is None:
        print(f"[adjudicate] no over_band found in {args.artifact}", file=sys.stderr)
        return 3
    if not flagged:
        print(f"[adjudicate] over_band already empty in {args.artifact} — nothing to do",
              file=sys.stderr)
        return 3
    names = sorted(flagged)
    print(f"[adjudicate] {len(names)} flagged ({how}): {','.join(names)}", file=sys.stderr)

    ts = int(time.time() * 1000)
    rerun_path = os.path.join("target", "bench", f"adjudicate_rerun_{ts}.json")
    env = dict(os.environ)
    # exact names double as prefixes for SPARK_GRAFT_ONLY; a prefix
    # over-selecting a sibling query only adds coverage, never drops a
    # flagged one
    env.update({
        "SPARK_GRAFT_ONLY": ",".join(names),
        "SPARK_GRAFT_REPEAT": str(args.repeat),
        "SPARK_GRAFT_SF_DIR": args.sf,
        "SPARK_GRAFT_CPUS": str(args.cpus),
        "SPARK_GRAFT_BENCH_OUT": rerun_path,
    })
    # aux run: must NOT touch BENCH_FULL_LATEST.json (r15 ask 4) — it
    # writes only to the explicit target/bench/ path above
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True)
    rerun_file = os.path.join(REPO, rerun_path)
    if proc.returncode != 0 or not os.path.exists(rerun_file):
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        print("[adjudicate] bench re-run failed", file=sys.stderr)
        return 3
    with open(rerun_file) as f:
        rerun = json.load(f)

    # best-of-passes per flagged name from the '#pass'-tagged queries map
    best = {}
    for k, v in rerun.get("queries", {}).items():
        base = re.sub(r"#\d+$", "", k)
        if base in flagged and v >= 0 and (base not in best or v < best[base]):
            best[base] = v
    after = rerun.get("over_band", {})
    reproduced = {n: after[n] for n in names if n in after}
    # A flagged query that ERRORED on every re-run pass (all values -1)
    # has no best-of-passes and drops out of the rerun's over_band — a
    # purely over_band-driven verdict would then print 'clean' for a
    # query that never ran (ADVICE r19). Errors are recorded per-pass as
    # "name#K"; strip the pass tag and treat any flagged name that
    # errored or is missing from best as unadjudicated = not clean.
    err_bases = {re.sub(r"#\d+$", "", e) for e in rerun.get("errors", [])}
    unadjudicated = sorted(n for n in names
                           if n not in best or n in err_bases)
    verdict = ("reproduced" if reproduced
               else "error" if unadjudicated else "clean")
    record = {
        "source_artifact": os.path.relpath(args.artifact, REPO)
            if os.path.isabs(args.artifact) else args.artifact,
        "flagged": flagged,
        "repeat": args.repeat,
        "sf": args.sf,
        "rerun_artifact": rerun_path,
        "best_of_passes": {n: best.get(n) for n in names},
        "over_band_after": after,
        "reproduced": reproduced,
        "unadjudicated": unadjudicated,
        "verdict": verdict,
        "rule": "flag counts only if it survives isolated same-JVM REPEAT>=%d (best-of-passes > max(1.5x band median, 1s))" % args.repeat,
        "errors": rerun.get("errors", []),
    }
    out = os.path.join(REPO, args.out) if args.out else \
        os.path.join(REPO, "target", "bench", f"adjudication_{ts}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
    print(f"[adjudicate] verdict={verdict} -> {os.path.relpath(out, REPO)}")
    for n in names:
        tag = (f"REPRODUCED {after[n]}x" if n in after
               else "ERRORED in re-run (not clean)" if n in unadjudicated
               else "clean")
        print(f"[adjudicate]   {n}: flagged {flagged[n]}x, re-run best "
              f"{best.get(n, float('nan')):.3f}s -> {tag}")
    return 2 if reproduced else 3 if unadjudicated else 0


if __name__ == "__main__":
    sys.exit(main())
