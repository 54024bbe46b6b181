#!/usr/bin/env python3
"""Regenerate BenchBands.medianSec from a recorded bench trio.

Usage: python3 tools/band_from_trio.py run1.json run2.json run3.json

Each argument is a full bench artifact (the BENCH_FULL_LATEST.json the
bench writes). Emits:
  - the Scala map body (sorted by query name, 3 entries per line) to
    paste into BenchBands.medianSec, each value the per-query median of
    the trio's adjudicated times;
  - a provenance summary (totals, first-pass sums, smear counts,
    median sum, slowest medians) for the BASELINE.md section-f block.
"""
import json
import statistics
import sys


def main():
    runs = []
    for p in sys.argv[1:]:
        with open(p) as f:
            runs.append(json.load(f))
    names = set()
    for r in runs:
        names |= set(r["queries"])
    medians = {}
    for n in sorted(names):
        present = [r for r in runs if n in r["queries"]]
        vals = [r["queries"][n] for r in present if r["queries"][n] >= 0]
        # distinguish a query ABSENT from a run (registry drift) from one
        # present but errored (-1, check that run's errors list) — the
        # two send the operator down entirely different hunts
        if len(present) != len(runs):
            print(f"// WARNING: {n} absent from "
                  f"{len(runs) - len(present)} run(s) — registry drift?",
                  file=sys.stderr)
        if len(vals) != len(present):
            print(f"// WARNING: {n} errored (-1) in "
                  f"{len(present) - len(vals)} run(s) — see that run's "
                  "errors list; median uses the remaining samples",
                  file=sys.stderr)
        if not vals:  # errored (-1) in every run: skip, don't crash
            print(f"// WARNING: {n} has no successful run — omitted "
                  "from the band (3 s fallback will apply)",
                  file=sys.stderr)
            continue
        medians[n] = statistics.median(vals)

    entries = [f'"{n}" -> {medians[n]:.3f}' for n in sorted(medians)]
    lines = []
    for i in range(0, len(entries), 3):
        lines.append("    " + ", ".join(entries[i:i + 3]) + ",")
    body = "\n".join(lines).rstrip(",")
    print(body)

    print("\n// ---- provenance ----", file=sys.stderr)
    tot = [r["value"] for r in runs]
    fp = [r.get("total_firstpass") for r in runs]
    sm = [len(r.get("smears", {})) for r in runs]
    drift = [r.get("band_drift") for r in runs]
    errs = [len(r.get("errors", [])) for r in runs]
    def fmt(xs):  # pre-r10 artifacts lack total_firstpass — print n/a
        return " / ".join("n/a" if x is None else f"{x:.1f}" for x in xs)
    print(f"// adjudicated totals: {fmt(tot)} s", file=sys.stderr)
    print(f"// first-pass sums:    {fmt(fp)} s", file=sys.stderr)
    print(f"// smears per run: {sm}; band_drift per run: {drift}; "
          f"errors per run: {errs}", file=sys.stderr)
    print(f"// queries: {len(medians)}; median sum: "
          f"{sum(medians.values()):.1f} s", file=sys.stderr)
    slow = sorted(medians.items(), key=lambda kv: -kv[1])[:8]
    print("// slowest medians: " +
          ", ".join(f"{n} {v:.2f}" for n, v in slow), file=sys.stderr)
    for r, p in zip(runs, sys.argv[1:]):
        smeared = r.get("smears", {})
        if smeared:
            # the LARGEST smears (by first-pass minus re-run), not JSON
            # insertion order — the provenance block must show severity
            tops = dict(sorted(smeared.items(),
                               key=lambda kv: -(kv[1][0] - kv[1][-1]))[:6])
            print(f"// {p} smears: {tops}", file=sys.stderr)


if __name__ == "__main__":
    main()
