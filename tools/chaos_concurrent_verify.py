#!/usr/bin/env python3
"""Concurrent-battery chaos arm (r20, VERDICT r19 task 4).

The r18 ingest sweep fixed scratch races FOUND BY READING; this tool
proves the concurrency story end-to-end: TWO simultaneous graft.Verify
batteries over the SAME dataset into DISTINCT outDirs must BOTH finish
with the full expected oracle tally and no marker/lock violation. What
real contention exercises that sequential runs cannot:

  - `Formats.withScratchLock` + every fmt_*/dedup/maintenance scratch
    sink under interleaved scheduling (two JVMs racing the same INPUT
    dataset, CPU-oversubscribed);
  - the per-dataset fingerprint/label memos (dedup_pairs, dedup_cc,
    bucketed tables, binary fixture) being built twice concurrently;
  - the `_GRAFT_RUNNING` marker + query_names manifest lifecycle — each
    outDir must end marker-free with a complete manifest;
  - streaming memory-sink sweeps and session-conf windows inside each
    JVM while the sibling JVM hammers the same parquet inputs.

Scratch modes:
  --scratch-mode=distinct  (pre-r20 documented contract): each process
      gets its own -Dgraft.scratch.dir.
  --scratch-mode=default   (r20 default-isolation): NO -D override —
      relies on Formats.defaultScratchRoot being per-process. Run this
      mode only against classes carrying the r20 per-PID scratch root;
      on older classes both JVMs share one fixed root and the
      documented single-process assumption is violated by design.

Exit 0 = both batteries green (expected pass/fail/rows-only from
oracle_check over each outDir); 1 = any crash, fail, marker survivor,
or manifest mismatch. Writes a JSON receipt to
target/chaos_concurrent_<ms>.json for the round record.

Usage:
  python3 tools/chaos_concurrent_verify.py [--sf /root/testdata/sf0.01]
      [--scratch-mode distinct|default] [--cpus 8]
"""
import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JPMS_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]


def launch(sf, out_dir, scratch_dir, cpus):
    cp = f"{ROOT}/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    opens = [f"--add-opens={p}=ALL-UNNAMED" for p in JPMS_OPENS]
    props = [f"-Dgraft.scratch.dir={scratch_dir}"] if scratch_dir else []
    return subprocess.Popen(
        ["java", "-cp", cp, "-Xmx12g", *opens, *props,
         "graft.Verify", sf, out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)})


def oracle_check(sf, out_dir):
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/oracle_check.py", sf, out_dir],
        capture_output=True, text=True)
    last = r.stdout.splitlines()[-1] if r.stdout.splitlines() else ""
    m = re.match(r"(\d+) pass, (\d+) fail, (\d+) rows-only", last)
    return r.returncode, (tuple(int(g) for g in m.groups()) if m else None), \
        r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--scratch-mode", choices=["distinct", "default"],
                    default="distinct")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    ts = int(time.time() * 1000)
    arms = []
    for i in (1, 2):
        out_dir = f"{ROOT}/target/chaos_verify_{i}"
        shutil.rmtree(out_dir, ignore_errors=True)
        scratch = (f"/tmp/graft_chaos_scratch_{ts}_{i}"
                   if args.scratch_mode == "distinct" else None)
        arms.append({"i": i, "out": out_dir, "scratch": scratch})

    print(f"[chaos] launching 2 simultaneous Verify batteries over "
          f"{args.sf} (scratch-mode={args.scratch_mode})", file=sys.stderr)
    procs = [launch(args.sf, a["out"], a["scratch"], args.cpus)
             for a in arms]
    # drain pipes concurrently so neither JVM blocks on a full pipe
    outs = [None, None]

    def drain(idx):
        outs[idx] = procs[idx].communicate()
    threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    record = {"sf": args.sf, "scratch_mode": args.scratch_mode,
              "cpus_each": args.cpus, "arms": []}
    ok = True
    for a, p, (so, se) in zip(arms, procs, outs):
        crashes = [ln for ln in se.splitlines()
                   if ln.startswith("[verify] ") and " failed: " in ln]
        summary = [ln for ln in so.splitlines()
                   if ln.startswith("[verify-summary]")]
        marker = os.path.exists(f"{a['out']}/_GRAFT_RUNNING")
        rc, tally, oc_out = oracle_check(args.sf, a["out"])
        stale = [ln for ln in oc_out.splitlines() if "_GRAFT_STALE" in ln]
        arm_ok = (p.returncode == 0 and not crashes and not marker
                  and rc == 0 and tally is not None and tally[1] == 0
                  and not stale)
        ok = ok and arm_ok
        record["arms"].append({
            "out": os.path.relpath(a["out"], ROOT),
            "scratch": a["scratch"], "exit": p.returncode,
            "verify_summary": summary, "query_crashes": crashes,
            "running_marker_survived": marker,
            "oracle_tally": tally, "stale_sentinels": stale,
            "ok": arm_ok})
        print(f"[chaos] arm {a['i']}: exit={p.returncode} "
              f"crashes={len(crashes)} marker={marker} tally={tally} "
              f"-> {'OK' if arm_ok else 'FAIL'}", file=sys.stderr)
        if not arm_ok and crashes:
            print("\n".join(crashes[:10]), file=sys.stderr)
    # the two arms must agree with each other exactly (same dataset,
    # deterministic queries): identical tallies is the cheap cross-check
    tallies = [a["oracle_tally"] for a in record["arms"]]
    if tallies[0] != tallies[1]:
        ok = False
        print(f"[chaos] tallies differ between arms: {tallies}",
              file=sys.stderr)
    record["verdict"] = "clean" if ok else "violated"
    out = f"{ROOT}/target/chaos_concurrent_{ts}.json"
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(f"[chaos] verdict={record['verdict']} -> "
          f"{os.path.relpath(out, ROOT)}")
    for a in arms:
        if a["scratch"]:
            shutil.rmtree(a["scratch"], ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
