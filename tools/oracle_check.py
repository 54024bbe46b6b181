#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir: load the Spark parquet result, run
oracleSql[name] from oracle_sql.json in DuckDB against the sfDir parquet
tables, sort columns by name and rows by all columns, and compare
rowcount / schema / values exactly (the driver hash-compares, so exact
equality is the bar).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return ([cols[i] for i in order], [types[i] for i in order], out)


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # sign-strict: the driver's hash compares encodings, and -0.0 and
        # 0.0 encode differently — Python's -0.0 == 0.0 would green-light
        # a query the real gate fails (a signed-zero mismatch may also
        # misalign the str-sorted rows; the resulting FAIL then points at
        # whichever cell differs between the misaligned rows, which is
        # correct-but-indirect)
        return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
    # container-typed cells (array/struct columns arrive as lists/dicts):
    # recurse so the float rules above reach NESTED cells — a bare ==
    # would green-light [0.0] vs [-0.0] (the driver's encoding hash fails
    # it) and spuriously fail [nan] vs [nan] (the driver passes it)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(
            cells_equal(a[k], b[k]) for k in a)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional builder-side name filter (comma-separated); the driver
    # always calls with two args, so the gate path never hits this —
    # it exists for re-checking a handful of queries against a big
    # (slow-oracle) fixture without re-paying the full battery
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    # Verify writes _GRAFT_RUNNING at startup scrub and removes it only
    # after the manifest lands (ADVICE r18): if it is still here the run
    # died mid-battery and EVERY result dir in this outDir is suspect —
    # a subset-run death used to leave no manifest while unattempted
    # names' stale dirs from an earlier broader run compared as PASS
    # with only a stderr NOTE. Hard fail, no per-query narration.
    if os.path.exists(f"{out_dir}/_GRAFT_RUNNING"):
        print(f"FAIL  {out_dir}: _GRAFT_RUNNING marker present — the "
              "Verify run died mid-battery; every result dir here is "
              "suspect. Re-run Verify before comparing.")
        print("\n0 pass, 1 fail, 0 rows-only")
        sys.exit(1)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rowsonly = 0
    # A query that CRASHED inside Verify writes no result dir — a purely
    # dir-driven compare would then report one fewer PASS and exit 0
    # (green when not green). Verify writes the names it attempted as
    # query_names.json; fail every attempted name with no dir. Dirs not
    # in the manifest (stale from an earlier broader run into the same
    # outDir — the builder's incremental workflow) keep today's behavior.
    manifest_path = f"{out_dir}/query_names.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            attempted = json.load(f)
        for name in sorted(set(attempted) - set(names)):
            print(f"FAIL  {name}: no result dir — query crashed in Verify "
                  "(see its [verify] stderr line)")
            n_fail += 1
    else:
        # pre-r17 Verify output (possibly a SUBSET run — the filter arg
        # writes only the selected dirs): keep the legacy dir-driven
        # behavior rather than spuriously failing every absent oracle
        # name with a misleading "crashed" message, but say the
        # crashed-query detection is off
        print("NOTE  query_names.json missing (pre-r17 Verify output?) — "
              "crashed-query detection unavailable for this outDir",
              file=sys.stderr)
    # A filtered run must never masquerade as a full-battery hold: print
    # a loud subset banner up front and in the summary (ADVICE r19 —
    # without it a saved "N pass, 0 fail" log reads like a full compare).
    n_skipped = 0
    if only is not None:
        selected = [n for n in names if n in only]
        n_skipped = len(names) - len(selected)
        print(f"[subset] comparing {len(selected)} of {len(names)} result "
              f"dirs (filter: {','.join(sorted(only))}) — NOT a "
              "full-battery hold")
    for name in names:
        if only is not None and name not in only:
            continue
        # Verify plants this sentinel into a stale result dir it FAILED to
        # delete (crash path or startup scrub; ADVICE r17) — the parquet
        # files in such a dir are the PREVIOUS run's data and would
        # otherwise compare as a spurious PASS.
        if os.path.exists(f"{out_dir}/{name}/_GRAFT_STALE"):
            print(f"FAIL  {name}: stale result dir Verify could not delete "
                  "(_GRAFT_STALE sentinel present)")
            n_fail += 1
            continue
        try:
            rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = list(rel.columns)
            stypes = [str(t) for t in rel.types]
            srows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(srows)} (no oracle; rows-only)")
            n_rowsonly += 1
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        scols2, stypes2, srows2 = canon(srows, scols, stypes)
        ocols2, otypes2, orows2 = canon(orows, ocols, otypes)
        if scols2 != ocols2:
            print(f"FAIL  {name}: schema {scols2} != {ocols2}")
            n_fail += 1
            continue
        # Type-strict: the driver's hash is type-aware, so an un-cast DuckDB
        # integer sum() (HUGEINT) vs Spark's BIGINT must fail HERE, not there.
        if stypes2 != otypes2:
            diffs = [(c, s, o) for c, s, o in zip(scols2, stypes2, otypes2)
                     if s != o]
            print(f"FAIL  {name}: column types differ: {diffs}")
            n_fail += 1
            continue
        if len(srows2) != len(orows2):
            print(f"FAIL  {name}: rows {len(srows2)} != {len(orows2)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(srows2, orows2)):
            for c, (x, y) in enumerate(zip(sr, orow)):
                if not cells_equal(x, y):
                    bad = (i, scols2[c], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL  {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(srows2)}")
            n_pass += 1
    subset_note = (f" [subset: {n_skipped} dirs skipped by filter]"
                   if n_skipped else "")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only"
          f"{subset_note}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
