#!/usr/bin/env python3
"""Builds the float64-embeddings-refresh fixture the ANN-oracle
refresh-proofing claim is probed against (SURVEY.md §2c residual risk,
VERDICT r11 ask #3).

Copies every table of a source sf dir into <outDir>, but rewrites
`embeddings.embedding` as array<double> with every component perturbed
by a sub-float32-ulp factor (x -> x * (1 + 2^-30)): representable in
float64, rounds back to the ORIGINAL float32 — the exact "refresh
carries more precision" case. A plain cast would test nothing.

Then the REAL driver gate is run against the fixture:

    python3 tools/float64_refresh_probe.py /root/testdata/sf0.001 target/sf0.001_f64
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify target/sf0.001_f64 target/verify_f64 \
        ann_topk_bruteforce,ann_topk_batch,dedup_embedding_cosine"
    python3 tools/oracle_check.py target/sf0.001_f64 target/verify_f64

PASS on all three = Spark (conform -> float32 -> quantize) and DuckDB
(QuantSql's CAST(x AS REAL) pin) hash-agree on genuinely-float64 files,
with the actual DuckDB engine evaluating the actual oracle SQL — the
half EmbeddingsFloat64Spec's in-JVM emulation cannot cover.
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, out = sys.argv[1], sys.argv[2]
    # rebuild from scratch: exist_ok alone would let tables from a PRIOR
    # run's (different) source survive into this fixture — the recurring
    # stale-scratch class (artifact gated on existence, not provenance)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        if t != "embeddings":
            shutil.copyfile(p, f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT * REPLACE (
            list_transform(embedding,
              x -> CAST(x AS DOUBLE) * (1 + pow(2.0, -30))) AS embedding)
          FROM '{src}/embeddings.parquet'
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    typ = con.execute(
        f"SELECT typeof(embedding) FROM '{out}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    assert "DOUBLE" in typ, f"fixture not float64: {typ}"
    print(f"[f64-probe] wrote {out} (embedding: {typ})")


if __name__ == "__main__":
    main()
