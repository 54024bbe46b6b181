#!/usr/bin/env python3
"""Edge-case oracle probe: run the REAL engine-vs-DuckDB gate on planted
degenerate rows the shipped fixtures never contain —

documents: a zero-token (all-punctuation) document, a NULL body, and
vertical-tab (U+000B) whitespace;
events: a NULL props, a type-mismatched {"k": "abc"}, a props without
the extracted key, and a nested-object value.

TextEdgeCasesSpec pins the ENGINE half of the text semantics; this probe
executes the ORACLE half (the rewritten explicit whitespace classes in
Text.WsClassRe2 / ContentHashSql / textTokenCountSql, NULL propagation,
empty-list sums, the events TRY_CAST / has_missing CASE arms) through
DuckDB on the same rows and diffs the two with tools/oracle_check.py —
the exact compare the driver runs.

Usage: python3 tools/edge_oracle_probe.py   (needs target/scala-2.13/classes
built; writes scratch under /tmp/graft_edge_probe)
"""
import glob
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/tmp/graft_edge_probe"
DATA = f"{SCRATCH}/data"
OUT = f"{SCRATCH}/verify"

# queries whose oracle SQL the probe must exercise on the degenerate
# rows: every document query that interpolates TokensOracleSql,
# ContentHashSql or the n_bpe class, and every events query that
# extracts from props (lenient-cast / has_missing contract)
QUERIES = ["dedup_exact", "text_token_count", "text_fingerprint",
           "text_stats", "text_quality_filter", "text_array_fns",
           "text_langid", "curation_e2e",
           "events_json_kv", "events_variant", "events_map_fns",
           "q_join_anti_nullaware",
           "mm_metadata", "mm_decode", "mm_resize", "mm_frame_sample",
           # the full token/shingle pipelines over the SAME degenerate
           # docs — zero-token and NULL bodies must flow through
           # tfidf/bm25/LM/inverted-index/shingle oracles as empty sets
           # on BOTH engines, not crash or diverge
           "text_normalize", "text_tfidf", "text_bm25", "text_top_terms",
           "text_vocab_oov", "text_repetition", "text_bigrams",
           "text_lm_score", "text_inverted_index", "text_redact",
           "dedup_near_jaccard", "dedup_minhash_lsh", "dedup_ngram_exact",
           "dedup_chunks", "dedup_survivors", "dedup_decontaminate",
           "doc_stable_ids",
           # events consumers over the NULL/mistyped-props rows
           "events_hourly", "events_histogram", "events_lead_lag",
           # exact-ANN oracles over a NULL embedding (the Similarity
           # hardening's filter) and a ZERO-NORM vector (sim = 0/0:
           # Spark's NaN >= t is FALSE while DuckDB compares NaN as
           # greater — the engines must agree by construction, not luck)
           "ann_topk_bruteforce", "ann_topk_batch",
           "ann_pairs_bruteforce", "dedup_embedding_cosine"]

ROWS = [
    # ≥20 tokens of English prose: the one row the curation gate keeps
    (1, "the cat sat on the mat and the dog lay by the door "
        "while the bird flew over the tall tree in the yard"),
    (2, "!!! ??? ... --- !!!"),          # zero tokens after punct strip
    (3, None),                             # NULL body
    (4, "alpha\x0bbeta gamma"),           # VT whitespace (Java \s, not RE2 \s)
    (5, "tab\tand\nnewline\x0cform feed"),  # the rest of the \s set
]

# (event_type, value, props) — the error/value>=490 rows feed
# q_join_anti_nullaware's `blocked` CTE: without them the NOT-IN set is
# empty and the props-extraction contract is never load-bearing for that
# query (any divergence would compare trivially-equal full counts). The
# mistyped error props puts the NULL arm INSIDE the blocked set — the
# exact null-aware semantics the query exists to pin: both engines must
# agree the set contains NULL (empty result) or the counts diverge.
EVENTS = [
    ("click", 0.0, '{"k": 7}'),        # the fixture's clean shape
    ("view", 1.0, '{"k": "abc"}'),     # type mismatch: lenient cast must NULL, not abort
    ("click", 2.0, '{"x": 1}'),        # extracted key absent
    ("view", 3.0, None),                # NULL props: has_missing groups under NULL
    ("click", 4.0, '{"k": {"a": 1}}'), # nested value: per-field cast NULLs, keys still count
    ("error", 500.0, '{"k": 7}'),      # blocked: clean key
    ("error", 495.0, '{"k": "abc"}'),  # blocked: extraction-NULL arm
]
EVENT_PROPS = [p for (_, _, p) in EVENTS]


def tables():
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "text": pa.array([r[1] for r in ROWS], pa.string()),
        "lang": pa.array(["en"] * len(ROWS), pa.string()),
        "source": pa.array(["planted"] * len(ROWS), pa.string()),
        "n_chars": pa.array([len(r[1]) if r[1] else 0 for r in ROWS], pa.int64()),
    })
    ev = pa.table({
        "event_id": pa.array(range(1, len(EVENT_PROPS) + 1), pa.int64()),
        "ts": pa.array([1700000000000000 + i * 1000000
                        for i in range(len(EVENT_PROPS))], pa.timestamp("us")),
        "user_id": pa.array([1] * len(EVENT_PROPS), pa.int64()),
        "event_type": pa.array([t for (t, _, _) in EVENTS], pa.string()),
        "value": pa.array([v for (_, v, _) in EVENTS], pa.float64()),
        "props": pa.array(EVENT_PROPS, pa.string()),
    })
    # embeddings: 11 deterministic non-trivial vectors, one NULL row
    # (vec_id 11), one all-zero row (vec_id 12, norm 0 → sim 0/0)
    dim = 8
    vecs = [[((7 * i + 3 * d) % 11 - 5) / 7.0 for d in range(dim)]
            for i in range(11)]
    emb = pa.table({
        "vec_id": pa.array(range(13), pa.int64()),
        "embedding": pa.array(vecs + [None, [0.0] * dim],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(13)], pa.int32()),
    })
    return {"documents": docs, "events": ev, "embeddings": emb}


def run_pass(label, data_dir, out_dir, tbls, queries):
    """Plant `tbls`, run the REAL engine Verify + oracle_check, demand
    every query passes. One pass per fixture class."""
    os.makedirs(data_dir)
    for name, t in tbls.items():
        pq.write_table(t, f"{data_dir}/{name}.parquet")
    cp = f"{ROOT}/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    r = subprocess.run(
        ["java", "-cp", cp, "-Xmx4g", "graft.Verify", data_dir, out_dir,
         ",".join(queries)],
        capture_output=True, text=True)
    failed = [l for l in r.stderr.splitlines() if "[verify] " in l]
    if r.returncode != 0 or failed:
        print("\n".join(failed) or r.stderr[-2000:])
        sys.exit(f"engine Verify failed on the {label} fixture "
                 f"(exit {r.returncode})")
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/oracle_check.py", data_dir, out_dir],
        capture_output=True, text=True)
    print(r.stdout, end="")
    last = r.stdout.splitlines()[-1] if r.stdout.splitlines() else ""
    if r.returncode != 0 or not last.startswith(f"{len(queries)} pass, 0 fail"):
        # surface the checker's own crash (import error, corrupt
        # oracle_sql.json) — otherwise a tooling failure reads as a
        # false "divergence" with the real traceback thrown away
        if r.stderr:
            print(r.stderr[-2000:], file=sys.stderr)
        sys.exit(f"EDGE PROBE FAILED — engine and oracle diverge on the "
                 f"{label} fixture")


def main():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    run_pass("degenerate-rows", DATA, OUT, tables(), QUERIES)
    # pass 2: the SAME queries over fully EMPTY tables (schema preserved)
    # — the count-over-empty / sum-returns-NULL divergence class (an
    # aggregate-without-GROUP-BY emits one row whose SUMs are NULL and
    # whose COUNTs are 0; both engines must emit the same single row or
    # the same zero rows)
    empties = {n: t.slice(0, 0) for n, t in tables().items()}
    run_pass("empty-tables", f"{SCRATCH}/data_empty", f"{SCRATCH}/verify_empty",
             empties, QUERIES)
    print("edge probe OK: engine == DuckDB oracle on zero-token/NULL/VT "
          "documents, NULL/mistyped/nested props events, NULL/zero-norm "
          "embeddings, and fully EMPTY tables")


if __name__ == "__main__":
    main()
