#!/usr/bin/env python3
"""Derive an sf1 dataset for the nonlinear-operator scale probe.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md). This tool
extrapolates the two tables the nonlinear operators consume one order
of magnitude up, by EMULATING the observed generative law of the
driver's synthetic data (measured against /root/testdata/sf0.1, seed
fixed, deterministic):

- documents (5,000 -> 50,000 rows): 31-word uniform vocabulary,
  uniform doc length 10..100 words, ~4.9% of docs are a copy of a
  random earlier doc with a +-1-word tail mutation (the structure that
  produces sf0.1's 233 shared-prefix groups of size 2-4 and 8 exact-dup
  groups), lang/source drawn from sf0.1's empirical marginals,
  n_chars = len(text).
- customer (15,000 -> 150,000 rows): only c_name is consumed by
  dedup_fuzzy_names; names extend the observed `Customer#%09d`
  sequential scheme.

Output: <outdir>/{documents,customer,embeddings,orders,lineitem,
events}.parquet (orders/lineitem/events are MULT-x key-offset replicas
for the maint_profile volume probe — see the comments at their writers)
plus dup_pairs.parquet, the generator-derived duplicate ground truth the
sf10 flagship recall receipt consumes.

Usage: python3 tools/make_sf1.py [outdir] [mult] [--vocab-growth]
  default outdir /root/repo/target/sf1, mult 10 (sf1);
  `python3 tools/make_sf1.py /root/repo/target/sf10 100` emits the sf10
  rung (~100x the gate scale, ~1.75 GB parquet).

--vocab-growth (VERDICT r15 ask 2): the REAL-corpus vocabulary law arm
for the two LSH scale paths. The default corpus keeps the driver's
31-word vocabulary FIXED as N grows, so shingle frequencies grow ∝ N and
LSH buckets densify — the adversarial corner behind the measured ~N^1.1+
superlinear walls. Real corpora grow their vocabulary with N instead, so
shingle document-frequencies stay ~flat. This arm measures that law
rather than arguing it: the word vocabulary is synthesized at 31·MULT
words (∝ N, the strongest form of the growth law), every other
generative knob (seed, doc-length law, copy rate and mutation mix,
lang/source marginals) identical to the fixed-vocab corpus, so
vocabulary size is the ONLY changed variable between the two arms.
Writes ONLY documents.parquet + dup_pairs.parquet — the tables the LSH
pair (dedup_minhash_lsh, dedup_components_lsh) and its planted-recall
receipt consume; pair with `sbt "runMain graft.ScaleProbe --lsh <dirs>"`.

This is builder tooling (driver-side python), NOT part of the Spark
library; /root/testdata is never written.
"""
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
VOCAB_GROWTH = "--vocab-growth" in sys.argv
# --vocab-heaps: the Heaps-law middle point between the two measured
# extremes — vocabulary ~ 31*sqrt(MULT) (beta = 0.5, the textbook
# real-corpus exponent) instead of fixed (beta = 0) or proportional
# (beta = 1). Same documents+dup_pairs-only output and guards as
# --vocab-growth; convention: target/sf1h, target/sf10h.
VOCAB_HEAPS = "--vocab-heaps" in sys.argv
if VOCAB_GROWTH and VOCAB_HEAPS:
    sys.exit("--vocab-growth and --vocab-heaps are mutually exclusive")
GROWTH_ARM = VOCAB_GROWTH or VOCAB_HEAPS
argv = [a for a in sys.argv if a not in ("--vocab-growth", "--vocab-heaps")]
# reject unrecognized flags LOUDLY: a typo like --vocab_growth would
# otherwise be consumed as the positional outdir, silently generating
# the BASE arm into a directory named after the typo — the user then
# measures the fixed-vocab adversarial corner believing it is the
# vocab-growth law (review r16)
bad = [a for a in argv[1:] if a.startswith("--")]
if bad:
    sys.exit(f"unrecognized flag(s) {bad}; only --vocab-growth / "
             "--vocab-heaps are supported")
OUT = argv[1] if len(argv) > 1 else "/root/repo/target/sf1"
# scale multiplier over sf0.1: 10 (default) -> sf1, 100 -> sf10. The RNG
# streams are consumed identically per row, so the first 10%-of-rows of an
# sf10 corpus follow the same law (not the same bytes — the copy pool
# grows) as an sf1 run; all documented growth exponents are law-level.
MULT = int(argv[2]) if len(argv) > 2 else 10
N_DOCS = 5_000 * MULT
N_CUST = 15_000 * MULT
COPY_RATE = 0.049  # measured: ~244 copy docs / 5000 at sf0.1

# arm-mixing guard (review r16): --vocab-growth writes ONLY
# documents + dup_pairs, so pointing it at an existing BASE-arm dir
# (e.g. the default target/sf1 after a plain run) would overwrite just
# those two tables and leave a silently MIXED dataset — a vocab-growth
# documents corpus beside base-arm orders/embeddings/customer — that
# every later ScaleProbe run over that dir would measure as if coherent.
if GROWTH_ARM:
    mixed = [t for t in ("orders", "lineitem", "events", "customer",
                         "embeddings")
             if os.path.exists(f"{OUT}/{t}.parquet")]
    if mixed:
        sys.exit(f"the vocab arms refuse to write into {OUT}: it holds "
                 f"base-arm tables {mixed} — use a dedicated dir "
                 "(convention: target/sf1v(h), target/sf10v(h))")
else:
    # the reverse direction (review r16, second pass): a plain run into
    # an existing vocab-growth dir (flag forgotten) would replace the
    # growth-arm corpus with the fixed-vocab one and add the base
    # tables — ScaleProbe --lsh over that dir would then measure the
    # adversarial corner and report it as the real-corpus law. The
    # growth-arm signature is documents+dup_pairs WITHOUT base tables.
    if (os.path.exists(f"{OUT}/documents.parquet")
            and not os.path.exists(f"{OUT}/orders.parquet")):
        sys.exit(f"refusing the BASE arm into {OUT}: it looks like a "
                 "vocab-arm dir (documents+dup_pairs without base "
                 "tables) — pass a vocab flag or use a different dir")

con = duckdb.connect()

if GROWTH_ARM:
    # vocabulary ∝ N (--vocab-growth) or ∝ sqrt(N) (--vocab-heaps, the
    # Heaps-law middle point): 31 words per sf0.1-equivalent of corpus
    # at the strongest law — synthesized tokens, same uniform draw as
    # the base arm
    n_vocab = 31 * MULT if VOCAB_GROWTH else max(31, round(31 * MULT ** 0.5))
    vocab = [f"w{i:06d}" for i in range(n_vocab)]
else:
    vocab = [r[0] for r in con.sql(
        f"select distinct unnest(string_split(text,' ')) w "
        f"from '{SRC}/documents.parquet' order by 1").fetchall()]
    assert len(vocab) == 31, vocab
langs = con.sql(
    f"select lang, count(*) from '{SRC}/documents.parquet' group by 1 order by 1"
).fetchall()
sources = con.sql(
    f"select source, count(*) from '{SRC}/documents.parquet' group by 1 order by 1"
).fetchall()

rng = random.Random(20260813)
lang_names = [l for l, _ in langs]
lang_w = [c for _, c in langs]
src_names = [s for s, _ in sources]
src_w = [c for _, c in sources]

docs = []
# generator-derived duplicate truth: (base_doc_id, copy_doc_id) for every
# copy-branch doc. At sf10 the EXACT components fixpoint (whose edge build
# is the Sigma-df^2 shingle join) is deliberately not run, so the LSH
# recall receipt needs an independent ground truth — these pairs, filtered
# to >=threshold Jaccard at probe time, are exactly that (the generative
# law is the truth the smaller-scale exact oracles already validated).
dup_pairs = []
for doc_id in range(N_DOCS):
    if docs and rng.random() < COPY_RATE:
        base_row = rng.choice(docs)
        base = base_row[1].split()
        dup_pairs.append((base_row[0], doc_id))
        mut = rng.random()
        if mut < 0.4 and len(base) > 10:
            words = base[:-1]                      # drop last word
        elif mut < 0.8:
            words = base + [rng.choice(vocab)]     # append one word
        else:
            words = base                           # exact copy
    else:
        words = [rng.choice(vocab) for _ in range(rng.randint(10, 100))]
    text = " ".join(words)
    docs.append((doc_id, text,
                 rng.choices(lang_names, lang_w)[0],
                 rng.choices(src_names, src_w)[0],
                 len(text)))

os.makedirs(OUT, exist_ok=True)


def copy_rows(rows, schema, dest):
    """Bulk-ingest generated row tuples via a registered pyarrow table —
    executemany runs one prepared INSERT per row, which at MULT=100
    (500k docs, 200k 64-float embeddings) was minutes of pure per-row
    overhead per arm (review r16); identical values, seconds instead."""
    import pyarrow as pa
    tbl = pa.table({f.name: pa.array([r[i] for r in rows], f.type)
                    for i, f in enumerate(schema)})
    con.register("bulk_src", tbl)
    con.sql(f"copy (select * from bulk_src) to '{dest}' (format parquet)")
    con.unregister("bulk_src")


import pyarrow as pa
copy_rows(docs, pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                           ("lang", pa.string()), ("source", pa.string()),
                           ("n_chars", pa.int64())]),
          f"{OUT}/documents.parquet")
# sidecar, NOT one of the ten engine table names: only the ScaleProbe
# flagship receipts read it (Tables accessors and oracle_check never will)
copy_rows(dup_pairs,
          pa.schema([("base_id", pa.int64()), ("copy_id", pa.int64())]),
          f"{OUT}/dup_pairs.parquet")

if GROWTH_ARM:
    # LSH-arm dataset only — see the module doc
    arm = "vocab-growth" if VOCAB_GROWTH else "vocab-heaps"
    print("wrote", OUT, f"({arm} arm: documents + dup_pairs only,",
          f"vocab {len(vocab)} words)")
    for t in ("documents", "dup_pairs"):
        print(t, con.sql(
            f"select count(*) from '{OUT}/{t}.parquet'").fetchone()[0])
    sys.exit(0)

# embeddings (2,000 -> 20,000): measured sf0.1 law = 64-dim unit vectors,
# 10 roughly balanced labels, WEAK label clustering (within-label mean
# cos ~0.019 vs cross-label ~0.001 => centroid weight ~ sqrt(0.019) ~ 0.14
# against unit gaussian noise).
N_VEC = 2_000 * MULT
DIM = 64
N_LABELS = 10
CENTROID_W = 0.14
vrng = random.Random(20260814)
def unit(v):
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v]
centroids = [unit([vrng.gauss(0, 1) for _ in range(DIM)]) for _ in range(N_LABELS)]
vecs = []
for vec_id in range(N_VEC):
    lab = vrng.randrange(N_LABELS)
    noise = [vrng.gauss(0, 1) for _ in range(DIM)]
    noise = unit(noise)
    e = unit([CENTROID_W * c + x for c, x in zip(centroids[lab], noise)])
    vecs.append((vec_id, [float(x) for x in e], lab))
copy_rows(vecs,
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]),
          f"{OUT}/embeddings.parquet")

con.sql(f"""copy (select i as c_custkey,
                   'Customer#' || lpad(cast(i as varchar), 9, '0') as c_name,
                   cast(i % 25 as integer) as c_nationkey,
                   round((i * 7919) % 999999 / 100.0, 2) as c_acctbal,
                   ['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'][(i % 5) + 1]
                     as c_mktsegment
            from range({N_CUST}) t(i))
            to '{OUT}/customer.parquet' (format parquet)""")

# orders / lineitem (10x by key-offset replication): consumed only by the
# maint_profile scale probe, whose claim is "linear in scanned rows with a
# constant Expand factor" — replication with offset keys preserves the
# volume law exactly (key NDVs scale ~10x, low-cardinality flag/price
# NDVs stay ~constant), which is all a profiling scan sees.
# ONE offset for both tables, from orders' max(o_orderkey)+1: lineitem's
# l_orderkey values are a subset of o_orderkey, so a per-table offset
# (max(l_orderkey)+1 <= max(o_orderkey)+1) would shift the two key spaces
# apart and silently break orders<->lineitem referential joins in any
# future sf1 probe (ADVICE r12); the shared offset keeps replica i of
# lineitem joining replica i of orders exactly as the base tables do.
mx = con.sql(
    f"select max(o_orderkey) + 1 from '{SRC}/orders.parquet'").fetchone()[0]
for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
    if t == "orders":
        # o_custkey deliberately NOT offset: its NDV stays constant like
        # the flag columns, while o_orderkey provides the growing-NDV
        # distinct-agg state; referential shape to customer is preserved
        cols = ("o_orderkey + i * cast(%d as bigint) as o_orderkey, "
                "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
                "o_orderpriority" % mx)
    else:
        cols = ("l_orderkey + i * cast(%d as bigint) as l_orderkey, "
                "l_partkey, l_suppkey, l_linenumber, l_quantity, "
                "l_extendedprice, l_discount, l_tax, l_returnflag, "
                "l_linestatus, l_shipdate" % mx)
    con.sql(f"""copy (select {cols}
                from '{SRC}/{t}.parquet', range({MULT}) t(i))
                to '{OUT}/{t}.parquet' (format parquet)""")

# events (10x by key-offset replication): consumed only by the
# maint_profile probe's events arm (the ProfTs timestamp column). Same
# law as orders/lineitem: event_id offsets (growing-NDV key state),
# everything else — ts included — repeats verbatim, so ts NDV and its
# min/max stay constant like the flag columns while scanned rows grow
# 10x. The repeated ts makes replicas non-causal as an event LOG, which
# is fine: no sf1 probe reads events as a timeline, only as profiler
# volume.
ev_mx = con.sql(
    f"select max(event_id) + 1 from '{SRC}/events.parquet'").fetchone()[0]
con.sql(f"""copy (select event_id + i * cast({ev_mx} as bigint) as event_id,
                   ts, user_id, event_type, value, props
            from '{SRC}/events.parquet', range({MULT}) t(i))
            to '{OUT}/events.parquet' (format parquet)""")

# The four UNSCALED dimension tables, copied verbatim from sf0.1 (r19,
# VERDICT r18 task 4: the full-battery oracle hold at sf1 needs every
# table the 173-query surface reads). Correct by construction, not just
# convenient: nation/region are fixed-size in TPC-H, and the
# orders/lineitem replicas above keep l_partkey/l_suppkey/o_custkey in
# the sf0.1 key range, so the sf0.1 part/supplier rows are exactly the
# referenced set — no orphan FKs introduced.
import shutil
for t in ("nation", "region", "part", "supplier"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

print("wrote", OUT)
for t in ("documents", "customer", "embeddings", "orders", "lineitem",
          "events", "nation", "region", "part", "supplier"):
    print(t, con.sql(f"select count(*) from '{OUT}/{t}.parquet'").fetchone()[0])
