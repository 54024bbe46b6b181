#!/usr/bin/env python3
"""Edge-case oracle probe: run the REAL engine-vs-DuckDB gate — the full
query battery, not a subset — on fixtures the shipped testdata never
contains:

pass 1 (degenerate rows): a referentially-consistent shrunk sample of
every sf0.001 table PLUS planted degenerate rows — NULL join keys,
NULL/zero/negative measures, NULL group-by keys, empty and
unicode/quote-bearing strings, orphan foreign keys, zero-token and NULL
document bodies, VT whitespace, NULL/mistyped/nested event props,
NULL / zero-norm embeddings, EXTREME-MAGNITUDE keys (Int/Long
Min/MaxValue ids — the 64-bit abs/mul-overflow class, r15), and
STREAMING TIME EXTREMES (epoch-boundary, far-future watermark driver,
late/out-of-order arrivals ~127 years older than the final watermark —
the append-emission / dedup / stream-stream-join drop-vs-emit class,
r16; see STREAM_EXTREME_EVENT_ROWS).

pass 2 (empty tables): the SAME battery over fully empty tables (schema
preserved) — the count-over-empty / sum-returns-NULL divergence class.

pass 3 (epoch guard, INVERTED): one zeroed-timestamp event planted; the
row-level-late-filter streaming queries must FAIL LOUD with the ingest
guard's message (r17 contract) — a silent drop fails the arm.

pass 4 (stale result dir, INVERTED): a query that crashes in Verify
while writing into a REUSED outDir must not leave the previous run's
result dir behind — a surviving dir would make oracle_check compare
the stale (typically hash-matching) data as a spurious PASS (the r17
review residue of the crashed-query manifest fix). The arm runs
wordcount twice into one outDir — once over a good fixture, once over
a fixture missing the documents table — and demands the stale dir is
gone and oracle_check FAILS the attempted name with exit 1.

Each pass runs graft.Verify (ALL registered queries — a rows-only query
that crashes on degenerate input is a finding too) and diffs with
tools/oracle_check.py, the exact compare the driver runs. The probe
demands: zero engine crashes, zero oracle fails, and a pass count equal
to the full oracle registry (so a query silently skipped counts as a
failure, not a free pass).

Usage: python3 tools/edge_oracle_probe.py   (needs target/scala-2.13/classes
built; writes scratch under /tmp/graft_edge_probe)
"""
import glob
import json
import os
import re
import shutil
import subprocess
import sys

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
SCRATCH = "/tmp/graft_edge_probe"

# ---------------------------------------------------------------------------
# planted documents (unchanged contract from the 40-query probe: the text
# pipeline's zero-token / NULL / VT-whitespace arms) + lang/source edge rows
# for the hive-partitioned lines dump and the per-source samplers
DOC_ROWS = [
    # >=20 tokens of English prose: the one planted row the curation gate keeps
    (900001, "the cat sat on the mat and the dog lay by the door "
             "while the bird flew over the tall tree in the yard", "en", "planted"),
    (900002, "!!! ??? ... --- !!!", "en", "planted"),   # zero tokens after punct strip
    (900003, None, "en", "planted"),                     # NULL body
    (900004, "alpha\x0bbeta gamma", "en", "planted"),    # VT ws (Java \s, not RE2 \s)
    (900005, "tab\tand\nnewline\x0cform feed", "en", "planted"),  # rest of \s
    (900006, "a plain short doc about rivers and stones", None, None),  # NULL lang+source
    (900007, 'quote " comma , doc', "pt-BR", 'src "q"'),  # non-[a-z]+ lang; quoted source
    # astral-plane (surrogate-pair) content: UTF-16-unit engines count
    # these chars as 2 where codepoint engines count 1 — the length /
    # substr / regex / fingerprint divergence class
    (900008, "smile \U0001F600 and \U0001D54F marks the spot here today",
     "en", "planted"),
]

# streaming-extremes arm (r16, VERDICT r15 ask 3): late/out-of-order and
# extreme event TIMES through the WATERMARKED streaming paths
# (stream_hourly_append, stream_sessions_append, stream_dedup,
# stream_stream_join) — the one domain the r15 fixture deliberately kept
# inside the 2024 window. What each planted user pins:
#   900101 — epoch-boundary: a click at 1970-01-01T00:00:00.001 — one
#     millisecond past the INITIAL watermark (batch 1 of an AvailableNow
#     run executes against watermark = epoch 0, and the row-level late
#     filters of dropDuplicatesWithinWatermark and the stream-stream join
#     drop ts <= watermark: a ts of EXACTLY 0 is dropped, measured r16
#     and pinned engine-side in StreamExtremesSpec; the windowed aggs
#     filter on window END and keep it) — plus a purchase 20 min later →
#     an epoch-starting session and a stream-stream joined pair.
#   900103 — far-future watermark driver: a click/purchase pair at
#     2150-12-31T23:00/23:30 becomes the global max(ts), dragging the
#     final append watermark ~127 years forward — every 2024 window and
#     session must now EMIT (state evicted) while 900103's own window and
#     session end past the watermark and must be HELD BACK; the
#     max(ts)-relative oracle truncations express exactly this.
#   900104 — late/out-of-order: rows appended LAST in file order (after
#     the 2150 driver) with event times ~127 years OLDER than the final
#     watermark. Single-batch AvailableNow semantics: batch 1 runs at
#     watermark = epoch, so these rows are aggregated/deduped/joined like
#     any others and their long-closed windows emit at the terminal
#     flush — the duplicate (user, type, day) click pair must collapse in
#     stream_dedup, and the purchase joins BOTH clicks (within 1 h).
# PRE-epoch event times are deliberately ABSENT: rows before the initial
# watermark are dropped by every watermarked stateful operator in batch 1
# (real Spark drop semantics the full-battery batch oracles cannot
# express) — pinned engine-side in StreamExtremesSpec instead.
STREAM_EXTREME_EVENT_ROWS = [
    (910001, "1970-01-01T00:00:00.001", 900101, "click", 1.0, '{"k": 1}'),
    (910002, "1970-01-01T00:20:00", 900101, "purchase", 2.0, '{"k": 2}'),
    (910003, "2150-12-31T23:00:00", 900103, "click", 1.0, '{"k": 3}'),
    (910004, "2150-12-31T23:30:00", 900103, "purchase", 2.0, '{"k": 4}'),
    (910005, "2023-12-20T10:00:00", 900104, "click", 1.0, '{"k": 5}'),
    (910006, "2023-12-20T10:05:00", 900104, "click", 1.5, '{"k": 6}'),
    (910007, "2023-12-20T10:20:00", 900104, "purchase", 2.5, '{"k": 7}'),
]

# (event_type, value, props) — the error/value>=490 rows feed
# q_join_anti_nullaware's `blocked` CTE; the mistyped error props puts the
# NULL arm INSIDE the blocked set — the exact null-aware semantics that
# query exists to pin.
EVENT_ROWS = [
    ("click", 0.0, '{"k": 7}'),         # the fixture's clean shape
    ("view", 1.0, '{"k": "abc"}'),      # type mismatch: lenient cast must NULL
    ("click", 2.0, '{"x": 1}'),         # extracted key absent
    ("view", 3.0, None),                 # NULL props
    ("click", 4.0, '{"k": {"a": 1}}'),  # nested value
    ("error", 500.0, '{"k": 7}'),       # blocked: clean key
    ("error", 495.0, '{"k": "abc"}'),   # blocked: extraction-NULL arm
]

EMB_DIM = 64  # must match the real corpus: ANN ops assume one dim per table

# the same JPMS opens build.sbt injects (Spark 4 on JDK 17 outside
# spark-submit) — without sun.util.calendar every driver-side
# java.sql.Date decode (collected max(day) anchors) throws
# EXPRESSION_DECODING_FAILED and reads as a fake engine bug
JPMS_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]


def sampled(con, sql):
    return con.sql(sql).arrow()


def build_tables():
    """Referentially-consistent shrunk sample of sf0.001 + planted rows."""
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    # the sampled KEY SETS are materialized ONCE and every dependent
    # sample reads them — duplicating the LIMIT subqueries per table
    # would let one edited LIMIT silently break the referential
    # consistency this fixture exists to guarantee
    con.execute("""CREATE TEMP TABLE cust_keys AS
        SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 30""")
    con.execute("""CREATE TEMP TABLE order_keys AS
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM cust_keys)
        ORDER BY o_orderkey LIMIT 80""")
    region = sampled(con, "SELECT * FROM region")
    nation = sampled(con, "SELECT * FROM nation")
    supplier = sampled(con, "SELECT * FROM supplier")
    customer = sampled(con, """
        SELECT * FROM customer
        WHERE c_custkey IN (SELECT c_custkey FROM cust_keys)""")
    orders = sampled(con, """
        SELECT * FROM orders
        WHERE o_orderkey IN (SELECT o_orderkey FROM order_keys)""")
    lineitem = sampled(con, """
        SELECT * FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM order_keys)""")
    part = sampled(con, """
        SELECT * FROM part WHERE p_partkey IN (
          SELECT l_partkey FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM order_keys))
        OR p_partkey <= 20""")
    events = sampled(con, "SELECT * FROM events ORDER BY event_id LIMIT 80")
    documents = sampled(con, "SELECT * FROM documents ORDER BY doc_id LIMIT 25")
    embeddings = sampled(con, "SELECT * FROM embeddings ORDER BY vec_id LIMIT 25")
    con.close()

    def extend(base, rows):
        extra = pa.table(
            {f.name: pa.array([r[i] for r in rows], f.type)
             for i, f in enumerate(base.schema)})
        return pa.concat_tables([base, extra])

    # --- TPC-H planted degenerates (keys 90xxxx, clear of the sample;
    #     EXTREME-MAGNITUDE keys probe the 64-bit-arithmetic class the
    #     r15 review found by hand — abs/mul overflow on Min/MaxValue
    #     ids, the magnitudes snowflake-style id spaces actually use) ---
    I32MAX = 2147483647
    I64MAX = 9223372036854775807
    I64MIN = -9223372036854775808
    region = extend(region, [(90, None), (91, ""), (I32MAX, "REGION_X")])
    nation = extend(nation, [
        (90, None, 0), (91, "ZZ-ünïcode", None),
        (I32MAX - 1, "NATION_X", I32MAX)])
    supplier = extend(supplier, [
        (9001, None, None, None),            # NULL name / nationkey / acctbal
        (9002, 'Süpp "q", co', 0, -999.99),
        (I64MAX, "extreme supp", I32MAX - 1, 10.0)])
    part = extend(part, [
        (90001, None, None, None, None, None),   # all-NULL attributes
        (90002, "", "Brand#00", "", 0, 0.0),
        (90003, "neg part", "Brand#99", "ECONOMY ANODIZED STEEL", -1, -5.0),
        (I64MAX, "extreme part", "Brand#77", "STANDARD BURNISHED TIN",
         I32MAX, 55.0)])
    customer = extend(customer, [
        (90001, None, None, None, None),         # all-NULL attributes
        (90002, "", 0, -10.5, ""),
        (90003, 'Ünï "q" cust', 1, 0.0, "BUILDING"),
        (I64MAX, "extreme key cust", I32MAX - 1, 123.45, "MACHINERY"),
        # astral-pair names at Levenshtein-codepoint distance exactly 1
        # (one surrogate-pair INSERTION, one astral-for-astral
        # SUBSTITUTION): a UTF-16-unit edit distance reads both as 2
        # and diverges from DuckDB's codepoint distance at the <= 1
        # boundary of the fuzzy-name join
        (90004, "astral \U0001F600 cust", 2, 1.0, "AUTOMOBILE"),
        (90005, "astral \U0001F600\U0001F600 cust", 2, 2.0, "AUTOMOBILE"),
        (90006, "astral \U0001D54F cust", 3, 3.0, "HOUSEHOLD")])
    ts = lambda s: None if s is None else ts_iso(s)
    orders = extend(orders, [
        (900001, 90001, "", None, None, None),   # NULL price/date/priority
        (900002, 90002, "O", 0.0, ts("1995-06-15"), "1-URGENT"),
        (900003, 4242424, "F", 1.0, ts("1996-01-02"), "5-LOW"),  # orphan custkey
        (900004, None, "O", 2.0, ts("1996-03-03"), "2-HIGH"),    # NULL custkey
        (I64MAX, I64MAX, "F", 100.0, ts("1996-06-01"), "3-MEDIUM"),
        # time-domain extremes (batch tables only — events stay inside
        # the 2024 window so streaming watermark semantics are
        # untouched): pre-epoch and far-future order dates pin
        # year/strftime/date_format parity off the TPC-H date windows
        (900005, 90003, "F", 3.0, ts("1965-05-05"), "5-LOW"),
        (900006, 90003, "O", 4.0, ts("2150-12-31"), "4-NOT SPECIFIED")])
    lineitem = extend(lineitem, [
        # NULL measures and NULL group-by keys on a planted order
        (900001, 90001, 9001, 1, None, None, None, None, None, None, None),
        # zero quantity, zero price, discount 1.0 (revenue multiplier 0)
        (900002, 90002, 9002, 1, 0.0, 0.0, 1.0, 0.0, "N", "O", ts("1995-06-17")),
        # negative quantity/price
        (900002, 90003, 9002, 2, -3.0, -100.0, 0.05, 0.01, "R", "F", ts("1995-07-01")),
        # orphan order/part/supp keys
        (8888888, 7777777, 666666, 1, 5.0, 500.0, 0.1, 0.02, "A", "F", ts("1996-02-10")),
        # NULL orderkey (NULL join key through every lineitem join)
        (None, 90001, 9001, 3, 2.0, 20.0, 0.0, 0.0, "N", "O", ts("1996-05-05")),
        # extreme-magnitude keys on a consistent planted order: the
        # MaxValue l_partkey makes the z-order key RANGE span ~1e19 —
        # the 64-bit normalization-overflow arm — and the MaxValue
        # order/supp keys ride every lineitem join and bucket write
        (I64MAX, I64MAX, I64MAX, 1, 5.0, 500.0, 0.1, 0.02, "N", "O",
         ts("1996-06-03")),
        # pre-epoch / far-future ship dates on the planted time-extreme
        # orders: the z-order date span widens to ~185 years (the
        # datediff × 65535 arm), and Q1's ≤1998 window now spans a
        # pre-epoch row in both engines
        (900005, 90003, 9002, 1, 1.0, 10.0, 0.0, 0.0, "R", "F",
         ts("1965-05-06")),
        (900006, 90003, 9002, 1, 2.0, 20.0, 0.0, 0.0, "N", "O",
         ts("2150-12-30"))])

    # --- documents / events / embeddings planted degenerates ---
    documents = extend(
        documents,
        [(i, t, lang, src, len(t) if t else 0)
         for (i, t, lang, src) in DOC_ROWS]
        # extreme-magnitude doc ids: ride md5-coin sampling, %-derived
        # eval carve-outs, range-partitioned stable ids / prefix sums,
        # and the first-occurrence chunk window at both ends of the
        # id ordering (distinctive vocab: never near-dups anything)
        + [doc_row(I64MAX, "zebra quokka axolotl wombat numbat"),
           doc_row(I64MIN,
                   "xylophone marimba vibraphone celesta glockenspiel")])
    base_us = 1704067200000000 + 4 * 86400000000  # 2024-01-05 UTC, in-range
    events = extend(events, [
        (900001 + i, ts_us(base_us + i * 1000000), 900001, et, v, p)
        for i, (et, v, p) in enumerate(EVENT_ROWS)]
        # extreme event/user ids through the %-arm CASEs, lead/lag
        # tiebreaks, sessionization, and the partitioned format sinks
        + [(I64MAX, ts_us(base_us + 50000000), I64MAX, "click", 1.0, '{"k": 1}'),
           (I64MIN, ts_us(base_us + 51000000), I64MAX, "view", 2.0, '{"k": 2}')]
        # streaming time extremes LAST in file (= arrival) order, so the
        # 2023 rows arrive after the 2150 watermark driver — see the
        # STREAM_EXTREME_EVENT_ROWS doc. Each planted user's own span
        # stays under an hour: events_resample's per-user hourly grid and
        # the retention 64-day state bitmap are per-user linear, so ONLY
        # per-user spans may not stretch (a single user seen in both 1970
        # and 2150 would demand a ~1.6M-cell grid and a >64-day bitmap)
        + [(i, ts_iso(s), u, et, v, p)
           for (i, s, u, et, v, p) in STREAM_EXTREME_EVENT_ROWS])
    vecs = [[((7 * i + 3 * d) % 11 - 5) / 7.0 for d in range(EMB_DIM)]
            for i in range(11)]
    embeddings = extend(embeddings, [
        (900001 + i, v, i % 3)
        for i, v in enumerate(vecs + [None, [0.0] * EMB_DIM])]
        # extreme vec ids: pair tiling's multiplicative block hash, the
        # (x < y) pair orientation, and top-k id tiebreaks at both ends
        + [(I64MAX, vecs[0], 0), (I64MIN, vecs[1], 1)])

    return {"region": region, "nation": nation, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders,
            "lineitem": lineitem, "events": events, "documents": documents,
            "embeddings": embeddings}


def doc_row(doc_id, text, lang="en", source="planted"):
    """A planted documents row with n_chars DERIVED from the text, the
    same invariant the DOC_ROWS comprehension maintains (a hand-counted
    literal drifted off-by-one once)."""
    return (doc_id, text, lang, source, len(text))


def ts_us(us):
    return (datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            + datetime.timedelta(microseconds=us)).replace(tzinfo=None)


def ts_iso(s):
    """The ONE ISO-timestamp parse for planted fixtures (review r16:
    a lambda twin drifted beside it) — None-intolerant on purpose; the
    orders `ts` lambda adds the None arm its rows need."""
    return datetime.datetime.fromisoformat(s)


def run_verify(data_dir, out_dir, tbls, subset=None):
    """Plant `tbls` and launch the real engine's graft.Verify over them —
    ONE launch recipe for every pass (classpath, JPMS opens, heap), so
    pass 3 cannot drift onto a differently-configured engine."""
    os.makedirs(data_dir)
    for name, t in tbls.items():
        pq.write_table(t, f"{data_dir}/{name}.parquet")
    cp = f"{ROOT}/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    opens = [f"--add-opens={p}=ALL-UNNAMED" for p in JPMS_OPENS]
    return subprocess.run(
        ["java", "-cp", cp, "-Xmx8g", *opens, "graft.Verify",
         data_dir, out_dir] + ([subset] if subset else []),
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})


def run_pass(label, data_dir, out_dir, tbls):
    """Run the FULL battery + oracle_check over planted `tbls`; demand
    zero crashes, zero fails, full pass count."""
    r = run_verify(data_dir, out_dir, tbls)
    crashed = [l for l in r.stderr.splitlines() if "[verify] " in l]
    if r.returncode != 0 or crashed:
        print("\n".join(crashed) or r.stderr[-3000:])
        sys.exit(f"engine Verify CRASHED on the {label} fixture "
                 f"(exit {r.returncode}, {len(crashed)} query failures)")
    with open(f"{out_dir}/oracle_sql.json") as f:
        n_oracle = len(json.load(f))
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/oracle_check.py", data_dir, out_dir],
        capture_output=True, text=True)
    print(r.stdout, end="")
    last = r.stdout.splitlines()[-1] if r.stdout.splitlines() else ""
    m = re.match(r"(\d+) pass, (\d+) fail, (\d+) rows-only", last)
    if r.returncode != 0 or not m or int(m.group(2)) != 0:
        if r.stderr:
            print(r.stderr[-2000:], file=sys.stderr)
        sys.exit(f"EDGE PROBE FAILED — engine and oracle diverge on the "
                 f"{label} fixture")
    if int(m.group(1)) != n_oracle:
        sys.exit(f"EDGE PROBE INCOMPLETE on {label}: {m.group(1)} oracle "
                 f"passes but the registry holds {n_oracle} — a query was "
                 "skipped or wrote no result")
    print(f"[{label}] {m.group(1)}/{n_oracle} oracle queries pass, "
          f"{m.group(3)} rows-only ran without crashing")


def run_epoch_guard_pass(tbls):
    """Pass 3 (r17, VERDICT r16 ask 4): plant one zeroed-timestamp event
    (ts exactly 1970-01-01T00:00:00) and one NULL-timestamp event — the
    two corruption shapes — and demand the two row-level-late-filter
    queries FAIL LOUD with the ingest guard's message instead of
    silently dropping the rows. This is the INVERTED arm: the engine
    crashing here is the contract."""
    data_dir, out_dir = f"{SCRATCH}/data_epoch", f"{SCRATCH}/verify_epoch"
    events = tbls["events"]
    # one zeroed ts and one NULL ts — both members of the class the
    # guard counts (a NULL event time vanishes in the late filters just
    # as silently, review r17)
    planted = pa.table(
        {f.name: pa.array([v, w], f.type) for f, (v, w) in zip(
            events.schema,
            [(920001, 920002), (ts_iso("1970-01-01T00:00:00"), None),
             (920001, 920002), ("click", "purchase"), (1.0, 2.0),
             ('{"k": 0}', '{"k": 0}')])})
    tbls = {**tbls, "events": pa.concat_tables([events, planted])}
    r = run_verify(data_dir, out_dir, tbls,
                   subset="stream_dedup,stream_stream_join")
    failed = [l for l in r.stderr.splitlines() if "[verify] " in l]
    for q in ["stream_dedup", "stream_stream_join"]:
        hits = [l for l in failed if f"[verify] {q} failed:" in l]
        if not (hits and "1970-01-01T00:00:00Z" in hits[0]):
            print("\n".join(failed) or r.stderr[-3000:])
            sys.exit(f"EPOCH-GUARD ARM FAILED: {q} did not fail loud on a "
                     "zeroed timestamp (expected the ingest-guard message; "
                     "a silent drop is the pre-r17 bug)")
    print("[epoch-guard] both row-filter queries failed loud on a zeroed "
          "timestamp (ingest contract holds)")


def run_stale_dir_pass(tbls):
    """Pass 4 (r17 review, INVERTED): a crashed query in a REUSED outDir
    must not serve the previous run's results. Without the crash-path
    delete, run 2's wordcount crash leaves run 1's dir where the
    manifest check finds it and oracle_check PASSes on stale data."""
    out_dir = f"{SCRATCH}/verify_stale"
    r = run_verify(f"{SCRATCH}/data_stale_good", out_dir, tbls,
                   subset="wordcount")
    if r.returncode != 0 or not os.path.isdir(f"{out_dir}/wordcount"):
        print(r.stderr[-2000:])
        sys.exit("STALE-DIR ARM SETUP FAILED: wordcount did not write its "
                 "result dir on the good fixture")
    # run 2 into the SAME outDir, over a fixture with no documents table:
    # wordcount crashes before its write
    broken_dir = f"{SCRATCH}/data_stale_broken"
    broken = {n: t for n, t in tbls.items() if n != "documents"}
    r = run_verify(broken_dir, out_dir, broken, subset="wordcount")
    if not any("[verify] wordcount failed:" in l
               for l in r.stderr.splitlines()):
        print(r.stderr[-2000:])
        sys.exit("STALE-DIR ARM SETUP FAILED: wordcount did not crash on "
                 "the documents-less fixture")
    if os.path.isdir(f"{out_dir}/wordcount"):
        sys.exit("STALE-DIR ARM FAILED: the crashed query's previous "
                 "result dir survived the re-run — oracle_check would "
                 "compare stale data as a spurious PASS (the pre-r17 bug)")
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/oracle_check.py", broken_dir, out_dir],
        capture_output=True, text=True)
    if r.returncode == 0 or "FAIL  wordcount: no result dir" not in r.stdout:
        print(r.stdout[-2000:])
        sys.exit("STALE-DIR ARM FAILED: oracle_check did not fail the "
                 "crashed query (expected 'no result dir' + exit 1)")
    print("[stale-dir] crashed query's stale result dir deleted; "
          "oracle_check fails it loud (reused-outDir contract holds)")
    # sub-arm (r18, ADVICE r17): when Verify CANNOT delete a stale dir it
    # plants a _GRAFT_STALE sentinel instead — oracle_check must FAIL the
    # query on the sentinel rather than comparing the dir's (otherwise
    # hash-matching) parquet as a spurious PASS. Recreate the good state,
    # then plant the sentinel to simulate the undeletable-dir outcome.
    r = run_verify(f"{SCRATCH}/data_stale_good2", out_dir, tbls,
                   subset="wordcount")
    if r.returncode != 0 or not os.path.isdir(f"{out_dir}/wordcount"):
        sys.exit("STALE-SENTINEL ARM SETUP FAILED: wordcount rerun did not "
                 "write its result dir")
    with open(f"{out_dir}/wordcount/_GRAFT_STALE", "w") as f:
        f.write("planted by edge probe")
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/oracle_check.py",
         f"{SCRATCH}/data_stale_good2", out_dir],
        capture_output=True, text=True)
    if r.returncode == 0 or "FAIL  wordcount: stale result dir" not in r.stdout:
        print(r.stdout[-2000:])
        sys.exit("STALE-SENTINEL ARM FAILED: oracle_check did not fail the "
                 "sentinel-marked dir (it would compare stale data as PASS)")
    print("[stale-dir] _GRAFT_STALE sentinel fails the query loud "
          "(undeletable-dir contract holds)")
    # sub-arm (r19, ADVICE r18): a hard death MID-BATTERY leaves the
    # _GRAFT_RUNNING marker scrubStale wrote at startup (a completed run
    # deletes it right after the manifest). oracle_check must fail the
    # WHOLE outDir on it — a subset-run death leaves no manifest while
    # unattempted names' stale dirs survive, and the dir-driven loop
    # would otherwise compare them as PASS behind a stderr NOTE.
    # Simulate by re-planting the marker after the completed run above.
    os.remove(f"{out_dir}/wordcount/_GRAFT_STALE")
    with open(f"{out_dir}/_GRAFT_RUNNING", "w") as f:
        f.write("planted by edge probe")
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/oracle_check.py",
         f"{SCRATCH}/data_stale_good2", out_dir],
        capture_output=True, text=True)
    if r.returncode == 0 or "died mid-battery" not in r.stdout:
        print(r.stdout[-2000:])
        sys.exit("RUNNING-MARKER ARM FAILED: oracle_check did not hard-fail "
                 "an outDir carrying _GRAFT_RUNNING (a mid-battery death "
                 "would compare stale dirs as PASS)")
    os.remove(f"{out_dir}/_GRAFT_RUNNING")
    print("[stale-dir] _GRAFT_RUNNING marker hard-fails the outDir "
          "(mid-battery-death contract holds)")


def main():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    tbls = build_tables()
    run_pass("degenerate-rows", f"{SCRATCH}/data", f"{SCRATCH}/verify", tbls)
    # pass 2: the SAME battery over fully EMPTY tables (schema preserved)
    empties = {n: t.slice(0, 0) for n, t in tbls.items()}
    run_pass("empty-tables", f"{SCRATCH}/data_empty",
             f"{SCRATCH}/verify_empty", empties)
    # pass 3: the INVERTED epoch-guard arm (expected loud failure)
    run_epoch_guard_pass(tbls)
    # pass 4: the INVERTED stale-result-dir arm (expected loud failure)
    run_stale_dir_pass(tbls)
    # pass 5 (r20, VERDICT r19 task 4): two SIMULTANEOUS full batteries
    # over the degenerate fixture — the concurrent-Verify contract
    # (scratch isolation, memo rebuild races, marker lifecycle) proven
    # on the nastiest data the sequential passes already pin. Delegates
    # to the dedicated chaos tool so the launch/check recipe exists once.
    r = subprocess.run(
        [sys.executable, f"{ROOT}/tools/chaos_concurrent_verify.py",
         "--sf", f"{SCRATCH}/data", "--scratch-mode", "default",
         "--cpus", "8"],
        capture_output=True, text=True)
    print(r.stdout, end="")
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        sys.exit("CONCURRENT ARM FAILED: two simultaneous Verify batteries "
                 "over the degenerate fixture did not both finish green")
    print("[concurrent] two simultaneous batteries green "
          "(scratch/memo/marker contracts hold under contention)")
    print("edge probe OK: FULL battery, engine == DuckDB oracle on the "
          "degenerate fixture (NULL keys/measures, orphan FKs, empty+unicode "
          "strings, zero-token/NULL docs, NULL/mistyped props, NULL/zero-norm "
          "embeddings) and on fully EMPTY tables")


if __name__ == "__main__":
    main()
