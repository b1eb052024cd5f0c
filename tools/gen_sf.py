#!/usr/bin/env python3
"""Builder-side scale-factor data generator (sf1 and beyond).

The driver ships sf0.001/0.01/0.1 (read-only, TESTDATA.md); the full gate
has only ever been RUN at those scales. This script regenerates the same
ten tables at any sf, matching the driver corpus's observed schemas, value
domains, and structural features (document near-dup/exact-dup planting,
sorted event times, unit-norm embeddings, TPC-H-ish dimension patterns) so
Verify + tools/check.py and Bench run unmodified:

    python3 tools/gen_sf.py 1 /root/repo/testdata_sf1

Self-consistency is what the gate checks (Spark vs DuckDB on the SAME
files), so this generator does not need to reproduce the driver's exact
RNG stream — only its distributions and invariants:

  - documents: 10..100 uniform words over the 30-word vocab; lang
    en 40% / zh,es,fr,de 15%; source = src{doc_id % 20}; ~5% of docs are a
    NEAR-DUP of an earlier doc (copy + ' dup' appended — the planted
    signal every near-dup query family detects); ~0.2% are EXACT copies.
    Max words 101 — inside the Verify geometry guard (t15 <= 600 grams,
    d11 <= 20 chunks, t20 <= 8 windows).
  - events: sorted uniform timestamps over 2024-01 (us precision),
    event_id sequential, 5 uniform types, value ~ Exp(mean 50) rounded,
    users = events/67, props = {"k": 0..99}.
  - embeddings: 64-dim unit-norm float32, labels uniform 0..9 (the driver
    corpus has NO planted cluster structure — verified empirically).
  - TPC-H-ish: same key ranges/ratios as sf0.1 x (sf/0.1); lineitem rows
    are INDEPENDENT draws (orderkey uniform, linenumber uniform 1..7,
    shipdate independent of orderdate), matching the driver tables.

--skew: PLANTED-SKEW variant of the same corpus (round-12 campaign). The
gate's oracle is self-consistent (Spark vs DuckDB on the same files), so
every query stays hash-checkable; what changes is which CODE PATHS fire:

  - events.user_id ~ Zipf(1.1) over the user ranks (top user ≈ 16% of all
    events — trips the funnel heavy-user census that uniform data never
    exercises, and concentrates every per-user window/groupBy);
  - lineitem.l_suppkey: 15% of rows land on ONE supplier (the salted-join
    j12 hot key) and l_orderkey: 5% on ONE order (AQE skew-join food);
  - orders.o_custkey: 10% of orders on ONE customer (hot groupBy/join key
    through the j/a families);
  - documents: lang 'en' 80% (hot LSH/gram buckets, mixture skew) and
    source 'src0' 40% (domain-cap pressure).

    python3 tools/gen_sf.py 0.1 /root/repo/testdata_skew0.1 --skew

--nulls: NULL-PLANTED variant (round-12 campaign, composable with
--skew). The driver corpus carries ZERO nulls in any column of any
table (verified column-by-column), so every null-handling path in the
engine — coalesce fills, count(col) vs count(*), null group keys, the
null-safe PSI join, aggregate null-skipping, JSON-path-on-null — has
only ever fired on nulls the queries themselves derive. This knob
plants nulls in MEASURE/ATTRIBUTE columns (never in keys, timestamps,
ids, or text — those are legitimate non-null contracts the operators
require and the specs pin):

  - events.value 8% NULL, events.props 5% NULL;
  - customer.c_acctbal / supplier.s_acctbal 5% NULL;
  - lineitem.l_quantity 2%, l_tax 3% NULL (k9's InRange n_checked is
    count(col), so planted nulls exercise the checked-vs-total split);
  - orders.o_orderpriority 3% NULL (null GROUP KEYS through agg/pivot);
  - documents.source 2% NULL (null category through the PSI null-safe
    join, the domain cap's MapState, sampling strata).

    python3 tools/gen_sf.py 0.1 /root/repo/testdata_nulls0.1 --nulls
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

skew = "--skew" in sys.argv
nulls = "--nulls" in sys.argv
argv = [a for a in sys.argv if a not in ("--skew", "--nulls")]
sf = float(argv[1]) if len(argv) > 1 else 1.0
out = argv[2] if len(argv) > 2 else (
    f"/root/repo/testdata_{'skew' if skew else ('nulls' if nulls else 'sf')}{sf:g}")
import os
os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(42)

def null_mask(values, frac, pa_type=None):
    """pyarrow array with `frac` of entries nulled (no-op without --nulls)."""
    if not nulls:
        return values if isinstance(values, pa.Array) else pa.array(values, pa_type)
    m = rng.random(len(values)) < frac
    vals = [None if m[i] else v for i, v in enumerate(
        values.to_pylist() if isinstance(values, pa.Array) else list(values))]
    return pa.array(vals, pa_type)

def hot_mix(n, n_keys, hot_key, hot_frac):
    """Uniform keys with a planted fraction on one hot key."""
    keys = rng.integers(0, n_keys, n)
    keys[rng.random(n) < hot_frac] = hot_key
    return keys

def write(name, table):
    # Row groups are Spark's scan-split unit: pyarrow's default (1Mi rows)
    # leaves any sub-million-row table as ONE row group, serializing every
    # scan of it onto one core no matter how many executors exist. At sf10
    # that made documents (500k rows of full text) and embeddings (200k
    # 64-dim vectors) single-task scans feeding 30+ queries — the read-side
    # twin of the one-giant-row-group write defect the skew campaign found
    # (Sinks.writeRowGroupBounded). Target >=32 splittable groups per table.
    rg = max(10_000, min(1_000_000, table.num_rows // 32))
    pq.write_table(table, f"{out}/{name}.parquet", row_group_size=rg)
    print(f"{name}: {table.num_rows} rows ({-(-table.num_rows // rg)} row groups)")

# ---- dimensions -----------------------------------------------------------
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": REGIONS}))

n_nation = 25
write("nation", pa.table({
    "n_nationkey": pa.array(range(n_nation), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(n_nation)],
    "n_regionkey": pa.array([i % 5 for i in range(n_nation)], pa.int32())}))

n_cust = int(150_000 * sf)
write("customer", pa.table({
    "c_custkey": pa.array(range(n_cust), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
    "c_nationkey": pa.array(rng.integers(0, n_nation, n_cust), pa.int32()),
    "c_acctbal": null_mask(np.round(rng.uniform(-1000, 10000, n_cust), 2),
                           0.05, pa.float64()),
    "c_mktsegment": np.array(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD",
                              "BUILDING", "FURNITURE"])[rng.integers(0, 5, n_cust)]}))

n_supp = int(10_000 * sf)
write("supplier", pa.table({
    "s_suppkey": pa.array(range(n_supp), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
    "s_nationkey": pa.array(rng.integers(0, n_nation, n_supp), pa.int32()),
    "s_acctbal": null_mask(np.round(rng.uniform(-1000, 10000, n_supp), 2),
                           0.05, pa.float64())}))

n_part = int(200_000 * sf)
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
pk = np.arange(n_part)
write("part", pa.table({
    "p_partkey": pa.array(pk, pa.int64()),
    "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
               zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
    "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
    "p_type": np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM",
                        "PROMO"])[rng.integers(0, 6, n_part)],
    "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
    "p_retailprice": 900.0 + (pk % 1000) / 10.0}))

# ---- facts ----------------------------------------------------------------
n_ord = int(1_500_000 * sf)
DAY_US = 86_400_000_000
o_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
o_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
             / np.timedelta64(1, "D"))
write("orders", pa.table({
    "o_orderkey": pa.array(range(n_ord), pa.int64()),
    "o_custkey": pa.array(hot_mix(n_ord, n_cust, 7, 0.10) if skew
                          else rng.integers(0, n_cust, n_ord), pa.int64()),
    "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
    "o_orderdate": pa.array(o_lo + rng.integers(0, o_days + 1, n_ord) * DAY_US,
                            pa.timestamp("us")),
    "o_orderpriority": null_mask(
        np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                  "4-NOT SPECIFIED", "5-LOW"])[rng.integers(0, 5, n_ord)],
        0.03, pa.string())}))

n_li = int(6_000_000 * sf)
s_lo = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
s_days = int((np.datetime64("2001-11-04") - np.datetime64("1995-01-02"))
             / np.timedelta64(1, "D"))
write("lineitem", pa.table({
    "l_orderkey": pa.array(hot_mix(n_li, n_ord, 13, 0.05) if skew
                           else rng.integers(0, n_ord, n_li), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
    "l_suppkey": pa.array(hot_mix(n_li, n_supp, 7, 0.15) if skew
                          else rng.integers(0, n_supp, n_li), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
    "l_quantity": null_mask(rng.integers(1, 51, n_li).astype(np.float64),
                            0.02, pa.float64()),
    "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
    "l_discount": rng.integers(0, 11, n_li) / 100.0,
    "l_tax": null_mask(rng.integers(0, 9, n_li) / 100.0, 0.03, pa.float64()),
    "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)],
    "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
    "l_shipdate": pa.array(s_lo + rng.integers(0, s_days + 1, n_li) * DAY_US,
                           pa.timestamp("us"))}))

# ---- events ---------------------------------------------------------------
n_ev = int(1_000_000 * sf)
n_users = max(15, int(15_000 * sf))
ev_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
span_us = 30 * DAY_US
ts = np.sort(rng.integers(0, span_us, n_ev)) + ev_lo
write("events", pa.table({
    "event_id": pa.array(range(n_ev), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(
        rng.choice(n_users, n_ev,
                   p=(lambda r: r / r.sum())(
                     np.arange(1, n_users + 1, dtype=np.float64) ** -1.1))
        if skew else rng.integers(0, n_users, n_ev), pa.int64()),
    "event_type": np.array(["view", "click", "purchase", "signup",
                            "error"])[rng.integers(0, 5, n_ev)],
    "value": null_mask(np.round(rng.exponential(50.0, n_ev), 2),
                       0.08, pa.float64()),
    "props": null_mask([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
                       0.05, pa.string())}))

# ---- documents ------------------------------------------------------------
n_doc = max(500, int(50_000 * sf))
VOCAB = np.array(["a", "agg", "batch", "big", "column", "customer", "data",
                  "fast", "filter", "group", "hash", "join", "key", "line",
                  "merge", "order", "part", "query", "row", "scan", "slow",
                  "small", "sort", "spark", "stream", "table", "the",
                  "value", "vector", "window"])
lens = rng.integers(10, 101, n_doc)
texts = [" ".join(VOCAB[rng.integers(0, len(VOCAB), n)]) for n in lens]
# plant near-dups (copy of an earlier doc + ' dup') and exact dups — the
# signal the whole dedup family detects; same ~5% / ~0.2% rates as sf0.1
for i in range(10, n_doc):
    r = rng.random()
    if r < 0.05:
        texts[i] = texts[int(rng.integers(0, i))] + " dup"
    elif r < 0.052:
        texts[i] = texts[int(rng.integers(0, i))]
langs = np.array(["en", "zh", "es", "fr", "de"])[
    rng.choice(5, n_doc, p=[0.8, 0.05, 0.05, 0.05, 0.05] if skew
               else [0.4, 0.15, 0.15, 0.15, 0.15])]
sources = [("src0" if skew and r < 0.4 else f"src{i % 20}")
           for i, r in enumerate(rng.random(n_doc))]
write("documents", pa.table({
    "doc_id": pa.array(range(n_doc), pa.int64()),
    "text": texts,
    "lang": langs,
    "source": null_mask(sources, 0.02, pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# ---- embeddings -----------------------------------------------------------
n_emb = max(500, int(20_000 * sf))
E = rng.standard_normal((n_emb, 64)).astype(np.float32)
E /= np.linalg.norm(E, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(range(n_emb), pa.int64()),
    "embedding": pa.array([row for row in E.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))

print(f"done -> {out}")
