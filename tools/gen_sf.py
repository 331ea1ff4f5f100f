#!/usr/bin/env python3
"""Deterministic fixture generator for scale-factor rehearsal ABOVE the
driver-provided sf0.1 (SURVEY §6; r4 verdict next-round #2).

Matches FIXTURES.md exactly: schemas (timestamp[us] order/ship dates and
events.ts per the 2026-08-13 driver regeneration — `--ts-unit ns`
reproduces the pre-drift ns/ms shape to rehearse the legacy reader path,
list<float> 64-dim L2-normalized embeddings), value domains, and the
measured sf0.1 distributions
(documented per column below), scaled by sf/0.1. Seed fixed → identical
bytes on every run. Dev-tooling only (like parity.py) — the engine itself
never reads or needs this script.

Usage: gen_sf.py [sf] [outdir] [--skew SHARE] [--clusters C]
       (default: 1 /root/repo/testdata/sf1)

--skew SHARE (r5 verdict #6: skewed-fixture rehearsal): give ONE hot key
a SHARE fraction of the probe rows — l_orderkey 0 owns SHARE of lineitem
and user_id 0 owns SHARE of events, remaining rows uniform as before.
This is the adversarial shape salting/AQE exist for: a single shuffle
partition would otherwise receive SHARE of the fact table.

--clusters C (r6 verdict #4: ANN recall on non-adversarial data): draw
embeddings from a C-center Gaussian mixture (centers ~N(0,1) normalized,
per-vector noise sigma=0.05) instead of isotropic N(0,0.15). Real
embedding corpora are clustered — the uniform-random default is the
documented adversarial case where IVF probe-pruning and PQ codebooks
cannot beat chance. C=0 keeps the isotropic default.

Verified divergences from the driver generator (irrelevant to parity —
Spark and DuckDB read the SAME files): exact PRNG stream, parquet
row-group layout (we use 512k-row groups so a 6M-row lineitem yields
enough splits for 32 threads).
"""
import argparse
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# argparse instead of hand-rolled filtering (ADVICE r6: the string-equality
# filter crashed on `--skew 0.3` when a positional equalled "0.3", silently
# ignored `--skew=0.3`, and misparsed `--skew 0.30` before positionals).
_p = argparse.ArgumentParser(description=__doc__)
_p.add_argument("sf", nargs="?", type=float, default=1.0)
_p.add_argument("outdir", nargs="?", default="/root/repo/testdata/sf1")
_p.add_argument("--skew", type=float, default=0.0,
                help="fraction of probe rows routed to hot key 0")
_p.add_argument("--clusters", type=int, default=0,
                help="Gaussian-mixture centers for embeddings (0 = isotropic)")
_p.add_argument("--ts-unit", choices=["us", "ns"], default="us",
                help="events.ts physical type: us = current driver shape "
                     "(orders/lineitem us too); ns = pre-2026-08-13 shape "
                     "(events ns, orders/lineitem ms) to rehearse the "
                     "legacy nanosAsLong reader path")
_a = _p.parse_args()
SKEW, SF, OUT, CLUSTERS = _a.skew, _a.sf, _a.outdir, _a.clusters
TS_UNIT = _a.ts_unit
DATE_UNIT = "us" if TS_UNIT == "us" else "ms"  # order/ship dates drifted with events
K = SF / 0.1  # scale vs the measured sf0.1 fixture


def skewed(uniform_draw, n):
    """Route a SKEW fraction of rows to hot key 0, rest stay uniform."""
    if SKEW <= 0.0:
        return uniform_draw
    hot = rng.random(n) < SKEW
    return np.where(hot, 0, uniform_draw)

rng = np.random.default_rng(42)
import os
os.makedirs(OUT, exist_ok=True)

N_CUST = int(15_000 * K)
N_SUPP = int(1_000 * K)
N_PART = int(20_000 * K)
N_ORD = int(150_000 * K)
N_LI = int(600_000 * K)
N_EV = int(100_000 * K)
N_DOC = int(5_000 * K)
N_EMB = int(2_000 * K)

def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=512 * 1024)
    print(f"{name}: {table.num_rows} rows")

# region / nation: fixed tiny dimensions, identical at every sf
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
}))

# customer: acctbal U(-1000, 10000), segment uniform over 5, nation uniform
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, N_CUST)]),
}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}))

# part: name = "adj noun" (8x8 = 64 combos, as measured), Brand#1..25,
# 6 types, size 1..50, retailprice U(900, 1000)
ADJS = ["large", "hot", "small", "cold", "red", "blue", "light", "dark"]
NOUNS = ["ring", "bolt", "gear", "plate", "rod", "cap", "tube", "disk"]
write("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in
               zip(rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART))],
    "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, N_PART)]),
    "p_type": pa.array(np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO",
                                 "SMALL", "STANDARD"])[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2),
}))

# orders: day-granular timestamp[DATE_UNIT] uniform 1995-01-01..2001-08-01
# (2405 distinct days, as measured), totalprice U(1000, 500000),
# custkey uniform, status {F,O,P} and priority uniform
DAY0 = np.datetime64("1995-01-01")
N_DAYS = 2405
odates = (DAY0 + rng.integers(0, N_DAYS, N_ORD).astype("timedelta64[D]")) \
    .astype(f"datetime64[{DATE_UNIT}]")
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(odates, pa.timestamp(DATE_UNIT)),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
        rng.integers(0, 5, N_ORD)]),
}))

# lineitem: orderkey uniform over orders (per-order count ~ Poisson(4),
# max ~17, as measured), linenumber uniform 1..7 (NOT unique per order —
# measured), qty integer 1..50, extendedprice U(900, 105000) independent
# of qty (measured ratio range), discount 0.00..0.10 and tax 0.00..0.08
# on cent grids, shipdate day-granular uniform 1995-01-02..2001-11-04
# INDEPENDENT of o_orderdate (measured deltas span ±2400 days)
sdates = (np.datetime64("1995-01-02")
          + rng.integers(0, 2499, N_LI).astype("timedelta64[D]")) \
    .astype(f"datetime64[{DATE_UNIT}]")
write("lineitem", pa.table({
    "l_orderkey": pa.array(np.sort(skewed(rng.integers(0, N_ORD, N_LI), N_LI)),
                           pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LI) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LI) / 100.0, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, N_LI)]),
    "l_shipdate": pa.array(sdates, pa.timestamp(DATE_UNIT)),
}))

# events: ts timestamp[TS_UNIT] uniform over 2024-01 (sub-second
# precision, as measured), user_id over N_CUST/10 users, value ~ Exp(50)
# (measured p50=34.8/p90=114/avg=49.9), props single-key JSON. Draw at ns
# then truncate for us so the two units produce value-identical µs rows
# (same PRNG stream; DuckDB truncates ns→µs the same way).
T0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
T1 = np.datetime64("2024-01-31T00:00:00", "ns").astype(np.int64)
ets_ns = np.sort(rng.integers(T0, T1, N_EV))
ets = (ets_ns.astype("datetime64[ns]") if TS_UNIT == "ns"
       else (ets_ns // 1000).astype("datetime64[us]"))
write("events", pa.table({
    "event_id": pa.array(range(N_EV), pa.int64()),
    "ts": pa.array(ets, pa.timestamp(TS_UNIT)),
    "user_id": pa.array(skewed(rng.integers(0, max(1, N_CUST // 10), N_EV),
                               N_EV), pa.int64()),
    "event_type": pa.array(np.array(["click", "error", "purchase", "signup",
                                     "view"])[rng.integers(0, 5, N_EV)]),
    "value": np.round(rng.exponential(50.0, N_EV), 2),
    "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)]),
}))

# documents: 10..100 words uniform from the measured 30-word analytics
# vocabulary + the rare 'dup' marker (~0.09% of tokens); lang en ~41% /
# others ~14.8%; source uniform src0..src19; n_chars = len(text) exactly
VOCAB = np.array(["spark", "window", "merge", "table", "column", "vector",
                  "stream", "value", "data", "small", "join", "filter",
                  "big", "group", "hash", "customer", "sort", "order",
                  "slow", "line", "part", "fast", "the", "row", "agg",
                  "key", "query", "a", "scan", "batch"])
nw = rng.integers(10, 101, N_DOC)
flat = VOCAB[rng.integers(0, 30, int(nw.sum()))]
dup_mask = rng.random(flat.shape[0]) < 0.0009
flat = np.where(dup_mask, "dup", flat)
texts, pos = [], 0
for n in nw:
    texts.append(" ".join(flat[pos:pos + n]))
    pos += n
langs = np.array(["en", "de", "es", "fr", "zh"])[
    rng.choice(5, N_DOC, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])]
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(langs),
    "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N_DOC)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

# embeddings: 64-dim float32, ~N(0, 0.15) then L2-normalized per vector
# (measured norms == 1.0 ± 1e-7), label uniform 0..9. With --clusters C:
# C-center Gaussian mixture (tight sigma=0.05 noise around unit-norm
# centers) — the clustered shape real embedding corpora have, where IVF
# cell-pruning and PQ codebooks recover recall (r6 verdict #4).
if CLUSTERS > 0:
    centers = rng.normal(0, 1.0, (CLUSTERS, 64))
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, CLUSTERS, N_EMB)
    emb = (centers[assign] + rng.normal(0, 0.05, (N_EMB, 64))).astype(np.float32)
else:
    emb = rng.normal(0, 0.15, (N_EMB, 64)).astype(np.float32)
emb = emb / np.linalg.norm(emb.astype(np.float64), axis=1,
                           keepdims=True).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
}))

print(f"done → {OUT} (sf={SF})")
