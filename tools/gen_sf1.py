#!/usr/bin/env python3
"""Deterministic sf1 (10x sf0.1) fixture generator for scale-stress runs.

Mirrors the driver generator's measured sf0.1 statistics (profiled with
DuckDB/pyarrow, recorded in FIXTURES.md):

documents.parquet  (sf0.1: 5,000 rows -> sf1: 50,000 rows)
  - 20 sources (src0..src19, exactly N/20 each via id % 20)
  - lang mix ~ en 41% / de 14% / es 15% / fr 15% / zh 15%
  - text = 10..100 words uniform from the same 31-word vocabulary
  - dup structure: ~4.9% of docs are mutated copies of an earlier doc
    KEEPING the first 8 words (prefix-40 collision, like the 244/5000
    measured), of which a small slice (~0.16%) are byte-exact copies
    (8/5000 measured)
embeddings.parquet (sf0.1: 2,000 rows -> sf1: 20,000 rows)
  - 64-dim unit-norm gaussian directions (component std 1/8 = 0.125,
    norm 1.0, measured); label ~ uniform multinomial over 0..9
    (sf0.1 labels carry no geometric signal: per-label mean norms equal
    the 1/sqrt(n) random-sampling prediction)

Pure-python RNG seeded at 4242: same output on every run, no numpy
dependency needed for docs (numpy used for embeddings only).

Usage: python3 tools/gen_sf1.py [outdir=/tmp/graft_sf1] [scale=10]
Driver-side tooling only (pyarrow): not part of the Spark library.
"""
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]


def gen_documents(n, rng):
    texts, langs, sources = [], [], []
    for i in range(n):
        r = rng.random()
        if i > 100 and r < 0.0016:           # byte-exact copy
            texts.append(texts[rng.randrange(i)])
        elif i > 100 and r < 0.049:          # near-dup: keep 8-word prefix
            base = texts[rng.randrange(i)].split()
            words = [
                w if j < 8 or rng.random() > 0.10 else rng.choice(VOCAB)
                for j, w in enumerate(base)
            ]
            # force >=1 difference so a near-dup never collapses to exact
            # (a 10-word copy keeps all words with prob 0.9^2 otherwise)
            last = len(words) - 1
            words[last] = rng.choice([w for w in VOCAB if w != base[last]])
            texts.append(" ".join(words))
        else:
            k = rng.randint(10, 100)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(k)))
        langs.append(rng.choices(LANGS, LANG_W)[0])
        sources.append(f"src{i % 20}")
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n, seed):
    npr = np.random.default_rng(seed)
    g = npr.standard_normal((n, 64))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in g.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(npr.integers(0, 10, n).astype(np.int32), pa.int32()),
    })


def gen_events(n, n_users, seed):
    """Mirror sf0.1 events: 30 days, uniform event times (ns precision),
    ~67 events/user, event_type ~ uniform over 5, value 2-dp with mean
    ~50 (exponential-ish tail to 560), props = {"k": <0..99>}."""
    npr = np.random.default_rng(seed)
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span = np.int64(30 * 24 * 3600) * np.int64(1_000_000_000)
    ts = np.sort(t0 + (npr.random(n) * span).astype(np.int64))
    value = np.round(np.minimum(npr.exponential(50.0, n), 560.0), 2)
    types = np.array(["click", "error", "purchase", "signup", "view"])
    k = npr.integers(0, 100, n)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(npr.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(types[npr.integers(0, 5, n)], pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array([f'{{"k": {v}}}' for v in k], pa.string()),
    })


def gen_tpch(n_orders, n_cust, n_part, n_supp, seed):
    """Mirror the driver's sf0.1 orders/lineitem/customer statistics
    (profiled with DuckDB this round):
      orders   o_orderkey dense 0..n-1; o_custkey uniform (=> ~Poisson(10)
               orders/customer); status F/O/P uniform; priority 5-way
               uniform; totalprice U(1000, 500000) 2dp; orderdate
               1995-01-01 + U(0..2403) days
      lineitem ~4.08 lines/order Poisson (1.8% of orders lineless, like
               the measured 147236/150000 distinct); partkey/suppkey
               uniform; quantity U{1..50}; extendedprice U(900, 105000)
               2dp; discount U{0..0.10}; tax U{0..0.08}; returnflag
               A/N/R, linestatus F/O; shipdate = orderdate + U(1..95)d
      customer c_custkey dense; nationkey k%25; acctbal U(-1000, 10000)
               2dp; mktsegment 5-way
    Only join-relevant SHAPE matters here (fan-out, key cardinality,
    value ranges) — the correctness gate runs on the driver corpus."""
    npr = np.random.default_rng(seed)
    day_us = np.int64(24 * 3600) * np.int64(1_000_000)
    t0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)

    seg = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                    "MACHINERY"])
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{k:09d}" for k in range(n_cust)],
                           pa.string()),
        "c_nationkey": pa.array((np.arange(n_cust) % 25).astype(np.int32),
                                pa.int32()),
        "c_acctbal": pa.array(
            np.round(npr.uniform(-1000.0, 10000.0, n_cust), 2), pa.float64()),
        "c_mktsegment": pa.array(seg[npr.integers(0, 5, n_cust)], pa.string()),
    })

    status = np.array(["F", "O", "P"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                     "5-LOW"])
    odate = t0 + npr.integers(0, 2404, n_orders) * day_us
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(npr.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(status[npr.integers(0, 3, n_orders)],
                                  pa.string()),
        "o_totalprice": pa.array(
            np.round(npr.uniform(1000.0, 500000.0, n_orders), 2),
            pa.float64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(prio[npr.integers(0, 5, n_orders)],
                                    pa.string()),
    })

    nl = npr.poisson(4.08, n_orders)
    okeys = np.repeat(np.arange(n_orders), nl)
    n_li = okeys.size
    linenum = (np.arange(n_li) -
               np.repeat(np.cumsum(nl) - nl, nl) + 1).astype(np.int32)
    flag = np.array(["A", "N", "R"])
    lstat = np.array(["F", "O"])
    ship = (np.repeat(odate, nl) +
            npr.integers(1, 96, n_li) * day_us)
    lineitem = pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(npr.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(npr.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(npr.integers(1, 51, n_li).astype(np.float64),
                               pa.float64()),
        "l_extendedprice": pa.array(
            np.round(npr.uniform(900.0, 105000.0, n_li), 2), pa.float64()),
        "l_discount": pa.array(npr.integers(0, 11, n_li) / 100.0,
                               pa.float64()),
        "l_tax": pa.array(npr.integers(0, 9, n_li) / 100.0, pa.float64()),
        "l_returnflag": pa.array(flag[npr.integers(0, 3, n_li)], pa.string()),
        "l_linestatus": pa.array(lstat[npr.integers(0, 2, n_li)],
                                 pa.string()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })
    return cust, orders, lineitem


def gen_part(n_part, seed):
    """Mirror the driver part profile (sf0.1: 20,000 rows): p_name =
    adj + ' ' + noun over an 8x8 vocabulary, p_brand = Brand#0..24,
    p_type uniform over 6 classes, p_size 1..50, p_retailprice =
    900 + (p_partkey % 1000) / 10 (measured at sf0.1)."""
    npr = np.random.default_rng(seed + 7)
    adjs = np.array(["blue", "old", "new", "large", "hot", "red",
                     "small", "cold"])
    nouns = np.array(["widget", "ring", "gear", "anvil", "bolt",
                      "plate", "rod", "gizmo"])
    types = np.array(["ECONOMY", "LARGE", "STANDARD", "MEDIUM",
                      "SMALL", "PROMO"])
    keys = np.arange(n_part)
    names = np.char.add(np.char.add(
        adjs[npr.integers(0, 8, n_part)], " "),
        nouns[npr.integers(0, 8, n_part)])
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(names, pa.string()),
        "p_brand": pa.array(
            np.char.add("Brand#", npr.integers(0, 25, n_part).astype(str)),
            pa.string()),
        "p_type": pa.array(types[npr.integers(0, 6, n_part)], pa.string()),
        "p_size": pa.array(npr.integers(1, 51, n_part).astype(np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(900.0 + (keys % 1000) / 10.0,
                                  pa.float64()),
    })


def gen_region():
    """The driver's fixed 5-row region table (scale-invariant)."""
    return pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"], pa.string()),
    })


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os
    os.makedirs(out, exist_ok=True)
    rng = random.Random(4242)
    docs = gen_documents(5000 * scale, rng)
    pq.write_table(docs, f"{out}/documents.parquet")
    emb = gen_embeddings(2000 * scale, seed=4242)
    pq.write_table(emb, f"{out}/embeddings.parquet")
    ev = gen_events(100000 * scale, 1500 * scale, seed=4242)
    pq.write_table(ev, f"{out}/events.parquet")
    cust, orders, li = gen_tpch(
        n_orders=15000 * scale, n_cust=1500 * scale,
        n_part=2000 * scale, n_supp=100 * scale, seed=4242)
    pq.write_table(cust, f"{out}/customer.parquet")
    pq.write_table(orders, f"{out}/orders.parquet")
    pq.write_table(li, f"{out}/lineitem.parquet")
    part = gen_part(2000 * scale, seed=4242)
    pq.write_table(part, f"{out}/part.parquet")
    pq.write_table(gen_region(), f"{out}/region.parquet")
    print(f"wrote {docs.num_rows} docs, {emb.num_rows} embeddings, "
          f"{ev.num_rows} events, {orders.num_rows} orders, "
          f"{li.num_rows} lineitems, {cust.num_rows} customers, "
          f"{part.num_rows} parts -> {out}")


if __name__ == "__main__":
    main()
