#!/usr/bin/env python
"""Generate driver-shaped synthetic testdata at an arbitrary scale factor.

The driver ships sf0.001/sf0.01/sf0.1 (TESTDATA.md, read-only). Scale-
proofing the engine (VERDICT r2 "Next round" #3) needs a 10x step beyond
the largest shipped size, so this script reproduces the driver tables'
schemas and distributions — measured off /root/testdata/sf0.1 — at any
sf. It is NOT byte-identical to the driver generator (seed/stream
unknown); it is *statistically* identical where the engine's plans care:

  - row-count scaling:  customer 150k*sf, supplier 10k*sf, part 200k*sf,
    orders 1.5M*sf, lineitem ~6M*sf (Uniform{1..7} lines/order,
    avg 4.07), events 1M*sf over 30 days with 15k*sf users,
    documents max(500, 50k*sf), embeddings max(500, 20k*sf)
  - key ranges co-scale (l_partkey < |part|, o_custkey < |customer|,
    user_id < |users|) so join fan-outs match the driver's
  - documents: 31-word vocab, 10-100 words/doc, lang {en:40%, de/es/
    fr/zh:15%}, source src0..src19, ~8% planted near-duplicates
    (copy an earlier doc, mutate ~3 tokens) so the dedup family has
    realistic positive density
  - embeddings: 64-dim unit-norm, 10 labeled clusters
    (normalize(center + 0.35*noise)), ~2% planted near-identical
    copies so cosine near-dup / ANN queries have positives

Usage:  python tools/gen_testdata.py [SF] [OUTDIR]
        default SF=1.0, OUTDIR=.testdata/sf{SF} (gitignored)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "data", "sort", "value", "hash", "filter", "big", "dup",
    "query", "row", "stream", "the", "spark", "fast", "customer",
    "column", "order", "a", "vector", "part", "scan", "slow", "agg",
    "key", "window", "table", "merge", "join", "line", "small", "group",
]
P_NAME_A = ["large", "hot", "blue", "red", "green", "cold", "tiny", "dark"]
P_NAME_B = ["ring", "bolt", "screw", "plate", "wheel", "gear", "pin", "rod"]
P_TYPES = ["MEDIUM", "LARGE", "STANDARD", "ECONOMY", "SMALL", "PROMO"]
SEGMENTS = ["AUTOMOBILE", "MACHINERY", "BUILDING", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")
DAY_US = 86_400_000_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_col(us: np.ndarray, epoch: np.datetime64) -> pa.Array:
    return pa.array(epoch + us.astype("timedelta64[us]"), type=pa.timestamp("us"))


def generate(sf: float, outdir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.asarray(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{P_NAME_A[a]} {P_NAME_B[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.asarray(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part) % 1000, 2),
    }))

    order_days = rng.integers(0, 2400, n_ord)  # 1995-01-01 .. 2001-08
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.asarray(["O", "F", "P"])[rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_col(order_days * DAY_US, EPOCH_1995),
        "o_orderpriority": pa.array(np.asarray(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(l_orderkey)
    linenums = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenums, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.asarray(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(np.asarray(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(
            rng.integers(1, 2500, n_li) * DAY_US, EPOCH_1995
        ),
    }))

    evt_us = rng.integers(0, 30 * DAY_US, n_evt)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": _ts_col(evt_us, EPOCH_2024),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), pa.int64()),
        "event_type": pa.array(np.asarray(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.uniform(0, 561, n_evt), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)],
    }))

    # documents: ~8% are near-dup mutations of an earlier doc
    vocab = np.asarray(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.08:
            words = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(min(3, len(words))):
                words[int(rng.integers(0, len(words)))] = vocab[int(rng.integers(0, 31))]
            texts.append(" ".join(words))
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[rng.integers(0, 31, k)]))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.asarray(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_emb, 64))
    # ~2% near-identical copies of an earlier vector (same label)
    dup_mask = rng.random(n_emb) < 0.02
    dup_mask[0] = False
    for i in np.flatnonzero(dup_mask):
        j = int(rng.integers(0, i))
        vecs[i] = vecs[j] + 0.01 * rng.normal(size=64)
        labels[i] = labels[j]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f".testdata/sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
