"""Measurement-only scale-up data generator.

Regenerates an sf1.0-SIZED synthetic dataset at /root/testdata/sf1.0
(10x the sf0.1 row counts) with the same schemas and matched
distributions, for LOCAL before/after benchmarking only (bench_extra.py,
plan captures). It is NOT the driver's data: the driver generates its
own sf1.0 with its own seed, so absolute numbers differ slightly —
always compare before/after on the SAME locally generated dataset.

Never writes into the driver-provided sf0.001/sf0.01/sf0.1 dirs.

Distribution notes (measured from /root/testdata/sf0.1):
  documents: 10-100 uniform words from a 30-word vocab; ~5%% of docs are
    near-copies of an earlier doc with a few tokens replaced by "dup"
    (drives the near-dup pair density the dedup queries depend on);
    lang en 40%% / de,es,fr,zh 15%% each; source src0..src19.
  embeddings: 64-dim unit-normalized float32, label 0..9.
  events: ts sequential over Jan 2024, user_id uniform, 5 event types.
  lineitem/orders/customer: TPC-H-ish uniform keys, ~4 lines/order.
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0  # x sf0.1
SRC = "/root/testdata/sf0.1"
SEED = 20260822

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(
        ["en", "de", "es", "fr", "zh"], size=n, p=[0.4, 0.15, 0.15, 0.15, 0.15]
    )
    sources = np.char.add("src", rng.integers(0, 20, size=n).astype(str))
    vocab = np.array(VOCAB)
    texts: list = [None] * n
    dup_of = rng.random(n) < 0.05
    for i in range(n):
        if dup_of[i] and i > 10:
            j = int(rng.integers(0, i))
            words = texts[j].split()
            # mutate ~5% of tokens to "dup"
            k = max(1, len(words) // 20)
            for p in rng.integers(0, len(words), size=k):
                words[int(p)] = "dup"
            texts[i] = " ".join(words)
        else:
            texts[i] = " ".join(vocab[rng.integers(0, len(vocab), size=lens[i])])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    span_us = 30 * 24 * 3600 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    offs = np.sort(rng.integers(0, span_us, size=n))
    ts = (base + offs).astype("datetime64[us]")
    types = rng.choice(["signup", "purchase", "view", "click", "error"], size=n)
    value = np.round(np.minimum(rng.exponential(90.0, size=n), 560.0), 2)
    props = np.char.add(
        np.char.add('{"k": ', rng.integers(0, 100, size=n).astype(str)), "}"
    )
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, size=n).astype(np.int64)),
            "event_type": pa.array(types),
            "value": pa.array(value),
            "props": pa.array(props),
        }
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n)]
            ),
            "c_nationkey": pa.array(rng.integers(0, 25, size=n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, size=n), 2)),
            "c_mktsegment": pa.array(
                rng.choice(
                    ["FURNITURE", "BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"],
                    size=n,
                )
            ),
        }
    )


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    base = np.datetime64("1992-01-01", "us").astype(np.int64)
    span = (np.datetime64("1998-08-01", "us").astype(np.int64)) - base
    odate = (base + rng.integers(0, span, size=n)).astype("datetime64[us]")
    odate = odate.astype("datetime64[D]").astype("datetime64[us]")
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n).astype(np.int64)),
            "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], size=n)),
            "o_totalprice": pa.array(np.round(rng.uniform(900, 400000, size=n), 2)),
            "o_orderdate": pa.array(odate),
            "o_orderpriority": pa.array(
                rng.choice(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                    size=n,
                )
            ),
        }
    )


def gen_lineitem(rng: np.random.Generator, n: int, n_orders: int) -> pa.Table:
    base = np.datetime64("1992-01-01", "us").astype(np.int64)
    span = (np.datetime64("1998-12-01", "us").astype(np.int64)) - base
    sdate = (base + rng.integers(0, span, size=n)).astype("datetime64[us]")
    sdate = sdate.astype("datetime64[D]").astype("datetime64[us]")
    return pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_orders, size=n).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(0, 20000, size=n).astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(0, 1000, size=n).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 8, size=n).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.float64)),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105000, size=n), 2)
            ),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, size=n), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, size=n), 2)),
            "l_returnflag": pa.array(rng.choice(["N", "A", "R"], size=n)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], size=n)),
            "l_shipdate": pa.array(sdate),
        }
    )


def main() -> None:
    assert not OUT.rstrip("/").endswith(("sf0.001", "sf0.01", "sf0.1"))
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    s = SCALE

    def write(name: str, table: pa.Table, rows_per_group: int = 200_000) -> None:
        pq.write_table(
            table,
            os.path.join(OUT, f"{name}.parquet"),
            compression="snappy",
            row_group_size=rows_per_group,
        )
        print(name, table.num_rows)

    write("documents", gen_documents(rng, int(5000 * s)))
    write("embeddings", gen_embeddings(rng, int(2000 * s)))
    n_users = int(1500 * s)
    write("events", gen_events(rng, int(100_000 * s), n_users))
    n_cust = int(15000 * s)
    n_orders = int(150_000 * s)
    write("customer", gen_customer(rng, n_cust))
    write("orders", gen_orders(rng, int(150_000 * s), n_cust))
    write("lineitem", gen_lineitem(rng, int(600_000 * s), n_orders))
    # small dims: copy from sf0.1 unchanged
    for name in ["region", "nation", "part", "supplier"]:
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(OUT, f"{name}.parquet"),
        )
        print(name, "(copied)")


if __name__ == "__main__":
    main()
