"""Focused tests for the r7 block-pair execution optimizations:
driver-side murmur3 partition prediction, LPT group placement, the
amortized chunk merge and the Arrow-buffer kernel — all must keep the
exact-Jaccard output bit-identical."""
import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from contessa_spark.operators.dedup import (
    _count_block_pair,
    _murmur3_int,
    _partition_target_values,
    ngram_jaccard_pairs,
)


def test_murmur3_matches_spark_hash(spark):
    """The driver-side Murmur3 must equal Spark's F.hash for
    IntegerType values — placement prediction depends on it."""
    df = spark.range(0, 4096).select(F.col("id").cast("int").alias("x"))
    rows = df.select("x", F.hash("x").alias("h")).collect()
    for r in rows:
        assert _murmur3_int(r.x) == r.h


def test_partition_target_values_route_to_their_partition():
    for n in [1, 2, 7, 32, 91, 613]:
        tv = _partition_target_values(n)
        assert [(_murmur3_int(v) % n) for v in tv] == list(range(n))


def test_count_block_pair_matches_naive_sets():
    """Fuzz the numeric core (including tiny chunk sizes that force
    many pending-merge rounds) against a set-based oracle."""
    rng = random.Random(7)
    for trial in range(200):
        m = rng.randint(2, 40)
        vocab = rng.randint(1, 30)
        ids = np.array(rng.sample(range(1000), m), dtype=np.int64)
        sets = [
            sorted(rng.sample(range(vocab), rng.randint(0, min(vocab, 12))))
            for _ in range(m)
        ]
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        hcat = np.array(
            list(itertools.chain.from_iterable(sets)), dtype=np.int64
        )
        diag = rng.random() < 0.5
        side = (
            np.zeros(m, dtype=np.int8)
            if diag
            else np.array([0] * (m // 2) + [1] * (m - m // 2), dtype=np.int8)
        )
        thr = rng.choice([0.0, 0.1, 0.3])
        chunk = rng.choice([4, 16, 1 << 21])
        ia, ib, c, _, _ = _count_block_pair(
            ids, lens.copy(), side, hcat, lens, diag, thr, chunk
        )
        got = {(int(a), int(b)): int(cc) for a, b, cc in zip(ia, ib, c)}
        want = {}
        for i in range(m):
            for j in range(i + 1, m):
                if not diag and side[i] == side[j]:
                    continue
                inter = len(set(sets[i]) & set(sets[j]))
                if inter == 0:
                    continue
                u = lens[i] + lens[j] - inter
                if u and inter / u >= thr:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    want[(a, b)] = inter
        assert got == want, f"trial {trial}"


@pytest.mark.parametrize("block_docs", [64, 130, 100000])
def test_blocked_pairs_invariant_to_block_size(spark, block_docs):
    """The LPT-binned Arrow path (small block_docs → many groups) and
    the degenerate one-block case must produce the same pair set."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, k=3, threshold=0.1, block_docs=block_docs
        ).collect()
    )
    ref = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.1).collect()
    )
    assert out == ref
