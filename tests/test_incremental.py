"""Incremental dedup vs a seen corpus: exact anti-join semantics, the
bloom path's zero-false-negative guarantee, measured FPR vs target,
and layout independence."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contessa_spark.operators.incremental import (
    bloom_params,
    incremental_dedup,
)


def test_bloom_params_standard_formulas():
    m, k = bloom_params(1000, 0.01)
    # -1000 ln(0.01)/ln^2(2) ~ 9585 bits, k ~ 7
    assert 9500 <= m <= 9700 and k == 7
    m, k = bloom_params(1, 0.5)
    assert m >= 64 and k >= 1


def test_anti_join_exact_and_normalized(spark):
    new = spark.createDataFrame(
        [
            (1, "Hello   World"),   # matches seen "hello world" (normalized)
            (2, "fresh content"),
            (3, "another new doc"),
        ],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame(
        [(100, "hello world"), (101, "old news")], "doc_id long, text string"
    )
    got = sorted(
        r["doc_id"] for r in incremental_dedup(new, seen).collect()
    )
    assert got == [2, 3]


def test_bloom_no_false_negatives_and_fpr(spark):
    """Every seen doc must be dropped (no false negatives — the bloom
    guarantee); genuinely-new docs survive at ≥ 1 − ~3×fpp."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    seen = docs.where("doc_id % 2 = 0")
    # new batch = half overlapping, half genuinely new (suffix-perturbed)
    from pyspark.sql import functions as F

    overlapping = docs.where("doc_id % 2 = 0").limit(100)
    fresh = (
        docs.where("doc_id % 2 = 1")
        .withColumn("text", F.concat(F.col("text"), F.lit(" UNIQUETAIL")))
    )
    new = overlapping.unionByName(fresh)

    out = incremental_dedup(new, seen, method="bloom", fpp=0.01)
    kept = [r["doc_id"] for r in out.collect()]
    assert all(d % 2 == 1 for d in kept), "a seen doc survived the bloom"
    n_fresh = fresh.count()
    dropped_fresh = n_fresh - len(kept)
    assert dropped_fresh / n_fresh <= 0.03, (
        f"FPR {dropped_fresh / n_fresh:.4f} vs target 0.01"
    )

    # layout independence: same survivors from a repartitioned seen side
    out2 = incremental_dedup(
        new.repartition(5), seen.repartition(7), method="bloom", fpp=0.01
    )
    assert sorted(kept) == sorted(r["doc_id"] for r in out2.collect())


def test_bloom_matches_anti_join_when_fpp_tiny(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seen = docs.where("doc_id % 3 = 0")
    new = docs
    exact = sorted(
        r["doc_id"] for r in incremental_dedup(new, seen).collect()
    )
    bloom = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, seen, method="bloom", fpp=1e-6).collect()
    )
    # bloom ⊆ exact always; at fpp=1e-6 on 50 docs they are equal w.h.p.
    assert bloom == exact


def test_unknown_method_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="anti_join"):
        incremental_dedup(docs, docs, method="nope")
