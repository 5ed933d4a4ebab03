"""Deterministic hash sampling: reproducibility across partitionings,
fraction accuracy, per-stratum fractions, nested-sample subset
property, and filter pushdown (the predicate is pure JVM)."""

import pytest
from pyspark.sql import functions as F

from contessa_spark.operators.sampling import (
    _threshold_hex,
    hash_sample,
    hash_sample_sql_predicate,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_deterministic_across_partitionings(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, ["doc_id"]).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.3, ["doc_id"])
        .select("doc_id")
        .collect()
    }
    assert a == b and a


def test_sample_fraction_accuracy(spark):
    n = 20000
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    got = hash_sample(df, 0.2, ["doc_id"]).count()
    assert abs(got / n - 0.2) < 0.02  # ±2pp at 20k keys


def test_nested_samples_are_subsets(spark, docs):
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, ["doc_id"]).select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.4, ["doc_id"]).select("doc_id").collect()}
    assert small <= big
    # different salt → a genuinely different draw
    other = {
        r["doc_id"]
        for r in hash_sample(docs, 0.1, ["doc_id"], salt="s1").select("doc_id").collect()
    }
    assert other != small


def test_stratified_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(20000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = hash_sample(
        df, 0.5, ["doc_id"], strata_col="lang", strata_fractions={"en": 0.05}
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 10000 - 0.05) < 0.01
    assert abs(counts["fr"] / 10000 - 0.5) < 0.02


def test_sql_predicate_matches_column_form(spark, docs):
    pred = hash_sample_sql_predicate(0.3, ["doc_id"])
    via_sql = {r["doc_id"] for r in docs.where(pred).select("doc_id").collect()}
    via_col = {r["doc_id"] for r in hash_sample(docs, 0.3, ["doc_id"]).select("doc_id").collect()}
    assert via_sql == via_col


def test_threshold_hex_bounds(spark):
    assert _threshold_hex(0.0) == "000000"
    assert _threshold_hex(1.0) > "ffffff"  # keeps EVERY row
    with pytest.raises(ValueError):
        _threshold_hex(1.5)
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    assert hash_sample(df, 1.0, ["doc_id"]).count() == 100
    assert hash_sample(df, 0.0, ["doc_id"]).count() == 0
