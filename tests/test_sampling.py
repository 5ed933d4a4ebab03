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


def test_mixture_fractions_math():
    from contessa_spark.operators.sampling import mixture_fractions

    # en is abundant, it is scarce relative to its weight -> it binds
    counts = {"en": 1000, "it": 10}
    weights = {"en": 0.5, "it": 0.5}
    fr = mixture_fractions(counts, weights)
    assert fr["it"] == 1.0
    assert abs(fr["en"] - 10 / 1000) < 1e-12  # 0.5/1000 vs 0.5/10
    # unweighted strata drop; degenerate all-zero weights drop all
    assert mixture_fractions({"a": 5}, {})["a"] == 0.0


def test_mixture_sample_distribution_and_determinism(spark):
    from pyspark.sql import functions as F

    from contessa_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    weights = {"en": 0.4, "zh": 0.2, "de": 0.2, "fr": 0.1, "es": 0.1}
    out = mixture_sample(docs, weights, strata_col="lang")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(got.values())
    assert total > 0
    for lang, w in weights.items():
        # hash sampling is binomial: allow generous relative slack
        assert abs(got.get(lang, 0) / total - w) < 0.05, (lang, got, total)

    # layout independence: identical row set after repartition
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(docs.repartition(7), weights).select("doc_id").collect()
    )
    assert ids1 == ids2


def test_mixture_sample_join_path_matches_case_path(spark):
    """Above max_case_strata the threshold CASE becomes a broadcast
    join (a 10^5-branch CASE is the measured planning blowup) — the
    row set must be identical either way."""
    from contessa_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    weights = {"en": 0.4, "zh": 0.2, "de": 0.2, "fr": 0.1, "es": 0.1}
    a = sorted(
        r["doc_id"]
        for r in mixture_sample(docs, weights, strata_col="lang").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(
            docs, weights, strata_col="lang", max_case_strata=1
        ).collect()
    )
    assert a == b and a


def test_mixture_sample_null_strata_dropped(spark):
    """NULL stratum values must be DROPPED (per the docstring), not
    crash the driver-side sorted() over fractions — on both the CASE
    path and the broadcast-join path."""
    from contessa_spark.operators.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else None) for i in range(200)],
        "doc_id long, lang string",
    )
    weights = {"en": 1.0}
    for max_case in (256, 0):  # CASE path, then broadcast-join path
        out = mixture_sample(
            docs, weights, strata_col="lang", max_case_strata=max_case
        )
        rows = out.collect()
        assert rows, "en rows should survive"
        assert all(r["lang"] == "en" for r in rows)


# ------------------------------------------------- split_assign

def test_split_assign_disjoint_exhaustive_deterministic(spark):
    from contessa_spark.operators.sampling import split_assign

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = split_assign(df, splits, key_cols=["doc_id"], salt="t")
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 4000  # exhaustive, one label per row
    counts = {}
    for s in rows.values():
        counts[s] = counts.get(s, 0) + 1
    # md5 is uniform: realized fractions within a few % of weights
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["val"] / 4000 - 0.1) < 0.03
    assert abs(counts["test"] / 4000 - 0.1) < 0.03
    # deterministic + partition-invariant
    rows2 = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            df.repartition(7), splits, key_cols=["doc_id"], salt="t"
        ).collect()
    }
    assert rows2 == rows


def test_split_assign_append_stable(spark):
    from contessa_spark.operators.sampling import split_assign

    splits = [("train", 0.9), ("test", 0.1)]
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1500).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in split_assign(small, splits, key_cols=["doc_id"]).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(big, splits, key_cols=["doc_id"]).collect()
    }
    # growing the corpus never moves an existing row between splits
    assert all(b[k] == v for k, v in a.items())


def test_split_assign_strata_override_and_null(spark):
    from contessa_spark.operators.sampling import split_assign

    df = spark.createDataFrame(
        [(i, "de" if i % 2 else None) for i in range(2000)],
        "doc_id long, lang string",
    )
    out = split_assign(
        df,
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
        key_cols=["doc_id"],
        strata_col="lang",
        strata_splits={"de": [("train", 0.2), ("val", 0.4), ("test", 0.4)]},
    ).collect()
    de = [r for r in out if r["lang"] == "de"]
    base = [r for r in out if r["lang"] is None]  # NULL → default weights
    frac_de = sum(r["split"] == "train" for r in de) / len(de)
    frac_base = sum(r["split"] == "train" for r in base) / len(base)
    assert abs(frac_de - 0.2) < 0.05
    assert abs(frac_base - 0.8) < 0.05


def test_split_assign_validation(spark):
    from contessa_spark.operators.sampling import split_assign

    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_assign(df, [("train", 1.0)], key_cols=["doc_id"])
    with pytest.raises(ValueError):
        split_assign(df, [("a", 0.5), ("a", 0.5)], key_cols=["doc_id"])
    with pytest.raises(ValueError):
        split_assign(df, [("a", 0.6), ("b", 0.6)], key_cols=["doc_id"])
    with pytest.raises(ValueError):
        split_assign(df, [("a", 1.2), ("b", -0.2)], key_cols=["doc_id"])


# ------------------------------------------- stratified_fixed_sample

def test_stratified_fixed_sample_exact_counts(spark):
    from contessa_spark.operators.sampling import stratified_fixed_sample

    rows = [(i, "big" if i < 930 else "small") for i in range(950)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_fixed_sample(
        df, 30, key_cols=["doc_id"], strata_cols=["lang"]
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # exactly n from the big stratum, the whole small stratum (< n)
    assert len(by_lang["big"]) == 30
    assert len(by_lang["small"]) == 20
    assert {r["rank"] for r in out if r["lang"] == "big"} == set(range(1, 31))
    # deterministic + partition-invariant
    out2 = stratified_fixed_sample(
        df.repartition(7), 30, key_cols=["doc_id"], strata_cols=["lang"]
    ).collect()
    assert sorted(r["doc_id"] for r in out2) == sorted(
        r["doc_id"] for r in out
    )
    # a different salt draws a (near-certainly) different sample
    out3 = stratified_fixed_sample(
        df, 30, key_cols=["doc_id"], strata_cols=["lang"], salt="other"
    ).collect()
    assert sorted(r["doc_id"] for r in out3) != sorted(
        r["doc_id"] for r in out
    )


def test_stratified_fixed_sample_validation(spark):
    from contessa_spark.operators.sampling import stratified_fixed_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_fixed_sample(df, 0, key_cols=["doc_id"], strata_cols=["lang"])
    with pytest.raises(ValueError):
        stratified_fixed_sample(df, 5, key_cols=["doc_id"], strata_cols=[])
