"""HLL cardinality sketches: accuracy vs exact, slice-merge ≡ global,
layout invariance, bounded-state sanity."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_estimate_close_to_exact(spark):
    from pyspark.sql import functions as F

    from contessa_spark.operators.sketches import approx_distinct_counts

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_counts(ev, "user_id", "event_type").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] - n) <= max(3, 0.05 * n), (t, got[t], n)


def test_slice_merge_equals_global_sketch(spark):
    """Union of per-slice sketches ≡ one global sketch — the property
    that makes persisting sketches per day/partition sound."""
    from pyspark.sql import functions as F

    from contessa_spark.operators.sketches import (
        cardinality_sketches,
        merge_sketches,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    sliced = ev.withColumn("day", F.to_date("ts"))
    daily = cardinality_sketches(sliced, "user_id", ["event_type", "day"])
    rolled = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_sketches(daily, "event_type").collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in cardinality_sketches(ev, "user_id", "event_type").collect()
    }
    assert rolled == direct


def test_layout_invariant_and_global_form(spark):
    from contessa_spark.operators.sketches import approx_distinct_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def run(df):
        return sorted(
            tuple(r)
            for r in approx_distinct_counts(df, "user_id", "event_type").collect()
        )

    assert run(ev) == run(ev.repartition(7))
    # ungrouped form: one row, near the true global distinct
    n_true = ev.select("user_id").distinct().count()
    row = approx_distinct_counts(ev, "user_id").collect()
    assert len(row) == 1
    assert abs(row[0]["approx_distinct"] - n_true) <= max(3, 0.05 * n_true)


def test_sketch_state_is_bounded(spark):
    """The sketch blob stays ≤ ~2^lgk bytes however many rows feed it —
    the bounded-state claim that makes the agg safe at any scale."""
    from pyspark.sql import functions as F

    from contessa_spark.operators.sketches import cardinality_sketches

    big = spark.range(200_000).select(
        (F.col("id") % 50_000).alias("v")
    )
    row = cardinality_sketches(big, "v", lgk=12).collect()[0]
    assert len(row["sketch"]) <= (1 << 12) + 64
    assert abs(row["approx_distinct"] - 50_000) <= 0.05 * 50_000
