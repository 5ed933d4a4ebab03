"""Mergeable quantile summaries: exact-regime equality with the
definitional quantile, rank-error guarantee under adversarial layouts,
exact N accounting, null filtering, grouped + global paths."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHIS = (0.25, 0.5, 0.75, 0.9, 1.0)


def _true_values(spark, df, value_col, group_col=None):
    """group -> ascending list of non-null values (the multiset)."""
    from pyspark.sql import functions as F

    gc = [group_col] if group_col else []
    rows = (
        df.where(F.col(value_col).isNotNull())
        .select(*gc, value_col)
        .collect()
    )
    out = {}
    for r in rows:
        key = r[group_col] if group_col else None
        out.setdefault(key, []).append(float(r[value_col]))
    for v in out.values():
        v.sort()
    return out


def test_exact_regime_is_definitional_quantile(spark):
    """capacity ≥ rows per (partition, group) → no compaction ever
    fires: max_rank_error = 0 and the estimate IS the value at
    1-indexed rank ⌈φ·N⌉ — layout-invariant."""
    from contessa_spark.operators.quantiles import grouped_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    true = _true_values(spark, ev, "value", "event_type")
    out = grouped_quantiles(
        ev, "value", "event_type", phis=PHIS, capacity=65536
    ).collect()
    assert len(out) == len(true) * len(PHIS)
    for r in out:
        assert r["max_rank_error"] == 0
        vals = true[r["event_type"]]
        want = vals[math.ceil(r["phi"] * len(vals)) - 1]
        assert r["quantile_est"] == want, (r, want)
    out2 = grouped_quantiles(
        ev.repartition(7), "value", "event_type", phis=PHIS, capacity=65536
    ).collect()
    key = lambda r: (r["event_type"], r["phi"])
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_guarantee_bound_holds_under_any_layout(spark):
    """Tiny capacity forces compactions on every level; estimates
    become layout-dependent but |true_rank(est) − ⌈φ·N⌉| ≤
    max_rank_error must hold in every layout, and N stays exact."""
    import bisect

    from contessa_spark.operators.quantiles import (
        grouped_quantiles,
        quantile_summary_partials,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    true = _true_values(spark, ev, "value")
    vals = true[None]
    n = len(vals)
    for nparts in (1, 3, 17):
        src = ev.repartition(nparts)
        # Σweights = n exactly, even through compactions
        total_w = sum(
            r["weight"]
            for r in quantile_summary_partials(
                src, "value", capacity=32
            ).collect()
        )
        assert total_w == n
        out = grouped_quantiles(
            src, "value", phis=PHIS, capacity=32
        ).collect()
        assert len(out) == len(PHIS)
        for r in out:
            assert r["max_rank_error"] > 0  # compactions did fire
            target = math.ceil(r["phi"] * n)
            # the estimate's feasible rank interval in the multiset
            lo = bisect.bisect_left(vals, r["quantile_est"]) + 1
            hi = bisect.bisect_right(vals, r["quantile_est"])
            assert lo <= hi, "estimate must be an input value"
            dist = max(lo - target, target - hi, 0)
            assert dist <= r["max_rank_error"], (r, target, lo, hi)


def test_error_bound_is_useful_not_vacuous(spark):
    """At capacity 256 over ~6k rows the accumulated bound should be
    far below N — otherwise the summary guarantees nothing."""
    from contessa_spark.operators.quantiles import grouped_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = ev.where("value IS NOT NULL").count()
    out = grouped_quantiles(
        ev.repartition(4), "value", phis=(0.5,), capacity=256
    ).collect()
    assert out[0]["max_rank_error"] < n * 0.1


def test_nulls_filtered_and_group_isolation(spark):
    from contessa_spark.operators.quantiles import grouped_quantiles

    rows = [("a", 1.0), ("a", 2.0), ("a", None), ("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = grouped_quantiles(df, "v", "g", phis=(0.5, 1.0), capacity=16)
    got = {(r["g"], r["phi"]): r["quantile_est"] for r in out.collect()}
    # a: N=2 → ⌈.5·2⌉=1 → 1.0; ⌈1·2⌉=2 → 2.0. b: N=1 → 10.0 both.
    assert got == {
        ("a", 0.5): 1.0,
        ("a", 1.0): 2.0,
        ("b", 0.5): 10.0,
        ("b", 1.0): 10.0,
    }


def test_phi_validation(spark):
    import pytest

    from contessa_spark.operators.quantiles import grouped_quantiles

    df = spark.createDataFrame([(1.0,)], "v double")
    for bad in ((), (0.0,), (1.5,), (-0.1,)):
        with pytest.raises(ValueError):
            grouped_quantiles(df, "v", phis=bad)
