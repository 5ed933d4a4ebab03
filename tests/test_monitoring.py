"""Rule pass-rate drift detection: hand-computed golden on a planted
step change, fail-closed NULL handling, trailing-frame semantics,
validation. Oracle parity runs in tests/test_oracle_parity.py
(rule_drift_events)."""

import datetime
import os
import statistics
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _mk_events(spark, rates, per_bucket=20):
    """One hourly bucket per entry of ``rates``; in bucket i exactly
    round(rates[i] * per_bucket) rows have value < 0 (rule failure)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i, rate in enumerate(rates):
        n_fail = round(rate * per_bucket)
        for j in range(per_bucket):
            rows.append(
                (
                    t0 + datetime.timedelta(hours=i, minutes=j % 60),
                    -1.0 if j < n_fail else 1.0,
                )
            )
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_rule_drift_golden_step_change(spark):
    from contessa_spark.operators.monitoring import rule_drift

    # 8 calm buckets wiggling 10–20%, then a 60% step: the step bucket
    # must flag, the calm ones must not (sequence chosen so no calm
    # bucket z-scores past 2 against its own trailing window)
    rates = [0.10, 0.20, 0.10, 0.15, 0.10, 0.20, 0.10, 0.15, 0.60]
    df = _mk_events(spark, rates)
    out = rule_drift(
        df,
        {"nonneg": F.col("value") >= 0},
        ts_col="ts",
        bucket="1 hour",
        trailing=6,
        z_threshold=2.0,
    ).orderBy("bucket_epoch")
    rows = out.collect()
    assert len(rows) == len(rates)
    assert [r["fail_pct"] for r in rows] == [pytest.approx(r_) for r_ in rates]
    # trailing stats of the step bucket come from buckets 2..7
    trail = rates[2:8]
    last = rows[-1]
    assert last["n_trail"] == 6
    assert last["trail_mean"] == pytest.approx(
        round(statistics.mean(trail), 6)
    )
    assert last["trail_std"] == pytest.approx(
        round(statistics.stdev(trail), 6), abs=1e-6
    )
    want_z = round(
        (round(rates[-1], 6) - round(statistics.mean(trail), 6))
        / round(statistics.stdev(trail), 6),
        4,
    )
    assert last["z_score"] == pytest.approx(want_z, abs=2e-4)
    assert last["anomaly"] is True
    assert all(not r["anomaly"] for r in rows[:-1])


def test_rule_drift_null_fail_closed_and_warmup(spark):
    from contessa_spark.operators.monitoring import rule_drift

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (t0, 1.0),
        (t0 + datetime.timedelta(minutes=1), None),  # NULL pred → failed
        (t0 + datetime.timedelta(hours=1), 1.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {
        r["bucket_epoch"]: r
        for r in rule_drift(
            df, {"pos": F.col("value") > 0}, trailing=2
        ).collect()
    }
    first, second = (out[k] for k in sorted(out))
    assert first["total"] == 2 and first["failed"] == 1
    assert first["fail_pct"] == pytest.approx(0.5)
    # warm-up: empty frame → n_trail 0, NULL stats, no anomaly
    assert first["n_trail"] == 0
    assert first["trail_mean"] is None
    assert first["z_score"] is None
    assert first["anomaly"] is False
    # one-bucket frame: mean defined, sample std NULL → still no flag
    assert second["n_trail"] == 1
    assert second["trail_mean"] == pytest.approx(0.5)
    assert second["trail_std"] is None
    assert second["anomaly"] is False


def test_rule_drift_multi_rule_single_scan_plan(spark):
    from contessa_spark.operators.monitoring import rule_drift

    df = _mk_events(spark, [0.1, 0.2, 0.3])
    out = rule_drift(
        df,
        {"a": F.col("value") >= 0, "b": F.col("value") > -2},
        trailing=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all rules fold into ONE pre-window scan+aggregate pair
    assert plan.count("Scan ExistingRDD") == 1
    rows = out.collect()
    assert {r["rule_name"] for r in rows} == {"a", "b"}
    assert len(rows) == 6
    # rule b never fails
    assert all(
        r["failed"] == 0 for r in rows if r["rule_name"] == "b"
    )


def test_rule_drift_validation(spark):
    from contessa_spark.operators.monitoring import rule_drift

    df = _mk_events(spark, [0.1])
    with pytest.raises(ValueError):
        rule_drift(df, {})
    with pytest.raises(ValueError):
        rule_drift(df, {"a": F.col("value") >= 0}, trailing=1)
