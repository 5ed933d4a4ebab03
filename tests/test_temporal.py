"""As-of join: hand-computed golden (inclusive exact-match, no-prior
NULL, snapshot succession), naive-python equivalence on random data,
partition invariance, validation. Oracle parity (vs DuckDB's NATIVE
ASOF JOIN — a fully independent implementation) runs in
tests/test_oracle_parity.py (events_asof_snapshot)."""

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_asof_join_golden(spark):
    from contessa_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, _t(10), 1),  # exact match with a snapshot → inclusive
            (1, _t(12), 2),  # after the 11:00 snapshot
            (1, _t(9), 4),  # before any snapshot → NULL
            (2, _t(9), 3),  # key with no snapshots at all → NULL
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(11), 200.0)],
        "user_id long, ts timestamp, snap_value double",
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["snap_value"])
        for r in asof_join(
            left, right, on=["user_id"], value_cols=["snap_value"]
        ).collect()
    }
    assert got == {
        1: (_t(10), 100.0),
        2: (_t(11), 200.0),
        4: (None, None),
        3: (None, None),
    }


def test_asof_join_null_right_values_carried(spark):
    """A right row whose VALUE is NULL is still the as-of match: the
    struct carry must return (newer ts, NULL), never skip back to an
    older non-null snapshot (pandas merge_asof / DuckDB ASOF
    semantics; the r6 per-column last(ignorenulls) got this wrong)."""
    from contessa_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _t(12), 1)], "user_id long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(11), None)],
        "user_id long, ts timestamp, snap_value double",
    )
    rows = asof_join(
        left, right, on=["user_id"], value_cols=["snap_value"]
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["asof_ts"], rows[0]["snap_value"]) == (_t(11), None)


def test_asof_join_matches_naive(spark):
    import random

    from contessa_spark.operators.temporal import asof_join

    rng = random.Random(5)
    lrows, rrows = [], []
    used = set()
    for i in range(300):
        lrows.append((rng.randrange(8), _t(rng.randrange(6, 20), rng.randrange(60)), i))
    for j in range(120):
        while True:
            key = (rng.randrange(8), _t(rng.randrange(6, 20), rng.randrange(60)))
            if key not in used:
                used.add(key)
                break
        rrows.append((key[0], key[1], float(j)))
    left = spark.createDataFrame(lrows, "k long, ts timestamp, id long")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, v double")

    def naive(lk, lts):
        best = None
        for rk, rts, v in rrows:
            if rk == lk and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        return best or (None, None)

    for df in (left, left.repartition(7)):
        got = {
            r["id"]: (r["asof_ts"], r["v"])
            for r in asof_join(df, right, on=["k"], value_cols=["v"]).collect()
        }
        assert got == {i: naive(k, ts) for k, ts, i in lrows}


def test_asof_join_validation(spark):
    from contessa_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _t(10), 5.0)], "k long, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [(1, _t(9), 1.0)], "k long, ts timestamp, v double"
    )
    with pytest.raises(ValueError):
        asof_join(left, right, on=[], value_cols=["v"])
    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], value_cols=[])
    with pytest.raises(ValueError):  # value col clashes with left
        asof_join(left, right, on=["k"], value_cols=["v"])


def test_asof_join_plan_single_shuffle_no_join(spark):
    """The union-window shape: NO join node, exactly one Exchange
    (the key shuffle) feeding the per-key window."""
    from contessa_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _t(10), 1)], "k long, ts timestamp, id long"
    )
    right = spark.createDataFrame(
        [(1, _t(9), 2.0)], "k long, ts timestamp, sv double"
    )
    out = asof_join(left, right, on=["k"], value_cols=["sv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_golden_half_open_boundaries(spark):
    from contessa_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [
            (1, _t(10, 0), 1),  # exactly at start → included
            (1, _t(12, 0), 2),  # exactly at end → excluded
            (1, _t(11, 30), 3),  # inside, crosses a bucket boundary
            (1, _t(9, 59), 4),  # before → excluded
            (2, _t(10, 30), 5),  # other key, no intervals
        ],
        "k long, ts timestamp, id long",
    )
    intervals = spark.createDataFrame(
        [(1, _t(10, 0), _t(12, 0), 77)],
        "k long, start_ts timestamp, end_ts timestamp, iid long",
    )
    got = {
        (r["id"], r["iid"])
        for r in interval_join(
            points, intervals, on=["k"], bucket_seconds=3600
        ).collect()
    }
    assert got == {(1, 77), (3, 77)}


def test_interval_join_matches_naive_and_no_dups(spark):
    import random

    from contessa_spark.operators.temporal import interval_join

    rng = random.Random(9)
    pts = [
        (rng.randrange(5), _t(rng.randrange(6, 22), rng.randrange(60)), i)
        for i in range(200)
    ]
    ivs = []
    for j in range(40):
        s = _t(rng.randrange(6, 20), rng.randrange(60))
        e = s + datetime.timedelta(minutes=rng.randrange(10, 300))
        ivs.append((rng.randrange(5), s, e, j))
    points = spark.createDataFrame(pts, "k long, ts timestamp, id long")
    intervals = spark.createDataFrame(
        ivs, "k long, start_ts timestamp, end_ts timestamp, iid long"
    )
    out = interval_join(
        points, intervals, on=["k"], bucket_seconds=1800
    ).collect()
    got = sorted((r["id"], r["iid"]) for r in out)
    want = sorted(
        (i, j)
        for k, ts, i in pts
        for ik, s, e, j in ivs
        if ik == k and s <= ts < e
    )
    assert got == want  # equality also proves no duplicate matches
    assert want, "test must produce matches"


def test_interval_join_guard_and_plan(spark):
    import pytest as _pytest

    from contessa_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(1, _t(10), 1)], "k long, ts timestamp, id long"
    )
    intervals = spark.createDataFrame(
        [(1, _t(6), _t(20), 9)],
        "k long, start_ts timestamp, end_ts timestamp, iid long",
    )
    out = interval_join(
        points, intervals, on=["k"], bucket_seconds=3600,
        max_interval_buckets=3,
    )
    with _pytest.raises(Exception, match="interval_join: an interval spans"):
        out.collect()
    # the scale shape: equi-join, never a nested-loop/cartesian product
    ok = interval_join(points, intervals, on=["k"], bucket_seconds=3600)
    plan = ok._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    with _pytest.raises(ValueError):
        interval_join(points, intervals, on=[])
    with _pytest.raises(ValueError):
        interval_join(points, intervals, on=["k"], bucket_seconds=0)
