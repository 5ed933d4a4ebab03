"""Rule pass-rate drift detection over event time.

Contessa persists one ``QualityCheck`` row per (rule, task_ts) and its
result-table analytics compare a run against the trailing 30-day
median (``contessa/executor.py`` → ``results.py:194-226`` here).  This
operator extends that monitoring soul from *per-run* to *per-event-
time-bucket*: bucket the table by event time, evaluate every rule's
failure rate per bucket, and flag buckets whose failure rate deviates
from the trailing window by more than ``z_threshold`` sample standard
deviations — the classic data-quality drift alarm (a schema change,
an upstream outage, a bot flood show up as a step in fail_pct long
before a full-table rule trips).

Spark-first shape: ALL rules are evaluated in ONE scan — each rule
contributes two conditional counters to a single per-bucket
HashAggregate (the same 3N-counter design as the rule engine,
``compiler.py:70-125``), so N rules cost one shuffle of
``buckets × 2N`` longs, never N scans.  The trailing statistics are
window functions partitioned by rule over the *bucket* table — whose
row count grows with wall-clock time, not corpus size, so the window
stage is O(rules × buckets) regardless of how many trillion rows the
scan aggregated away.  Nothing leaves the JVM.

DETERMINISM: per-bucket failure rates are snapped to exact INTEGER
micro-units (``pct_u = round_half_up(failed · 10⁶ / total)``, pure
integer arithmetic), and the trailing mean / sample stddev are derived
from exact BIGINT window sums ``S1 = Σ pct_u`` and ``S2 = Σ pct_u²``
(``var = (n·S2 − S1²) / (n·(n−1))``) — so both engines feed
bit-identical integers into identical IEEE divisions and a correctly-
rounded sqrt, and every rounded output matches exactly.  This is
deliberately NOT ``avg()/stddev_samp()`` over doubles: windowed
double aggregation associates differently across engines (DuckDB
segment-trees sliding frames), and failure rates are small rationals
whose means land exactly ON 6-dp rounding boundaries often enough
that the usual ties-are-measure-zero convention does not hold.

Reference parity: no counterpart operator in contessa (the reference
stores the time series but leaves trend analysis to Datadog
dashboards — ``contessa/docs``); SURVEY.md §2 monitoring extension.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rule_drift(
    df: DataFrame,
    rules: Dict[str, Column],
    ts_col: str = "ts",
    bucket: str = "1 hour",
    trailing: int = 6,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-(rule, time-bucket) failure rates with trailing z-score
    anomaly flags.

    ``rules`` maps rule_name → boolean *pass* predicate ``Column``.
    Monitoring is fail-closed: a NULL predicate counts as failed
    (``failed = total − passed``), unlike the rule engine's
    three-valued counters — an upstream NULL flood should page.

    Output: ``(rule_name, bucket_epoch, total, failed, fail_pct,
    n_trail, trail_mean, trail_std, z_score, anomaly)`` where the
    trailing frame is the ``trailing`` buckets strictly before the
    current one (``ROWS BETWEEN trailing PRECEDING AND 1
    PRECEDING``).  ``z_score``/``anomaly`` are NULL/false until the
    frame holds ≥2 buckets with positive rounded spread.
    """
    if not rules:
        raise ValueError("rule_drift: empty rule set")
    if trailing < 2:
        raise ValueError("rule_drift: trailing must be >= 2")

    # ONE scan, 2 counters per rule, one per-bucket HashAggregate
    aggs = []
    for name in sorted(rules):
        pred = rules[name]
        aggs.append(F.count(F.lit(1)).alias(f"__t_{name}"))
        aggs.append(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).alias(
                f"__p_{name}"
            )
        )
    per_bucket = (
        df.groupBy(F.window(ts_col, bucket).alias("w"))
        .agg(*aggs)
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_epoch"),
            *[c for c in [f"__t_{n}" for n in sorted(rules)]],
            *[c for c in [f"__p_{n}" for n in sorted(rules)]],
        )
    )

    # unpivot to (rule_name, bucket_epoch, total, failed) — buckets ×
    # rules rows, a driver-trivial size, but kept distributed
    stacked = per_bucket.select(
        "bucket_epoch",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule_name"),
                        F.col(f"__t_{name}").cast("long").alias("total"),
                        (F.col(f"__t_{name}") - F.col(f"__p_{name}"))
                        .cast("long")
                        .alias("failed"),
                    )
                    for name in sorted(rules)
                ]
            )
        ).alias("r"),
    ).select("bucket_epoch", "r.rule_name", "r.total", "r.failed")

    return drift_from_bucket_counts(
        stacked, trailing=trailing, z_threshold=z_threshold
    )


def drift_from_bucket_counts(
    counts: DataFrame,
    trailing: int = 6,
    z_threshold: float = 2.0,
) -> DataFrame:
    """The trailing-statistics half of :func:`rule_drift`, over an
    already-aggregated counter table ``(rule_name, bucket_epoch,
    total, failed)`` — exactly the shape the Structured-Streaming
    counter sink accumulates (``streaming/quality_stream.py::
    stream_quality_counts``), which is the production wiring: the
    stream maintains the per-window counters incrementally; drift
    analysis is a cheap batch scan over that tiny table after each
    trigger (trailing windows need ordered history, which is not a
    streaming-state shape — and does not need to be)."""
    if trailing < 2:
        raise ValueError("drift_from_bucket_counts: trailing must be >= 2")
    # integer micro-unit failure rate: round-half-up without ever
    # leaving BIGINT arithmetic, then ONE exact division for display.
    # No round() anywhere on this path: Spark's round() rounds the
    # double's SHORTEST DECIMAL REPR (so 0.12569449…97 prints as
    # "0.1256945" and rounds UP) while DuckDB rounds the exact binary
    # value (DOWN) — small-rational inputs hit that divergence.
    z_threshold = float(z_threshold)
    pct = counts.withColumn(
        "__pct_u",
        F.expr("(failed * 2000000 + total) div (2 * total)"),
    ).withColumn(
        "fail_pct", F.col("__pct_u") / F.lit(1000000.0)
    )

    w = (
        Window.partitionBy("rule_name")
        .orderBy(F.col("bucket_epoch").asc())
        .rowsBetween(-int(trailing), -1)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("__pct_u").over(w)
    s2 = F.sum(F.col("__pct_u") * F.col("__pct_u")).over(w)
    trail = (
        pct.withColumn("n_trail", n)
        .withColumn("__s1", s1)
        .withColumn(
            # half-up integer mean in micro-units, then exact division
            "trail_mean",
            F.when(
                F.col("n_trail") >= 1,
                F.expr("(2 * __s1 + n_trail) div (2 * n_trail)")
                / F.lit(1000000.0),
            ),
        )
        .withColumn(
            # sample std in integer micro-units: floor(x + 0.5) of the
            # identical cross-engine sqrt double — floor of the same
            # double is the same integer on any engine, unlike round()
            "trail_std",
            F.when(
                F.col("n_trail") >= 2,
                F.floor(
                    F.sqrt(
                        (F.col("n_trail") * s2 - s1 * s1)
                        / (F.col("n_trail") * (F.col("n_trail") - 1))
                    )
                    + F.lit(0.5)
                )
                / F.lit(1000000.0),
            ),
        )
    )
    z = F.when(
        (F.col("n_trail") >= 2)
        & F.col("trail_std").isNotNull()
        & (F.col("trail_std") > 0),
        F.floor(
            (F.col("fail_pct") - F.col("trail_mean"))
            / F.col("trail_std")
            * F.lit(10000.0)
            + F.lit(0.5)
        )
        / F.lit(10000.0),
    )
    return (
        trail.withColumn("z_score", z)
        .withColumn(
            "anomaly",
            F.coalesce(
                F.abs(F.col("z_score")) > F.lit(float(z_threshold)),
                F.lit(False),
            ),
        )
        .select(
            "rule_name",
            "bucket_epoch",
            "total",
            "failed",
            "fail_pct",
            "n_trail",
            "trail_mean",
            "trail_std",
            "z_score",
            "anomaly",
        )
    )


def rule_drift_oracle_sql(
    rules: Dict[str, str],
    table: str = "events",
    ts_col: str = "ts",
    bucket_interval: str = "INTERVAL 1 HOUR",
    trailing: int = 6,
    z_threshold: float = 2.0,
) -> str:
    """DuckDB mirror of :func:`rule_drift`; ``rules`` maps rule_name
    → SQL pass-predicate string."""
    parts = []
    for name in sorted(rules):
        pred = rules[name]
        parts.append(
            f"SELECT '{name}' AS rule_name, "
            f"epoch(time_bucket({bucket_interval}, {ts_col}))::BIGINT AS bucket_epoch, "
            f"count(*)::BIGINT AS total, "
            f"(count(*) - count(*) FILTER (WHERE ({pred})))::BIGINT AS failed "
            f"FROM {table} GROUP BY 2"
        )
    union = " UNION ALL ".join(parts)
    return (
        f"WITH u AS ({union}), "
        "p AS (SELECT *, "
        " (failed * 2000000 + total) // (2 * total) AS pct_u FROM u), "
        "p2 AS (SELECT *, pct_u / 1000000.0 AS fail_pct FROM p), "
        "t AS (SELECT *, count(*) OVER w AS n_trail, "
        " CASE WHEN count(*) OVER w >= 1 THEN "
        "  ((2 * sum(pct_u) OVER w + count(*) OVER w) "
        "   // (2 * count(*) OVER w)) / 1000000.0 END AS trail_mean, "
        " CASE WHEN count(*) OVER w >= 2 THEN floor(sqrt("
        "   (count(*) OVER w * sum(pct_u * pct_u) OVER w "
        "    - sum(pct_u) OVER w * sum(pct_u) OVER w) "
        "   / (count(*) OVER w * (count(*) OVER w - 1))) + 0.5) / 1000000.0 "
        " END AS trail_std "
        " FROM p2 WINDOW w AS (PARTITION BY rule_name ORDER BY bucket_epoch ASC "
        f"  ROWS BETWEEN {int(trailing)} PRECEDING AND 1 PRECEDING)) "
        "SELECT rule_name, bucket_epoch, total, failed, fail_pct, "
        " n_trail::BIGINT AS n_trail, trail_mean, trail_std, "
        " CASE WHEN n_trail >= 2 AND trail_std IS NOT NULL AND trail_std > 0 "
        "      THEN floor((fail_pct - trail_mean) / trail_std * 10000.0 + 0.5) / 10000.0 "
        "      END AS z_score, "
        " coalesce(CASE WHEN n_trail >= 2 AND trail_std IS NOT NULL AND trail_std > 0 "
        "      THEN abs(floor((fail_pct - trail_mean) / trail_std * 10000.0 + 0.5) "
        f"           / 10000.0) > {float(z_threshold)!r} "
        "      END, false) AS anomaly "
        "FROM t"
    )
