"""Quality-check result model + idempotent persistence.

Reference: contessa/models.py — QualityCheck row schema
(models.py:40-68), percentage/status derivation (models.py:117-127),
30-day median enrichment (models.py:129-151), and upsert identity
``(attribute, rule_name, rule_type, task_ts, time_filter)``
(models.py:78-87) realized as INSERT ... ON CONFLICT DO UPDATE
(contessa/db.py:61-88).

Spark realization: a fixed StructType (no dynamic per-table classes —
the table *name* is the parameter), widened counters to LongType for
10^12-row scale, and a pluggable writer:

* ``IcebergMergeWriter`` — real deployment: ``MERGE INTO`` keyed on the
  identity (+ optional ``partition_id`` for per-partition lineage /
  checkpoint-resume);
* ``ParquetMergeWriter`` — sandbox fallback: anti-join old rows against
  the new key set, union, atomic directory swap. Same observable
  upsert semantics.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from contessa_spark.rules import Rule
from contessa_spark.utils import AggregatedResult

TIME_FILTER_DEFAULT = "not_set"  # contessa/models.py:29

# contessa/models.py:40-68 (SURVEY §1.2 mapping)
QUALITY_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("attribute", T.StringType(), False),
        T.StructField("rule_name", T.StringType(), False),
        T.StructField("rule_type", T.StringType(), False),
        T.StructField("rule_description", T.StringType(), True),
        T.StructField("total_records", T.LongType(), True),
        T.StructField("failed", T.LongType(), True),
        T.StructField("median_30_day_failed", T.DoubleType(), True),
        T.StructField("passed", T.LongType(), True),
        T.StructField("median_30_day_passed", T.DoubleType(), True),
        T.StructField("failed_percentage", T.DoubleType(), True),
        T.StructField("passed_percentage", T.DoubleType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("time_filter", T.StringType(), True),
        T.StructField("task_ts", T.TimestampType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

UPSERT_KEY = ["attribute", "rule_name", "rule_type", "task_ts", "time_filter"]

CONSISTENCY_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("left_table", T.StringType(), False),
        T.StructField("right_table", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
        T.StructField("time_filter", T.StringType(), True),
        T.StructField("context", T.StringType(), True),
        T.StructField("task_ts", T.TimestampType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# contessa/models.py:195-205
CONSISTENCY_UPSERT_KEY = [
    "type",
    "name",
    "left_table",
    "right_table",
    "task_ts",
    "time_filter",
]


def percentage(a: float, b: float) -> float:
    """contessa/models.py:121-127 — 0.0 on division by zero."""
    try:
        return (a / b) * 100
    except ZeroDivisionError:
        return 0.0


@dataclass
class CheckResult:
    """In-memory result when no result table is configured
    (contessa/models.py:303-375)."""

    rule_name: str = ""
    rule_type: str = ""
    rule_description: str = ""
    total_records: int = 0
    failed: int = 0
    passed: int = 0
    time_filter: Optional[str] = None
    failed_percentage: float = 0.0
    passed_percentage: float = 0.0
    status: str = "valid"
    failed_example: Optional[list] = None
    context: Optional[Dict] = None

    def init_row(self, rule: Rule, results: AggregatedResult, context: Dict = None):
        self.rule_name = rule.name
        self.rule_type = rule.type
        self.rule_description = rule.description
        self.total_records = results.total_records
        self.failed = results.failed
        self.passed = results.passed
        self.failed_example = results.failed_example
        if rule.time_filter:
            self.time_filter = str(rule.time_filter)
        self.failed_percentage = percentage(self.failed, self.total_records)
        self.passed_percentage = percentage(self.passed, self.total_records)
        self.status = "invalid" if self.failed > 0 else "valid"
        self.context = context

    def init_row_consistency(
        self,
        check: Dict,
        results: AggregatedResult,
        left_table_name: str,
        right_table_name: str,
        time_filter=None,
        context: Dict = None,
    ):
        # contessa/models.py:341-366 — note signed `failed` for COUNT:
        # percentage uses abs(failed); valid iff failed == 0.
        self.rule_type = check["type"]
        self.rule_name = check["name"]
        self.rule_description = check.get("description")
        self.total_records = results.total_records
        self.failed = results.failed
        self.passed = results.passed
        self.failed_example = results.failed_example
        if time_filter:
            self.time_filter = str(time_filter)
        self.failed_percentage = percentage(abs(self.failed), self.total_records)
        self.passed_percentage = percentage(self.passed, self.total_records)
        self.status = "valid" if results.failed == 0 else "invalid"
        context = dict(context or {})
        context.update(
            {"left_table_name": left_table_name, "right_table_name": right_table_name}
        )
        self.context = context


def build_quality_rows(
    rules: List[Rule],
    agg_results: List[AggregatedResult],
    task_ts: datetime,
    medians: Optional[Dict[str, Optional[float]]] = None,
) -> List[dict]:
    """One QualityCheck row per rule (contessa/models.py:89-127)."""
    med = medians or {"failed": None, "passed": None}
    rows = []
    for rule, res in zip(rules, agg_results):
        rows.append(
            {
                "attribute": rule.attribute,
                "rule_name": rule.name,
                "rule_type": rule.type,
                "rule_description": rule.description,
                "total_records": res.total_records,
                "failed": res.failed,
                "median_30_day_failed": med["failed"],
                "passed": res.passed,
                "median_30_day_passed": med["passed"],
                "failed_percentage": percentage(res.failed, res.total_records),
                "passed_percentage": percentage(res.passed, res.total_records),
                "status": "invalid" if res.failed > 0 else "valid",
                "time_filter": str(rule.time_filter)
                if rule.time_filter
                else TIME_FILTER_DEFAULT,
                "task_ts": task_ts,
                "created_at": datetime.utcnow(),
            }
        )
    return rows


def medians_30_day(
    spark: SparkSession,
    result_path: str,
    today: Optional[date] = None,
    days: int = 30,
) -> Dict[str, Optional[float]]:
    """Exact 30-day medians over the *existing* result table
    (contessa/models.py:129-151). Computed BEFORE the current run's
    rows are merged, so the current run is excluded (ordering caveat,
    SURVEY §4). Whole-table scope (the reference applies no per-rule
    filter). Uses Spark's exact ``median`` aggregate — a single
    pass over the (tiny) result table.
    """
    empty = {"failed": None, "passed": None}
    reader = _existing_df(spark, result_path, QUALITY_CHECK_SCHEMA)
    if reader is None:
        return empty
    now = today or date.today()
    past = now - timedelta(days=days)
    row = (
        reader.where(
            (F.col("task_ts") >= F.lit(str(past))) & (F.col("task_ts") <= F.lit(str(now)))
        )
        .agg(
            F.median("failed").alias("mf"),
            F.median("passed").alias("mp"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    if row["n"] == 0:
        return empty
    return {"failed": row["mf"], "passed": row["mp"]}


def _existing_df(
    spark: SparkSession, path: str, schema: T.StructType
) -> Optional[DataFrame]:
    if path.startswith("iceberg:"):
        name = path[len("iceberg:") :]
        try:
            return spark.table(name)
        except Exception:
            return None
    if os.path.exists(path):
        return spark.read.schema(schema).parquet(path)
    return None


class ParquetMergeWriter:
    """Upsert into a parquet result table by key anti-join + swap.

    Sandbox stand-in for Iceberg ``MERGE INTO`` — same observable
    semantics as contessa/db.py:61-88 (re-running a check for the same
    task_ts replaces the row). The result table is tiny (one row per
    rule per run), so the rewrite is cheap; at production scale use
    ``IcebergMergeWriter``.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def merge(
        self,
        rows_df: DataFrame,
        path: str,
        key_cols: List[str],
        schema: T.StructType,
    ) -> None:
        existing = _existing_df(self.spark, path, schema)
        if existing is not None:
            # broadcast the new (small) side; anti-join drops replaced keys
            kept = existing.join(F.broadcast(rows_df.select(*key_cols)), key_cols, "left_anti")
            merged = kept.unionByName(rows_df)
        else:
            merged = rows_df
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)


class LocalSmallTableMerge:
    """Driver-side upsert for TINY control tables (lineage, quality) —
    pandas + pyarrow, zero Spark jobs.

    Rationale: at any scale these tables hold one row per
    bucket/rule/run — thousands of rows, not data-plane rows. Running
    a Spark job (scheduler round-trip, shuffle file, commit protocol)
    per merge costs seconds of fixed latency per pipeline run; a
    driver-side parquet rewrite is milliseconds with identical upsert
    semantics. Production swaps this for Iceberg MERGE INTO, same
    interface.
    """

    @staticmethod
    def read(path: str):
        import glob

        import pandas as pd

        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return None
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    @classmethod
    def merge(cls, new_pdf, path: str, key_cols: List[str]) -> "object":
        """Upsert new_pdf into the parquet dir at path; returns the
        merged pandas frame."""
        import pandas as pd

        existing = cls.read(path)
        if existing is not None and len(existing) and not len(new_pdf):
            # nothing to upsert (e.g. a fully-resumed run): the table is
            # already the merge result — and concatenating an EMPTY
            # frame is the other half of the pandas all-NA deprecation
            return existing
        if existing is not None and len(existing):
            mask = ~existing.set_index(key_cols).index.isin(
                new_pdf.set_index(key_cols).index
            )
            survivors = existing[mask]
            # full replacement takes the NEW frame's schema: concat with
            # an empty survivor frame would union columns and resurrect
            # ones the caller dropped (migration downgrades do exactly
            # that) as all-NaN
            if not len(survivors):
                merged = new_pdf
            else:
                # pandas 2.x deprecates letting all-NA object columns
                # defer their dtype to the other frame during concat —
                # pre-coerce them to the counterpart's dtype so the
                # merge stays warning-free and future-proof
                survivors = survivors.copy()
                new_pdf = new_pdf.copy()
                for a, b in ((survivors, new_pdf), (new_pdf, survivors)):
                    for c in a.columns:
                        if (
                            c in b.columns
                            and a[c].dtype == object
                            and a[c].isna().all()
                            and b[c].dtype != object
                        ):
                            try:
                                a[c] = a[c].astype(b[c].dtype)
                            except (TypeError, ValueError):
                                pass  # e.g. all-NA → int64: leave as object
                merged = pd.concat([survivors, new_pdf], ignore_index=True)
        else:
            merged = new_pdf
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        # Spark cannot read TIMESTAMP(NANOS) parquet — write micros
        merged.to_parquet(
            os.path.join(tmp, "part-00000.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        return merged


class IcebergMergeWriter:
    """Production writer: real ``MERGE INTO`` keyed on the upsert
    identity — atomic, snapshot-isolated, scan-free for unchanged
    partitions. Requires an Iceberg catalog on the session (not
    available in this sandbox; tested via SQL-text golden tests only).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def merge_sql(self, table: str, source_view: str, key_cols: List[str]) -> str:
        on = " AND ".join(f"t.{c} <=> s.{c}" for c in key_cols)
        return (
            f"MERGE INTO {table} t USING {source_view} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )

    def merge(self, rows_df: DataFrame, table: str, key_cols: List[str], schema=None) -> None:
        view = f"_merge_src_{uuid.uuid4().hex[:8]}"
        rows_df.createOrReplaceTempView(view)
        try:
            self.spark.sql(self.merge_sql(table, view, key_cols))
        finally:
            self.spark.catalog.dropTempView(view)
