"""Structured-Streaming variant of the quality pipeline.

The reference is a batch runner (contessa/__init__.py:5-6 — one
``run()`` per Airflow task); its ``time_filter`` is the batch analogue
of an event-time window (contessa/time_filter.py:7-40). This module is
the streaming re-expression: web pages arrive continuously
(``readStream`` over a parquet/Iceberg directory or any source), the
SAME annotate/decide stages run on the micro-batches, and per-rule
quality counts become **watermarked tumbling-window aggregates** —
late pages update their window until the watermark closes it.

* ``stream_quality_counts`` — windowed per-rule pass/fail counters
  (event time = ``warc_ts``), the streaming QualityCheck table.
* ``stream_filtered_docs``  — continuous keep/drop + scrub; append-mode
  sink of cleaned documents.
* ``run_available_now``     — drains everything currently in the source
  (Trigger.AvailableNow) — the batch-parity entry used by tests.

All stages reuse the exact batch code (annotate/with_decisions), so
stream and batch results agree row-for-row — the streaming tests
assert that directly.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from contessa_spark.pipeline import KEEP_RULES, PipelineConfig, annotate, with_decisions
from contessa_spark.sources.webgen import WEB_SCHEMA


def read_web_stream(
    spark: SparkSession, path: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """File-based stream of web pages (the sandbox stand-in for a Kafka
    / Iceberg CDC source)."""
    reader = spark.readStream.schema(WEB_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_quality_counts(
    stream_df: DataFrame,
    cfg: Optional[PipelineConfig] = None,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window per-rule counters.

    Output (append/update sink): (window_start, window_end, rule_name,
    total_records, failed, passed). State is bounded by the watermark —
    late pages beyond it are dropped, matching the documented
    late-data contract.
    """
    cfg = cfg or PipelineConfig()
    decided = with_decisions(annotate(stream_df), cfg, bucket=False)
    decided = decided.withWatermark("warc_ts", watermark)

    aggs = []
    for n in KEEP_RULES:
        c = F.col(f"rule_{n}")
        aggs.append(F.count(F.when(~c, 1)).alias(f"failed_{n}"))
        aggs.append(F.count(F.when(c, 1)).alias(f"passed_{n}"))
    win = F.window("warc_ts", window)
    out = decided.groupBy(win.alias("w")).agg(
        F.count(F.lit(1)).alias("total_records"), *aggs
    )
    # unpivot to (rule_name, failed, passed) rows per window
    parts = ", ".join(
        f"'{n}', failed_{n}, passed_{n}" for n in KEEP_RULES
    )
    return out.selectExpr(
        "w.start AS window_start",
        "w.end AS window_end",
        "total_records",
        f"stack({len(KEEP_RULES)}, {parts}) AS (rule_name, failed, passed)",
    )


def stream_filtered_docs(
    stream_df: DataFrame, cfg: Optional[PipelineConfig] = None
) -> DataFrame:
    """Continuous filter+scrub: kept documents with scrubbed text."""
    cfg = cfg or PipelineConfig()
    decided = with_decisions(annotate(stream_df), cfg, bucket=False)
    return decided.where(F.col("keep")).select(
        "url", "warc_ts", "lang", "lang_pred", "scrubbed_text", "pii_changed"
    )


def run_available_now(
    stream_out: DataFrame,
    sink_path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Drain the source once (Trigger.AvailableNow) into a parquet sink
    — exactly-once via the checkpoint directory; re-running with the
    same checkpoint processes only NEW files (streaming resume)."""
    q = (
        stream_out.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
