"""Structured-Streaming parity tests: the streamed pipeline must agree
row-for-row with the batch pipeline on the same input, exactly-once
resume must skip already-processed files, and windowed counts must
match a batch groupBy."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from contessa_spark.pipeline import PipelineConfig, annotate, with_decisions
from contessa_spark.sources.webgen import generate
from contessa_spark.streaming.quality_stream import (
    read_web_stream,
    run_available_now,
    stream_filtered_docs,
    stream_quality_counts,
)

N = 400


@pytest.fixture(scope="module")
def web_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("webstream"))
    src = os.path.join(d, "src")
    generate(spark, N, seed=11).write.parquet(src)
    return d


def test_stream_matches_batch_filter(spark, web_dir):
    src = os.path.join(web_dir, "src")
    sink = os.path.join(web_dir, f"sink_{uuid.uuid4().hex[:6]}")
    ckpt = os.path.join(web_dir, f"ckpt_{uuid.uuid4().hex[:6]}")
    cfg = PipelineConfig()

    stream = stream_filtered_docs(read_web_stream(spark, src), cfg)
    run_available_now(stream, sink, ckpt)

    streamed = {
        r["url"]: r["scrubbed_text"]
        for r in spark.read.parquet(sink).collect()
    }
    batch = with_decisions(annotate(spark.read.parquet(src)), cfg, bucket=False)
    expected = {
        r["url"]: r["scrubbed_text"]
        for r in batch.where("keep").select("url", "scrubbed_text").collect()
    }
    assert streamed == expected


def test_stream_resume_is_exactly_once(spark, web_dir):
    """Re-running with the same checkpoint reprocesses nothing; new
    files get picked up."""
    src = os.path.join(web_dir, "src2")
    generate(spark, 100, seed=12).write.parquet(src)
    sink = os.path.join(web_dir, "sink2")
    ckpt = os.path.join(web_dir, "ckpt2")
    cfg = PipelineConfig()

    run_available_now(stream_filtered_docs(read_web_stream(spark, src), cfg), sink, ckpt)
    n1 = spark.read.parquet(sink).count()

    # rerun, no new data → no duplicates
    run_available_now(stream_filtered_docs(read_web_stream(spark, src), cfg), sink, ckpt)
    assert spark.read.parquet(sink).count() == n1

    # append new files → exactly the new batch's kept docs are added
    new_batch = generate(spark, 100, seed=13)
    kept_new = (
        with_decisions(annotate(new_batch), cfg, bucket=False).where("keep").count()
    )
    new_batch.write.mode("append").parquet(src)
    run_available_now(stream_filtered_docs(read_web_stream(spark, src), cfg), sink, ckpt)
    n3 = spark.read.parquet(sink).count()
    assert n3 == n1 + kept_new


def test_windowed_counts_match_batch(spark, web_dir):
    src = os.path.join(web_dir, "src")
    ckpt = os.path.join(web_dir, f"ckpt_{uuid.uuid4().hex[:6]}")
    cfg = PipelineConfig()

    counts = stream_quality_counts(
        read_web_stream(spark, src), cfg, window="1 day", watermark="1 day"
    )
    table = f"qc_stream_{uuid.uuid4().hex[:6]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["rule_name"]): (r["failed"], r["passed"])
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    }
    assert got  # windows exist

    batch = with_decisions(annotate(spark.read.parquet(src)), cfg, bucket=False)
    expected_total = batch.count()
    # reconcile one rule across all windows against the batch totals
    failed = sum(v[0] for (w, rule), v in got.items() if rule == "lang_match")
    passed = sum(v[1] for (w, rule), v in got.items() if rule == "lang_match")
    b = batch.agg(
        F.count(F.when(~F.col("rule_lang_match"), 1)).alias("f"),
        F.count(F.when(F.col("rule_lang_match"), 1)).alias("p"),
    ).collect()[0]
    assert (failed, passed) == (b["f"], b["p"])
    assert failed + passed == expected_total


def test_stream_counts_feed_drift_detection(spark, web_dir):
    """The production drift wiring: the stream maintains per-window
    per-rule counters incrementally (bounded state); drift analysis is
    a batch scan over that accumulated counter table. The streamed
    counters must produce IDENTICAL drift rows to counters computed
    directly from the batch input."""
    src = os.path.join(web_dir, "src")
    sink = os.path.join(web_dir, f"drift_sink_{uuid.uuid4().hex[:6]}")
    ckpt = os.path.join(web_dir, f"drift_ckpt_{uuid.uuid4().hex[:6]}")
    cfg = PipelineConfig()

    from contessa_spark.operators.monitoring import drift_from_bucket_counts
    from contessa_spark.pipeline import KEEP_RULES

    # 60-day warc_ts spread over 400 docs → daily buckets carry ~7
    # docs each; use a 1-day window via the stream's window parameter
    counts = stream_quality_counts(
        read_web_stream(spark, src), cfg, window="1 day", watermark="2 days"
    )
    run_available_now(counts, sink, ckpt)
    stream_counts = (
        spark.read.parquet(sink)
        .select(
            "rule_name",
            F.unix_timestamp("window_start").alias("bucket_epoch"),
            (F.col("failed") + F.col("passed")).alias("total"),
            "failed",
        )
    )
    stream_drift = {
        (r["rule_name"], r["bucket_epoch"]): tuple(r)
        for r in drift_from_bucket_counts(stream_counts, trailing=4).collect()
    }

    batch = with_decisions(annotate(spark.read.parquet(src)), cfg, bucket=False)
    from contessa_spark.operators.monitoring import rule_drift

    batch_drift = {
        (r["rule_name"], r["bucket_epoch"]): tuple(r)
        for r in rule_drift(
            batch,
            {n: F.col(f"rule_{n}") for n in KEEP_RULES},
            ts_col="warc_ts",
            bucket="1 day",
            trailing=4,
        ).collect()
    }
    # append mode emits only watermark-CLOSED windows: every emitted
    # window must match the batch computation exactly, and the
    # unemitted remainder must be confined to the trailing watermark
    # region (the documented late-data contract)
    assert stream_drift
    assert all(batch_drift[k] == v for k, v in stream_drift.items())
    missing = set(batch_drift) - set(stream_drift)
    horizon = max(e for _r, e in stream_drift)
    assert all(e > horizon for _r, e in missing)
    assert len(stream_drift) >= 10  # enough buckets to be meaningful
