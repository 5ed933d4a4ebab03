"""Robots noindex meta detection + the honor_noindex pipeline rule."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HTMLS = [
    (b"<html><head><meta name=robots content=noindex></head></html>", True),
    (b'<meta name="ROBOTS" content="NOINDEX, nofollow">', True),
    (b"<meta name='googlebot' content='noindex'>", True),
    (b'<META CONTENT="noindex,noarchive" NAME=robots>', True),  # reversed
    (b'<meta name="robots" content="index, follow">', False),
    (b'<meta name="viewport" content="noindex">', False),  # wrong name
    (b"<p>discussing the noindex directive in prose</p>", False),
    (b"", False),
    (None, False),
]


def test_py_has_noindex_cases():
    from contessa_spark.functions.robots import py_has_noindex

    for html, want in HTMLS:
        assert py_has_noindex(html) is want, html


def test_noindex_col_matches_python(spark):
    from contessa_spark.functions.robots import noindex_col, py_has_noindex

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTMLS)], "i long, html binary"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", noindex_col(F.col("html")).alias("n")).collect()
    }
    for i, (html, want) in enumerate(HTMLS):
        assert got[i] is want, (i, html)


def test_pipeline_honor_noindex_drops_opted_out_pages(spark, tmp_path):
    from datetime import datetime

    from contessa_spark.pipeline import PipelineConfig, QualityFilterPipeline
    from contessa_spark.sources.webgen import generate

    web = generate(spark, 60, seed=7)
    # mark every 3rd page noindex
    marked = web.withColumn(
        "html",
        F.when(
            F.col("url").isNotNull()
            & (F.xxhash64("url") % 3 == 0),
            F.concat(
                F.lit(b"<meta name=robots content=noindex>"), F.col("html")
            ),
        ).otherwise(F.col("html")),
    )
    cfg = PipelineConfig(n_buckets=8, honor_noindex=True)
    p = QualityFilterPipeline(spark, str(tmp_path / "a"), cfg)
    p.run(marked, task_ts=datetime(2026, 1, 1))
    out = spark.read.parquet(str(tmp_path / "a") + "/output")
    kept_marked = out.where(F.col("noindex") & F.col("keep")).count()
    assert kept_marked == 0
    # noindex pages exist and fail exactly the noindex rule
    assert out.where(F.col("noindex")).count() > 0
    assert out.where(F.col("noindex") & F.col("rule_noindex_absent")).count() == 0

    # default config: rule absent, output schema unchanged
    p2 = QualityFilterPipeline(spark, str(tmp_path / "b"), PipelineConfig(n_buckets=8))
    p2.run(web, task_ts=datetime(2026, 1, 1))
    out2 = spark.read.parquet(str(tmp_path / "b") + "/output")
    assert "noindex" not in out2.columns
    assert "rule_noindex_absent" not in out2.columns
