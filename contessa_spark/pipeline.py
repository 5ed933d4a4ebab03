"""The north-star job: language-ID + quality-filter + PII/toxicity scrub
over Common-Crawl-style web pages.

Contessa's rule DSL instantiated as a web-scale filter
(BASELINE.json north_rule): every stage is a registered rule; per-rule
pass/fail counts land in the quality-check table exactly like
Contessa's AggregatedResult rows; per-partition lineage rows make the
run resumable by partition.

Execution shape (designed for 10^12 docs / 1000 executors):

1. ONE scan of the input computes everything per row — langid +
   perplexity + scrub as Arrow-batched pandas UDFs, the C4/Gopher
   heuristics as pure JVM Column expressions — and writes the fully
   annotated dataset (keep flag + per-rule booleans + scrubbed text)
   to the output table, hash-bucketed by url.
2. Lineage + per-rule counts aggregate from the WRITTEN output
   (column-pruned boolean scan), never re-running the UDFs.
3. Resume = skip buckets whose lineage row already exists.

Skew: hot domains are irrelevant to the map-only filter itself, but
the bucket column is ``pmod(xxhash64(url), n_buckets)`` — a salted
uniform key, so output files and lineage groups stay balanced no
matter how hot a domain gets. AQE handles the rest (session.py).

Rule ancestry (SURVEY §2.5):
  lang_match            ← CustomSqlRule        (expr rule)
  perplexity_lt         ← LtRule               rules.py:226-246
  min/max length        ← GteRule/LteRule
  symbol_ratio_lt       ← LtRule
  repetition_lt         ← LtRule
  stopword_frac_gt      ← GtRule
  mean_word_len_between ← expr rule
  pii_scrub             ← CustomSqlRule + only_failures_mode rules.py:80-82
  url/text not_null     ← NotNullRule          rules.py:141-154
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from contessa_spark.functions import langid, perplexity, scrub, textstats
from contessa_spark.results import (
    QUALITY_CHECK_SCHEMA,
    UPSERT_KEY,
    ParquetMergeWriter,
    build_quality_rows,
    percentage,
)
from contessa_spark.rules import get_rule_cls


@dataclass
class PipelineConfig:
    """Thresholds calibrated on the synthetic corpus (see tests)."""

    lang_conf_tau: float = 0.5
    ppl_tau: float = 15000.0
    min_chars: int = 100
    max_chars: int = 20000
    symbol_tau: float = 0.15
    repetition_tau: float = 0.85
    stopword_tau: float = 0.10
    mwl_min: float = 2.5
    mwl_max: float = 8.0
    n_buckets: int = 64  # lineage/checkpoint granularity


#: rule definitions in the contessa DSL (dict form, normalizer-ready)
def rule_defs(cfg: PipelineConfig) -> List[Dict]:
    return [
        {
            "name": "lang_match",
            "type": "expr",
            "column": "lang_pred",
            "expression": f"lang_pred = lang AND lang_conf >= {cfg.lang_conf_tau}",
            "description": "langid agrees with claimed tag at confidence",
        },
        {"name": "perplexity_lt", "type": "lt", "column": "ppl", "value": cfg.ppl_tau},
        {"name": "min_len_gte", "type": "gte", "column": "n_chars", "value": cfg.min_chars},
        {"name": "max_len_lte", "type": "lte", "column": "n_chars", "value": cfg.max_chars},
        {"name": "symbol_ratio_lt", "type": "lt", "column": "symbol_ratio", "value": cfg.symbol_tau},
        {"name": "repetition_lt", "type": "lt", "column": "repetition", "value": cfg.repetition_tau},
        {"name": "stopword_frac_gt", "type": "gt", "column": "stopword_frac", "value": cfg.stopword_tau},
        {
            "name": "mean_word_len_between",
            "type": "expr",
            "column": "mean_word_len",
            "expression": f"mean_word_len >= {cfg.mwl_min} AND mean_word_len <= {cfg.mwl_max}",
            "description": "mean word length in plausible band",
        },
        {"name": "url_not_null", "type": "not_null", "column": "url"},
    ]


#: keep = conjunction of all quality rules (pii_scrub only flags/rewrites)
KEEP_RULES = [
    "lang_match",
    "perplexity_lt",
    "min_len_gte",
    "max_len_lte",
    "symbol_ratio_lt",
    "repetition_lt",
    "stopword_frac_gt",
    "mean_word_len_between",
    "url_not_null",
]


def annotate(df: DataFrame) -> DataFrame:
    """ONE-pass per-row annotation.

    JVM Column exprs for the heuristics (whole-stage codegen), Arrow
    pandas UDFs for langid/perplexity/scrub. No per-row Python.
    """
    lang_udf = langid.spark_udf()
    ppl_udf = perplexity.spark_udf()
    scrub_udf = scrub.spark_udf()
    stats = textstats.spark_stat_columns("text")

    out = df.withColumn("_lid", lang_udf(F.col("text"))).withColumn(
        "_scr", scrub_udf(F.col("text"))
    )
    out = (
        out.withColumn("lang_pred", F.col("_lid.lang_pred"))
        .withColumn("lang_conf", F.col("_lid.lang_conf"))
        .withColumn("scrubbed_text", F.col("_scr.scrubbed_text"))
        .withColumn("pii_changed", F.col("_scr.pii_changed"))
        .drop("_lid", "_scr")
        .withColumn("ppl", ppl_udf(F.col("text")))
    )
    for name, col in stats.items():
        out = out.withColumn(name, col)
    return out


def _rule_predicates(cfg: PipelineConfig) -> Dict[str, Column]:
    """Compile the DSL defs to named boolean Columns (same compiler
    path the QualityRunner uses)."""
    preds = {}
    for d in rule_defs(cfg):
        rule = get_rule_cls(d["type"])(**d)
        preds[d["name"]] = rule.predicate()
    return preds


def with_decisions(annotated: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add per-rule boolean columns + the keep conjunction + bucket id."""
    preds = _rule_predicates(cfg)
    out = annotated
    for name, pred in preds.items():
        out = out.withColumn(f"rule_{name}", pred.eqNullSafe(F.lit(True)))
    keep = None
    for name in KEEP_RULES:
        c = F.col(f"rule_{name}")
        keep = c if keep is None else (keep & c)
    out = out.withColumn("keep", keep)
    out = out.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.n_buckets)).cast("int")
    )
    return out


LINEAGE_KEY = ["bucket"]


class QualityFilterPipeline:
    """End-to-end checkpointed run.

    Layout under ``base_path``:
      output/   annotated + filtered docs, partitioned by bucket
      lineage/  one row per completed bucket (input/kept/scrubbed counts
                + per-rule failed counts) — the checkpoint
      quality/  contessa-style quality-check rows per run
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        cfg: Optional[PipelineConfig] = None,
    ):
        self.spark = spark
        self.cfg = cfg or PipelineConfig()
        self.base = base_path
        self.output_path = os.path.join(base_path, "output")
        self.lineage_path = os.path.join(base_path, "lineage")
        self.quality_path = os.path.join(base_path, "quality")
        self.writer = ParquetMergeWriter(spark)

    # ---- checkpoint -----------------------------------------------

    def completed_buckets(self) -> List[int]:
        if not os.path.exists(self.lineage_path):
            return []
        return [
            r["bucket"]
            for r in self.spark.read.parquet(self.lineage_path)
            .select("bucket")
            .distinct()
            .collect()
        ]

    # ---- run ------------------------------------------------------

    def run(self, df: DataFrame, task_ts: Optional[datetime] = None) -> Dict:
        cfg = self.cfg
        task_ts = task_ts or datetime.now()

        done = set(self.completed_buckets())
        decided = with_decisions(annotate(df), cfg)
        if done:
            # resume: cheap JVM-side bucket filter BEFORE any UDF runs
            # (Catalyst pushes the xxhash64 filter below the Python
            # stages since they only depend on `text`)
            decided = decided.where(~F.col("bucket").isin(*done))

        out_cols = [
            "url",
            "warc_ts",
            "text",
            "lang",
            "lang_pred",
            "lang_conf",
            "ppl",
            "n_chars",
            "symbol_ratio",
            "repetition",
            "stopword_frac",
            "mean_word_len",
            "scrubbed_text",
            "pii_changed",
            "keep",
            "bucket",
        ] + [f"rule_{n}" for n in KEEP_RULES]

        # pass 1 (the only scan of the input): write annotated output
        projected = decided.select(*out_cols)
        (
            projected.write.mode("append")
            .partitionBy("bucket")
            .parquet(self.output_path)
        )

        # pass 2: aggregates over the WRITTEN columnar output — column
        # pruning means this scans a handful of boolean/long columns.
        # Explicit schema: cheap, and robust to an empty write.
        written = self.spark.read.schema(projected.schema).parquet(self.output_path)
        if done:
            written = written.where(~F.col("bucket").isin(*done))

        rule_aggs = []
        for n in KEEP_RULES + ["pii_scrub"]:
            col = (
                ~F.col("pii_changed") if n == "pii_scrub" else F.col(f"rule_{n}")
            )
            rule_aggs.append(
                F.count(F.when(col.eqNullSafe(F.lit(False)), 1)).alias(f"failed_{n}")
            )
        lineage = written.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("input_count"),
            F.count(F.when(F.col("keep"), 1)).alias("kept_count"),
            F.count(F.when(F.col("pii_changed"), 1)).alias("scrubbed_count"),
            *rule_aggs,
            F.lit(task_ts).alias("task_ts"),
        )
        self.writer.merge(
            lineage, self.lineage_path, LINEAGE_KEY, lineage.schema
        )

        # quality-check rows: tiny rollup of lineage (never rescans data)
        qrows = self._quality_rows(task_ts)
        qdf = self.spark.createDataFrame(qrows, schema=QUALITY_CHECK_SCHEMA)
        self.writer.merge(qdf, self.quality_path, UPSERT_KEY, QUALITY_CHECK_SCHEMA)

        summary = (
            self.spark.read.parquet(self.lineage_path)
            .agg(
                F.sum("input_count").alias("input"),
                F.sum("kept_count").alias("kept"),
                F.sum("scrubbed_count").alias("scrubbed"),
            )
            .collect()[0]
        )
        return {
            "input": summary["input"] or 0,
            "kept": summary["kept"] or 0,
            "scrubbed": summary["scrubbed"] or 0,
            "buckets_done": cfg.n_buckets,
            "resumed_buckets_skipped": len(done),
        }

    def _quality_rows(self, task_ts: datetime) -> List[dict]:
        lineage = self.spark.read.parquet(self.lineage_path)
        agg = [F.sum("input_count").alias("total")]
        names = KEEP_RULES + ["pii_scrub"]
        for n in names:
            agg.append(F.sum(f"failed_{n}").alias(f"failed_{n}"))
        row = lineage.agg(*agg).collect()[0]
        defs = {d["name"]: d for d in rule_defs(self.cfg)}
        out = []
        for n in names:
            total = row["total"] or 0  # sum() over empty lineage is NULL
            failed = row[f"failed_{n}"] or 0
            passed = total - failed
            d = defs.get(n, {"column": "text", "type": "sql"})
            out.append(
                {
                    "attribute": d.get("column", "text"),
                    "rule_name": n,
                    "rule_type": d.get("type", "sql"),
                    "rule_description": d.get("description"),
                    "total_records": total,
                    "failed": failed,
                    "median_30_day_failed": None,
                    "passed": passed,
                    "median_30_day_passed": None,
                    "failed_percentage": percentage(failed, total),
                    "passed_percentage": percentage(passed, total),
                    "status": "invalid" if failed > 0 else "valid",
                    "time_filter": "not_set",
                    "task_ts": task_ts,
                    "created_at": datetime.utcnow(),
                }
            )
        return out
