"""Benchmark decontamination: flag corpus documents sharing word
n-grams with an evaluation/benchmark set.

The standard LLM-training hygiene pass (GPT-3 appendix C uses 13-gram
overlap; The Pile and most open pipelines follow): before training,
every document that shares at least one n-gram with any benchmark
document is flagged (and usually dropped or split). Re-expressed
Spark-first:

* the benchmark side is, by nature, tiny next to the corpus (eval
  suites are thousands of documents, the corpus is 10¹²) — its
  distinct n-gram HASH set is a few MB and is explicitly
  ``broadcast()``: the corpus-side scan never shuffles;
* n-grams are FNV-64 hashes (``dedup.hashed_shingles_udf``), so the
  broadcast carries 8-byte longs, and the corpus side computes its
  grams in the same single fused UDF pass used by the dedup operators;
* output is per-document (id, hit_ngrams, contaminated) — the count
  supports thresholded policies (e.g. drop on ≥2 distinct hits), the
  boolean is the GPT-3-style any-overlap flag.

False-positive rate from hash collisions is ≤ |bench grams|·2⁻⁶⁴ per
doc gram — irrelevant at any real benchmark size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from contessa_spark.operators.dedup import hashed_shingles_udf


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id, hit_ngrams, contaminated) — distinct word n-grams of each
    doc found anywhere in the benchmark's n-gram set.

    Plan: benchmark grams → distinct hash set → ``broadcast`` inner
    join against the exploded corpus grams → per-doc count → left join
    back so clean docs report 0. One corpus UDF pass, zero corpus
    shuffles besides the per-doc count (partial-aggregated on the
    already-co-located explode output).
    """
    grams = hashed_shingles_udf(n)
    bench_grams = (
        benchmark.select(F.explode(grams(F.col(bench_text_col))).alias("_g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(grams(F.col(text_col))).alias("_g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hit_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("hit_ngrams"), F.lit(0)).alias("hit_ngrams"),
            (F.coalesce(F.col("hit_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
