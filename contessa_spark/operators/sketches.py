"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 4: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

At 100-TB scale the question "how many distinct users/domains/tokens?"
must not be answered by re-scanning history: the scalable pattern is
to persist a PER-SLICE sketch (per day, per partition, per source) and
MERGE sketches later — union is commutative/associative, so rollups,
backfills, and incremental appends all cost one tiny agg over sketch
blobs instead of a full recount. ``count(DISTINCT x)`` needs a full
shuffle of x; a sketch agg is map-side-combinable bounded state
(≤ 2^lgk registers) regardless of cardinality.

Everything here is JVM-side (zero Python in the hot path); the
estimate is deterministic for a given input SET (hashing is seeded
constant, union order-insensitive) — layout-invariance is pytest-gated.

Reference parity: contessa counts exact rule violations only; sketches
are a forward-looking training-pipeline operator (SURVEY.md §2
extension — "novel sketch" family next to MinHash/SimHash/bloom).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(cols: Union[str, Sequence[str], None]) -> List[str]:
    if cols is None:
        return []
    return [cols] if isinstance(cols, str) else list(cols)


def cardinality_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch + estimate → group_cols + (sketch binary,
    approx_distinct long).

    ``lgk`` = log2 of the register count (12 → 4 KiB state, ~1.6 %
    relative standard error). The sketch column is the persistable
    artifact: write it per slice, roll up later with
    ``merge_sketches`` — never recount.
    """
    gc = _cols(group_cols)
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    out = df.groupBy(*gc).agg(agg) if gc else df.agg(agg)
    return out.withColumn(
        "approx_distinct", F.hll_sketch_estimate(F.col("sketch"))
    )


def merge_sketches(
    sketch_df: DataFrame,
    group_cols: Union[str, Sequence[str], None] = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union previously-built sketches (e.g. daily slices → totals) →
    group_cols + (sketch, approx_distinct). One tiny agg over blobs —
    the incremental-rollup path that makes sketches worth storing."""
    gc = _cols(group_cols)
    agg = F.hll_union_agg(F.col(sketch_col)).alias("sketch")
    out = (
        sketch_df.groupBy(*gc).agg(agg) if gc else sketch_df.agg(agg)
    )
    return out.withColumn(
        "approx_distinct", F.hll_sketch_estimate(F.col("sketch"))
    )


def approx_distinct_counts(
    df: DataFrame,
    value_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    lgk: int = 12,
) -> DataFrame:
    """group_cols + approx_distinct only (no sketch blob) — the
    one-shot form for when the artifact isn't being persisted."""
    return cardinality_sketches(df, value_col, group_cols, lgk).drop(
        "sketch"
    )
