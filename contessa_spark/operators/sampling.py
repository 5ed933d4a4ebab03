"""Deterministic (hash-based) sampling — the reproducible kind a
training-data pipeline needs: the same row set comes back on every
run, engine, and partitioning, unlike ``df.sample`` whose output
depends on RNG seed plumbing and split boundaries.

Mechanism: ``md5(salt | key)`` is uniform; a row is kept when the
first 6 hex chars compare below a threshold string derived from the
fraction (16⁶ ≈ 1.7e7 granularity). Lowercase-hex string comparison is
identical in Spark, DuckDB, and Python, so the oracle shares the
predicate verbatim. Per-stratum fractions (e.g. downsample English,
keep all low-resource languages) compile to a CASE over thresholds —
pure JVM, no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(fraction: float) -> str:
    """fraction ∈ [0,1] → 6-char threshold string for lexicographic
    comparison against a 6-char lowercase-hex prefix. fraction=1.0
    maps to "gggggg": every hex char < 'g', so everything is kept
    (format(16**6) would be 7 chars and compare LESS than "ffffff")."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    v = int(round(fraction * 16**6))
    if v >= 16**6:
        return "gggggg"
    return format(v, "06x")


def sample_hash_col(key_cols: List[str], salt: str = "s0") -> Column:
    """The 6-hex-char sampling key: md5 over salt + key columns."""
    joined = F.concat_ws("|", F.lit(salt), *[F.col(c) for c in key_cols])
    return F.substring(F.md5(joined.cast("binary")), 1, 6)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: List[str],
    salt: str = "s0",
    strata_col: Optional[str] = None,
    strata_fractions: Optional[Dict[str, float]] = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash.

    With ``strata_col`` + ``strata_fractions``, each stratum gets its
    own fraction (unlisted strata fall back to ``fraction``). Changing
    ``salt`` draws an independent sample; nested samples with the same
    salt are subsets (threshold monotonicity) — handy for 1% → 10%
    scale-up experiments that must reuse the smaller sample's rows.
    """
    h = sample_hash_col(key_cols, salt)
    if strata_col is not None and strata_fractions:
        thr = F.lit(_threshold_hex(fraction))
        for value, frac in sorted(strata_fractions.items()):
            thr = F.when(
                F.col(strata_col) == value, F.lit(_threshold_hex(frac))
            ).otherwise(thr)
        return df.where(h < thr)
    return df.where(h < F.lit(_threshold_hex(fraction)))


def hash_sample_sql_predicate(
    fraction: float, key_cols: List[str], salt: str = "s0"
) -> str:
    """The SAME predicate as ANSI SQL (DuckDB-ready) — oracle sharing."""
    keys = ", ".join(key_cols)
    return (
        f"substring(md5(concat_ws('|', '{salt}', {keys})), 1, 6) "
        f"< '{_threshold_hex(fraction)}'"
    )
