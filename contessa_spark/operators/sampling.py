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


# ------------------------------------------------------- mixture sampling

def _threshold_hex_floor(fraction: float) -> str:
    """Like ``_threshold_hex`` but FLOOR-derived: mixture fractions are
    computed from data-dependent counts on BOTH the Spark side and the
    SQL oracle, and ``floor`` is the rounding whose semantics are
    identical everywhere (Python ``round`` is banker's, SQL round is
    half-away — an off-by-one threshold would flip boundary rows)."""
    import math

    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "gggggg"
    return format(int(math.floor(fraction * 16**6)), "06x")


def mixture_fractions(
    counts: Dict[str, int], weights: Dict[str, float]
) -> Dict[str, float]:
    """Target mixture proportions → per-stratum KEEP fractions that
    (a) hit the target ratios exactly in expectation and (b) keep the
    maximum possible data without replacement: the stratum with the
    highest weight-to-availability rate keeps everything (fraction 1)
    and binds the rest — ``frac_s = (w_s/n_s) / max_t(w_t/n_t)``
    (the standard mixture construction in DoReMi/Pile-style data
    recipes). Strata without a weight are dropped (fraction 0)."""
    rates = {
        s: (weights.get(s, 0.0) / c if c else 0.0) for s, c in counts.items()
    }
    mx = max(rates.values(), default=0.0)
    if mx <= 0:
        return {s: 0.0 for s in counts}
    return {s: r / mx for s, r in rates.items()}


def mixture_sample(
    df: DataFrame,
    weights: Dict[str, float],
    strata_col: str = "lang",
    key_cols: Optional[List[str]] = None,
    salt: str = "mix",
    max_case_strata: int = 256,
) -> DataFrame:
    """Deterministic mixture construction: resample ``df`` so the
    ``strata_col`` distribution matches ``weights`` in expectation,
    keeping the maximum data (no replacement, no duplication).

    One tiny count aggregate (map-side combined) fixes the per-stratum
    fractions driver-side; the filter itself is the shared pure-JVM
    hash predicate (``sample_hash_col`` < per-stratum threshold CASE)
    — no shuffle, pushdown-friendly, identical row set on every
    engine/layout. The division chain uses plain float64 ops in a
    fixed order so a SQL oracle recomputing the same fractions lands
    on bit-identical thresholds (see ``_threshold_hex_floor``).
    Rows with a NULL or unweighted stratum value are dropped (they
    have no place in the target mixture)."""
    key_cols = list(key_cols or ["doc_id"])
    counts = {
        r[strata_col]: r["_n"]
        for r in df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    # NULL strata have no place in the target mixture: drop them here so
    # they never reach sorted() (None is unorderable against str) — they
    # fall through to the CASE default / fail the inner join below.
    counts.pop(None, None)
    fracs = mixture_fractions(counts, weights)
    h = sample_hash_col(key_cols, salt)
    if len(fracs) <= max_case_strata:
        # CASE chain: evaluated at the scan, pushdown-friendly
        thr = F.lit("000000")  # unknown / zero-weight strata: drop
        for value, frac in sorted(fracs.items()):
            thr = F.when(
                F.col(strata_col) == value, F.lit(_threshold_hex_floor(frac))
            ).otherwise(thr)
        return df.where(h < thr)
    # many strata (e.g. per-domain weights): a CASE with 10⁵ branches
    # is exactly the planning/codegen blowup measured on the expanded
    # ANN dots — switch to a broadcast threshold-table join instead
    # (inner join: unknown strata drop, same as the CASE default)
    spark = df.sparkSession
    thr_df = spark.createDataFrame(
        [(v, _threshold_hex_floor(f)) for v, f in sorted(fracs.items())],
        f"{strata_col} string, _thr string",
    )
    return (
        df.join(F.broadcast(thr_df), strata_col)
        .where(h < F.col("_thr"))
        .drop("_thr")
    )


# ------------------------------------------------- train/val/test splits

def split_assign(
    df: DataFrame,
    splits: List,
    key_cols: List[str],
    salt: str = "split0",
    strata_col: Optional[str] = None,
    strata_splits: Optional[Dict[str, List]] = None,
) -> DataFrame:
    """Deterministic multi-way dataset split → input columns +
    ``split`` label.

    ``splits`` is an ordered list of ``(name, weight)`` pairs summing
    to ~1.0 (the last split absorbs hash-granularity remainder — it
    owns the hash range past the final boundary).  Assignment is by
    the same md5-prefix mechanism as :func:`hash_sample`: each split
    owns a contiguous hash range, so splits are disjoint, exhaustive,
    reproducible across runs/engines/partitionings, and STABLE UNDER
    APPEND — a new document lands in a split without moving any
    existing document (the property shuffle-based `randomSplit`
    lacks, and the one that matters when a 10^12-doc corpus grows
    incrementally).  ``strata_splits`` overrides the weight list for
    chosen strata (e.g. hold out more of a low-resource language).

    Scale shape: a pure-JVM projection — no shuffle, no window, no
    state; the split predicate composes with partition pruning and
    pushdown.  Per-stratum EXACT proportions would need a per-stratum
    global rank (one task per stratum at 10^12 rows — a non-starter);
    at 16⁶ hash granularity the realized fraction is within ~6e-8 of
    the weight, which is the right trade at scale.
    """
    ranges = _split_ranges(splits)
    h = sample_hash_col(key_cols, salt)
    label = _split_case(h, ranges)
    if strata_col is not None and strata_splits:
        for value, sub in sorted(strata_splits.items()):
            label = F.when(
                F.col(strata_col) == value,
                _split_case(h, _split_ranges(sub)),
            ).otherwise(label)
    return df.withColumn("split", label)


def _split_ranges(splits: List) -> List:
    """[(name, weight)] → [(name, upper_hex_bound)] with cumulative
    boundaries; validates weights."""
    if len(splits) < 2:
        raise ValueError("split_assign: need at least 2 splits")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"split_assign: duplicate split names {names}")
    total = sum(w for _, w in splits)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split_assign: weights sum to {total}, not 1")
    out, cum = [], 0.0
    for name, w in splits:
        if w <= 0:
            raise ValueError(f"split_assign: weight for {name} must be > 0")
        cum += w
        out.append((name, _threshold_hex(min(cum, 1.0))))
    out[-1] = (out[-1][0], "gggggg")  # last split absorbs remainder
    return out


def _split_case(h: Column, ranges: List) -> Column:
    label = F.lit(ranges[-1][0])
    for name, bound in reversed(ranges[:-1]):
        label = F.when(h < F.lit(bound), F.lit(name)).otherwise(label)
    # reversed() builds WHEN h < t1 THEN s1 WHEN h < t2 THEN s2 … —
    # first matching (smallest) bound wins, like the SQL CASE mirror
    return label


def split_assign_sql_case(
    splits: List,
    key_cols: List[str],
    salt: str = "split0",
) -> str:
    """The SAME split CASE as ANSI SQL (DuckDB-ready) — oracle
    sharing, mirroring :func:`hash_sample_sql_predicate`."""
    ranges = _split_ranges(splits)
    keys = ", ".join(key_cols)
    h = f"substring(md5(concat_ws('|', '{salt}', {keys})), 1, 6)"
    whens = " ".join(
        f"WHEN {h} < '{bound}' THEN '{name}'" for name, bound in ranges[:-1]
    )
    return f"CASE {whens} ELSE '{ranges[-1][0]}' END"


def stratified_fixed_sample(
    df: DataFrame,
    n_per_stratum: int,
    key_cols: List[str],
    strata_cols: List[str],
    salt: str = "fx0",
) -> DataFrame:
    """EXACTLY ``min(n, |stratum|)`` rows per stratum, chosen
    deterministically — the eval-set construction primitive ("500
    documents per language, same 500 every run and engine").

    The selection order is the md5 sampling hash (uniform, salt-keyed,
    shared verbatim with the SQL oracle), tie-broken by the key
    columns, so the sample is reproducible across runs, engines, and
    partitionings, and re-salting draws an independent sample.
    Implemented as rank-within-stratum over the hash; output adds the
    6-hex ``__sample_hash`` and the 1-based ``rank`` (callers drop
    them or keep them as lineage).

    Scale note: rank-per-stratum is a per-stratum ordered window —
    fine for the many-strata/handful-of-rows-each shapes eval sets
    have. For a FEW huge strata at 10^12 rows, the fractional
    :func:`hash_sample` (zero shuffle) is the right tool; this
    operator is for when exact counts matter more than shuffle
    freedom.
    """
    if n_per_stratum <= 0:
        raise ValueError("stratified_fixed_sample: n_per_stratum must be > 0")
    if not strata_cols:
        raise ValueError("stratified_fixed_sample: need strata_cols")
    from contessa_spark.operators.windows import top_k_per_group

    with_hash = df.withColumn(
        "__sample_hash", sample_hash_col(key_cols, salt)
    )
    return top_k_per_group(
        with_hash,
        strata_cols,
        "__sample_hash",
        k=int(n_per_stratum),
        tiebreak_cols=key_cols,
        descending=False,
    )


def stratified_fixed_sample_sql(
    n_per_stratum: int,
    key_cols: List[str],
    strata_cols: List[str],
    salt: str = "fx0",
    table: str = "documents",
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`stratified_fixed_sample` (same hash,
    same ordering, same rank semantics)."""
    keys = ", ".join(key_cols)
    strata = ", ".join(strata_cols)
    h = f"substring(md5(concat_ws('|', '{salt}', {keys})), 1, 6)"
    order = ", ".join([f"__sample_hash ASC"] + [f"{c} ASC" for c in key_cols])
    return (
        f"WITH h AS (SELECT {select_cols}, {h} AS __sample_hash FROM {table}), "
        "r AS (SELECT *, row_number() OVER ("
        f" PARTITION BY {strata} ORDER BY {order})::INT AS rank FROM h) "
        f"SELECT * FROM r WHERE rank <= {int(n_per_stratum)}"
    )
