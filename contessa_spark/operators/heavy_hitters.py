"""Misra–Gries heavy hitters: approximate top items with a bounded,
mergeable summary (Misra & Gries 1982; merge rule from Agarwal et al.
2013, "Mergeable Summaries").

The exact top-k operators (`text_analysis.top_terms_per_lang`'s salted
two-level top-k) shuffle every (term, partial count) group. When the
key space is huge (domains, tokens, URLs at 10¹² docs) and only the
heavy tail matters, a Misra–Gries summary needs ONE pass, O(1/ε)
state per partition, and a driver-side merge of ≤ partitions · (1/ε)
candidate rows — no corpus shuffle at all. Deterministic guarantee
(not probabilistic): for every item,

    true_count − εN  ≤  estimate  ≤  true_count

so every item with frequency > εN is guaranteed present (no false
negatives above the threshold), and reported estimates never
overcount.

Spark-first plan: ``mapInPandas`` runs the classic counter algorithm
per Arrow batch stream (value_counts-vectorized, not per-row Python:
each batch's exact counts feed the MG state, decrements amortize), one
summary row per (group, item) candidate; a groupBy-sum merges partial
summaries, subtracting nothing — summing MG summaries and re-pruning
to the top 1/ε preserves the guarantee with ε doubled (Agarwal et al.
Thm 1); we track the per-partition decrement totals explicitly and
expose ``max_undercount`` so callers see the actual error bound, not
the worst case.

The ESTIMATES are layout-dependent (merge order changes decrements) —
the GUARANTEE is not. Tests gate the guarantee under multiple layouts;
the driver query is rows-only by design.

Reference parity: contessa has no approximate operators — forward-
looking training-pipeline operator (SURVEY.md §2 extension, sketch
family: MinHash / SimHash / bloom / HLL / MG).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cols(cols: Union[str, Sequence[str], None]) -> List[str]:
    if cols is None:
        return []
    return [cols] if isinstance(cols, str) else list(cols)


def misra_gries_topk(
    df: DataFrame,
    value_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-``k`` items per group → group_cols + (item,
    est_count, max_undercount) with est_count descending, item-lex
    tie-break, row_number ≤ k.

    ``capacity`` is the per-partition counter budget (ε = 1/capacity:
    any item with true frequency > N/capacity per partition survives
    locally; after the merge the bound is the SUM of per-partition
    decrements, reported exactly in ``max_undercount`` — identical for
    every row of a group). est_count never exceeds the true count.
    """
    import pandas as pd

    gc = _cols(group_cols)
    sel = gc + [value_col]
    src = df.select(*sel).where(F.col(value_col).isNotNull())

    def summarize(batches):
        # state per group: {group_key: ({item: count}, decrement_total)}
        state: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = (
                list(zip(*[pdf[c] for c in gc])) if gc else [()] * len(pdf)
            )
            kf = pd.Series(keys)
            for gkey, sub in pdf.groupby(kf, sort=False):
                counters, dec = state.get(gkey, ({}, 0))
                # exact counts within the batch, then one MG update per
                # DISTINCT item — vectorized, no per-row loop
                vc = sub[value_col].value_counts()
                for item, c in vc.items():
                    if item in counters:
                        counters[item] += int(c)
                    else:
                        counters[item] = int(c)
                        if len(counters) > capacity:
                            # decrement by the current minimum count:
                            # removes ≥1 counter, amortized O(1)
                            m = min(counters.values())
                            dec += m
                            counters = {
                                i: n - m
                                for i, n in counters.items()
                                if n > m
                            }
                state[gkey] = (counters, dec)
        rows = []
        for gkey, (counters, dec) in state.items():
            for item, c in counters.items():
                rows.append((*gkey, item, c, dec))
            if not counters and dec:
                # all counters decremented away: a NULL-item sentinel
                # keeps this partition's decrement in the bound (input
                # NULLs are filtered, so NULL is free as a sentinel)
                rows.append((*gkey, None, 0, dec))
        cols = gc + ["item", "part_count", "part_dec"]
        yield pd.DataFrame(rows, columns=cols)

    gtypes = [f"`{c}` {dict(src.dtypes)[c]}" for c in gc]
    vtype = dict(src.dtypes)[value_col]
    schema = ", ".join(
        gtypes + [f"item {vtype}", "part_count long", "part_dec long"]
    )
    partials = src.mapInPandas(summarize, schema)

    # merge: sum per-item partial counts; the group's undercount bound
    # is the sum of every PARTITION's decrement total — collect it from
    # the distinct (partition, dec) pairs via max-per-partial trick:
    # part_dec repeats on every row a partition emits for the group, so
    # sum(DISTINCT) is unsafe (two partitions can share a value); tag
    # each source partition instead.
    #
    # localCheckpoint (lazy): per_part_dec and counted both consume the
    # sketch pass below — without it the full input scan + MG summarize
    # runs TWICE, and the pid/part_dec pairing would silently rely on
    # deterministic re-scan partitioning. The materialized partials are
    # O(1/ε) rows per partition per group — bounded at any scale.
    partials = partials.withColumn(
        "pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    per_part_dec = (
        partials.groupBy(*gc, "pid")
        .agg(F.max("part_dec").alias("d"))
        .groupBy(*gc)
        .agg(F.sum("d").alias("max_undercount"))
    )
    counted = partials.where(F.col("item").isNotNull())
    merged = (
        counted.groupBy(*gc, "item")
        .agg(F.sum("part_count").alias("est_count"))
        .join(per_part_dec, gc)
        if gc
        else counted.groupBy("item")
        .agg(F.sum("part_count").alias("est_count"))
        .crossJoin(per_part_dec)
    )
    w_cols = [F.col(c) for c in gc]
    from pyspark.sql import Window

    w = Window.partitionBy(*w_cols).orderBy(
        F.desc("est_count"), F.asc("item")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*gc, "item", "est_count", "max_undercount", "rank")
    )
