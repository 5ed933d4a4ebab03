"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — exact cosine top-k: candidate pair join +
  window rank. The correctness baseline; O(Q·N) pairs but the pair
  rows are narrow and Catalyst broadcasts the (small) query side.
* ``hyperplane_lsh_topk`` — the scale path: random-hyperplane signed
  signatures (Charikar 2002 SimHash-for-cosine) bucket the corpus;
  top-k is searched only within matching buckets (multi-probe via
  several independent tables). Hyperplanes derive deterministically
  from a seed (SplitMix-style), so signatures are stable across
  partitionings; recall is tunable with n_tables × n_bits.
* ``ivf_topk`` — IVF-style variant: k-means-free coarse quantizer
  using hash-selected pivot vectors; probes the closest n_probe cells.

At 10^12 rows the bucket join replaces an impossible cross join; all
distance math is JVM (zip_with/aggregate) — no UDF in the hot path.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from contessa_spark.operators.dedup import cosine_sim


def _splitmix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _hyperplanes(dim: int, n_bits: int, seed: int) -> List[List[float]]:
    """Deterministic pseudo-gaussian hyperplanes from a seed (sum of
    uniforms ≈ normal; all integer hashing, no RNG state)."""
    planes = []
    for b in range(n_bits):
        row = []
        for d in range(dim):
            acc = 0.0
            for r in range(4):
                h = _splitmix(seed * 1_000_003 + b * 10_007 + d * 101 + r)
                acc += (h / 2**64) - 0.5
            row.append(acc)
        planes.append(row)
    return planes


def signature_col(vec: Column, planes: List[List[float]]) -> Column:
    """int bucket id: sign bits of plane dot products. Pure JVM —
    plane vectors are array literals folded by Catalyst."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast the query side, rank per query.
    Output: (query_id, neighbor_id, cosine, rank). Ties break on
    neighbor_id for determinism."""
    from contessa_spark.operators.dedup import dot_fixed, norm_fixed

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    queries = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    dim = corpus.select(F.size("_cv")).first()[0]
    # norms once per row (not per pair); dot as codegen-friendly
    # expanded terms — higher-order lambdas stay interpreted
    corpus = corpus.withColumn("_cn", norm_fixed(F.col("_cv"), dim))
    queries = queries.withColumn("_qn", norm_fixed(F.col("_qv"), dim))
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            # rank on the ROUNDED score: deterministic and engine-agnostic
            # (raw-double ordering can disagree with an external oracle
            # in the last ulp)
            F.round(
                dot_fixed(F.col("_qv"), F.col("_cv"), dim)
                / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 16,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: per-table sign-bucket join, union of candidates,
    exact re-rank. Recall < 1 by design; the bucket join shuffles
    (table, bucket) keys instead of forming Q×N pairs."""
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    queries = query_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))

    c_ent = []
    q_ent = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed + 7919 * t)
        c_ent.append(
            corpus.select(
                "neighbor_id",
                "_cv",
                F.lit(t).alias("tbl"),
                signature_col(F.col("_cv").cast("array<double>"), planes).alias("bucket"),
            )
        )
        q_ent.append(
            queries.select(
                "query_id",
                "_qv",
                F.lit(t).alias("tbl"),
                signature_col(F.col("_qv").cast("array<double>"), planes).alias("bucket"),
            )
        )
    c_all = c_ent[0]
    for e in c_ent[1:]:
        c_all = c_all.unionByName(e)
    q_all = q_ent[0]
    for e in q_ent[1:]:
        q_all = q_all.unionByName(e)

    cand = (
        c_all.join(q_all, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            cosine_sim(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-flat ANN: pivot vectors = hash-selected corpus rows
    (deterministic coarse quantizer, no k-means iterations); every
    vector is assigned to its nearest cell, queries probe the n_probe
    nearest cells, exact re-rank inside.

    The pivot set is tiny → collected once and broadcast as literals;
    assignment and re-rank are JVM expressions.
    """
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    # deterministic pivot choice: smallest xxhash64(id, seed)
    pivots = [
        (r["neighbor_id"], [float(x) for x in r["_cv"]])
        for r in corpus.withColumn("_h", F.xxhash64(F.col("neighbor_id"), F.lit(seed)))
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    ]

    def cell_scores(vec: Column) -> Column:
        """array of cosine-to-pivot, index = cell id."""
        scores = []
        for _, pv in pivots:
            lit = F.array(*[F.lit(x) for x in pv])
            scores.append(cosine_sim(vec, lit))
        return F.array(*scores)

    def best_cells(vec: Column, n: int) -> Column:
        scores = cell_scores(vec)
        idx = F.sequence(F.lit(0), F.lit(len(pivots) - 1))
        pairs = F.zip_with(scores, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        top = F.slice(F.reverse(F.array_sort(pairs)), 1, n)
        return F.transform(top, lambda st: st["i"])

    c_assigned = corpus.withColumn(
        "cell", F.element_at(best_cells(F.col("_cv").cast("array<double>"), 1), 1)
    )
    queries = query_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    q_assigned = queries.withColumn(
        "cell", F.explode(best_cells(F.col("_qv").cast("array<double>"), n_probe))
    )
    scored = (
        c_assigned.join(q_assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            # rank on the ROUNDED score: deterministic and engine-agnostic
            # (raw-double ordering can disagree with an external oracle
            # in the last ulp)
            F.round(
                cosine_sim(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
