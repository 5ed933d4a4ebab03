"""SemDedup-style semantic cluster deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

Lexical near-dup passes (MinHash / SimHash / n-gram Jaccard) miss
documents that say the same thing in different words. SemDedup finds
them in embedding space: cluster the corpus with a cheap coarse
quantizer, then drop, within each cluster, every document whose cosine
to an already-kept cluster-mate exceeds a threshold. Pairwise work is
confined to clusters — no corpus-level pair join anywhere.

Spark-first plan:
1. pivot selection — the ``n_cells`` rows with the lowest
   ``md5(salt | id)`` (layout-stable, TakeOrderedAndProject, same
   deterministic-selection trick as ``sampling.sample_hash_col`` whose
   Spark/DuckDB identity is oracle-proven). Pivots are collected once
   driver-side (tiny) and closed over the assignment UDF — an implicit
   broadcast, like the IVF quantizer in ``similarity.ivf_topk``.
2. assignment — one numpy GEMM per Arrow batch: cell = the pivot id
   with the highest ROUNDED (6 dp) cosine, ties to the lowest pivot id
   (np.argmax first-max over pid-ordered pivots ≡ SQL ``ORDER BY cos
   DESC, pid ASC LIMIT 1``). Rounding before argmax keeps the
   boundary decision engine-agnostic.
3. within-cell dedup — ``groupBy(cell).applyInPandas``: unit-normalize
   the cell's matrix, one GEMM for all pairwise cosines, keep-first by
   ascending id (a row drops iff some LOWER id in the cell is within
   ``threshold``). Shuffle carries (id, vector) once, keyed by cell.

Scale notes: the pairwise stage is O(|cell|²) BY DESIGN — the SemDedup
paper sizes clusters so this is tractable (they run 50k clusters over
LAION). ``max_cell_rows`` guards the executor: a cell above it raises
with the remedy (raise ``n_cells``) instead of OOMing. Zero-norm
vectors are excluded up front (their cosine is undefined; Spark's
NaN-compares-high semantics would otherwise rank them wrongly — same
guard as ``similarity``).

Reference parity: contessa has no embedding ops — this is a
forward-looking training-pipeline operator (SURVEY.md §2 extension).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_cells: int = 8,
    salt: str = "sem",
    dim: Optional[int] = None,
    max_cell_rows: int = 200_000,
) -> DataFrame:
    """Semantic cluster dedup → (id, cell, keep).

    ``keep`` is False iff another document in the same cell has a
    LOWER id and rounded-6dp cosine ≥ ``threshold`` (keep-first by id:
    deterministic, layout-independent). ``cell`` is the pivot doc's id.

    The decision rule is exactly SQL-expressible (see the
    ``dedup_semantic`` oracle in ``__spark_entry__``): pivot selection,
    assignment, and the drop predicate all recompute bit-identically in
    DuckDB from the same md5 ordering and 6-dp-rounded cosines.
    """
    import numpy as np
    import pandas as pd

    from contessa_spark.operators.similarity import dim_check

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    if dim is None:
        first = base.select(F.size("_v")).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], f"{id_col} long, cell long, keep boolean"
            )
        dim = first[0]
    base = base.where(dim_check(F.col("_v"), dim))
    # zero-norm vectors have no cosine: exclude them from clustering
    # entirely (mirrored in the oracle's WHERE list_dot_product > 0)
    sqnorm = F.aggregate(
        F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    base = base.where(sqnorm > 0)

    # --- 1. deterministic pivot selection (md5-ordered, collect once)
    hkey = F.md5(
        F.concat_ws("|", F.lit(salt), F.col("_id").cast("string")).cast("binary")
    )
    pivot_rows = (
        base.withColumn("_h", hkey)
        .orderBy("_h", "_id")  # total order: layout-stable collect
        .limit(n_cells)
        .select("_id", "_v")
        .collect()
    )
    if not pivot_rows:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cell long, keep boolean"
        )
    # pid-ascending order so argmax first-max == lowest pid on ties
    pivot_rows.sort(key=lambda r: r["_id"])
    pids = np.array([r["_id"] for r in pivot_rows], dtype=np.int64)
    P = np.array([r["_v"] for r in pivot_rows], dtype=np.float64)
    P = P / np.linalg.norm(P, axis=1, keepdims=True)

    # --- 2. assignment: one GEMM per Arrow batch, rounded argmax-cosine
    def assign_udf():
        from pyspark.sql import types as T

        def _cells(vecs: pd.Series) -> pd.Series:
            V = np.array(list(vecs), dtype=np.float64)
            if V.ndim != 2:
                return pd.Series([], dtype="int64")
            U = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = np.round(U @ P.T, 6)
            return pd.Series(pids[np.argmax(S, axis=1)])

        _cells.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
        return F.pandas_udf(_cells, T.LongType())

    assigned = base.withColumn("cell", assign_udf()(F.col("_v")))

    # --- 3. within-cell keep-first dedup (one GEMM per cell)
    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cell_rows:
            raise ValueError(
                f"semantic_dedup cell {pdf['cell'].iloc[0]} has {n} rows "
                f"(> max_cell_rows={max_cell_rows}); raise n_cells so the "
                "O(cell^2) pairwise stage stays tractable"
            )
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.array(list(pdf["_v"].iloc[order]), dtype=np.float64)
        U = V / np.linalg.norm(V, axis=1, keepdims=True)
        # row i drops iff any j<i has cosine >= threshold. BLOCKED: a
        # one-shot n×n similarity matrix would be 320 GB at the
        # max_cell_rows cap; each block row only needs columns j < i,
        # so peak memory is block×n (≈1.6 GB at the cap), and the
        # decision for i is independent of whether j itself dropped
        # (keep-first chains through dropped docs by design — see
        # docstring), so no cross-block ordering state is needed.
        dropped = np.zeros(n, dtype=bool)
        block = 1024
        for s0 in range(0, n, block):
            e0 = min(s0 + block, n)
            S = np.round(U[s0:e0] @ U[:e0].T, 6)  # (block, e0)
            ge = S >= threshold
            # row i drops iff any ge[i, j] for j < i: columns left of
            # the block are all admissible; within the block's square
            # only the strict lower triangle is (j < i) — both reduce
            # with vectorized any(), no per-row Python
            dropped[s0:e0] = ge[:, :s0].any(axis=1) | np.tril(
                ge[:, s0:e0], k=-1
            ).any(axis=1)
        return pd.DataFrame(
            {
                "_id": ids,
                "cell": pdf["cell"].iloc[0],
                "keep": ~dropped,
            }
        )

    out = assigned.groupBy("cell").applyInPandas(
        dedup_cell, schema="_id long, cell long, keep boolean"
    )
    return out.select(
        F.col("_id").alias(id_col), F.col("cell"), F.col("keep")
    )
