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


def dim_check(vec: Column, dim: int) -> Column:
    """Per-row declared-dim guard as a FILTER predicate: true when the
    vector's size equals ``dim``, raises otherwise. A wrong declared
    dim otherwise produces silently-wrong math (truncated dots, NULLed
    norms via out-of-range ``element_at``, the bucket-collapse
    degeneration the LSH docstrings document). Use via ``.where(
    dim_check(col, dim))`` — a predicate evaluates ONCE per row;
    wrapping the vector column itself in a CASE WHEN would re-embed the
    branch into every one of the ``dim`` expanded dot terms and blow
    the generated method past janino's 64 KB limit (measured at
    dim=64). ``size()`` is O(1) on arrays — no extra Spark job, unlike
    a ``first()`` check."""
    return F.when(F.size(vec) == dim, F.lit(True)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"declared dim={dim} but embedding has size "),
                F.size(vec).cast("string"),
            )
        )
    )


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
    dim: Optional[int] = None,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k via blocked GEMM: the query matrix (a top-k
    query set is small by definition) is collected once and closed over
    the scorer UDF — an implicit broadcast — and each corpus Arrow
    batch computes its full similarity block with ONE numpy float64
    matmul, emitting only its per-query local top-k. A final window
    ranks the ≤ batches×k rows per query globally (local top-k per
    block ⊇ global top-k, so this is exact).

    Output: (query_id, neighbor_id, cosine, rank); cosine rounded to
    6 dp BEFORE ranking (deterministic and engine-agnostic — raw-double
    ordering can disagree with an external oracle in the last ulp),
    ties break on neighbor_id.

    Why GEMM and not a codegen pair join: the expression form expands
    the dot to ``dim`` element_at terms, and at dim=64 the PLANNING +
    janino compile of that tree costs ~2 s per query execution —
    dominating any corpus below ~10⁶ rows (measured; the r1-r3 form).
    The GEMM plan is a dozen nodes, and 25M dots are a handful of BLAS
    calls instead of 25M interpreted-or-compiled expressions.

    ``max_queries`` guards the driver collect: beyond it, raise —
    a query set that large should use ``hyperplane_lsh_topk`` or a
    bucketed join, not all-pairs brute force."""
    import numpy as np
    import pandas as pd

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    qrows = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).take(max_queries + 1)
    if len(qrows) > max_queries:
        raise ValueError(
            f"brute_force_topk query side exceeds max_queries="
            f"{max_queries}; use hyperplane_lsh_topk / ivf_topk for "
            "large query sets"
        )
    if not qrows:
        return df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    if dim is not None and Q.shape[1] != dim:
        raise ValueError(
            f"declared dim={dim} but query embeddings have size {Q.shape[1]}"
        )
    dim = Q.shape[1]
    Qn = np.linalg.norm(Q, axis=1)
    corpus = corpus.where(dim_check(F.col("_cv"), dim))

    def score_blocks(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            C = np.array(list(pdf["_cv"]), dtype=np.float64)
            Cn = np.linalg.norm(C, axis=1)
            S = (C @ Q.T) / (Cn[:, None] * Qn[None, :])  # (nc, nq)
            S = np.round(S, 6)
            out_q, out_n, out_c = [], [], []
            kk = min(k, len(ids))
            for j in range(len(qids)):
                col = S[:, j]
                mask = ids != qids[j]  # exclude self
                cand_ids = ids[mask]
                cand = col[mask]
                if not cand.size:
                    continue
                # local top-k on (cosine desc, id asc): lexsort keys
                order = np.lexsort((cand_ids, -cand))[:kk]
                out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                out_n.append(cand_ids[order])
                out_c.append(cand[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    local = corpus.mapInPandas(
        score_blocks, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: per-table sign-bucket join, union of candidates,
    exact re-rank. Recall < 1 by design; the bucket join shuffles
    (table, bucket) keys instead of forming Q×N pairs.

    ``dim`` MUST equal the true vector dimension (inferred via one
    ``first()`` job when omitted): hyperplanes shorter than the vector
    would make ``zip_with`` pad with NULLs, nulling every plane dot
    and collapsing ALL rows into bucket 0 — a silent degeneration to a
    full scan (found by the oracle gate; hence inference-by-default).
    A wrong DECLARED dim now raises per-row (``dim_check``).

    Candidate dedup happens on (query_id, neighbor_id) ID PAIRS ONLY —
    a table/bucket can pair the same ids up to n_tables times, and
    carrying the two vectors through that distinct would put
    ~2·dim·8 bytes/row (~1 KB at dim=64) on the dedup shuffle for no
    reason. Vectors re-attach afterwards: the corpus side by join, the
    query side broadcast (a top-k query set is small by construction) —
    ~16× fewer dedup-shuffle bytes at dim=64."""
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    queries = query_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    if dim is None:
        first = corpus.select(F.size("_cv")).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine double, rank int"
            )
        dim = first[0]
    corpus = corpus.withColumn("_cv", F.col("_cv").cast("array<double>")).where(
        dim_check(F.col("_cv"), dim)
    )
    queries = queries.withColumn("_qv", F.col("_qv").cast("array<double>")).where(
        dim_check(F.col("_qv"), dim)
    )

    c_ent = []
    q_ent = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed + 7919 * t)
        c_ent.append(
            corpus.select(
                "neighbor_id",
                F.lit(t).alias("tbl"),
                signature_col(F.col("_cv"), planes).alias("bucket"),
            )
        )
        q_ent.append(
            queries.select(
                "query_id",
                F.lit(t).alias("tbl"),
                signature_col(F.col("_qv"), planes).alias("bucket"),
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
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "cosine",
            F.round(cosine_sim(F.col("_qv"), F.col("_cv")), 6),
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


def _pivot_init_df(train: DataFrame, n_cells: int, seed: int) -> DataFrame:
    """Deterministic pivot-init rows: the ``n_cells`` lowest
    ``xxhash64(id, seed)`` rows — a pseudo-random but layout-stable
    selection whose physical plan is TakeOrderedAndProject."""
    return (
        train.withColumn("_h", F.xxhash64(F.col("neighbor_id"), F.lit(seed)))
        .orderBy("_h")
        .limit(n_cells)
    )


def _train_ivf_pivots(
    corpus: DataFrame,
    vec_df_col: str,
    dim: int,
    n_cells: int,
    seed: int,
    train_iters: int,
    train_fraction: Optional[float],
) -> List[List[float]]:
    """Spherical-k-means coarse quantizer: hash-selected init rows +
    ``train_iters`` Lloyd iterations (assign to argmax dot, update =
    renormalized per-cell mean). Each iteration is one scan + one tiny
    aggregate; at 10^12 rows train on a sample (``train_fraction``) —
    quantizer quality needs thousands of vectors, not all of them.

    The sample is a deterministic hash-threshold predicate (NOT
    ``df.sample``, whose per-partition RNG changes with the physical
    partitioning), so pivots are stable across layouts; init is
    ``orderBy(hash).limit(n)``, which Spark executes as
    TakeOrderedAndProject — a per-partition n-row heap + driver merge,
    never a global sort (plan-asserted in tests/test_plans.py)."""
    import math as _math

    train = corpus
    if train_fraction is not None:
        thr = max(1, int(train_fraction * 1_000_000))
        train = corpus.where(
            F.pmod(
                F.xxhash64(F.col("neighbor_id"), F.lit(seed * 2 + 1)),
                F.lit(1_000_000),
            )
            < thr
        )
    init = _pivot_init_df(train, n_cells, seed).collect()

    def _unit(v):
        n = _math.sqrt(sum(x * x for x in v)) or 1.0
        return [float(x) / n for x in v]

    pivots = [_unit(r[vec_df_col]) for r in init]
    from contessa_spark.operators.dedup import dot_fixed

    for _ in range(train_iters):
        scores = F.array(
            *[
                dot_fixed(
                    F.col(vec_df_col).cast("array<double>"),
                    F.array(*[F.lit(x) for x in p]),
                    dim,
                )
                for p in pivots
            ]
        )
        assigned = train.withColumn(
            "_cell", F.array_position(scores, F.array_max(scores)) - 1
        )
        sums = (
            assigned.groupBy("_cell")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(
                        F.element_at(F.col(vec_df_col), i + 1).cast("double")
                    ).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new_pivots = list(pivots)
        for r in sums:
            new_pivots[int(r["_cell"])] = _unit([r[f"_s{i}"] for i in range(dim)])
        pivots = new_pivots  # cells that captured no rows keep their pivot
    return pivots


def hyperplane_lsh_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    max_df: Optional[int] = None,
    observation=None,
    dim: Optional[int] = None,
) -> DataFrame:
    """Embedding near-dup pairs via LSH pre-bucketing — the 10⁹-vector
    path that ``embedding_near_dups`` (exact all-pairs) cannot walk.

    Plan: per table, a sign-signature bucket id (deterministic
    hyperplanes, pure JVM); candidate pairs emitted per (table, bucket)
    group — same single-pass group emission as MinHash banding,
    including the ``max_df`` hot-bucket cap (``dedup._cap_groups``) —
    then every candidate is verified with an exact codegen dot product.
    No cross join and no all-blocks-pair join anywhere; shuffles carry
    (table, bucket, id) entries and candidate id pairs only.

    Recall for a pair at cosine s: 1 − (1 − p^n_bits)^n_tables with
    p = 1 − arccos(s)/π (Charikar 2002). At threshold 0.95 the default
    (8 bits × 6 tables) gives ≈ 0.96; for low thresholds use fewer
    bits / more tables.
    """
    import pandas as pd

    from contessa_spark.operators.dedup import _cap_groups, dot_fixed, norm_fixed

    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    if dim is None:
        first = base.select(F.size("_v")).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = first[0]
    base = base.where(dim_check(F.col("_v"), dim))

    ent = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed + 7919 * t)
        ent.append(
            base.select(
                "_id",
                F.lit(t).alias("tbl"),
                signature_col(F.col("_v"), planes).alias("bucket"),
            )
        )
    entries = ent[0]
    for e in ent[1:]:
        entries = entries.unionByName(e)

    groups = (
        entries.groupBy("tbl", "bucket")
        .agg(F.collect_list("_id").alias("_ids"))
        .where(F.size("_ids") > 1)
        .select("_ids")
    )
    groups = _cap_groups(groups, "_ids", max_df, observation)

    def emit_pairs(batches):
        import numpy as np

        triu = {}
        for pdf in batches:
            ca, cb = [], []
            for ids in pdf["_ids"]:
                ds = np.unique(np.asarray(ids, dtype=np.int64))  # sort+dedup
                g = len(ds)
                if g < 2:
                    continue
                t = triu.get(g)
                if t is None:
                    t = np.triu_indices(g, 1)
                    triu[g] = t
                xi, yi = t
                ca.append(ds[xi])
                cb.append(ds[yi])
            if ca:
                yield pd.DataFrame(
                    {"id_a": np.concatenate(ca), "id_b": np.concatenate(cb)}
                )
            else:
                yield pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")

    cand = groups.mapInPandas(emit_pairs, schema="id_a long, id_b long").distinct()

    normed = base.withColumn("_n", norm_fixed(F.col("_v"), dim))
    a = normed.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na")
    )
    b = normed.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine",
            dot_fixed(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
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
    train_iters: int = 3,
    train_fraction: Optional[float] = None,
    dim: Optional[int] = None,
) -> DataFrame:
    """IVF-flat ANN: spherical-k-means pivots (deterministic hash init
    + Lloyd refinement — see ``_train_ivf_pivots``), every vector
    assigned to its best cell, queries probe the ``n_probe`` best
    cells, exact re-rank inside.

    The pivot set is tiny → broadcast as literals; assignment and
    re-rank are expanded ``element_at`` dot products that stay inside
    whole-stage codegen (higher-order array lambdas would not — the
    same measurement that motivated ``dot_fixed``). Pivots are unit
    vectors, so argmax-dot ≡ argmax-cosine without per-row norms.
    """
    from contessa_spark.operators.dedup import dot_fixed, norm_fixed

    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    if dim is None:
        first = corpus.select(F.size("_cv")).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine double, rank int"
            )
        dim = first[0]
    corpus = corpus.where(dim_check(F.col("_cv"), dim))
    pivots = _train_ivf_pivots(
        corpus, "_cv", dim, n_cells, seed, train_iters, train_fraction
    )

    def cell_scores(vec: Column) -> Column:
        """array of dot-to-unit-pivot, index = cell id (codegen-side)."""
        return F.array(
            *[
                dot_fixed(vec, F.array(*[F.lit(x) for x in p]), dim)
                for p in pivots
            ]
        )

    def best_cells(vec: Column, n: int) -> Column:
        scores = cell_scores(vec)
        idx = F.sequence(F.lit(0), F.lit(len(pivots) - 1))
        pairs = F.zip_with(scores, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        top = F.slice(F.reverse(F.array_sort(pairs)), 1, n)
        return F.transform(top, lambda st: st["i"])

    c_assigned = corpus.withColumn(
        "cell", F.element_at(best_cells(F.col("_cv").cast("array<double>"), 1), 1)
    ).withColumn("_cn", norm_fixed(F.col("_cv").cast("array<double>"), dim))
    queries = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).where(dim_check(F.col("_qv"), dim))
    q_assigned = queries.withColumn(
        "cell", F.explode(best_cells(F.col("_qv").cast("array<double>"), n_probe))
    ).withColumn("_qn", norm_fixed(F.col("_qv").cast("array<double>"), dim))
    scored = (
        c_assigned.join(q_assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            # rank on the ROUNDED score: deterministic and engine-agnostic
            # (raw-double ordering can disagree with an external oracle
            # in the last ulp)
            F.round(
                dot_fixed(
                    F.col("_qv").cast("array<double>"),
                    F.col("_cv").cast("array<double>"),
                    dim,
                )
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
