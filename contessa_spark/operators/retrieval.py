"""Lexical retrieval: BM25 top-k document search for a query set.

The keyword-side counterpart of the embedding ANN family
(``operators/similarity.py``): training-data pipelines use BM25
retrieval for eval-set decontamination probes, targeted corpus
audits ("which documents match this benchmark prompt?"), and
hard-negative mining. Okapi BM25 with the Lucene non-negative idf:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Spark-first shape: the query term set is tiny → broadcast semi-join
prunes the exploded token stream to query terms only, so the corpus
shuffles per-(doc, term) counts for *matching* terms, never the full
token stream. N / avgdl are two scalar aggregates. Final top-k is a
per-query window over only the scored candidates (documents sharing
≥1 term with the query) — candidates, not the corpus.

DETERMINISM: scores are rounded to 6 dp on both engines before the
(score DESC, doc_id ASC) ranking; double-rounding ties at the 6th dp
of a log/ratio product are measure-zero (the repo-wide convention —
see quality_terciles). Tokenization is lowercase whitespace-split,
matching the token-count family.

Reference parity: no counterpart in contessa (SURVEY.md §2 extension
— retrieval/search family).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_topk(
    docs: DataFrame,
    queries: Dict[str, str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k per query → (query_id, doc_id, score, rank).

    ``queries`` maps query_id → query text (tokenized the same way as
    documents; duplicate terms in a query count once, the standard
    bag-of-*distinct*-terms form). Only documents sharing at least one
    term with a query appear; ties break by ascending ``id_col``.
    """
    if not queries:
        raise ValueError("bm25_topk: empty query set")
    if k <= 0:
        raise ValueError("bm25_topk: k must be positive")
    spark = docs.sparkSession
    qterms = [
        (str(qid), t)
        for qid, q in sorted(queries.items())
        for t in dict.fromkeys(str(q).lower().split())
    ]
    if not qterms:
        raise ValueError("bm25_topk: queries contain no terms")
    qdf = spark.createDataFrame(qterms, "query_id string, term string")

    # (?U)\s+ is the repo-wide tokenization contract (see textstats)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"(?U)\s+")
        ).alias("term"),
    ).where(F.col("term") != "")

    # per-document length over ALL terms (not just matches)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # two scalars; exact integer sums → identical double ratio anywhere
    tot = doclen.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    ).collect()[0]
    if int(tot["n_docs"]) == 0:
        # empty corpus: return an empty result like sibling operators
        # instead of dividing by the zero doc count below
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", T.StringType()),
                    T.StructField("doc_id", docs.schema[id_col].dataType),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    n_docs, avgdl = int(tot["n_docs"]), float(tot["sum_dl"]) / int(tot["n_docs"])

    # prune to query terms BEFORE the per-(doc, term) shuffle
    terms = qdf.select("term").distinct()
    tf = (
        toks.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - float(b))
        + F.lit(float(b)) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / norm

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc_id")
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_oracle_sql(
    queries: Dict[str, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`bm25_topk` over the same table."""
    from contessa_spark.functions.textstats import DUCKDB_WS

    qrows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, q in sorted(queries.items())
        for t in dict.fromkeys(str(q).lower().split())
    )
    return (
        f"WITH q(query_id, term) AS (VALUES {qrows}), "
        f"w AS (SELECT {id_col} AS doc_id, list_filter("
        f" string_split_regex(lower({text_col}), '[{DUCKDB_WS}]+'), "
        f" x -> x <> '') AS ws FROM {table}), "
        "toks AS (SELECT doc_id, unnest(ws) AS term FROM w), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id), "
        "tot AS (SELECT sum(dl)::DOUBLE / count(*)::BIGINT AS avgdl, "
        " count(*)::BIGINT AS n FROM dl), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks "
        " WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term), "
        "dfreq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df "
        " FROM tf GROUP BY term), "
        "sc AS (SELECT q.query_id, tf.doc_id, round(sum("
        " ln(1.0 + (tot.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) "
        f" * tf.tf * {float(k1) + 1.0!r} "
        f" / (tf.tf + {float(k1)!r} * ({1.0 - float(b)!r} "
        f"    + {float(b)!r} * dl.dl / tot.avgdl))), 6) AS score "
        " FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) "
        " JOIN q USING (term) CROSS JOIN tot "
        " GROUP BY q.query_id, tf.doc_id) "
        "SELECT query_id, doc_id, score, rank FROM ("
        " SELECT query_id, doc_id, score, row_number() OVER ("
        "  PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank "
        f" FROM sc) WHERE rank <= {int(k)}"
    )


def rrf_fuse(
    rankings: Dict[str, DataFrame],
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of several ranked lists →
    (query_id, doc_id, rrf_score, rank).

    ``rankings`` maps system name → a DataFrame with columns
    ``(query_id, doc_id, rank)`` — e.g. :func:`bm25_topk` for the
    lexical side and ``similarity.brute_force_topk`` (renamed) for the
    semantic side.  RRF (Cormack et al., SIGIR'09):

        rrf(q, d) = Σ_systems 1 / (k0 + rank_s(q, d))

    with absent (q, d) contributing 0.  Hybrid lexical+semantic fusion
    is the standard first-stage retriever for RAG corpora; rank-based
    fusion needs no score calibration between systems.

    Spark-first shape: each input is already a per-query top-k — at
    most ``queries × k_in`` rows per system no matter the corpus size
    — so the full-outer joins and the final per-query window run on
    capped candidate lists, never the corpus.  The expensive work
    (corpus scans, shuffles) lives in the upstream systems, which are
    independently scale-shaped.

    DETERMINISM: systems join in sorted-name order and the fused sum
    is a fixed left-to-right addition chain of ``coalesce(1.0 /
    (k0 + rank_s), 0.0)`` terms, so both engines add bit-identical
    doubles in the same association order; rounded to 6 dp, ties break
    by ascending doc_id.

    Reference parity: no counterpart in contessa (SURVEY.md §2
    extension — retrieval/search family).
    """
    if not rankings:
        raise ValueError("rrf_fuse: empty rankings")
    if k <= 0 or k0 <= 0:
        raise ValueError("rrf_fuse: k and k0 must be positive")
    names = sorted(rankings)
    wide = None
    for name in names:
        part = rankings[name].select(
            "query_id", "doc_id", F.col("rank").alias(f"__r_{name}")
        )
        wide = (
            part
            if wide is None
            else wide.join(part, ["query_id", "doc_id"], "full_outer")
        )
    score = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r_{name}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    fused = wide.select(
        "query_id", "doc_id", F.round(score, 6).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", "doc_id", "rrf_score", "rank")
    )


def rrf_oracle_sql(
    system_sqls: Dict[str, str],
    k: int = 10,
    k0: int = 60,
) -> str:
    """DuckDB mirror of :func:`rrf_fuse`; each value of
    ``system_sqls`` must be a query yielding (query_id, doc_id, rank).
    The FULL OUTER JOIN ... USING chain coalesces the keys exactly as
    Spark's multi-column equi-join does, and the fused sum adds the
    same coalesce terms in the same sorted-system order."""
    names = sorted(system_sqls)
    ctes = ", ".join(
        f"s_{name} AS ({system_sqls[name]})" for name in names
    )
    joined = f"s_{names[0]}"
    for name in names[1:]:
        joined += f" FULL OUTER JOIN s_{name} USING (query_id, doc_id)"
    terms = " + ".join(
        f"coalesce(1.0 / ({int(k0)} + s_{name}.rank), 0.0)" for name in names
    )
    return (
        f"WITH {ctes}, "
        f"f AS (SELECT query_id, doc_id, round({terms}, 6) AS rrf_score "
        f" FROM {joined}) "
        "SELECT query_id, doc_id, rrf_score, rank FROM ("
        " SELECT query_id, doc_id, rrf_score, row_number() OVER ("
        "  PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC)::INT AS rank "
        f" FROM f) WHERE rank <= {int(k)}"
    )
