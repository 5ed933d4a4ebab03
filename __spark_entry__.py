"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: the contessa-DSL quality-check run over
                     the sf0.001 documents table (annotation UDFs +
                     single-scan multi-rule counters).
``queries()``      — one entry per implemented operator (SURVEY.md §2 +
                     training-data ops); each takes (spark, sf_dir).
``oracle_sql()``   — DuckDB-equivalent SQL per query where the
                     semantics are SQL-expressible; model-based /
                     approximate ops (langid, scrub, minhash, simhash,
                     LSH/IVF ANN) are rows-only by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TASK_TS = datetime(2024, 2, 1, 12, 0, 0)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_REPO = os.path.dirname(os.path.abspath(__file__))
_shipped_sessions = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``contessa_spark`` importable on Spark PYTHON WORKERS even
    when the driver process runs from another cwd: workers do not
    inherit this module's sys.path patch, so ship the package zip via
    addPyFile (idempotent per session)."""
    key = id(spark.sparkContext)
    if key in _shipped_sessions:
        return
    import zipfile

    zip_path = os.path.join(_REPO, "dist", "contessa_spark.zip")
    pkg = os.path.join(_REPO, "contessa_spark")
    sources = [
        os.path.join(root, f)
        for root, _, files in os.walk(pkg)
        for f in files
        if f.endswith(".py")
    ]
    # rebuild when stale, not just when missing: the checkout (and its
    # dist/) outlives code edits, and a stale zip silently ships OLD
    # code to the python workers
    fresh = os.path.exists(zip_path) and os.path.getmtime(zip_path) >= max(
        os.path.getmtime(s) for s in sources
    )
    if not fresh:
        os.makedirs(os.path.dirname(zip_path), exist_ok=True)
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zip_path)
    _shipped_sessions.add(key)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ship_package(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition a UDF-heavy input up to the session's
    parallelism when the scan yields fewer splits. A pandas-UDF stage
    inherits the scan partitioning, and the small-SF documents table is
    ONE ~20 MB parquet split — without this the entire Python stage of
    a dedup query serializes onto one core (measured: the whole 2 s
    shingle pass of dedup_ngram_jaccard at sf0.1 ran as a single task).
    At production scale input splits ≫ cores and this no-ops; the
    repartition itself moves one small file's bytes once."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: annotate documents (langid UDF + JVM
    heuristics) and evaluate the full DSL rule set in one scan."""
    from contessa_spark.compiler import counters_df
    from contessa_spark.functions import langid
    from contessa_spark.functions.textstats import spark_stat_columns
    from contessa_spark.runner import QualityRunner

    docs = _load(spark, "/root/testdata/sf0.001", "documents")
    annotated = docs.withColumn("_lid", langid.spark_udf()(F.col("text")))
    annotated = annotated.withColumn("lang_pred", F.col("_lid.lang_pred")).withColumn(
        "lang_conf", F.col("_lid.lang_conf")
    )
    for name, col in spark_stat_columns("text").items():
        annotated = annotated.withColumn(name, col)
    rules = QualityRunner.build_rules(
        [
            {"name": "text_not_null", "type": "not_null", "column": "text"},
            {"name": "min_len", "type": "gte", "column": "n_chars", "value": 100},
            {"name": "symbol_lt", "type": "lt", "column": "symbol_ratio", "value": 0.15},
            {"name": "repetition_lt", "type": "lt", "column": "repetition", "value": 0.9},
            {
                "name": "lang_agrees",
                "type": "expr",
                "column": "lang_pred",
                "expression": "lang_pred = lang",
                "description": "langid agrees with tag",
            },
        ]
    )
    return counters_df(annotated, rules, TASK_TS)


# ------------------------------------------------------------- queries

def _rule_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.compiler import counters_df
    from contessa_spark.runner import QualityRunner

    li = _load(spark, sf_dir, "lineitem")
    rules = QualityRunner.build_rules(
        [
            {"name": "nn", "type": "not_null", "column": "l_orderkey"},
            {"name": "qty_gt", "type": "gt", "column": "l_quantity", "value": 25},
            {"name": "qty_gte", "type": "gte", "column": "l_quantity", "value": 25},
            {"name": "disc_lt_tax", "type": "lt", "column": "l_discount", "value": "l_tax"},
            {"name": "price_lte", "type": "lte", "column": "l_extendedprice", "value": 30000},
            {"name": "flag_eq", "type": "eq", "column": "l_returnflag", "value": "'N'"},
            {"name": "status_not", "type": "not", "column": "l_linestatus", "value": "'O'"},
        ]
    )
    return counters_df(li, rules, TASK_TS)


def _rule_time_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.compiler import counters_df
    from contessa_spark.runner import QualityRunner
    from contessa_spark.time_filter import TimeFilter, TimeFilterColumn

    ev = _load(spark, sf_dir, "events")
    tf = TimeFilter(
        columns=[
            TimeFilterColumn(
                "ts", since=datetime(2024, 1, 5), until=datetime(2024, 1, 15)
            )
        ]
    )
    rules = QualityRunner.build_rules(
        [
            {
                "name": "value_gt0",
                "type": "gt",
                "column": "value",
                "value": 0,
                "time_filter": tf,
                "condition": "event_type IN ('click', 'view')",
            }
        ]
    )
    return counters_df(ev, rules, TASK_TS)


def _consistency_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.consistency import ConsistencyChecker

    return ConsistencyChecker.count_compare_df(
        _load(spark, sf_dir, "orders"), _load(spark, sf_dir, "lineitem")
    )


def _consistency_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.consistency import ConsistencyChecker

    left = _load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    right = _load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return ConsistencyChecker.diff_compare_df(left, right)


def _doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import token_counts

    return token_counts(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import quality_scores

    return quality_scores(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_quality_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet head/middle/tail on the composite quality score, per lang
    from contessa_spark.operators.text_analysis import (
        quality_scores,
        quality_terciles,
    )

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    scored = quality_scores(docs, keep_cols=("lang",)).select(
        "doc_id", "lang", "quality_score"
    )
    return quality_terciles(scored)


def _doc_keep_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.functions.textstats import spark_stat_columns

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    stats = spark_stat_columns("text")
    keep = (
        (stats["n_chars"] >= 100)
        & (stats["n_chars"] <= 20000)
        & (stats["symbol_ratio"] < 0.15)
        & (stats["repetition"] < 0.9)
        & (stats["stopword_frac"] > 0.01)
        & (stats["mean_word_len"] >= 2.5)
        & (stats["mean_word_len"] <= 10.0)
    )
    return docs.select("doc_id", keep.alias("keep"))


def _doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import fingerprints

    return fingerprints(_spread(_load(spark, sf_dir, "documents"), spark)).select(
        "doc_id", "fingerprint"
    )


def _doc_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import dup_ngram_char_frac

    return dup_ngram_char_frac(_spread(_load(spark, sf_dir, "documents"), spark), n=2)


def _doc_dup_ngrams5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher §A1.1 uses the dup-n-gram signal at n=5..10; n=5 exercises
    # the generalized core against the parameterized oracle
    from contessa_spark.operators.text_analysis import dup_ngram_char_frac

    return dup_ngram_char_frac(_spread(_load(spark, sf_dir, "documents"), spark), n=5)


def _doc_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import dup_line_fracs

    return dup_line_fracs(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import top_ngram_char_frac

    return top_ngram_char_frac(_spread(_load(spark, sf_dir, "documents"), spark), ns=(2, 3, 4))


def _doc_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine-portable modulo bucketing so DuckDB reproduces the exact
    # pack layout (production default is xxhash64 for uniformity)
    from contessa_spark.operators.text_analysis import pack_documents

    return pack_documents(
        _spread(_load(spark, sf_dir, "documents"), spark),
        budget_tokens=2048,
        n_buckets=8,
        bucket_col=F.pmod(F.col("doc_id"), F.lit(8)),
    )


def _doc_pack_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # budget-respecting best-fit-decreasing variant (same portable
    # modulo bucketing); oracle = recursive-CTE replay of the exact
    # deterministic placement sequence
    from contessa_spark.operators.text_analysis import pack_documents_bfd

    return pack_documents_bfd(
        _spread(_load(spark, sf_dir, "documents"), spark),
        budget_tokens=2048,
        n_buckets=8,
        bucket_col=F.pmod(F.col("doc_id"), F.lit(8)),
    )


def _doc_alpha_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import alpha_word_stats

    return alpha_word_stats(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import line_stats

    return line_stats(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic hash sampling with per-language fractions; the
    # oracle reuses the identical md5-hex-prefix predicate
    from contessa_spark.operators.sampling import hash_sample

    docs = _load(spark, sf_dir, "documents")
    return hash_sample(
        docs,
        fraction=0.25,
        key_cols=["doc_id"],
        salt="r2",
        strata_col="lang",
        strata_fractions={"en": 0.1, "de": 0.5},
    ).select("doc_id", "lang")


def _doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-shape dashboard: exact length percentiles per language.
    # ONE shuffle on lang with partial aggregation; Spark's exact
    # percentile and DuckDB's quantile_cont share the linear-
    # interpolation definition, so the oracle is value-exact
    docs = _load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.round(
                F.expr(f"percentile(length(text), {p})"), 6
            ).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.9)
        ],
    )


def _token_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import token_topk_per_lang

    return token_topk_per_lang(_load(spark, sf_dir, "documents"), k=10)


def _doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import detect_language

    return detect_language(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.functions import scrub

    docs = _load(spark, sf_dir, "documents")
    s = scrub.spark_udf()
    # evaluate the UDF ONCE: select the struct, then project its fields
    # (two getField calls on s(col) would each embed a full UDF
    # invocation — two ArrowEvalPython nodes; see tests/test_plans.py)
    return docs.select("doc_id", s(F.col("text")).alias("_s")).select(
        "doc_id",
        F.col("_s.scrubbed_text").alias("scrubbed_text"),
        F.col("_s.pii_changed").alias("pii_changed"),
    )


def _url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic gnarly URLs synthesized from doc_id (the testdata
    # documents table carries no url column); the oracle builds the
    # SAME strings and canonicalizes with the same regexes
    from contessa_spark.functions.urlnorm import canonical_url_col

    docs = _load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP://WWW.Example")).otherwise(
            F.lit("HTTPS://Api.Site")
        ),
        (d % 40).cast("string"),
        F.when(d % 2 == 0, F.lit(".COM:80")).otherwise(F.lit(".ORG:443")),
        F.when(d % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/Path/"), d.cast("string"), F.lit("?q=1"))
        ),
        F.lit("#Frag"),
    )
    return docs.select(
        "doc_id", url.alias("url"), canonical_url_col(url).alias("canonical_url")
    )


def _synth_url_col() -> "Column":
    """Deterministic per-doc URLs with subdomains, mixed case, ports,
    and multi-part public suffixes — the domain-operator test surface
    (the testdata documents table has no url column; the oracle builds
    the SAME strings, see ``_SYNTH_URL_SQL``)."""
    d = F.col("doc_id")
    d5 = (d % 5).cast("string")
    did = d.cast("string")

    def mk(prefix, suffix):
        return F.concat(F.lit(prefix), d5, F.lit(suffix), did)

    return (
        F.when(d % 7 == 0, mk("https://news.example", ".com/p/"))
        .when(d % 7 == 1, mk("http://WWW.Example", ".COM:80/p/"))
        .when(d % 7 == 2, mk("https://shop.portal", ".co.uk/p/"))
        .when(d % 7 == 3, mk("https://blog.site", ".org/p/"))
        .when(d % 7 == 4, mk("https://api.site", ".org:443/p/"))
        .when(d % 7 == 5, mk("https://files.archive", ".com.au/p/"))
        .otherwise(mk("https://cdn.media", ".net/p/"))
    )


_SYNTH_URL_SQL = (
    "CASE (doc_id % 7) "
    "WHEN 0 THEN 'https://news.example' || (doc_id % 5) || '.com/p/' || doc_id "
    "WHEN 1 THEN 'http://WWW.Example' || (doc_id % 5) || '.COM:80/p/' || doc_id "
    "WHEN 2 THEN 'https://shop.portal' || (doc_id % 5) || '.co.uk/p/' || doc_id "
    "WHEN 3 THEN 'https://blog.site' || (doc_id % 5) || '.org/p/' || doc_id "
    "WHEN 4 THEN 'https://api.site' || (doc_id % 5) || '.org:443/p/' || doc_id "
    "WHEN 5 THEN 'https://files.archive' || (doc_id % 5) || '.com.au/p/' || doc_id "
    "ELSE 'https://cdn.media' || (doc_id % 5) || '.net/p/' || doc_id END"
)

_BLOCKLIST = ["example1.com", "media2.net", "site0.org", "site3.org"]


def _domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-registrable-domain rollup: subdomains / case / ports of the
    # same registrable domain must aggregate together
    from contessa_spark.operators.domains import domain_stats

    docs = _load(spark, sf_dir, "documents").withColumn("url", _synth_url_col())
    return domain_stats(docs)


def _url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.domains import domain_blocklist_filter

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", _synth_url_col().alias("url")
    )
    return domain_blocklist_filter(docs, _BLOCKLIST)


def _doc_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embedding-level leakage flagging: every 50th vector plays the
    # benchmark; threshold 0.4 is sized to the near-uniform testdata
    # embeddings so both verdicts occur
    from contessa_spark.operators.decontaminate import semantic_contamination

    emb = _load(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 50 == 0)
    corpus = emb.where(F.col("vec_id") % 50 != 0)
    return semantic_contamination(corpus, bench, threshold=0.4)


from contessa_spark.operators.linkgraph import SCALE as SCALE_PR


def _domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # link-authority prior over a deterministic synthetic link graph
    # (documents carry no outlinks at test scale): node = doc_id % 100,
    # edge u → (7u+3) % 100 — a dense functional graph with cycles and
    # dangling asymmetry. Integer fixed-point ranks hash-match the
    # unrolled-CTE oracle exactly (see operators/linkgraph.py).
    from contessa_spark.operators.linkgraph import pagerank

    docs = _load(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 100).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 100).alias("dst"),
    )
    return pagerank(edges, iters=3)


def _pagerank_oracle_sql(iters: int = 3) -> str:
    base = 15 * SCALE_PR // 100
    parts = [
        "WITH e AS (SELECT DISTINCT (doc_id % 100) AS src, "
        "((doc_id * 7 + 3) % 100) AS dst FROM documents), "
        "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e), "
        "od AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src), "
        f"r0 AS (SELECT node, {SCALE_PR}::BIGINT AS r FROM n)"
    ]
    for i in range(iters):
        parts.append(
            f", r{i + 1} AS (SELECT n.node, "
            f"({base} + coalesce(s.c, 0))::BIGINT AS r FROM n LEFT JOIN ("
            f"SELECT e.dst AS node, sum((r{i}.r * 85) // (100 * od.outdeg))::BIGINT AS c "
            f"FROM e JOIN od USING (src) JOIN r{i} ON r{i}.node = e.src "
            f"GROUP BY e.dst) s ON n.node = s.node)"
        )
    parts.append(f" SELECT node, r AS rank_scaled FROM r{iters}")
    return "".join(parts)


# fixed audit queries over the corpus vocabulary (retrieval.py);
# term sets differ in df so idf weighting is actually exercised
_BM25_QUERIES = {
    "q_join": "hash join order",
    "q_scan": "table scan filter",
    "q_stream": "window batch merge",
}


def _doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Okapi BM25 lexical top-k (operators/retrieval.py): the keyword
    # counterpart of ann_topk_* — broadcast query-term semi-join prunes
    # the token stream before any shuffle; scores rounded to 6 dp on
    # both engines, ties by doc_id (rounding-tie risk measure-zero,
    # repo convention)
    from contessa_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        _spread(_load(spark, sf_dir, "documents"), spark), _BM25_QUERIES, k=10
    )


#: query_id ↔ query embedding row (vec_id) for the hybrid retriever
_HYBRID_QVECS = {"q_join": 0, "q_scan": 1, "q_stream": 2}


def _doc_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hybrid lexical+semantic retrieval via reciprocal-rank fusion
    # (operators/retrieval.py:rrf_fuse): BM25 top-20 fused with exact
    # cosine top-20 (query vectors = embedding rows 0/1/2 standing in
    # for encoded queries), k0=60. Both inputs are per-query capped
    # lists, so fusion never touches the corpus; the sum is a fixed
    # left-to-right coalesce chain → cross-engine bit-identical.
    from contessa_spark.operators.retrieval import bm25_topk, rrf_fuse
    from contessa_spark.operators.similarity import brute_force_topk

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    emb = _load(spark, sf_dir, "embeddings")
    lexical = bm25_topk(docs, _BM25_QUERIES, k=20).select(
        "query_id", "doc_id", "rank"
    )
    qmap = F.create_map(
        *[
            x
            for name, vid in sorted(_HYBRID_QVECS.items())
            for x in (F.lit(vid), F.lit(name))
        ]
    )
    qvecs = emb.where(
        F.col("vec_id") < len(_HYBRID_QVECS)
    )
    semantic = brute_force_topk(emb, qvecs, k=20, dim=64).select(
        qmap[F.col("query_id")].alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse(
        {"lexical": lexical, "semantic": semantic}, k=10, k0=60
    )


def _domain_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HITS hubs/authorities (operators/linkgraph.py) over the same
    # synthetic-link-graph convention as domain_pagerank, with a second
    # edge family so in/out-degrees vary: u → (7u+3)%100 and
    # u → (3u+11)%100. Integer L1-normalized fixed-point scores
    # hash-match the unrolled-CTE oracle exactly.
    from contessa_spark.operators.linkgraph import hits

    docs = _load(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 100).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 100).alias("dst"),
    ).unionAll(
        docs.select(
            (F.col("doc_id") % 100).alias("src"),
            ((F.col("doc_id") * 3 + 11) % 100).alias("dst"),
        )
    )
    return hits(edges, iters=2)


def _hits_oracle_sql(iters: int = 2) -> str:
    # mirror of operators/linkgraph.py::hits — uniform scale//n init,
    # per-half-step L1 renormalization via integer floor division
    S = SCALE_PR
    parts = [
        "WITH e AS (SELECT DISTINCT src, dst FROM ("
        "SELECT (doc_id % 100) AS src, ((doc_id * 7 + 3) % 100) AS dst "
        "FROM documents UNION ALL "
        "SELECT (doc_id % 100), ((doc_id * 3 + 11) % 100) FROM documents)), "
        "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e), "
        f"h0 AS (SELECT node, ({S} // (SELECT count(*) FROM n))::BIGINT AS h "
        "FROM n)"
    ]
    for i in range(iters):
        parts.append(
            f", ar{i} AS (SELECT n.node, coalesce(s.c, 0)::BIGINT AS raw "
            f"FROM n LEFT JOIN (SELECT e.dst AS node, sum(h{i}.h)::BIGINT AS c "
            f"FROM e JOIN h{i} ON h{i}.node = e.src GROUP BY e.dst) s "
            f"ON n.node = s.node), "
            f"a{i + 1} AS (SELECT node, CASE WHEN t.t = 0 THEN 0 ELSE "
            f"(raw * {S}) // t.t END::BIGINT AS a FROM ar{i}, "
            f"(SELECT sum(raw)::BIGINT AS t FROM ar{i}) t), "
            f"hr{i} AS (SELECT n.node, coalesce(s.c, 0)::BIGINT AS raw "
            f"FROM n LEFT JOIN (SELECT e.src AS node, "
            f"sum(a{i + 1}.a)::BIGINT AS c "
            f"FROM e JOIN a{i + 1} ON a{i + 1}.node = e.dst GROUP BY e.src) s "
            f"ON n.node = s.node), "
            f"h{i + 1} AS (SELECT node, CASE WHEN t.t = 0 THEN 0 ELSE "
            f"(raw * {S}) // t.t END::BIGINT AS h FROM hr{i}, "
            f"(SELECT sum(raw)::BIGINT AS t FROM hr{i}) t)"
        )
    parts.append(
        f" SELECT a.node, a.a AS auth_scaled, h.h AS hub_scaled "
        f"FROM a{iters} a JOIN h{iters} h ON a.node = h.node"
    )
    return "".join(parts)


def _bm25_oracle() -> str:
    from contessa_spark.operators.retrieval import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_QUERIES, k=10)


def _hybrid_rrf_oracle() -> str:
    from contessa_spark.operators.retrieval import (
        bm25_oracle_sql,
        rrf_oracle_sql,
    )

    lex = (
        "SELECT query_id, doc_id, rank FROM ("
        + bm25_oracle_sql(_BM25_QUERIES, k=20)
        + ")"
    )
    case = " ".join(
        f"WHEN {vid} THEN '{name}'"
        for name, vid in sorted(_HYBRID_QVECS.items())
    )
    sem = (
        "WITH q AS (SELECT vec_id, embedding FROM embeddings "
        f" WHERE vec_id < {len(_HYBRID_QVECS)}), "
        "s AS (SELECT q.vec_id AS qv, c.vec_id AS doc_id, "
        " round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine "
        " FROM q, embeddings c WHERE c.vec_id <> q.vec_id) "
        f"SELECT CASE qv {case} END AS query_id, doc_id, rank FROM ("
        " SELECT *, row_number() OVER (PARTITION BY qv "
        "  ORDER BY cosine DESC, doc_id ASC)::INT AS rank FROM s) "
        "WHERE rank <= 20"
    )
    return rrf_oracle_sql({"lexical": lex, "semantic": sem}, k=10, k0=60)


def _rule_drift_oracle() -> str:
    from contessa_spark.operators.monitoring import rule_drift_oracle_sql

    return rule_drift_oracle_sql(
        {name: sql for name, _, sql in _DRIFT_RULES},
        table="events",
        ts_col="ts",
        bucket_interval="INTERVAL 1 HOUR",
        trailing=6,
        z_threshold=2.0,
    )


def _doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # real trained-BPE token budgets next to the ws baseline. Rows-only
    # by design: greedy lowest-rank merge application is sequential per
    # word (no SQL form); training golden + round-trip + partition-
    # invariance are pytest-gated (tests/test_bpe.py)
    from contessa_spark.functions.bpe import bpe_token_counts, train_bpe

    docs = _load(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=128, max_words=5000)
    return bpe_token_counts(_spread(docs, spark), merges)


def _doc_badwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4-style badlist: word-set flag (pure JVM) + AC phrase count.
    # The oracle counts phrase occurrences with the replace() trick,
    # which equals the AC overlapping count only for phrases that
    # cannot overlap themselves — 'row scan' cannot.
    from contessa_spark.functions.badwords import badword_stats

    return badword_stats(
        _spread(_load(spark, sf_dir, "documents"), spark),
        words=["slow"],
        phrases=["row scan"],
    )


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.text_analysis import chunk_documents

    return chunk_documents(
        _spread(_load(spark, sf_dir, "documents"), spark), chunk_tokens=64, overlap=8
    )


def _lm_trigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The distributed counting stage of the trained Kneser-Ney LM
    # (functions/kenlm.py) — top-200 corpus trigrams by (count desc,
    # gram asc). One scan, one map-side-combined shuffle,
    # TakeOrderedAndProject cap. Fully SQL-expressible → oracle-backed.
    from contessa_spark.functions.kenlm import top_ngram_counts

    return top_ngram_counts(_spread(_load(spark, sf_dir, "documents"), spark), 3, 200)


def _doc_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet's actual quality signal: perplexity under a Kneser-Ney
    # n-gram LM TRAINED ON THE CORPUS (functions/kenlm.py), unlike
    # doc_quality_scores' fixed seed-corpus bigram scorer. Rows-only
    # by design (recursive float smoothing has no SQL form); golden
    # probabilities / sum-to-one / determinism / separation are
    # pytest-gated (tests/test_kenlm.py), and the counting stage is
    # the oracle-backed lm_trigram_counts.
    from contessa_spark.functions.kenlm import kn_perplexity, train_kn

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    model = train_kn(docs, order=3, min_count=2, max_grams=200_000)
    return kn_perplexity(docs, model)


def _doc_unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SentencePiece-style unigram-LM token budgets next to the BPE ones
    # (functions/unigram.py). Rows-only by design: Viterbi segmentation
    # has no SQL form; optimality/round-trip/determinism are
    # pytest-gated (tests/test_unigram.py)
    from contessa_spark.functions.unigram import (
        train_unigram,
        unigram_token_counts,
    )

    docs = _load(spark, sf_dir, "documents")
    logp = train_unigram(docs, vocab_size=512, max_words=5000)
    return unigram_token_counts(_spread(docs, spark), logp)


def _doc_wordpiece_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BERT-style WordPiece token budgets — the third subword family
    # next to BPE and unigram (functions/wordpiece.py). Rows-only by
    # design: greedy longest-match segmentation under a driver-trained
    # vocab has no SQL form; objective/encoding/determinism are
    # pytest-gated (tests/test_wordpiece.py)
    from contessa_spark.functions.wordpiece import (
        train_wordpiece,
        wordpiece_token_counts,
    )

    docs = _load(spark, sf_dir, "documents")
    vocab = train_wordpiece(docs, vocab_size=512, max_words=5000)
    return wordpiece_token_counts(_spread(docs, spark), vocab)


def _doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FineWeb-edu/DCLM-style model-based quality scoring, self-
    # distilled from the heuristic keep rule (the standard bootstrap
    # when no human/LLM labels exist). Rows-only by design (trained
    # model); balanced-accuracy + determinism pytest-gated
    # (tests/test_quality_classifier.py)
    from contessa_spark.functions.quality_classifier import (
        classify_quality,
        train_quality_classifier,
    )
    from contessa_spark.functions.textstats import (
        py_n_chars,
        py_repetition,
        py_stopword_frac,
        py_symbol_ratio,
    )

    docs = _load(spark, sf_dir, "documents")

    # self-distilled keep label, computed driver-side on the ≤2k
    # COLLECTED training rows via the py_* cores (bit-equal to the
    # Column stats by the shared property tests) — the Column form made
    # Spark evaluate all five stat columns for the whole hash sample
    # just to label the 2k survivors. The label is NULL only for NULL
    # text, which the isNotNull pre-filter reproduces, so the
    # (hash, id)-ordered top-k pool — and hence the trained weights —
    # are identical.
    def keep_label(t):
        return float(
            py_n_chars(t) >= 100
            and py_symbol_ratio(t) < 0.15
            and py_repetition(t) < 0.85
            and py_stopword_frac(t) > 0.10
        )

    w = train_quality_classifier(
        docs.where(F.col("text").isNotNull()),
        None,
        sample_fraction=0.5,
        max_train_docs=2000,
        label_fn=keep_label,
    )
    return classify_quality(_spread(docs, spark), w)


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.dedup import exact_dedup

    return exact_dedup(_spread(_load(spark, sf_dir, "documents"), spark)).select("doc_id")


def _doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.dedup import dedup_doc_lines

    return dedup_doc_lines(_spread(_load(spark, sf_dir, "documents"), spark))


def _corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.dedup import corpus_line_dedup

    return corpus_line_dedup(_spread(_load(spark, sf_dir, "documents"), spark))


#: target mixture for the doc_mixture_sample query — shared with its
#: oracle, which recomputes the same per-lang keep fractions in SQL
MIX_WEIGHTS = {"en": 0.4, "zh": 0.2, "de": 0.2, "fr": 0.1, "es": 0.1}


def _doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as pq

    from contessa_spark.operators.text_analysis import tfidf_top_terms

    # n_docs from the parquet footer — no Spark job, no second corpus
    # scan (at production scale: the Iceberg snapshot's row-count stat)
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    return tfidf_top_terms(_spread(_load(spark, sf_dir, "documents"), spark), k=5, n_docs=n_docs)


def _doc_textnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unicode NFC pass (oracle: DuckDB nfc_normalize — utf8proc agrees
    # with CPython unicodedata on the normalization forms); the
    # ftfy-style mojibake repair half has no SQL form and is
    # pytest-gated (tests/test_textnorm.py)
    from contessa_spark.functions.textnorm import normalize_text

    return normalize_text(
        _spread(_load(spark, sf_dir, "documents"), spark), mojibake=False
    )


#: train/val/test weights for the split query; German gets a larger
#: holdout (the per-stratum override path)
_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_SPLITS_DE = [("train", 0.5), ("val", 0.25), ("test", 0.25)]


def _doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic train/val/test split (operators/sampling.py):
    # contiguous md5-prefix hash ranges — disjoint, exhaustive,
    # append-stable (new docs never move old ones between splits),
    # zero shuffle; per-stratum weight override for 'de'
    from contessa_spark.operators.sampling import split_assign

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    return split_assign(
        docs,
        _SPLITS,
        key_cols=["doc_id"],
        salt="r6split",
        strata_col="lang",
        strata_splits={"de": _SPLITS_DE},
    )


def _split_assign_oracle() -> str:
    from contessa_spark.operators.sampling import split_assign_sql_case

    base = split_assign_sql_case(_SPLITS, ["doc_id"], salt="r6split")
    de = split_assign_sql_case(_SPLITS_DE, ["doc_id"], salt="r6split")
    return (
        "SELECT doc_id, lang, "
        f"CASE WHEN lang = 'de' THEN {de} ELSE {base} END AS split "
        "FROM documents"
    )


def _doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-n-per-stratum deterministic sampling (the eval-set
    # primitive): 20 docs per language, chosen by md5 hash rank with
    # doc_id ties — same rows on every run/engine/partitioning; the
    # oracle shares the hash and the window verbatim
    from contessa_spark.operators.sampling import stratified_fixed_sample

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_fixed_sample(
        docs, 20, key_cols=["doc_id"], strata_cols=["lang"], salt="r6fx"
    )


def _stratified_sample_oracle() -> str:
    from contessa_spark.operators.sampling import stratified_fixed_sample_sql

    return stratified_fixed_sample_sql(
        20,
        key_cols=["doc_id"],
        strata_cols=["lang"],
        salt="r6fx",
        table="documents",
        select_cols="doc_id, lang",
    )


def _doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DoReMi/Pile-style mixture construction: resample so the lang
    # distribution matches MIX_WEIGHTS in expectation, keeping maximal
    # data (the binding stratum keeps everything). The oracle recomputes
    # the data-dependent fractions in SQL with the identical float64
    # op chain + floor-derived thresholds
    from contessa_spark.operators.sampling import mixture_sample

    docs = _load(spark, sf_dir, "documents")
    return mixture_sample(docs, MIX_WEIGHTS, strata_col="lang").select(
        "doc_id", "lang"
    )


def _doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recrawl pass: new batch filtered against a seen corpus (every
    # 3rd doc stands in for the previous crawl) by content
    # fingerprint. Exact anti-join path under oracle; the zero-shuffle
    # bloom path is FPR/no-false-negative pytest-gated
    # (tests/test_incremental.py)
    from contessa_spark.operators.incremental import incremental_dedup

    docs = _load(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") % 3 == 0)
    return incremental_dedup(docs, seen).select("doc_id")


def _corpus_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.dedup import corpus_sentence_dedup

    return corpus_sentence_dedup(_spread(_load(spark, sf_dir, "documents"), spark))


def _doc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lee et al. 2021 repeated-span removal; k=3 words so the synthetic
    # corpus actually shares spans — production uses the paper's 50-token
    # threshold (operator default)
    from contessa_spark.operators.dedup import substring_dedup

    return substring_dedup(_spread(_load(spark, sf_dir, "documents"), spark), k=3)


def _doc_substring_dedup_dropall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the keep_first=False variant: EVERY occurrence of a duplicated
    # span is stripped (no canonical copy survives)
    from contessa_spark.operators.dedup import substring_dedup

    return substring_dedup(
        _spread(_load(spark, sf_dir, "documents"), spark), k=3, keep_first=False
    )


def _dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as pq

    from contessa_spark.operators.dedup import ngram_jaccard_pairs

    # n_docs from the parquet footer (the tfidf trick) — skips the
    # block-count job; at production scale: the snapshot's row count
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    return ngram_jaccard_pairs(
        _spread(_load(spark, sf_dir, "documents"), spark),
        k=3,
        threshold=0.1,
        n_docs=n_docs,
    )


def _dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the df-capped path itself under oracle: posting lists longer than
    # max_df are dropped before pair emission, so common (and thus
    # jaccard) undercounts for pairs sharing a hot shingle — the oracle
    # reproduces exactly that with a HAVING count(*) <= max_df filter
    from contessa_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _spread(_load(spark, sf_dir, "documents"), spark), k=3, threshold=0.1, max_df=30
    )


def _doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # benchmark = every 50th doc (a deterministic stand-in eval suite,
    # guaranteed overlap with the corpus); n=3 so the synthetic corpus
    # actually shares grams — production uses n=13 (GPT-3 appendix C)
    from contessa_spark.operators.decontaminate import ngram_contamination

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return ngram_contamination(docs, bench, n=3)


def _dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup pairs → connected components → canonical keep ids (the
    # actual dedup output); min-label propagation, oracle'd by a
    # DuckDB recursive CTE over the identical pair set
    from contessa_spark.operators.dedup import dedup_components, ngram_jaccard_pairs

    import pyarrow.parquet as pq

    docs = _load(spark, sf_dir, "documents")
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    pairs = ngram_jaccard_pairs(
        _spread(docs, spark), k=3, threshold=0.1, n_docs=n_docs
    )
    return dedup_components(pairs, all_ids=docs.select("doc_id"))


def _dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        _spread(_load(spark, sf_dir, "documents"), spark),
        k=3, n_hashes=32, bands=16, threshold=0.1
    )


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_hamming=7 with adaptive 8x8-bit banding is pigeonhole-LOSSLESS
    # (r2 used 8 with 4x16 banding, lossless only <=3 — a documented
    # recall gap, now gone); equality to brute force is pytest-gated
    from contessa_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(
        _spread(_load(spark, sf_dir, "documents"), spark), max_hamming=7
    )


def _dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDedup (Abbas et al. 2023): md5-selected pivot cells, one GEMM
    # per cell, keep-first-by-id within threshold. threshold 0.4 /
    # n_cells 4 are sized to the near-uniform sf embeddings (max random
    # cosine ≈ 0.44) so real drops occur at test scale.
    from contessa_spark.operators.semantic import semantic_dedup

    return semantic_dedup(
        _load(spark, sf_dir, "embeddings"), threshold=0.4, n_cells=4
    )


def _embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed Lloyd k-means (operators/clustering.py): md5-seeded
    # so the whole loop replays CTE-by-CTE in DuckDB (the
    # domain_pagerank unrolled-oracle trick); the greedy farthest-first
    # init (default elsewhere) is pytest-gated on synthetic blobs
    # (tests/test_clustering.py)
    from contessa_spark.operators.clustering import kmeans_embeddings

    return kmeans_embeddings(
        _load(spark, sf_dir, "embeddings"), k=8, iters=2, init="md5"
    )


def _embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blocked-GEMM exact variant: bit-identical to the pair-join form
    # (verified), ~50× faster on all-pairs workloads
    from contessa_spark.operators.dedup import embedding_near_dups_blocked

    # block_size 2048 (r7): replication shuffle is B× the vector table
    # (B = n/block), so 4× bigger blocks cut the replicated bytes 4×;
    # verified bit-identical to the 512-block output at sf1.0 (the
    # BLAS dot accumulates along k in a shape-independent order)
    return embedding_near_dups_blocked(
        _load(spark, sf_dir, "embeddings"), threshold=0.45, block_size=2048
    )


def _embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the 10⁹-vector path: LSH bucket → capped group pair emission →
    # exact codegen-dot verify. Low threshold (0.45 ⇒ θ≈63°) needs few
    # bits + many tables for recall (1-(1-p^2)^8 ≈ 0.97 at p≈0.65).
    from contessa_spark.operators.similarity import hyperplane_lsh_join

    return hyperplane_lsh_join(
        _load(spark, sf_dir, "embeddings"),
        threshold=0.45,
        n_bits=2,
        n_tables=8,
        max_df=2000,
        dim=64,
    )


def _ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 10)
    # dim=64: the embeddings tables declare a fixed dimension — passing
    # it skips the dim-inference job (a whole extra scan kickoff)
    return brute_force_topk(emb, queries_df, k=5, dim=64)


def _ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.similarity import hyperplane_lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 10)
    # 64-dim vectors (all sf testdata tables); near-uniform corpus needs
    # FEW bits + several tables for top-k recall (p^3 per table at the
    # rank-5 cosine ~0.3-0.5, 10 tables -> ~0.9)
    return hyperplane_lsh_topk(
        emb, queries_df, k=5, dim=64, n_bits=3, n_tables=10
    )


def _ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 10)
    # train_fraction: quantizer trains on a deterministic hash-sampled
    # half — at 10^9 vectors the Lloyd scans touch the sample only
    return ivf_topk(
        emb, queries_df, k=5, n_cells=8, n_probe=3, train_fraction=0.5, dim=64
    )


def _events_top_users_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Misra–Gries heavy hitters (operators/heavy_hitters.py) in the
    # EXACT regime: capacity 16384 ≥ distinct users per type at every
    # SF, so zero decrements → est_count is the true count and the
    # result equals the SQL top-k (oracle below). The approximate
    # regime (tiny capacity, guarantee bounds under arbitrary layouts)
    # is pytest-gated (tests/test_heavy_hitters.py)
    from contessa_spark.operators.heavy_hitters import misra_gries_topk

    return misra_gries_topk(
        _load(spark, sf_dir, "events"),
        "user_id",
        "event_type",
        k=10,
        capacity=16384,
    )


def _events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable quantile summaries (operators/quantiles.py) in the
    # EXACT regime: capacity 32768 ≥ rows per (partition, event_type)
    # at every SF, so no compaction fires → max_rank_error = 0 and the
    # estimate is the definitional value at 1-indexed rank ⌈φ·N⌉
    # (⌈·⌉ of the IEEE-double product on both engines — oracle below).
    # The approximate regime (small capacity, rank-error guarantee
    # under arbitrary layouts) is pytest-gated (tests/test_quantiles.py)
    from contessa_spark.operators.quantiles import grouped_quantiles

    return grouped_quantiles(
        _load(spark, sf_dir, "events"),
        "value",
        "event_type",
        phis=(0.25, 0.5, 0.75, 0.9),
        capacity=32768,
    )


def _events_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable DataSketches-HLL cardinality (operators/sketches.py):
    # per-(event_type, day) sketches unioned into per-type totals —
    # the store-sketches-not-recounts pattern. Rows-only by design
    # (DuckDB's approx_count_distinct is a different sketch);
    # accuracy / slice-merge≡global / layout invariance / bounded
    # state are pytest-gated (tests/test_sketches.py)
    from contessa_spark.operators.sketches import (
        cardinality_sketches,
        merge_sketches,
    )

    ev = _load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = cardinality_sketches(ev, "user_id", ["event_type", "day"])
    return merge_sketches(daily, "event_type").select(
        "event_type", "approx_distinct"
    )


def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5-lite star join: fact lineitem joins the supplier →
    # nation dimension chain. Both dims are tiny → explicit broadcast,
    # so the fact table never shuffles for the join; the groupBy
    # partial-aggregates map-side. Filter on l_shipdate pushes to the
    # parquet scan.
    li = _load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= "1995-01-01"
    )
    sup = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


def _events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from contessa_spark.operators.multimodal import decode_images, fake_image_bytes

    # the single-file documents scan yields ONE split; the synth+decode
    # python chain inherits it and serializes onto one core without
    # the round-robin spread (no-op at production split counts)
    docs = _spread(_load(spark, sf_dir, "documents").select("doc_id"), spark)

    def make_media(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        fake_image_bytes(16 + i % 64, 16 + i % 32, i % 256)
                        for i in ids
                    ],
                }
            )

    media = docs.mapInPandas(make_media, schema="media_id long, payload binary")
    return decode_images(media)


def _media_image_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # perceptual image near-dup detection (operators/image_dedup.py):
    # planted duplicate families — doc_id < 500, group g = doc_id % 50,
    # image = 16×18 BMP realizing codeword splitmix64(g) with
    # brightness offset (doc_id // 50) % 32. dHash compares exact
    # integer cross-products, so the brightness term cancels and every
    # group member hashes to EXACTLY the group codeword; the 50
    # codewords sit ≥ 18 bits apart (asserted in tests), so the
    # near-dup pairs at max_hamming=4 are precisely the within-group
    # pairs at hamming 0 — which the oracle recomputes arithmetically.
    # The full encode→decode→hash→band→verify path must hold for the
    # row set to match.
    import pandas as pd

    from contessa_spark.operators.image_dedup import (
        bmp24_from_gray,
        codeword_image_gray,
        image_dhash,
        image_near_dups,
        splitmix64,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 500)
    )

    def make_media(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        bmp24_from_gray(
                            codeword_image_gray(
                                splitmix64(i % 50), (i // 50) % 32
                            )
                        )
                        for i in ids
                    ],
                }
            )

    media = docs.mapInPandas(make_media, schema="media_id long, payload binary")
    return image_near_dups(image_dhash(media), max_hamming=4)


def _media_audio_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # acoustic fingerprint near-dup detection (operators/audio_dedup.py)
    # — planted clip families mirroring media_image_dups: doc_id < 500,
    # group g = doc_id % 40, WAV realizing 32-bit codeword
    # splitmix64(g) at volume scale 1 + (doc_id // 40) % 13. The
    # energy-contour hash compares integer cross-products, so volume
    # cancels and every member fingerprints to the group codeword; the
    # 40 codewords sit > 6 bits apart (asserted in tests), so pairs at
    # max_hamming=4 are exactly the within-group pairs at hamming 0.
    # Full RIFF encode→parse→hash→band→verify path must hold to match.
    import pandas as pd

    from contessa_spark.operators.audio_dedup import (
        audio_afp,
        audio_near_dups,
        codeword_wav_bytes,
    )
    from contessa_spark.operators.image_dedup import splitmix64

    docs = (
        _load(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 500)
    )

    def make_media(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        codeword_wav_bytes(
                            splitmix64(i % 40) & 0xFFFFFFFF,
                            scale=1 + (i // 40) % 13,
                        )
                        for i in ids
                    ],
                }
            )

    media = docs.mapInPandas(make_media, schema="media_id long, payload binary")
    return audio_near_dups(audio_afp(media), max_hamming=4)


def _media_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # real RIFF/WAVE payloads (PCM16, deterministic sawtooth samples)
    # synthesized per doc_id, then actually decoded — headers AND the
    # sample stream (mean-abs amplitude); the oracle recomputes every
    # field arithmetically from doc_id
    import pandas as pd

    from contessa_spark.operators.multimodal import decode_audio, fake_wav_bytes

    docs = _spread(_load(spark, sf_dir, "documents").select("doc_id"), spark)

    def make_media(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        fake_wav_bytes(
                            8000 + (i % 4) * 4000, 1 + i % 2, 100 + i % 400, i
                        )
                        for i in ids
                    ],
                }
            )

    media = docs.mapInPandas(make_media, schema="media_id long, payload binary")
    return decode_audio(media)


def _media_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # real ISO-BMFF (MP4) skeletons per doc_id — ftyp + moov/mvhd +
    # trak/tkhd — decoded by the public-spec box walk; oracle
    # recomputes all fields arithmetically
    import pandas as pd

    from contessa_spark.operators.multimodal import decode_video, fake_mp4_bytes

    docs = _spread(_load(spark, sf_dir, "documents").select("doc_id"), spark)

    def make_media(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        fake_mp4_bytes(
                            320 + (i % 8) * 80,
                            240 + (i % 6) * 60,
                            1000 + (i % 5000),
                        )
                        for i in ids
                    ],
                }
            )

    media = docs.mapInPandas(make_media, schema="media_id long, payload binary")
    return decode_video(media)


def _events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.windows import session_stats

    return session_stats(_load(spark, sf_dir, "events"), gap_minutes=30).select(
        "user_id",
        "session_id",
        "n_events",
        "duration_sec",
        F.unix_timestamp("session_start").alias("start_epoch"),
    )


def _top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.windows import top_k_per_group

    sup = _load(spark, sf_dir, "supplier")
    return top_k_per_group(
        sup, ["s_nationkey"], "s_acctbal", k=3, tiebreak_cols=["s_suppkey"]
    ).select("s_nationkey", "s_suppkey", "s_acctbal", "rank")


def _lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.windows import rollup_counts

    return rollup_counts(
        _load(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"], "l_quantity"
    )


#: drift-monitored rules: (name, Spark pass-pred builder, SQL pass-pred)
_DRIFT_RULES = [
    ("not_error", lambda: F.col("event_type") != "error", "event_type <> 'error'"),
    ("value_gte_1", lambda: F.col("value") >= 1, "value >= 1"),
    ("value_lt_100", lambda: F.col("value") < 100, "value < 100"),
]


def _rule_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rule pass-rate drift detection (operators/monitoring.py): every
    # rule folds into ONE per-hour-bucket scan (2 counters per rule —
    # the compiler's 3N-counter design applied over event time), then
    # trailing-6-bucket mean/sample-std window per rule flags buckets
    # whose failure rate z-scores past 2.0. Rounded-then-divide makes
    # the z cross-engine exact; extends the reference's stored
    # QualityCheck time series into in-engine trend analysis.
    from contessa_spark.operators.monitoring import rule_drift

    ev = _load(spark, sf_dir, "events")
    return rule_drift(
        ev,
        {name: mk() for name, mk, _ in _DRIFT_RULES},
        ts_col="ts",
        bucket="1 hour",
        trailing=6,
        z_threshold=2.0,
    )


def _events_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed as-of join (operators/temporal.py): each click joined
    # to the user's latest at-or-before signup snapshot — union-window
    # shape, ONE key shuffle, no join node (plan-asserted in tests).
    # The oracle is DuckDB's NATIVE ASOF LEFT JOIN: two independent
    # implementations of the temporal-join semantics must agree row
    # for row. Right side pre-aggregated per (user, ts) so "latest"
    # is well-defined on both engines.
    from contessa_spark.operators.temporal import asof_join

    ev = _load(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("snap_value"))
    )
    out = asof_join(left, right, on=["user_id"], value_cols=["snap_value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("asof_ts").alias("asof_epoch"),
        "snap_value",
    )


def _events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucketized interval join (operators/temporal.py): clicks matched
    # to every 2-day post-signup window of the same user. Intervals
    # explode into daily buckets (pure-JVM sequence), the join is a
    # plain equi-join on (user, bucket) — never the
    # BroadcastNestedLoopJoin Spark plans for raw range predicates —
    # and the exact half-open range filter runs post-match. Oracle is
    # the naive DuckDB range join: fine at oracle scale, the trap at
    # 10^12 rows.
    from contessa_spark.operators.temporal import interval_join

    ev = _load(spark, sf_dir, "events")
    points = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    intervals = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("end_ts"),
        F.col("event_id").alias("interval_id"),
    )
    out = interval_join(
        points, intervals, on=["user_id"], bucket_seconds=86400
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        "interval_id",
        F.unix_timestamp("start_ts").alias("start_epoch"),
    )


def _events_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contessa_spark.operators.skew import salted_counts

    return salted_counts(
        _load(spark, sf_dir, "events"), ["event_type"], "event_id", n_salt=8
    )


def _events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in types])
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness harness checks the first 50
    # entries — all 50 are oracle-backed. Five more oracle-backed queries
    # sit just past the window (see the rotation note below), then the 11
    # rows-only / no-oracle queries (pytest-gated instead) at the end.
    return {
        "rule_counts_lineitem": _rule_counts_lineitem,
        "rule_time_filter_events": _rule_time_filter_events,
        "consistency_count": _consistency_count,
        "consistency_diff": _consistency_diff,
        "doc_token_counts": _doc_token_counts,
        "doc_quality_scores": _doc_quality_scores,
        "doc_quality_terciles": _doc_quality_terciles,
        "doc_keep_heuristic": _doc_keep_heuristic,
        "doc_fingerprints": _doc_fingerprints,
        "doc_sample": _doc_sample,
        "doc_line_stats": _doc_line_stats,
        "doc_alpha_words": _doc_alpha_words,
        "doc_pack_assignments": _doc_pack_assignments,
        "doc_dup_ngrams": _doc_dup_ngrams,
        "doc_hybrid_rrf": _doc_hybrid_rrf,
        "doc_dup_lines": _doc_dup_lines,
        "doc_top_ngrams": _doc_top_ngrams,
        "token_topk_per_lang": _token_topk_per_lang,
        "doc_length_quantiles": _doc_length_quantiles,
        "dedup_exact": _dedup_exact,
        "url_canonical": _url_canonical,
        "doc_line_dedup": _doc_line_dedup,
        "corpus_line_dedup": _corpus_line_dedup,
        "corpus_sentence_dedup": _corpus_sentence_dedup,
        "doc_substring_dedup": _doc_substring_dedup,
        "media_image_dups": _media_image_dups,
        "doc_incremental_dedup": _doc_incremental_dedup,
        "doc_mixture_sample": _doc_mixture_sample,
        "doc_textnorm": _doc_textnorm,
        "doc_tfidf_terms": _doc_tfidf_terms,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_components": _dedup_components,
        "dedup_semantic": _dedup_semantic,
        "doc_decontamination": _doc_decontamination,
        "doc_semantic_decontamination": _doc_semantic_decontamination,
        "domain_stats": _domain_stats,
        "url_blocklist": _url_blocklist,
        "domain_pagerank": _domain_pagerank,
        "embedding_near_dups": _embedding_near_dups,
        "ann_topk_bruteforce": _ann_topk_bruteforce,
        "dedup_ngram_jaccard_capped": _dedup_ngram_jaccard_capped,
        "doc_chunks": _doc_chunks,
        "doc_badwords": _doc_badwords,
        "events_hourly_rollup": _events_hourly_rollup,
        "events_sessions": _events_sessions,
        "events_type_counts_salted": _events_type_counts_salted,
        "rule_drift_events": _rule_drift_events,
        "media_decode": _media_decode,
        "media_audio_decode": _media_audio_decode,
        "media_video_decode": _media_video_decode,
        # More queries carry oracles than the driver's 50-slot window
        # holds: the block below sits outside it BY CHOICE (r6 rotation
        # — their operator CLASSES are already exercised by in-window
        # rows: revenue_by_nation by the lineitem join+aggs,
        # top_suppliers_per_nation by token_topk_per_lang's
        # top-k-per-group, events_pivot by events_type_counts_salted's
        # wide agg, lineitem_rollup by events_hourly_rollup's
        # GROUPING SETS, doc_dup_ngrams5 by doc_dup_ngrams (same
        # operator, n=5 vs n=3), and doc_substring_dedup_dropall by
        # doc_substring_dedup (same operator, drop-all vs keep-first);
        # the rotation let the r5/r6 additions — doc_chunks,
        # doc_badwords, dedup_ngram_jaccard_capped, rule_drift_events,
        # doc_hybrid_rrf, media_image_dups — into the driver gate).
        # tests/test_oracle_parity.py checks EVERY oracle on every
        # pytest run regardless of position — at sf0.01, and at sf0.001
        # / sf0.1 via SPARK_GRAFT_ORACLE_SF.
        "doc_dup_ngrams5": _doc_dup_ngrams5,
        "doc_substring_dedup_dropall": _doc_substring_dedup_dropall,
        "top_suppliers_per_nation": _top_suppliers_per_nation,
        "doc_split_assign": _doc_split_assign,
        "doc_stratified_sample": _doc_stratified_sample,
        "media_audio_dups": _media_audio_dups,
        "events_asof_snapshot": _events_asof_snapshot,
        "events_interval_join": _events_interval_join,
        "revenue_by_nation": _revenue_by_nation,
        "events_pivot": _events_pivot,
        "lineitem_rollup": _lineitem_rollup,
        "doc_pack_bfd": _doc_pack_bfd,
        "lm_trigram_counts": _lm_trigram_counts,
        "embedding_kmeans": _embedding_kmeans,
        "events_top_users_mg": _events_top_users_mg,
        "events_value_quantiles": _events_value_quantiles,
        "domain_hits": _domain_hits,
        "doc_bm25_topk": _doc_bm25_topk,
        # ---- rows-only (no SQL oracle by design; each pytest-gated) ----
        "doc_kn_perplexity": _doc_kn_perplexity,
        "doc_langid": _doc_langid,
        "doc_scrub": _doc_scrub,
        "doc_bpe_tokens": _doc_bpe_tokens,
        "doc_unigram_tokens": _doc_unigram_tokens,
        "doc_wordpiece_tokens": _doc_wordpiece_tokens,
        "doc_quality_classifier": _doc_quality_classifier,
        "dedup_minhash_lsh": _dedup_minhash_lsh,
        "dedup_simhash": _dedup_simhash,
        "embedding_near_dups_lsh": _embedding_near_dups_lsh,
        "ann_topk_lsh": _ann_topk_lsh,
        "ann_topk_ivf": _ann_topk_ivf,
        "events_user_sketch_rollup": _events_user_sketch_rollup,
    }


# ---------------------------------------------------------- oracle SQL

def _domain_sql(url_expr: str) -> str:
    from contessa_spark.functions.domain import registrable_domain_sql

    return registrable_domain_sql(url_expr)


def _stopword_array_sql() -> str:
    from contessa_spark.functions.textstats import STOPWORDS

    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS) + "]"


_RULE_CASES = [
    # (attribute, rule_name, rule_type, pass-predicate SQL)
    ("l_orderkey", "nn", "not_null", "l_orderkey IS NOT NULL"),
    ("l_quantity", "qty_gt", "gt", "l_quantity > 25"),
    ("l_quantity", "qty_gte", "gte", "l_quantity >= 25"),
    ("l_discount", "disc_lt_tax", "lt", "l_discount < l_tax"),
    ("l_extendedprice", "price_lte", "lte", "l_extendedprice <= 30000"),
    ("l_returnflag", "flag_eq", "eq", "l_returnflag IS NOT DISTINCT FROM 'N'"),
    ("l_linestatus", "status_not", "not", "l_linestatus IS DISTINCT FROM 'O'"),
]


def _rule_counts_oracle() -> str:
    parts = []
    for attr, name, typ, pred in _RULE_CASES:
        parts.append(
            f"SELECT '{attr}' AS attribute, '{name}' AS rule_name, '{typ}' AS rule_type, "
            f"count(*)::BIGINT AS total_records, "
            f"count(*) FILTER (WHERE NOT ({pred}))::BIGINT AS failed, "
            f"count(*) FILTER (WHERE ({pred}))::BIGINT AS passed, "
            f"CASE WHEN count(*) FILTER (WHERE NOT ({pred})) > 0 THEN 'invalid' ELSE 'valid' END AS status "
            f"FROM lineitem"
        )
    return " UNION ALL ".join(parts)


# RE2 (DuckDB) equivalent of the engine's (?U)\s Unicode-whitespace
# contract: RE2 has no (?U); \p{Z} + \x09-\x0d + \x85 is the same set.
_WS = r"\x09-\x0d\x85\p{Z}"

_TEXTSTATS_CTE = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '[{ws}]+'), x -> x <> '') AS ws
  FROM documents
), s AS (
  SELECT doc_id,
    length(text)::BIGINT AS n_chars,
    CASE WHEN length(text) = 0 THEN 1.0
         ELSE length(regexp_replace(text, '[A-Za-zÀ-ÿ0-9{ws}]', '', 'g')) / length(text) END AS symbol_ratio,
    CASE WHEN len(ws) = 0 THEN 1.0
         ELSE 1.0 - len(list_distinct(ws)) / len(ws) END AS repetition,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE len(list_filter(ws, x -> list_contains({stops}, lower(x)))) / len(ws) END AS stopword_frac,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE list_sum(list_transform(ws, x -> length(x))) / len(ws) END AS mean_word_len
  FROM w
)
"""


def _dup_ngram_oracle(n: int) -> str:
    # gram char weight = gram string minus its separator spaces; words
    # are split on the unicode-ws class so they contain no ASCII space
    m = n - 1
    return (
        f"WITH w AS (SELECT doc_id, "
        f" list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
        f"g AS (SELECT doc_id, [array_to_string(ws[i:i+{m}], ' ') "
        f" for i in range(1, greatest(len(ws) - {m}, 0) + 1)] AS grams FROM w), "
        f"e AS (SELECT doc_id, unnest(grams) AS gram FROM g), "
        f"c AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt, "
        f" length(replace(gram, ' ', ''))::BIGINT AS wt FROM e GROUP BY doc_id, gram), "
        f"a AS (SELECT doc_id, sum(cnt * wt) AS den, "
        f" sum(CASE WHEN cnt > 1 THEN cnt * wt ELSE 0 END) AS num FROM c GROUP BY doc_id) "
        f"SELECT d.doc_id, round(coalesce(a.num / nullif(a.den, 0), 0.0), 6) AS dup_ngram_frac "
        f"FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id"
    )


def _top_ngram_oracle(ns=(2, 3, 4)) -> str:
    # per n: gram counts → row_number tie-break (cnt DESC, gram ASC) →
    # num = cnt × len(gram incl. spaces); frac = num / raw doc chars
    ctes = [
        "WITH w AS (SELECT doc_id, length(text)::BIGINT AS nc, "
        f"list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws "
        "FROM documents)"
    ]
    selects, joins = [], []
    for n in ns:
        m = n - 1
        ctes.append(
            f"e{n} AS (SELECT doc_id, unnest([array_to_string(ws[i:i+{m}], ' ') "
            f" for i in range(1, greatest(len(ws) - {m}, 0) + 1)]) AS gram FROM w), "
            f"c{n} AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM e{n} "
            f" GROUP BY doc_id, gram), "
            f"t{n} AS (SELECT doc_id, cnt * length(gram) AS num FROM ("
            f" SELECT doc_id, gram, cnt, row_number() OVER (PARTITION BY doc_id "
            f"  ORDER BY cnt DESC, gram ASC) AS rn FROM c{n}) WHERE rn = 1)"
        )
        selects.append(
            f"round(coalesce(t{n}.num / nullif(w.nc, 0), 0.0), 6) "
            f"AS top_{n}gram_char_frac"
        )
        joins.append(f"LEFT JOIN t{n} ON w.doc_id = t{n}.doc_id")
    return (
        ", ".join(ctes)
        + " SELECT w.doc_id, "
        + ", ".join(selects)
        + " FROM w "
        + " ".join(joins)
    )


def _doc_sample_oracle() -> str:
    from contessa_spark.operators.sampling import _threshold_hex

    base, en, de = _threshold_hex(0.25), _threshold_hex(0.1), _threshold_hex(0.5)
    return (
        "SELECT doc_id, lang FROM documents WHERE "
        "substring(md5(concat_ws('|', 'r2', doc_id)), 1, 6) < "
        f"(CASE WHEN lang = 'en' THEN '{en}' WHEN lang = 'de' THEN '{de}' "
        f"ELSE '{base}' END)"
    )


def oracle_sql() -> dict[str, str]:
    stops = _stopword_array_sql()
    textstats = _TEXTSTATS_CTE.format(stops=stops, ws=_WS)
    return {
        "rule_counts_lineitem": _rule_counts_oracle(),
        "rule_time_filter_events": (
            "SELECT 'value' AS attribute, 'value_gt0' AS rule_name, 'gt' AS rule_type, "
            "count(*)::BIGINT AS total_records, "
            "count(*) FILTER (WHERE NOT (value > 0))::BIGINT AS failed, "
            "count(*) FILTER (WHERE value > 0)::BIGINT AS passed, "
            "CASE WHEN count(*) FILTER (WHERE NOT (value > 0)) > 0 THEN 'invalid' ELSE 'valid' END AS status "
            "FROM events WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15' "
            "AND event_type IN ('click', 'view')"
        ),
        "consistency_count": (
            "SELECT greatest(l, r)::BIGINT AS total_records, (l - r)::BIGINT AS failed, "
            "least(l, r)::BIGINT AS passed, "
            "CASE WHEN l <> r THEN 'invalid' ELSE 'valid' END AS status "
            "FROM (SELECT (SELECT count(*) FROM orders) AS l, (SELECT count(*) FROM lineitem) AS r)"
        ),
        "consistency_diff": (
            "WITH p AS (SELECT count(*) AS passed FROM "
            " (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)), "
            "fl AS (SELECT count(*) AS fl FROM "
            " (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)), "
            "fr AS (SELECT count(*) AS fr FROM "
            " (SELECT o_custkey FROM orders EXCEPT SELECT c_custkey FROM customer)) "
            "SELECT (passed + fl + fr)::BIGINT AS total_records, (fl + fr)::BIGINT AS failed, "
            "passed::BIGINT AS passed, "
            "CASE WHEN fl + fr > 0 THEN 'invalid' ELSE 'valid' END AS status "
            "FROM p, fl, fr"
        ),
        "doc_token_counts": (
            f"SELECT doc_id, "
            f"len(list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> ''))::BIGINT AS ws_tokens, "
            f"len(regexp_extract_all(text, '[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9{_WS}]'))::BIGINT AS bpeish_tokens, "
            f"length(text)::BIGINT AS n_chars FROM documents"
        ),
        "doc_quality_scores": textstats + (
            "SELECT doc_id, n_chars, round(symbol_ratio, 6) AS symbol_ratio, "
            "round(repetition, 6) AS repetition, round(stopword_frac, 6) AS stopword_frac, "
            "round(mean_word_len, 6) AS mean_word_len, "
            "round((least(n_chars / 200.0, 1.0) + (1.0 - least(symbol_ratio / 0.15, 1.0)) "
            " + (1.0 - least(repetition / 0.85, 1.0)) + least(stopword_frac / 0.10, 1.0)) / 4.0, 6) "
            "AS quality_score FROM s"
        ),
        "doc_quality_terciles": textstats + (
            ", sc AS (SELECT s.doc_id, d.lang, "
            "round((least(s.n_chars / 200.0, 1.0) + (1.0 - least(s.symbol_ratio / 0.15, 1.0)) "
            " + (1.0 - least(s.repetition / 0.85, 1.0)) + least(s.stopword_frac / 0.10, 1.0)) / 4.0, 6) "
            "AS quality_score FROM s JOIN documents d ON s.doc_id = d.doc_id), "
            "thr AS (SELECT lang, "
            f"round(quantile_cont(quality_score, {1 / 3!r}), 6) AS t1, "
            f"round(quantile_cont(quality_score, {2 / 3!r}), 6) AS t2 "
            "FROM sc GROUP BY lang) "
            "SELECT sc.doc_id, sc.lang, sc.quality_score, "
            "CASE WHEN sc.quality_score >= thr.t2 THEN 'head' "
            " WHEN sc.quality_score >= thr.t1 THEN 'middle' ELSE 'tail' END AS bucket "
            "FROM sc JOIN thr ON sc.lang IS NOT DISTINCT FROM thr.lang"
        ),
        "doc_keep_heuristic": textstats + (
            "SELECT doc_id, (n_chars >= 100 AND n_chars <= 20000 AND symbol_ratio < 0.15 "
            "AND repetition < 0.9 AND stopword_frac > 0.01 "
            "AND mean_word_len >= 2.5 AND mean_word_len <= 10.0) AS keep FROM s"
        ),
        "doc_sample": _doc_sample_oracle(),
        "doc_dup_ngrams": _dup_ngram_oracle(2),
        "doc_dup_ngrams5": _dup_ngram_oracle(5),
        "doc_top_ngrams": _top_ngram_oracle((2, 3, 4)),
        "doc_dup_lines": (
            "WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS l, "
            " string_split(text, chr(10) || chr(10)) AS p FROM documents) "
            "SELECT doc_id, "
            "round((len(l) - len(list_distinct(l))) / len(l), 6) AS dup_line_frac, "
            "CASE WHEN list_sum(list_transform(l, x -> length(x))) = 0 THEN 0.0 "
            " ELSE round((list_sum(list_transform(l, x -> length(x))) "
            "  - list_sum(list_transform(list_distinct(l), x -> length(x)))) "
            "  / list_sum(list_transform(l, x -> length(x))), 6) END AS dup_line_char_frac, "
            "round((len(p) - len(list_distinct(p))) / len(p), 6) AS dup_para_frac, "
            "CASE WHEN list_sum(list_transform(p, x -> length(x))) = 0 THEN 0.0 "
            " ELSE round((list_sum(list_transform(p, x -> length(x))) "
            "  - list_sum(list_transform(list_distinct(p), x -> length(x)))) "
            "  / list_sum(list_transform(p, x -> length(x))), 6) END AS dup_para_char_frac "
            "FROM t"
        ),
        "doc_pack_assignments": (
            f"WITH w AS (SELECT doc_id, (doc_id % 8)::INT AS bucket, "
            f" len(list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> ''))::BIGINT AS n_tokens "
            f" FROM documents) "
            "SELECT doc_id, bucket, "
            "floor(coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id "
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)::BIGINT AS pack_id, "
            "n_tokens FROM w"
        ),
        "doc_pack_bfd": (
            # recursive CTE replays the deterministic BFD placement:
            # per bucket, docs in (n_tokens DESC, doc_id) order; state
            # `rem` = remaining capacity per open pack (index = pack
            # id + 1); each step best-fits into min remaining >= n
            # (lowest pack id on ties) else appends a new pack
            f"WITH RECURSIVE w AS (SELECT doc_id, (doc_id % 8)::INT AS bucket, "
            f" len(list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> ''))::BIGINT AS n_tokens "
            f" FROM documents), "
            "d AS (SELECT doc_id, bucket, n_tokens, "
            " row_number() OVER (PARTITION BY bucket ORDER BY n_tokens DESC, doc_id) AS rk FROM w), "
            "steps AS ( "
            " SELECT bucket, 0::BIGINT AS rk, []::BIGINT[] AS rem, "
            "  NULL::BIGINT AS doc_id, NULL::BIGINT AS pack_id, NULL::BIGINT AS n_tokens "
            " FROM (SELECT DISTINCT bucket FROM d) "
            " UNION ALL "
            " SELECT s.bucket, dd.rk, "
            "  CASE WHEN best.bi IS NULL THEN list_append(s.rem, 2048 - dd.n_tokens) "
            "   ELSE s.rem[1:best.bi-1] || [s.rem[best.bi] - dd.n_tokens] || s.rem[best.bi+1:] END, "
            "  dd.doc_id, "
            "  CASE WHEN best.bi IS NULL THEN len(s.rem) ELSE best.bi - 1 END, "
            "  dd.n_tokens "
            " FROM steps s JOIN d dd ON dd.bucket = s.bucket AND dd.rk = s.rk + 1, "
            " LATERAL (SELECT list_filter([{'r': s.rem[k], 'i': k} for k in range(1, len(s.rem)+1)], "
            "   x -> x.r >= dd.n_tokens) AS cands) AS c, "
            " LATERAL (SELECT CASE WHEN len(c.cands) = 0 THEN NULL "
            "   ELSE list_reduce(c.cands, (a, b) -> CASE WHEN b.r < a.r OR (b.r = a.r AND b.i < a.i) "
            "    THEN b ELSE a END).i END AS bi) AS best) "
            "SELECT doc_id, bucket, pack_id, n_tokens FROM steps WHERE doc_id IS NOT NULL"
        ),
        "lm_trigram_counts": (
            # the KN LM's distributed counting stage: corpus trigrams,
            # top-200 by (count desc, gram asc) — deterministic order
            f"WITH w AS (SELECT list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws "
            f" FROM documents WHERE text IS NOT NULL), "
            "g AS (SELECT unnest([array_to_string(ws[i:i+2], ' ') "
            "  for i in range(1, greatest(len(ws) - 2, 0) + 1)]) AS gram FROM w) "
            "SELECT gram, count(*)::BIGINT AS n FROM g GROUP BY gram "
            "ORDER BY n DESC, gram ASC LIMIT 200"
        ),
        "doc_alpha_words": (
            f"WITH w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws FROM documents) "
            "SELECT doc_id, "
            "round(CASE WHEN len(ws) = 0 THEN 0.0 "
            " ELSE len(list_filter(ws, x -> regexp_matches(x, '[A-Za-zÀ-ÿ]'))) / len(ws) END, 6) "
            "AS alpha_word_frac, "
            "(CASE WHEN len(ws) = 0 THEN 0.0 "
            " ELSE len(list_filter(ws, x -> regexp_matches(x, '[A-Za-zÀ-ÿ]'))) / len(ws) END) >= 0.8 "
            "AS passes_alpha_80 FROM w"
        ),
        "doc_line_stats": (
            "WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents) "
            "SELECT doc_id, len(l)::BIGINT AS n_lines, "
            "round(len(list_filter(l, x -> starts_with(x, '- ') OR starts_with(x, '* ') "
            " OR starts_with(x, '• '))) / len(l), 6) AS bullet_frac, "
            "round(len(list_filter(l, x -> ends_with(x, '...') OR ends_with(x, '…'))) "
            " / len(l), 6) AS ellipsis_frac FROM t"
        ),
        "token_topk_per_lang": (
            f"WITH t AS (SELECT lang, lower(x) AS token, count(*)::BIGINT AS n "
            f" FROM (SELECT lang, unnest(list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '')) AS x "
            f"  FROM documents) GROUP BY lang, lower(x)) "
            f"SELECT lang, token, n, rank FROM ("
            f" SELECT lang, token, n, row_number() OVER (PARTITION BY lang "
            f"  ORDER BY n DESC, token ASC)::INT AS rank FROM t) WHERE rank <= 10"
        ),
        "doc_length_quantiles": (
            "SELECT lang, count(*)::BIGINT AS n_docs, "
            "round(quantile_cont(length(text), 0.25), 6) AS p25, "
            "round(quantile_cont(length(text), 0.50), 6) AS p50, "
            "round(quantile_cont(length(text), 0.75), 6) AS p75, "
            "round(quantile_cont(length(text), 0.90), 6) AS p90 "
            "FROM documents GROUP BY lang"
        ),
        "doc_fingerprints": (
            f"SELECT doc_id, md5(regexp_replace(lower(trim(text)), '[{_WS}]+', ' ', 'g')) "
            f"AS fingerprint FROM documents"
        ),
        "url_canonical": (
            "WITH u AS (SELECT doc_id, "
            " (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.Example' ELSE 'HTTPS://Api.Site' END "
            "  || (doc_id % 40)::VARCHAR "
            "  || CASE WHEN doc_id % 2 = 0 THEN '.COM:80' ELSE '.ORG:443' END "
            "  || CASE WHEN doc_id % 3 = 0 THEN '' ELSE '/Path/' || doc_id::VARCHAR || '?q=1' END "
            "  || '#Frag') AS url FROM documents), "
            "c AS (SELECT doc_id, url, "
            " lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme, "
            " lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS hostport, "
            " regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^#]*)', 1) AS pathq FROM u) "
            "SELECT doc_id, url, "
            "CASE WHEN scheme = '' THEN url ELSE scheme || '://' || "
            " (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '') "
            "       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '') "
            "       ELSE hostport END) "
            " || (CASE WHEN pathq = '' THEN '/' ELSE pathq END) END AS canonical_url "
            "FROM c"
        ),
        "doc_line_dedup": (
            # first-occurrence order is explicit (list_position trick):
            # DuckDB list_distinct does NOT preserve order, Spark
            # array_distinct does
            "WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents) "
            "SELECT doc_id, "
            "array_to_string([l[i] for i in range(1, len(l)+1) "
            " if list_position(l, l[i]) = i], chr(10)) AS clean_text, "
            "len(l)::BIGINT AS n_lines, "
            "(len(l) - len(list_distinct(l)))::BIGINT AS n_dupe_lines "
            "FROM t"
        ),
        "corpus_line_dedup": (
            # two positional unnests in one SELECT zip in DuckDB; global
            # first occurrence per line via row_number over (doc, idx)
            "WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents), "
            "e AS (SELECT doc_id, unnest(range(1, len(l) + 1))::BIGINT AS idx, "
            " unnest(l) AS line FROM t), "
            "k AS (SELECT doc_id, idx, line, row_number() OVER "
            " (PARTITION BY line ORDER BY doc_id, idx) AS rn FROM e), "
            "r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean_text, "
            " count(*)::BIGINT AS n_kept FROM k WHERE rn = 1 GROUP BY doc_id) "
            "SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, "
            "len(t.l)::BIGINT AS n_lines, coalesce(r.n_kept, 0)::BIGINT AS n_kept "
            "FROM t LEFT JOIN r ON t.doc_id = r.doc_id"
        ),
        "corpus_sentence_dedup": (
            # sentence boundaries marked with chr(30) then split — the
            # same engine-portable trick the Spark side uses (RE2 has
            # no lookbehind); rebuild joins with single spaces
            # trailing terminator+whitespace would leave an empty span:
            # filter empties (RE2 has no lookahead to anchor the marker)
            f"WITH t AS (SELECT doc_id, list_filter(string_split(regexp_replace("
            f"replace(text, chr(30), ''), "
            f"'([.!?])([{_WS}]+)', '\\1' || chr(30), 'g'), chr(30)), "
            f"x -> x <> '') AS l FROM documents), "
            "e AS (SELECT doc_id, unnest(range(1, len(l) + 1))::BIGINT AS idx, "
            " unnest(l) AS span FROM t), "
            "k AS (SELECT doc_id, idx, span, row_number() OVER "
            " (PARTITION BY span ORDER BY doc_id, idx) AS rn FROM e), "
            "r AS (SELECT doc_id, string_agg(span, ' ' ORDER BY idx) AS clean_text, "
            " count(*)::BIGINT AS n_kept FROM k WHERE rn = 1 GROUP BY doc_id) "
            "SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, "
            "len(t.l)::BIGINT AS n_sentences, coalesce(r.n_kept, 0)::BIGINT AS n_kept "
            "FROM t LEFT JOIN r ON t.doc_id = r.doc_id"
        ),
        "dedup_exact": (
            f"SELECT min(doc_id) AS doc_id FROM documents "
            f"GROUP BY md5(regexp_replace(lower(trim(text)), '[{_WS}]+', ' ', 'g'))"
        ),
        "doc_incremental_dedup": (
            f"SELECT doc_id FROM documents WHERE "
            f"md5(regexp_replace(lower(trim(text)), '[{_WS}]+', ' ', 'g')) NOT IN "
            f"(SELECT md5(regexp_replace(lower(trim(text)), '[{_WS}]+', ' ', 'g')) "
            f" FROM documents WHERE doc_id % 3 = 0)"
        ),
        "doc_tfidf_terms": (
            # smoothed sklearn idf = ln((N+1)/(df+1)) + 1; score rounded
            # to 6dp BEFORE ranking on both sides, ties break on term
            f"WITH w AS (SELECT doc_id, "
            f"list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "e AS (SELECT doc_id, lower(unnest(ws)) AS term FROM w), "
            "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY doc_id, term), "
            "dfq AS (SELECT term, count(*)::BIGINT AS dfc FROM tf GROUP BY term), "
            "n AS (SELECT count(*)::DOUBLE AS nd FROM documents), "
            "sc AS (SELECT tf.doc_id, tf.term, tf.tf, "
            " round(tf.tf * (ln((nd + 1) / (dfc + 1)) + 1), 6) AS score "
            " FROM tf JOIN dfq USING (term), n) "
            "SELECT doc_id, term, tf, score, rank FROM ("
            " SELECT sc.*, row_number() OVER (PARTITION BY doc_id "
            "  ORDER BY score DESC, term ASC) AS rank FROM sc) "
            "WHERE rank <= 5"
        ),
        "doc_textnorm": (
            "SELECT doc_id, nfc_normalize(text) AS norm_text, "
            "nfc_normalize(text) <> text AS changed FROM documents"
        ),
        "doc_mixture_sample": (
            "WITH c AS (SELECT lang, count(*)::DOUBLE AS cnt FROM documents GROUP BY lang), "
            "r AS (SELECT lang, (CASE lang "
            + " ".join(
                f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_WEIGHTS.items())
            )
            + " ELSE 0.0 END) / cnt AS rate FROM c), "
            "m AS (SELECT max(rate) AS mx FROM r), "
            "t AS (SELECT lang, CASE WHEN mx <= 0 THEN '000000' "
            " WHEN rate / mx >= 1.0 THEN 'gggggg' "
            " ELSE lower(lpad(to_hex(CAST(floor(rate / mx * 16777216.0) AS BIGINT)), 6, '0')) END AS thr "
            " FROM r, m) "
            "SELECT d.doc_id, d.lang FROM documents d JOIN t USING (lang) "
            "WHERE substring(md5(concat_ws('|', 'mix', d.doc_id)), 1, 6) < t.thr"
        ),
        "doc_substring_dedup": (
            # Lee et al. repeated-span removal at k=3, keep-first:
            # positional word 3-grams → global (count, first occurrence
            # by (doc_id, pos)) → non-first occurrences of count>1 grams
            # flag word positions [pos, pos+3) → maximal covered runs
            # stripped, kept words rejoin with single spaces
            f"WITH w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, ws, [array_to_string(ws[i:i+2], ' ') "
            " for i in range(1, greatest(len(ws) - 2, 0) + 1)] AS grams FROM w), "
            "e AS (SELECT doc_id, unnest(range(1, len(grams) + 1))::BIGINT AS pos, "
            " unnest(grams) AS gram FROM g), "
            "f AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS cnt, "
            " row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM e), "
            "fl AS (SELECT doc_id, pos FROM f WHERE cnt > 1 AND rn > 1), "
            "cov AS (SELECT DISTINCT doc_id, cp FROM "
            " (SELECT doc_id, unnest(range(pos, pos + 3))::BIGINT AS cp FROM fl)), "
            "cl AS (SELECT doc_id, list(cp ORDER BY cp) AS cps FROM cov GROUP BY doc_id), "
            "sp AS (SELECT doc_id, count(*) FILTER (WHERE prev IS NULL OR cp - prev > 1)::BIGINT AS n_spans "
            " FROM (SELECT doc_id, cp, lag(cp) OVER (PARTITION BY doc_id ORDER BY cp) AS prev FROM cov) "
            " GROUP BY doc_id) "
            "SELECT w.doc_id, "
            # array_to_string([]) is NULL in DuckDB, '' on the join side
            "coalesce(array_to_string([w.ws[i] for i in range(1, len(w.ws) + 1) "
            " if NOT coalesce(list_contains(cl.cps, i), false)], ' '), '') AS clean_text, "
            "len(w.ws)::BIGINT AS n_words, "
            "coalesce(len(cl.cps), 0)::BIGINT AS n_removed_words, "
            "coalesce(sp.n_spans, 0)::BIGINT AS n_spans "
            "FROM w LEFT JOIN cl ON w.doc_id = cl.doc_id "
            "LEFT JOIN sp ON w.doc_id = sp.doc_id"
        ),
        "doc_substring_dedup_dropall": (
            # Lee et al. repeated-span removal at k=3, keep-first:
            # positional word 3-grams → global (count, first occurrence
            # by (doc_id, pos)) → non-first occurrences of count>1 grams
            # flag word positions [pos, pos+3) → maximal covered runs
            # stripped, kept words rejoin with single spaces
            f"WITH w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, ws, [array_to_string(ws[i:i+2], ' ') "
            " for i in range(1, greatest(len(ws) - 2, 0) + 1)] AS grams FROM w), "
            "e AS (SELECT doc_id, unnest(range(1, len(grams) + 1))::BIGINT AS pos, "
            " unnest(grams) AS gram FROM g), "
            "f AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS cnt, "
            " row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM e), "
            "fl AS (SELECT doc_id, pos FROM f WHERE cnt > 1), "
            "cov AS (SELECT DISTINCT doc_id, cp FROM "
            " (SELECT doc_id, unnest(range(pos, pos + 3))::BIGINT AS cp FROM fl)), "
            "cl AS (SELECT doc_id, list(cp ORDER BY cp) AS cps FROM cov GROUP BY doc_id), "
            "sp AS (SELECT doc_id, count(*) FILTER (WHERE prev IS NULL OR cp - prev > 1)::BIGINT AS n_spans "
            " FROM (SELECT doc_id, cp, lag(cp) OVER (PARTITION BY doc_id ORDER BY cp) AS prev FROM cov) "
            " GROUP BY doc_id) "
            "SELECT w.doc_id, "
            # array_to_string([]) is NULL in DuckDB, '' on the join side
            "coalesce(array_to_string([w.ws[i] for i in range(1, len(w.ws) + 1) "
            " if NOT coalesce(list_contains(cl.cps, i), false)], ' '), '') AS clean_text, "
            "len(w.ws)::BIGINT AS n_words, "
            "coalesce(len(cl.cps), 0)::BIGINT AS n_removed_words, "
            "coalesce(sp.n_spans, 0)::BIGINT AS n_spans "
            "FROM w LEFT JOIN cl ON w.doc_id = cl.doc_id "
            "LEFT JOIN sp ON w.doc_id = sp.doc_id"
        ),
        "dedup_ngram_jaccard": (
            f"WITH w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(lower(text), '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "sh AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') "
            " for i in range(1, greatest(len(ws) - 2, 0) + 1)]) AS shingles FROM w), "
            "e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh) "
            "SELECT id_a, id_b, round(j, 6) AS jaccard FROM ("
            " SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "  count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j "
            " FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id "
            " GROUP BY a.doc_id, b.doc_id) WHERE j >= 0.1"
        ),
        "dedup_ngram_jaccard_capped": (
            f"WITH w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(lower(text), '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "sh AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') "
            " for i in range(1, greatest(len(ws) - 2, 0) + 1)]) AS shingles FROM w), "
            "e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh), "
            "ok AS (SELECT s FROM e GROUP BY s HAVING count(*) <= 30), "
            "f AS (SELECT e.doc_id, e.n, e.s FROM e JOIN ok USING (s)) "
            "SELECT id_a, id_b, round(j, 6) AS jaccard FROM ("
            " SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "  count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j "
            " FROM f a JOIN f b ON a.s = b.s AND a.doc_id < b.doc_id "
            " GROUP BY a.doc_id, b.doc_id) WHERE j >= 0.1"
        ),
        "doc_decontamination": (
            f"WITH w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(lower(text), '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct([array_to_string(ws[i:i+2], ' ') "
            " for i in range(1, greatest(len(ws) - 2, 0) + 1)])) AS gram FROM w), "
            "bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), "
            "h AS (SELECT g.doc_id, count(*)::BIGINT AS hit_ngrams "
            " FROM g JOIN bg USING (gram) GROUP BY g.doc_id) "
            "SELECT d.doc_id, coalesce(h.hit_ngrams, 0)::BIGINT AS hit_ngrams, "
            "coalesce(h.hit_ngrams, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id"
        ),
        "dedup_components": (
            # same pair set as dedup_ngram_jaccard, then component id =
            # min reachable node via a recursive min-label walk
            f"WITH RECURSIVE w AS (SELECT doc_id, "
            f" list_filter(string_split_regex(lower(text), '[{_WS}]+'), x -> x <> '') AS ws FROM documents), "
            "sh AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+2], ' ') "
            " for i in range(1, greatest(len(ws) - 2, 0) + 1)]) AS shingles FROM w), "
            "e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh), "
            "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            " FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id "
            " GROUP BY a.doc_id, b.doc_id "
            " HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.1), "
            "ed AS (SELECT id_a AS a, id_b AS b FROM p "
            " UNION SELECT id_b, id_a FROM p), "
            "reach AS (SELECT a AS node, a AS lbl FROM ed "
            " UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.node), "
            "comp AS (SELECT node, min(lbl) AS cid FROM reach GROUP BY node) "
            "SELECT d.doc_id, coalesce(comp.cid, d.doc_id) AS component_id "
            "FROM documents d LEFT JOIN comp ON d.doc_id = comp.node"
        ),
        "doc_semantic_decontamination": (
            # benchmark = every 50th vector; per-corpus-row max cosine
            # over the benchmark set, rounded 6dp (round is monotone:
            # round-then-max == max-then-round). Accounting is TOTAL:
            # zero-norm/NULL corpus rows keep a row with NULL cosine
            # and contaminated=false (left join), matching the operator
            "WITH b AS (SELECT embedding::DOUBLE[] AS v FROM embeddings "
            " WHERE vec_id % 50 = 0 "
            " AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0), "
            "c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
            " WHERE vec_id % 50 <> 0), "
            "s AS (SELECT c.vec_id, round(max(list_cosine_similarity(c.v, b.v)), 6) "
            "  AS max_cosine FROM c, b "
            "  WHERE list_dot_product(c.v, c.v) > 0 GROUP BY c.vec_id) "
            "SELECT c.vec_id, s.max_cosine, "
            "coalesce(s.max_cosine >= 0.4, false) AS contaminated "
            "FROM c LEFT JOIN s USING (vec_id)"
        ),
        "domain_stats": (
            f"WITH u AS (SELECT *, {_SYNTH_URL_SQL} AS url FROM documents) "
            f"SELECT {_domain_sql('url')} AS domain, "
            "count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars, "
            "count(DISTINCT lang)::BIGINT AS n_langs FROM u GROUP BY domain"
        ),
        "url_blocklist": (
            f"WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents), "
            f"d AS (SELECT doc_id, url, {_domain_sql('url')} AS domain FROM u) "
            "SELECT doc_id, url FROM d WHERE domain IS NULL OR domain NOT IN "
            "('example1.com', 'media2.net', 'site0.org', 'site3.org')"
        ),
        "domain_pagerank": _pagerank_oracle_sql(3),
        "domain_hits": _hits_oracle_sql(2),
        "rule_drift_events": _rule_drift_oracle(),
        "doc_hybrid_rrf": _hybrid_rrf_oracle(),
        "doc_split_assign": _split_assign_oracle(),
        "doc_stratified_sample": _stratified_sample_oracle(),
        "media_audio_dups": (
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::INT AS hamming "
            "FROM documents a JOIN documents b "
            " ON (a.doc_id % 40) = (b.doc_id % 40) AND a.doc_id < b.doc_id "
            "WHERE a.doc_id < 500 AND b.doc_id < 500"
        ),
        "events_asof_snapshot": (
            "WITH l AS (SELECT event_id, user_id, ts FROM events "
            " WHERE event_type = 'click'), "
            "r AS (SELECT user_id, ts, max(value) AS snap_value FROM events "
            " WHERE event_type = 'signup' GROUP BY user_id, ts) "
            "SELECT l.event_id, l.user_id, "
            " floor(epoch(l.ts))::BIGINT AS ts_epoch, "
            " floor(epoch(r.ts))::BIGINT AS asof_epoch, r.snap_value "
            "FROM l ASOF LEFT JOIN r "
            " ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "events_interval_join": (
            "WITH p AS (SELECT event_id, user_id, ts FROM events "
            " WHERE event_type = 'click'), "
            "i AS (SELECT user_id, ts AS start_ts, "
            " ts + INTERVAL 2 DAY AS end_ts, event_id AS interval_id "
            " FROM events WHERE event_type = 'signup') "
            "SELECT p.event_id, p.user_id, "
            " floor(epoch(p.ts))::BIGINT AS ts_epoch, i.interval_id, "
            " floor(epoch(i.start_ts))::BIGINT AS start_epoch "
            "FROM p JOIN i ON p.user_id = i.user_id "
            " AND i.start_ts <= p.ts AND p.ts < i.end_ts"
        ),
        "media_image_dups": (
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::INT AS hamming "
            "FROM documents a JOIN documents b "
            " ON (a.doc_id % 50) = (b.doc_id % 50) AND a.doc_id < b.doc_id "
            "WHERE a.doc_id < 500 AND b.doc_id < 500"
        ),
        "doc_bm25_topk": _bm25_oracle(),
        "doc_badwords": (
            f"WITH w AS (SELECT doc_id, text, "
            f"list_transform(list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> ''), x -> lower(x)) AS ws "
            f"FROM documents), "
            "s AS (SELECT doc_id, list_has_any(ws, ['slow']) AS has_blocked_word, "
            " CASE WHEN length(lower(text)) = 0 THEN 0 "
            "  ELSE (length(lower(text)) - length(replace(lower(text), 'row scan', ''))) // length('row scan') END "
            " ::BIGINT AS phrase_hits FROM w) "
            "SELECT doc_id, has_blocked_word, phrase_hits, "
            "(has_blocked_word OR phrase_hits > 0) AS blocked FROM s"
        ),
        "doc_chunks": (
            # sliding-window chunking: step=56, width 64 — integer
            # chunk count (n-8+55) // 56 via DuckDB // == Spark div
            f"WITH w AS (SELECT doc_id, "
            f"list_filter(string_split_regex(text, '[{_WS}]+'), x -> x <> '') AS ws "
            f"FROM documents), "
            "c AS (SELECT doc_id, ws, len(ws) AS n, "
            " greatest(1, (len(ws) - 8 + 55) // 56) AS n_chunks FROM w WHERE len(ws) > 0) "
            "SELECT doc_id, i::INT AS chunk_id, "
            "len(ws[i*56 + 1 : i*56 + 64])::BIGINT AS n_tokens, "
            "array_to_string(ws[i*56 + 1 : i*56 + 64], ' ') AS chunk_text "
            "FROM c, unnest(range(0, n_chunks)) AS t(i)"
        ),
        "dedup_semantic": (
            # SemDedup: md5-ordered pivot selection (shared with the
            # Spark side verbatim), argmax rounded-cosine assignment
            # (ties → lowest pivot id), keep-first-by-id within a cell
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
            " WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0), "
            "piv AS (SELECT vec_id AS pid, v AS pv FROM e "
            " ORDER BY md5(concat_ws('|', 'sem', vec_id)), vec_id LIMIT 4), "
            "assign AS (SELECT e.vec_id, e.v, "
            " (SELECT p.pid FROM piv p "
            "  ORDER BY round(list_cosine_similarity(e.v, p.pv), 6) DESC, p.pid ASC "
            "  LIMIT 1) AS cell FROM e), "
            "drops AS (SELECT DISTINCT a.vec_id FROM assign a JOIN assign b "
            " ON a.cell = b.cell AND b.vec_id < a.vec_id "
            " AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.4) "
            "SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep "
            "FROM assign a LEFT JOIN drops d ON a.vec_id = d.vec_id"
        ),
        "events_top_users_mg": (
            # MG in the exact regime (capacity ≥ distinct): the summary
            # carries true counts, zero undercount — equal to SQL top-k
            # with the operator's (count DESC, item ASC) tie-break
            "SELECT event_type, user_id AS item, n AS est_count, "
            "0::BIGINT AS max_undercount, rank FROM ("
            " SELECT event_type, user_id, count(*)::BIGINT AS n, "
            "  row_number() OVER (PARTITION BY event_type "
            "   ORDER BY count(*) DESC, user_id ASC)::INT AS rank "
            " FROM events WHERE user_id IS NOT NULL "
            " GROUP BY event_type, user_id) WHERE rank <= 10"
        ),
        "events_value_quantiles": (
            # quantile summary in the exact regime: estimate = value at
            # 1-indexed rank ⌈φ·N⌉ of the ascending multiset, zero rank
            # error. φ cast to DOUBLE so ⌈φ·N⌉ is the same IEEE-double
            # product on both engines; row_number tie order within
            # equal values is irrelevant to the value picked at a rank
            "WITH v AS (SELECT event_type, value FROM events "
            " WHERE value IS NOT NULL), "
            "n AS (SELECT event_type, count(*)::BIGINT AS n FROM v "
            " GROUP BY event_type), "
            "r AS (SELECT event_type, value, row_number() OVER ("
            " PARTITION BY event_type ORDER BY value)::BIGINT AS rk FROM v), "
            "p AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]::DOUBLE[]) AS phi) "
            "SELECT n.event_type, p.phi, r.value AS quantile_est, "
            "0::BIGINT AS max_rank_error "
            "FROM n CROSS JOIN p JOIN r ON r.event_type = n.event_type "
            " AND r.rk = ceil(p.phi * n.n)::BIGINT"
        ),
        "embedding_kmeans": (
            # Lloyd k-means, md5-seeded, 2 centroid updates + final
            # assignment — each iteration one (assign, mean, coalesce)
            # CTE triple; empty clusters keep their previous centroid;
            # every argmin on rounded-6dp distance, ties → lowest seed
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
            " WHERE len(embedding) = 64), "
            "p AS (SELECT vec_id AS pid, v AS pv FROM e "
            " ORDER BY md5(concat_ws('|', 'km', vec_id)), vec_id LIMIT 8), "
            "a0 AS (SELECT e.vec_id, e.v, (SELECT c.pid FROM p c "
            " ORDER BY round(list_distance(e.v, c.pv), 6) ASC, c.pid ASC LIMIT 1) AS cid FROM e), "
            "m0 AS (SELECT cid, pos, avg(v[pos]) AS mv "
            " FROM a0, range(1, 65) AS t(pos) GROUP BY cid, pos), "
            "c0 AS (SELECT p.pid, coalesce(n.cv, p.pv) AS pv FROM p LEFT JOIN "
            " (SELECT cid AS pid, list(mv ORDER BY pos) AS cv FROM m0 GROUP BY cid) n USING (pid)), "
            "a1 AS (SELECT e.vec_id, e.v, (SELECT c.pid FROM c0 c "
            " ORDER BY round(list_distance(e.v, c.pv), 6) ASC, c.pid ASC LIMIT 1) AS cid FROM e), "
            "m1 AS (SELECT cid, pos, avg(v[pos]) AS mv "
            " FROM a1, range(1, 65) AS t(pos) GROUP BY cid, pos), "
            "c1 AS (SELECT p.pid, coalesce(n.cv, p.pv) AS pv FROM c0 p LEFT JOIN "
            " (SELECT cid AS pid, list(mv ORDER BY pos) AS cv FROM m1 GROUP BY cid) n USING (pid)) "
            "SELECT e.vec_id, (SELECT c.pid FROM c1 c "
            " ORDER BY round(list_distance(e.v, c.pv), 6) ASC, c.pid ASC LIMIT 1) AS cluster FROM e"
        ),
        "embedding_near_dups": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45"
        ),
        "ann_topk_bruteforce": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10), "
            "s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            " round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine "
            " FROM q, embeddings c WHERE c.vec_id <> q.vec_id) "
            "SELECT query_id, neighbor_id, cosine, rank FROM ("
            " SELECT *, row_number() OVER (PARTITION BY query_id "
            "  ORDER BY cosine DESC, neighbor_id ASC)::INT AS rank FROM s) WHERE rank <= 5"
        ),
        "revenue_by_nation": (
            "SELECT n_name, count(*)::BIGINT AS n_items, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE l_shipdate >= DATE '1995-01-01' GROUP BY n_name"
        ),
        "events_hourly_rollup": (
            "SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT AS hour_epoch, "
            "event_type, count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "events_type_counts_salted": (
            "SELECT event_type, count(*)::BIGINT AS n_rows FROM events GROUP BY event_type"
        ),
        "events_pivot": (
            "SELECT user_id, "
            "count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click, "
            "count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view, "
            "count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error "
            "FROM events GROUP BY user_id"
        ),
        "events_sessions": (
            "WITH g AS (SELECT user_id, ts, "
            " CASE WHEN lag(ts) OVER w IS NULL "
            "      OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800 "
            " THEN 1 ELSE 0 END AS new_s "
            " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)), "
            "s AS (SELECT user_id, ts, "
            " sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id "
            " FROM g) "
            "SELECT user_id, session_id, count(*)::BIGINT AS n_events, "
            "(floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT) AS duration_sec, "
            "floor(epoch(min(ts)))::BIGINT AS start_epoch "
            "FROM s GROUP BY user_id, session_id"
        ),
        "top_suppliers_per_nation": (
            "SELECT s_nationkey, s_suppkey, s_acctbal, rank FROM ("
            " SELECT s_nationkey, s_suppkey, s_acctbal, "
            "  row_number() OVER (PARTITION BY s_nationkey "
            "   ORDER BY s_acctbal DESC, s_suppkey ASC)::INT AS rank FROM supplier) "
            "WHERE rank <= 3"
        ),
        "lineitem_rollup": (
            "SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows, "
            "round(sum(l_quantity), 4) AS sum_l_quantity "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "media_decode": (
            "SELECT doc_id AS media_id, (16 + doc_id % 64)::INT AS width, "
            "(16 + doc_id % 32)::INT AS height, (doc_id % 256)::INT AS mean_byte, "
            "true AS ok, "
            "(17 + ((16 + doc_id % 64) * (16 + doc_id % 32)) % 4096)::BIGINT AS n_bytes "
            "FROM documents"
        ),
        "media_audio_decode": (
            "WITH p AS (SELECT doc_id, (8000 + (doc_id % 4) * 4000)::INT AS sample_rate, "
            " (1 + doc_id % 2)::INT AS n_channels, (100 + doc_id % 400)::BIGINT AS n_frames "
            " FROM documents) "
            "SELECT doc_id AS media_id, sample_rate, n_channels, 16::INT AS bits_per_sample, "
            "n_frames, floor(n_frames / sample_rate * 1000 * 1e6) / 1e6 AS duration_ms, "
            # floor-to-6dp, not round: a mean landing on an exact .5 at
            # the 7th digit splits banker's (python) from half-away
            # (SQL) rounding — hit at sf0.1
            "floor(list_aggregate([abs((k * 37 + doc_id) % 2048 - 1024) "
            " for k in range(0, n_frames * n_channels)], 'avg') * 1e6) / 1e6 AS mean_abs, "
            "true AS ok FROM p"
        ),
        "media_video_decode": (
            "SELECT doc_id AS media_id, (320 + (doc_id % 8) * 80)::INT AS width, "
            "(240 + (doc_id % 6) * 60)::INT AS height, "
            "round((1000 + (doc_id % 5000)) / 1000 * 1000, 6) AS duration_ms, "
            "1000::INT AS timescale, true AS ok FROM documents"
        ),
        # doc_langid, doc_scrub, dedup_minhash_lsh, dedup_simhash,
        # embedding_near_dups_lsh, ann_topk_lsh, ann_topk_ivf:
        # model-based / approximate — intentionally rows-only (no
        # ANSI-SQL-expressible oracle); each is gated by a pytest
        # equality/recall assert instead (tests/test_dedup.py,
        # tests/test_plans.py).
    }
