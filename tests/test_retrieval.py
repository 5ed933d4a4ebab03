"""BM25 lexical retrieval: hand-computed golden, candidate pruning,
ranking semantics, validation. Oracle parity runs in
tests/test_oracle_parity.py (doc_bm25_topk)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bm25_ref(corpus, queries, k1=1.2, b=0.75):
    """Pure-python BM25 mirror (Lucene idf), unrounded scores."""
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, q in queries.items():
        for d, t in toks.items():
            s = 0.0
            for term in dict.fromkeys(q.lower().split()):
                tf = t.count(term)
                if not tf:
                    continue
                df = sum(term in tt for tt in toks.values())
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl)
                )
            if s:
                out[(qid, d)] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    from contessa_spark.operators.retrieval import bm25_topk

    corpus = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark broadcast join",
        3: "a very long document about nothing relevant at all here now",
        4: "broadcast the small side of the join",
        5: "data quality rules run on spark",
    }
    queries = {"a": "spark join", "b": "data quality"}
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(df, queries, k=10).collect()
    }
    want = _bm25_ref(corpus, queries)
    assert set(got) == set(want)
    for key, (score, _rank) in got.items():
        assert abs(score - want[key]) < 1e-9, (key, score, want[key])
    # ranking: contiguous ranks from 1, descending score order
    for qid in queries:
        ranked = sorted(
            (k for k in got if k[0] == qid), key=lambda k: got[k][1]
        )
        assert [got[k][1] for k in ranked] == list(range(1, len(ranked) + 1))
        scores = [got[k][0] for k in ranked]
        assert scores == sorted(scores, reverse=True)


def test_bm25_only_matching_docs_and_k_cap(spark):
    from contessa_spark.operators.retrieval import bm25_topk

    rows = [(i, "common filler words") for i in range(20)]
    rows.append((99, "needle in the stack"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, {"q": "needle"}, k=5).collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(99, 1)]
    out = bm25_topk(df, {"q": "common"}, k=5).collect()
    assert len(out) == 5  # capped, not 20
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4]  # tie → id asc


def test_bm25_term_frequency_saturates_not_linear(spark):
    """Doubling tf must increase the score, but by less than 2× —
    the k1 saturation that distinguishes BM25 from raw tf-idf."""
    from contessa_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [(1, "term pad pad pad"), (2, "term term pad pad"), (3, "pad x y z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in
           bm25_topk(df, {"q": "term"}, k=10).collect()}
    assert got[2] > got[1]
    assert got[2] < 2 * got[1]


def test_bm25_validation(spark):
    import pytest

    from contessa_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, {})
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": "x"}, k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": "   "})


def test_rrf_fuse_golden(spark):
    from contessa_spark.operators.retrieval import rrf_fuse

    # system A ranks docs 1,2,3; system B ranks 2,1,4
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 1, 2), ("q", 4, 3)],
        "query_id string, doc_id long, rank int",
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse({"a": a, "b": b}, k=10, k0=60).collect()
    }
    want = {
        1: 1 / 61 + 1 / 62,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63,
        4: 1 / 63,
    }
    assert set(got) == set(want)
    for d, (s, _r) in got.items():
        assert s == pytest.approx(round(want[d], 6), abs=1e-9)
    # docs 1 and 2 tie at the top → doc_id breaks the tie; 3 and 4
    # tie below → again by doc_id
    assert [d for d, (_s, r) in sorted(got.items(), key=lambda kv: kv[1][1])] == [
        1,
        2,
        3,
        4,
    ]


def test_rrf_fuse_k_cap_and_validation(spark):
    import pytest as _pytest

    from contessa_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q", i, i) for i in range(1, 6)],
        "query_id string, doc_id long, rank int",
    )
    out = rrf_fuse({"only": a}, k=3, k0=60).collect()
    assert len(out) == 3
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    with _pytest.raises(ValueError):
        rrf_fuse({}, k=3)
    with _pytest.raises(ValueError):
        rrf_fuse({"only": a}, k=0)
