"""Trained interpolated Kneser-Ney LM (functions/kenlm.py).

Gates: hand-computed golden probabilities, proper-distribution
(sum-to-one) per context INCLUDING pruned models, bit-determinism
across physical layouts, clean-vs-shuffled perplexity separation, and
persistence round-trip. The distributed counting stage is additionally
oracle-checked against DuckDB by tests/test_oracle_parity.py via the
`lm_trigram_counts` driver query.
"""

import math

import pytest

from contessa_spark.functions.kenlm import (
    KNModel,
    all_order_counts,
    kn_perplexity,
    load_model,
    ngram_counts,
    py_tokens,
    save_model,
    train_kn,
    train_kn_from_counts,
)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _counts_from_docs(docs, order):
    """Pure-python reference counting (document-as-sequence)."""
    out = [dict() for _ in range(order)]
    for d in docs:
        toks = py_tokens(d)
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i : i + n])
                out[n - 1][g] = out[n - 1].get(g, 0) + 1
    return out


# ---------------------------------------------------------------- golden


def test_bigram_golden_hand_computed():
    # corpus: one doc "a b a b c"; D = 0.5 fixed
    # c1: a:2 b:2 c:1 ; c2: (a,b):2 (b,a):1 (b,c):1
    # cont1 (distinct left-contexts): b:1 (from a,b), a:1 (from b,a),
    #   c:1 (from b,c) → total 3
    # p1 disc part: (1-0.5)/3 = 1/6 each; lam1 = 1 - 3/6 = 0.5
    # vocab = {a,b,c,<unk>} → V=4, floor = 0.125
    # p1: a=b=c = 1/6+1/8 = 7/24 ; <unk> = 1/8
    # t2[(a,b)] = (2-0.5)/c1[a]=2 → 0.75 ; l2[a] = 0.25
    # t2[(b,a)] = t2[(b,c)] = 0.5/2 = 0.25 ; l2[b] = 0.5
    m = train_kn_from_counts(_counts_from_docs(["a b a b c"], 2), 0.5)
    assert m.prob1("a") == pytest.approx(7 / 24)
    assert m.prob1("<unk>") == pytest.approx(1 / 8)
    assert m.prob1("zzz") == pytest.approx(1 / 8)
    assert m.prob2("a", "b") == pytest.approx(0.75 + 0.25 * (7 / 24))
    assert m.prob2("b", "a") == pytest.approx(0.25 + 0.5 * (7 / 24))
    # unseen context backs off with weight 1
    assert m.prob2("c", "a") == pytest.approx(m.prob1("a"))
    assert m.prob2("zzz", "a") == pytest.approx(m.prob1("a"))


def test_trigram_golden_structure():
    # "a b c a b d": trigram (a,b,c):1 (b,c,a):1 (c,a,b):1 (a,b,d):1
    # with D=0.5: t3[(a,b,c)] = 0.5 / c2[(a,b)]=2 = 0.25, ditto (a,b,d)
    # l3[(a,b)] = 1 - 0.5 = 0.5
    m = train_kn_from_counts(_counts_from_docs(["a b c a b d"], 3), 0.5)
    assert m.t3[("a", "b", "c")] == pytest.approx(0.25)
    assert m.l3[("a", "b")] == pytest.approx(0.5)
    assert m.prob3("a", "b", "c") == pytest.approx(
        0.25 + 0.5 * m.prob2("b", "c")
    )
    # unseen trigram context → exactly the bigram estimate
    assert m.prob3("d", "a", "b") == pytest.approx(m.prob2("a", "b"))


# ------------------------------------------------------- proper distribution


def _sum_over_vocab(m: KNModel, prob):
    """Σ prob(w) over the CLOSED train-time vocab: the |p1| words with
    explicit entries plus (V - |p1|) floor-only words (<unk> included),
    whose individual probabilities all equal prob(floor-word)."""
    explicit = sum(prob(w) for w in m.p1)
    return explicit + (m.V - len(m.p1)) * prob("<unk>")


def test_sums_to_one_full_model():
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps under the warm sun",
        "a quick brown fox and a lazy dog walk home",
    ]
    m = train_kn_from_counts(_counts_from_docs(docs, 3), None)
    assert _sum_over_vocab(m, m.prob1) == pytest.approx(1.0, abs=1e-9)
    for v in list(m.l2)[:8] + ["never-seen-ctx"]:
        assert _sum_over_vocab(
            m, lambda w: m.prob2(v, w)
        ) == pytest.approx(1.0, abs=1e-9)
    for (u, v) in list(m.l3)[:8] + [("x", "never")]:
        assert _sum_over_vocab(
            m, lambda w: m.prob3(u, v, w)
        ) == pytest.approx(1.0, abs=1e-9)


def test_sums_to_one_under_pruning():
    # drop every count-1 trigram and bigram (simulated min_count=2):
    # residual-mass back-off must keep each context a distribution
    docs = [
        "a b c d a b c e a b x y",
        "a b c d q r s t u v w z",
    ]
    full = _counts_from_docs(docs, 3)
    pruned = [
        full[0],
        {g: c for g, c in full[1].items() if c >= 2},
        {g: c for g, c in full[2].items() if c >= 2},
    ]
    m = train_kn_from_counts(pruned, 0.75)
    assert _sum_over_vocab(m, m.prob1) == pytest.approx(1.0, abs=1e-9)
    for v in list(m.l2) + ["a", "q", "nope"]:
        assert _sum_over_vocab(
            m, lambda w: m.prob2(v, w)
        ) == pytest.approx(1.0, abs=1e-9)
    for uv in list(m.l3) + [("a", "b"), ("u", "v")]:
        assert _sum_over_vocab(
            m, lambda w: m.prob3(uv[0], uv[1], w)
        ) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------- spark side


def test_spark_counts_match_pure_python(spark, docs_df):
    docs = [r["text"] for r in docs_df.select("text").collect()]
    want = _counts_from_docs(docs, 3)
    got = all_order_counts(docs_df, 3)
    assert got == want


def test_spark_counts_layout_invariant(spark, docs_df):
    a = all_order_counts(docs_df, 3)
    b = all_order_counts(docs_df.repartition(7), 3)
    assert a == b
    # and the trained models are bit-identical
    ma = train_kn_from_counts(a)
    mb = train_kn_from_counts(b)
    assert ma.p1 == mb.p1 and ma.t2 == mb.t2 and ma.t3 == mb.t3
    assert ma.l2 == mb.l2 and ma.l3 == mb.l3


def test_min_count_and_cap(spark, docs_df):
    full = all_order_counts(docs_df, 2)
    cut = all_order_counts(docs_df, 2, min_count=2)
    assert cut[0] == {g: c for g, c in full[0].items() if c >= 2}
    assert cut[1] == {g: c for g, c in full[1].items() if c >= 2}
    capped = all_order_counts(docs_df, 2, max_grams=5)
    assert len(capped[0]) == 5 and len(capped[1]) == 5
    # cap keeps the TOP grams by (count desc, gram asc)
    want = sorted(full[0].items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert capped[0] == dict(want)


def test_ngram_counts_single_order(spark, docs_df):
    got = {
        tuple(r["gram"].split(" ")): r["n"]
        for r in ngram_counts(docs_df, 2).collect()
    }
    docs = [r["text"] for r in docs_df.select("text").collect()]
    assert got == _counts_from_docs(docs, 2)[1]


def test_kn_perplexity_df(spark, docs_df):
    m = train_kn(docs_df, order=3)
    out = kn_perplexity(docs_df, m).collect()
    assert len(out) == docs_df.count()
    by_id = {r["doc_id"]: r["kn_ppl"] for r in out}
    docs = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    for did, text in docs.items():
        assert by_id[did] == pytest.approx(m.perplexity(text), rel=1e-12)
        assert by_id[did] > 0


def test_separation_clean_vs_shuffled(spark, docs_df):
    """The CCNet premise: in-domain prose scores lower than the same
    words in scrambled order (n-gram structure destroyed)."""
    import random

    m = train_kn(docs_df, order=3)
    texts = [r["text"] for r in docs_df.select("text").collect()][:40]
    rng = random.Random(7)
    worse = 0
    for t in texts:
        toks = py_tokens(t)
        if len(toks) < 8:
            continue
        shuf = toks[:]
        rng.shuffle(shuf)
        if m.perplexity(" ".join(shuf)) > m.perplexity(" ".join(toks)):
            worse += 1
    assert worse >= 0.9 * len(texts)


def test_empty_and_oov_docs():
    m = train_kn_from_counts(_counts_from_docs(["a b c"], 2), 0.5)
    assert m.perplexity("") == pytest.approx(1.0e6)
    assert m.perplexity(None) == pytest.approx(1.0e6)
    p = m.perplexity("zz yy xx")
    assert p > 1.0 and math.isfinite(p)


def test_persistence_round_trip(spark, docs_df, tmp_path):
    m = train_kn(docs_df, order=3)
    path = str(tmp_path / "kn_model")
    save_model(spark, m, path)
    m2 = load_model(spark, path)
    assert m2.order == m.order
    assert m2.p1 == m.p1 and m2.p1_floor == m.p1_floor
    assert m2.t2 == m.t2 and m2.l2 == m.l2
    assert m2.t3 == m.t3 and m2.l3 == m.l3


def test_counting_plan_shape(spark, docs_df):
    """The counting stage must be ONE pruned scan → partial+final
    hash aggregate → TakeOrderedAndProject (no full sort, no extra
    scans) — the only heavy stage at 100 TB, shaped for it."""
    from contessa_spark.functions.kenlm import top_ngram_counts

    plan = top_ngram_counts(
        docs_df, 3, 200
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") == 2  # partial + final
    assert "Sort " not in plan  # cap never global-sorts
