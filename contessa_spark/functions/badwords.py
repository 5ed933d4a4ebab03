"""Blocklist-phrase matching — the C4 §2.1 "bad words" rule at scale.

Reference parity: no counterpart in contessa (SURVEY.md §2
extension — the C4 rule family next to functions/textstats.py).

Two paths, chosen by what the blocklist contains:

* ``blocked_word_col``: single WORDS → pure-JVM ``arrays_overlap``
  against the lowercased word array (codegen, zero UDF, and the exact
  predicate re-expresses as DuckDB ``list_has_any`` — oracle-shared).
* ``phrase_hits_udf``: multi-word PHRASES / substrings → a driver-built
  Aho-Corasick automaton closed over a pandas UDF. One pass over the
  text counts occurrences of ALL patterns simultaneously — a regex
  alternation of thousands of phrases is quadratic-ish in practice and
  blows the regex compiler long before that (the real C4 list is ~400
  entries; CommonCrawl-scale lists reach 10⁵, where only an automaton
  works). The automaton is built once on the driver (tiny — nodes ≤
  total pattern chars) and ships to workers in the UDF closure.

Matching is case-insensitive on both paths (patterns are lowercased at
build time, text at match time). The AC path matches SUBSTRINGS, the
word path whole words — C4 uses word-level; phrase lists generally
want substring semantics (documented, tested).
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_word_col(text_col: str, words: Iterable[str]) -> Column:
    """True when any blocklisted WORD appears in the (?U)\\s+-split,
    lowercased word array. Pure JVM; SQL form: ``list_has_any``."""
    from contessa_spark.functions.textstats import spark_words_col

    blocked = sorted({w.lower() for w in words if w})
    arr = F.transform(spark_words_col(text_col), lambda x: F.lower(x))
    return F.arrays_overlap(
        arr, F.array(*[F.lit(w) for w in blocked])
    )


def build_ac(patterns: Iterable[str]) -> Tuple[list, list, list]:
    """Aho-Corasick automaton (goto / fail / output-count tables) over
    lowercased patterns. Returns (goto: list[dict], fail: list[int],
    nout: list[int]) where ``nout[s]`` is the number of patterns ending
    at state s INCLUDING via suffix links (precomputed, so matching
    never walks the fail chain)."""
    pats = sorted({p.lower() for p in patterns if p})
    goto: List[dict] = [{}]
    nout: List[int] = [0]
    for p in pats:
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                nout.append(0)
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        nout[s] += 1
    fail = [0] * len(goto)
    q = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        u = q.popleft()
        for ch, v in goto[u].items():
            q.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[v] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != v else 0
            nout[v] += nout[fail[v]]
    return goto, fail, nout


def ac_count(text: str, ac: Tuple[list, list, list]) -> int:
    """Total occurrences of all patterns in ``text`` (lowercased),
    counting overlaps — the pure core the UDF and tests share."""
    goto, fail, nout = ac
    s = 0
    hits = 0
    for ch in text.lower():
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        hits += nout[s]
    return hits


def phrase_hits_udf(patterns: Iterable[str]):
    """pandas UDF: text → BIGINT occurrence count over all patterns."""
    import pandas as pd
    from pyspark.sql import types as T

    ac = build_ac(patterns)

    def _hits(texts):
        return pd.Series(
            [ac_count(t if isinstance(t, str) else "", ac) for t in texts],
            dtype="int64",
        )

    _hits.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_hits, T.LongType())


def badword_stats(
    df: DataFrame,
    words: Iterable[str],
    phrases: Iterable[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, has_blocked_word, phrase_hits, blocked): word-set flag
    (JVM) + phrase occurrence count (AC UDF, skipped entirely when
    ``phrases`` is empty); ``blocked`` = either trips."""
    word_flag = blocked_word_col(text_col, words)
    out = df.select(F.col(id_col), word_flag.alias("has_blocked_word"))
    phrases = list(phrases)
    if phrases:
        hits = phrase_hits_udf(phrases)(F.col(text_col))
        out = df.select(
            F.col(id_col),
            word_flag.alias("has_blocked_word"),
            hits.alias("phrase_hits"),
        )
    else:
        out = out.withColumn("phrase_hits", F.lit(0).cast("long"))
    return out.withColumn(
        "blocked", F.col("has_blocked_word") | (F.col("phrase_hits") > 0)
    )
