"""C4/Gopher-style heuristic text statistics.

Signals (Raffel et al. 2020 §2.2 "C4"; Rae et al. 2021 Gopher §A1.1):
document length, symbol ratio, word repetition, stop-word fraction,
mean word length. Each has TWO implementations that must agree
exactly:

* a Spark ``Column`` expression (JVM-side, whole-stage-codegen — the
  hot path; no Python involved), and
* a pure-Python function used by the test oracle.

Tokenization is "split on whitespace runs, drop empties" in both.
The letter class includes Latin-1 accents so de/fr/es/it/cs text is
not penalized as symbols.

Whitespace contract: "whitespace" means the Unicode White_Space set
(NBSP, U+2028/29, U+3000, …) on BOTH sides — the JVM regexes carry the
``(?U)`` (UNICODE_CHARACTER_CLASS) flag so Java ``\\s`` matches it,
and the Python keep/delete table is built from the same explicit set.
Known residual divergence: Python ``str.split()`` additionally treats
the C0 separators U+001C–001F as whitespace (Java does not) — those
are unprintable control codes, accepted as out of contract and kept
out of the property tests.
"""

from __future__ import annotations

import re
from typing import Dict, List

from contessa_spark.functions.langid import SEED_CORPORA

# ---- shared constants ------------------------------------------------

#: the Unicode White_Space code points (what Java (?U)\s matches)
WS_CHARS = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
_WS_SET = frozenset(WS_CHARS)

#: JVM (Java-regex) form — (?U) makes \s match the White_Space set
_LETTER_CLASS = r"(?U)[A-Za-zÀ-ÿ0-9\s]"
_ALNUM_RE = re.compile(r"[A-Za-zÀ-ÿ0-9]")

#: DuckDB/RE2 equivalent of (?U)\s (RE2 has no (?U); \p{Z} = separators,
#: \x09-\x0d + \x85 the rest) — used by the oracle SQL builders
DUCKDB_WS = r"\x09-\x0d\x85\p{Z}"

# str.translate table deleting every keep-class char — C-speed
# equivalent of the regex sub (regex sub was the hotspot at
# ~150µs/doc). Built from the EXPLICIT keep set (alnum ∪ White_Space)
# so it agrees with the JVM (?U) class even on NBSP/U+2028/U+3000; all
# keep codepoints are ≤ 0x3000, chars above stay → counted as symbols.
_KEEP_DELETE_TABLE = {
    cp: None
    for cp in range(0x3001)
    if _ALNUM_RE.match(chr(cp)) or chr(cp) in _WS_SET
}

# stop words: the 25 most frequent tokens of each language's seed
# corpus, unioned — deterministic, derived, multi-language.
def _build_stopwords() -> List[str]:
    stops = set()
    for corpus in SEED_CORPORA.values():
        freq: Dict[str, int] = {}
        for w in corpus.split():
            freq[w] = freq.get(w, 0) + 1
        top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        stops.update(w for w, _ in top)
    return sorted(stops)


STOPWORDS: List[str] = _build_stopwords()
_STOPSET = set(STOPWORDS)


# ---- pure-python cores (test oracle) --------------------------------

def py_tokens(text: str) -> List[str]:
    return text.split()


def py_n_chars(text: str) -> int:
    return len(text)


def py_symbol_ratio(text: str) -> float:
    if not text:
        return 1.0
    return len(text.translate(_KEEP_DELETE_TABLE)) / len(text)


def py_repetition(text: str) -> float:
    toks = py_tokens(text)
    if not toks:
        return 1.0
    return 1.0 - len(set(toks)) / len(toks)


def py_stopword_frac(text: str) -> float:
    toks = py_tokens(text)
    if not toks:
        return 0.0
    return sum(1 for t in toks if t.lower() in _STOPSET) / len(toks)


def py_mean_word_len(text: str) -> float:
    toks = py_tokens(text)
    if not toks:
        return 0.0
    return sum(len(t) for t in toks) / len(toks)


# ---- Spark Column builders (the engine path) -------------------------

def spark_words_col(text_col: str = "text"):
    """split-on-whitespace-runs, drop empties — matches ``str.split()``
    (modulo U+001C–1F, see module docstring); (?U) makes Java \\s cover
    Unicode whitespace like Python's."""
    from pyspark.sql import functions as F

    return F.filter(F.split(F.col(text_col), r"(?U)\s+"), lambda x: x != F.lit(""))


def spark_stat_columns(text_col: str = "text", words_col: str = None):
    """dict of stat-name → Column, all JVM-side (no UDF).

    Pass ``words_col`` (a pre-materialized array column from
    ``spark_words_col``) when computing several stats over one table:
    each higher-order lambda otherwise embeds its own copy of the
    split, and codegen does not CSE across lambdas — the expression
    tree (and compile + eval time) grows ~4× without it.
    """
    from pyspark.sql import functions as F

    c = F.col(text_col)
    words = F.col(words_col) if words_col else spark_words_col(text_col)
    n_words = F.size(words)
    stops = F.lit(STOPWORDS)  # array literal, broadcast by codegen

    return {
        "n_chars": F.length(c).cast("long"),
        "symbol_ratio": F.when(F.length(c) == 0, F.lit(1.0)).otherwise(
            F.length(F.regexp_replace(c, _LETTER_CLASS, ""))
            / F.length(c).cast("double")
        ),
        "repetition": F.when(n_words == 0, F.lit(1.0)).otherwise(
            1.0 - F.size(F.array_distinct(words)) / n_words.cast("double")
        ),
        "stopword_frac": F.when(n_words == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(words, lambda w: F.array_contains(stops, F.lower(w))))
            / n_words.cast("double")
        ),
        "mean_word_len": F.when(n_words == 0, F.lit(0.0)).otherwise(
            F.aggregate(
                words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
            )
            / n_words.cast("double")
        ),
    }
