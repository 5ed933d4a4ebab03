"""Unicode NFC + mojibake repair: golden corruptions, conservatism
(clean text untouched), idempotency, and the Spark path."""

import os
import sys
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contessa_spark.functions.textnorm import fix_mojibake, py_normalize


def _corrupt(s: str, enc: str = "latin-1") -> str:
    """Simulate the classic corruption: UTF-8 bytes read as latin-1."""
    return s.encode("utf-8").decode(enc)


def test_mojibake_single_and_double_roundtrip():
    clean = "déjà vu — naïve café"
    once = _corrupt(clean)
    assert "Ã" in once
    assert fix_mojibake(once) == clean
    twice = _corrupt(once)
    assert fix_mojibake(twice) == clean  # two passes


def test_mojibake_conservative_on_clean_text():
    for s in ["plain ascii", "déjà vu", "日本語テキスト", "", "Ångström",
              "mañana Ñoño", "Москва Ð is a real letter? no — marker"]:
        assert fix_mojibake(s) == s


def test_mojibake_cp1252_curly_quotes():
    # ” (U+201D) maps through 0x9d, undefined in strict cp1252 — use
    # the apostrophe/open-quote artifacts, which round-trip
    clean = "it’s “quoted"
    once = clean.encode("utf-8").decode("cp1252")
    assert "â€" in once
    assert fix_mojibake(once) == clean


def test_mojibake_idempotent():
    once = _corrupt("résumé")
    fixed = fix_mojibake(once)
    assert fix_mojibake(fixed) == fixed


def test_nfc_composes():
    decomposed = "élève"  # e + combining accents
    got = py_normalize(decomposed, mojibake=False)
    assert got == "élève"
    assert unicodedata.is_normalized("NFC", got)


def test_spark_normalize_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "plain"),
            (2, _corrupt("café")),
            (3, "éclair"),
        ],
        "doc_id long, text string",
    )
    from contessa_spark.functions.textnorm import normalize_text

    got = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert got[1]["norm_text"] == "plain" and not got[1]["changed"]
    assert got[2]["norm_text"] == "café" and got[2]["changed"]
    assert got[3]["norm_text"] == "éclair" and got[3]["changed"]
