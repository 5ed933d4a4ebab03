"""Row-at-a-time pure-Python reference implementation (test oracle).

Plays the role Contessa's Postgres-side execution plays for the
reference tests: an independent, non-Spark evaluation of the SAME rule
semantics, structured the way contessa/rules.py:74-95 streams rows and
counts. The Spark pipeline must match its keep/drop decisions (F1
target ≥ 0.99, BASELINE.json) and its scrubbed text byte-for-byte.

It deliberately shares the pure scoring/scrub cores
(functions/langid.py, functions/perplexity.py, functions/textstats.py,
functions/scrub.py) — the SURVEY §7 risk note: keeping one shared pure
function is what makes byte-identity achievable at all. What is
independent here is the *evaluation path*: plain Python loop, no
Spark, no Arrow, no SQL.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Dict, Iterable, List

from contessa_spark.functions import langid, perplexity, scrub, textstats
from contessa_spark.pipeline import PipelineConfig


@dataclass
class RefRow:
    url: str
    keep: bool
    scrubbed_text: str
    failed_rules: List[str]


def evaluate_rows(rows: Iterable[dict], cfg: PipelineConfig = None) -> List[RefRow]:
    """rows: dicts with url/text/lang. Returns per-row golden labels."""
    cfg = cfg or PipelineConfig()
    out = []
    for r in rows:
        text = r["text"] or ""
        failed = []

        lang_pred, conf = langid.detect(text)
        if not (lang_pred == r["lang"] and conf >= cfg.lang_conf_tau):
            failed.append("lang_match")
        if not (perplexity.perplexity(text) < cfg.ppl_tau):
            failed.append("perplexity_lt")
        n = textstats.py_n_chars(text)
        if not (n >= cfg.min_chars):
            failed.append("min_len_gte")
        if not (n <= cfg.max_chars):
            failed.append("max_len_lte")
        if not (textstats.py_symbol_ratio(text) < cfg.symbol_tau):
            failed.append("symbol_ratio_lt")
        if not (textstats.py_repetition(text) < cfg.repetition_tau):
            failed.append("repetition_lt")
        if not (textstats.py_stopword_frac(text) > cfg.stopword_tau):
            failed.append("stopword_frac_gt")
        mwl = textstats.py_mean_word_len(text)
        if not (cfg.mwl_min <= mwl <= cfg.mwl_max):
            failed.append("mean_word_len_between")
        if r["url"] is None:
            failed.append("url_not_null")

        out.append(
            RefRow(
                url=r["url"],
                keep=not failed,
                scrubbed_text=scrub.scrub_text(text),
                failed_rules=failed,
            )
        )
    return out


def aggregate_counts(rows: Iterable[dict], cfg: PipelineConfig = None) -> Dict[str, dict]:
    """Contessa-style (total, passed, failed) per rule — streaming loop."""
    cfg = cfg or PipelineConfig()
    counters: Dict[str, dict] = {}
    refs = evaluate_rows(rows, cfg)
    all_rules = [
        "lang_match",
        "perplexity_lt",
        "min_len_gte",
        "max_len_lte",
        "symbol_ratio_lt",
        "repetition_lt",
        "stopword_frac_gt",
        "mean_word_len_between",
    ]
    for name in all_rules:
        counters[name] = {"total": 0, "passed": 0, "failed": 0}
    for ref in refs:
        for name in all_rules:
            c = counters[name]
            c["total"] += 1
            if name in ref.failed_rules:
                c["failed"] += 1
            else:
                c["passed"] += 1
    return counters
