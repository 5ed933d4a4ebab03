"""Rule-definition normalizer.

Reference semantics: contessa/normalizer.py:30-80 — expands
``columns: [a,b,c]`` × ``separate_time_filters: [t1,t2]`` into the
cross-product of single-column single-filter rule dicts; passthrough if
already normal; a 1-element ``separate_time_filters`` is rejected
("use `time_filter` for one column"); a dict-valued separate time
filter is wrapped in a 1-list so it parses as the list form.

Pure driver-side logic — no Spark involvement; runs before plan
construction.
"""

from __future__ import annotations

import itertools
from typing import Dict, List


class RuleNormalizer:
    @classmethod
    def normalize(cls, rules_def: List[Dict]) -> List[Dict]:
        normalized: List[Dict] = []
        for rule_def in rules_def:
            if not cls._should_normalize(rule_def):
                normalized.append(rule_def)
                continue
            normalized.extend(cls._expand(rule_def))
        return normalized

    @staticmethod
    def _should_normalize(rule_def: Dict) -> bool:
        if "columns" in rule_def:
            return True
        if "separate_time_filters" in rule_def:
            if len(rule_def["separate_time_filters"]) <= 1:
                raise ValueError("Please use `time_filter` for one column.")
            return True
        return False

    @staticmethod
    def _expand(rule_def: Dict) -> List[Dict]:
        cols = rule_def.get("columns") or [rule_def.get("column")] or [None]
        tfs = (
            rule_def.get("separate_time_filters")
            or [rule_def.get("time_filter")]
            or [None]
        )
        out = []
        for col, tf in itertools.product(cols, tfs):
            flat = dict(rule_def)
            flat["column"] = col
            flat["time_filter"] = [tf] if isinstance(tf, dict) else tf
            flat.pop("columns", None)
            flat.pop("separate_time_filters", None)
            out.append(flat)
        return out
