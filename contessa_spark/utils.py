"""Shared small utilities.

Reference: contessa/utils.py:8-23 — ``AggregatedResult`` (the engine's
only intermediate result type) and strict Jinja SQL rendering.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List

import jinja2


@dataclass
class AggregatedResult:
    """Per-(rule, run) counters (contessa/utils.py:8-13)."""

    total_records: int
    failed: int
    passed: int
    failed_example: List[Any] = field(default_factory=list)


def render_jinja_sql(sql: str, context: Dict[str, Any]) -> str:
    """Strict Jinja render (contessa/utils.py:16-23): missing variables
    raise ``jinja2.UndefinedError``; ``%`` is escaped to ``%%`` in the
    reference for DB-API param safety — Spark has no DB-API params, so
    the escape is intentionally dropped here.
    """
    template = jinja2.Template(sql, undefined=jinja2.StrictUndefined)
    return template.render(**context)
