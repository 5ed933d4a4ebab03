"""Time-filter DSL → Spark Column predicates.

Reference semantics: contessa/time_filter.py:7-102 —
``TimeFilterColumn(column, since, until, since_inclusive=True,
until_inclusive=False)`` composes ``(col >= since AND col < until)``;
``TimeFilter`` joins column windows with an AND/OR conjunction;
``parse_time_filter`` accepts None / TimeFilter / "colname" (30-day
window ending now) / list of ``{"column": ..., "days": ...}`` dicts.
``now`` is pinned to the run context's ``task_ts``
(contessa/executor.py:28-39), which makes renders deterministic.

Spark-first: instead of rendering SQL text we build a
``pyspark.sql.Column`` boolean; on a table partitioned by
``days(warc_ts)`` the same predicate gives partition pruning for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from enum import Enum
from functools import reduce
from operator import and_, or_
from typing import Dict, List, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

TimeLike = Union[timedelta, datetime, str]

DEFAULT_SINCE_DAYS = 30  # contessa/time_filter.py:84


def _resolve(time: TimeLike, now: datetime) -> datetime:
    if isinstance(time, str):
        if time != "now":
            raise ValueError("'now' is the only allowed string value")
        return now
    if isinstance(time, timedelta):
        return now - time
    return time


@dataclass
class TimeFilterColumn:
    """One column's time window; at least one of since/until must be set."""

    column: str
    since: Optional[TimeLike] = None
    since_inclusive: bool = True
    until: Optional[TimeLike] = None
    until_inclusive: bool = False

    def predicate(self, now: datetime) -> Column:
        if self.since is None and self.until is None:
            raise ValueError("at least one of 'since' or 'until' must be set")
        parts: List[Column] = []
        col = F.col(self.column)
        if self.since is not None:
            bound = F.lit(_resolve(self.since, now))
            parts.append(col >= bound if self.since_inclusive else col > bound)
        if self.until is not None:
            bound = F.lit(_resolve(self.until, now))
            parts.append(col <= bound if self.until_inclusive else col < bound)
        return reduce(and_, parts)

    def sql_text(self, now: datetime) -> str:
        """Spark-SQL text form (for CustomSqlRule WHERE composition).

        Mirrors contessa/time_filter.py:15-30 but emits Spark
        ``TIMESTAMP '...'`` literals instead of Postgres casts.
        """
        parts = []
        if self.since is not None:
            op = ">=" if self.since_inclusive else ">"
            ts = _resolve(self.since, now).strftime("%Y-%m-%d %H:%M:%S")
            parts.append(f"{self.column} {op} TIMESTAMP '{ts}'")
        if self.until is not None:
            op = "<=" if self.until_inclusive else "<"
            ts = _resolve(self.until, now).strftime("%Y-%m-%d %H:%M:%S")
            parts.append(f"{self.column} {op} TIMESTAMP '{ts}'")
        return "(" + " AND ".join(parts) + ")"

    def __str__(self) -> str:
        # contessa/time_filter.py:42-52 — rendered into the persisted
        # `time_filter` result column, so keep the same shape.
        if self.since is not None and self.until is not None:
            return f"{self.column} between {self.since} and {self.until}"
        if self.since is not None:
            return f"{self.column} > {self.since}"
        return f"{self.column} < {self.until}"


class TimeFilterConjunction(Enum):
    AND = "AND"
    OR = "OR"


@dataclass
class TimeFilter:
    """Join of column windows (contessa/time_filter.py:55-79).

    Default conjunction is OR, matching the reference.
    ``now`` defaults to evaluation-time injection by the runner (task_ts).
    """

    columns: List[TimeFilterColumn] = field(default_factory=list)
    conjunction: TimeFilterConjunction = TimeFilterConjunction.OR
    now: Optional[datetime] = None

    def predicate(self, now: Optional[datetime] = None) -> Column:
        moment = now or self.now
        if moment is None:
            raise ValueError("TimeFilter needs a 'now' (task_ts) to evaluate")
        op = and_ if self.conjunction == TimeFilterConjunction.AND else or_
        return reduce(op, (c.predicate(moment) for c in self.columns))

    def sql_text(self, now: Optional[datetime] = None) -> str:
        """SQL text form (contessa/time_filter.py:76-79)."""
        moment = now or self.now
        if moment is None:
            raise ValueError("TimeFilter needs a 'now' (task_ts) to render")
        sep = f" {self.conjunction.value} "
        return sep.join(c.sql_text(moment) for c in self.columns)

    def __str__(self) -> str:
        sep = f" {self.conjunction.value.lower()} "
        return sep.join(str(c) for c in self.columns)


def parse_time_filter(
    time_filter: Union[None, str, List[Dict], TimeFilter],
) -> Optional[TimeFilter]:
    """Back-compat parse (contessa/time_filter.py:83-102)."""
    if time_filter is None or isinstance(time_filter, TimeFilter):
        return time_filter
    default_since = timedelta(days=DEFAULT_SINCE_DAYS)
    if isinstance(time_filter, str):
        return TimeFilter(
            columns=[TimeFilterColumn(time_filter, since=default_since, until="now")]
        )
    if isinstance(time_filter, list):
        return TimeFilter(
            columns=[
                TimeFilterColumn(
                    d["column"],
                    since=timedelta(days=d.get("days", DEFAULT_SINCE_DAYS)),
                    until="now",
                )
                for d in time_filter
            ]
        )
    raise ValueError(f"unsupported time_filter: {time_filter!r}")
