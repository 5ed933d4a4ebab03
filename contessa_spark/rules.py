"""The rule DSL: named, typed predicates over one table.

Reference semantics: contessa/rules.py + contessa/base_rules.py.
Every reference rule renders a SQL string per rule and streams rows back
through a Python loop (contessa/rules.py:61-102). Here each rule instead
compiles to a ``pyspark.sql.Column`` boolean predicate; the runner
evaluates **all** rules over a table in one scan (see compiler.py).

Exact-parity requirements carried over:

* three-valued counting (contessa/rules.py:84-93): a row where the
  predicate is NULL counts in ``total`` but in neither ``passed`` nor
  ``failed``;
* ``value`` is spliced as raw SQL text (contessa/rules.py:119-124) —
  it may be a literal, another column name, or a SQL expression
  (``now()``), so we compile it with ``F.expr``;
* ``not``/``eq`` are null-safe ``IS [NOT] DISTINCT FROM``
  (contessa/rules.py:203-223, 272-292) → ``eqNullSafe``;
* ``only_failures_mode`` (contessa/rules.py:80-82): the rule query
  yields only failing rows; total_records is reported as 0;
* description is mandatory for one-column rules (contessa/rules.py:109-110).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from contessa_spark.time_filter import TimeFilter, parse_time_filter

# public rule-type constants (contessa/rules.py:295-303)
NOT_NULL = "not_null"
NOT_COLUMN = "not_column"
GT = "gt"
GTE = "gte"
NOT = "not"
SQL = "sql"
LT = "lt"
LTE = "lte"
EQ = "eq"


def _value_expr(value: Any) -> Column:
    """Compile a rule ``value`` operand.

    The reference splices the value into SQL text verbatim
    (contessa/rules.py:119-124; docs/rules.rst:30-32), so a string is a
    SQL fragment (column name / expression / quoted literal), and
    python literals are literals.
    """
    if isinstance(value, str):
        return F.expr(value)
    if isinstance(value, (_dt.datetime, _dt.date)):
        return F.lit(value)
    return F.lit(value)


class Rule:
    """Base rule (contessa/base_rules.py:6-53)."""

    def __init__(
        self,
        name: str,
        type: str,
        description: Optional[str] = None,
        time_filter: Union[None, str, List[Dict], TimeFilter] = None,
        condition: Optional[str] = None,
    ):
        self.name = name
        self.type = type
        self.description = description
        self.time_filter = parse_time_filter(time_filter)
        self.condition = condition

    @property
    def attribute(self) -> Optional[str]:
        return None

    def __str__(self) -> str:
        tf = f" - {self.time_filter}" if self.time_filter else ""
        return f"Rule {self.name} of type {self.type}{tf}"


class OneColumnRule(Rule):
    """Rule over one column, optional operand (contessa/rules.py:105-128)."""

    def __init__(
        self,
        name: str,
        type: str,
        column: str,
        description: str,
        only_failures_mode: bool = False,
        **kwargs: Any,
    ):
        if not description:
            raise TypeError("Description is mandatory")
        super().__init__(name, type, description=description, **kwargs)
        self.column = column
        self.only_failures_mode = only_failures_mode

    @property
    def attribute(self) -> Optional[str]:
        return self.column

    def predicate(self) -> Column:
        """Boolean (nullable) Column: True=passed, False=failed, NULL=neither."""
        raise NotImplementedError

    def __str__(self) -> str:
        tf = f"- {self.time_filter}" if self.time_filter else ""
        return f"Rule {self.name} - {self.type} - {self.attribute} {tf}"


class NotNullRule(OneColumnRule):
    """contessa/rules.py:141-154 — ``col IS NOT NULL`` (never yields NULL)."""

    def __init__(self, name, type, column, description="True when data is null.", **kw):
        super().__init__(name, type, column, description=description, **kw)

    def predicate(self) -> Column:
        return F.col(self.column).isNotNull()


class _ComparisonRule(OneColumnRule):
    default_description = ""

    def __init__(self, name, type, column, value, description=None, **kw):
        # explicit "" still raises TypeError (contessa/rules.py:109-110);
        # only omission falls back to the class default
        if description is None:
            description = self.default_description
        super().__init__(name, type, column, description=description, **kw)
        self.value = value

    def _operand(self) -> Column:
        return _value_expr(self.value)


class GtRule(_ComparisonRule):
    """contessa/rules.py:157-177 — ``col > value`` (NULL-propagating)."""

    default_description = "True when data is greater than value."

    def predicate(self) -> Column:
        return F.col(self.column) > self._operand()


class GteRule(_ComparisonRule):
    """contessa/rules.py:180-200 — ``col >= value``."""

    default_description = "True when data is greater or even to value."

    def predicate(self) -> Column:
        return F.col(self.column) >= self._operand()


class LtRule(_ComparisonRule):
    """contessa/rules.py:226-246 — ``col < value``."""

    default_description = "True when data is lower than value."

    def predicate(self) -> Column:
        return F.col(self.column) < self._operand()


class LteRule(_ComparisonRule):
    """contessa/rules.py:249-269 — ``col <= value``."""

    default_description = "True when data is lower or even to value."

    def predicate(self) -> Column:
        return F.col(self.column) <= self._operand()


class NotRule(_ComparisonRule):
    """contessa/rules.py:203-223 — ``col IS DISTINCT FROM value`` (null-safe ≠)."""

    default_description = "True when data is distinct from value."

    def predicate(self) -> Column:
        return ~F.col(self.column).eqNullSafe(self._operand())


class EqRule(_ComparisonRule):
    """contessa/rules.py:272-292 — ``col IS NOT DISTINCT FROM value`` (null-safe =)."""

    default_description = "True when data is not distinct from value."

    def predicate(self) -> Column:
        return F.col(self.column).eqNullSafe(self._operand())


class CustomSqlRule(OneColumnRule):
    """Arbitrary user SQL whose FIRST column is boolean validity
    (contessa/rules.py:131-138). Rendered with Jinja against the run
    context (``table_fullname``, ``task_ts``, ``target_column``, user
    keys) and executed via ``spark.sql``; the composed WHERE (time
    filter + condition) is appended exactly as the reference does
    (contessa/rules.py:41-59), so the user must leave room for it.
    """

    def __init__(self, name, type, column, sql, description, **kw):
        super().__init__(name, type, column, description=description, **kw)
        self.custom_sql = sql

    def evaluate(self, spark, context: Dict[str, Any]) -> DataFrame:
        """Render + run; returns the raw DataFrame (first col = validity)."""
        from contessa_spark.utils import render_jinja_sql

        ctx = dict(context)
        ctx.setdefault("target_column", self.column)
        if hasattr(self, "value"):
            ctx.setdefault("value", self.value)

        where = ""
        tf_sql = (
            self.time_filter.sql_text(context["task_ts"]) if self.time_filter else ""
        )
        cond = self.condition or ""
        if tf_sql and cond:
            where = f"WHERE  {tf_sql} AND {cond}"
        elif tf_sql or cond:
            where = f"WHERE  {tf_sql} {cond}".rstrip()
        final_sql = f"{self.custom_sql} {where}" if where else self.custom_sql
        return spark.sql(render_jinja_sql(final_sql, ctx))


class ExprRule(OneColumnRule):
    """Arbitrary boolean SQL *expression* (not a full query) evaluated
    per row — the Spark-native analogue of subclassing ``SqlRule`` with
    a custom ``sql`` property (the reference's documented extension
    point, test/integration/test_rules.py:299-344). Unlike
    CustomSqlRule it participates in the single-scan multi-rule agg.
    """

    def __init__(self, name, type, column, expression, description, **kw):
        super().__init__(name, type, column, description=description, **kw)
        self.expression = expression

    def predicate(self) -> Column:
        return F.expr(self.expression)


# registry (contessa/rules.py:305-324)
RULES = {
    NOT_NULL: NotNullRule,
    GT: GtRule,
    GTE: GteRule,
    NOT: NotRule,
    LT: LtRule,
    LTE: LteRule,
    EQ: EqRule,
    SQL: CustomSqlRule,
    "expr": ExprRule,
}


def get_rule_cls(type_key: str):
    """Registry lookup (contessa/rules.py:317-324) — raises ValueError
    with the reference's message shape, including the available-rules
    list (genuinely useful at the call site)."""
    try:
        return RULES[type_key]
    except KeyError:
        raise ValueError(
            f"I dont know this kind of rule - '{type_key}'. "
            f"Possible rules are - {list(RULES)}"
        ) from None
