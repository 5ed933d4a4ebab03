"""Rule-semantics parity tests.

Golden inputs/outputs from the reference's integration suite
(test/integration/test_rules.py:20-76 and FIXTURES.md F1-F3): exact
(total, failed, passed) per rule over the 5-row tmp_table, including
three-valued NULL counting.
"""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from contessa_spark.compiler import run_column_rules
from contessa_spark.rules import get_rule_cls

TASK_TS = datetime(2018, 9, 12, 12, 0, 0)

TMP_SCHEMA = T.StructType(
    [
        T.StructField("value", T.IntegerType(), True),
        T.StructField("value2", T.IntegerType(), True),
    ]
)
TMP_ROWS = [(1, 2), (4, 5), (5, 3), (None, None), (4, 11)]


@pytest.fixture(scope="module")
def tmp_table(spark):
    return spark.createDataFrame(TMP_ROWS, schema=TMP_SCHEMA)


# (rule_def, expected total, failed, passed) — test/integration/test_rules.py:20-51
CASES = [
    ({"name": "gt", "type": "gt", "column": "value", "value": "value2"}, 5, 3, 1),
    ({"name": "nn", "type": "not_null", "column": "value"}, 5, 1, 4),
    ({"name": "gte", "type": "gte", "column": "value", "value": 4}, 5, 1, 3),
    ({"name": "not", "type": "not", "column": "value", "value": 4}, 5, 2, 3),
    ({"name": "lt", "type": "lt", "column": "value", "value": 4}, 5, 3, 1),
    ({"name": "lte", "type": "lte", "column": "value", "value": 4}, 5, 1, 3),
    ({"name": "eq", "type": "eq", "column": "value", "value": 4}, 5, 3, 2),
]


@pytest.mark.parametrize("rule_def,total,failed,passed", CASES)
def test_rule_counts(tmp_table, rule_def, total, failed, passed):
    rule = get_rule_cls(rule_def["type"])(**rule_def)
    (res,) = run_column_rules(tmp_table, [rule], TASK_TS, collect_examples=0)
    assert (res.total_records, res.failed, res.passed) == (total, failed, passed)


def test_all_rules_single_pass(tmp_table):
    """All 7 rules in one agg — results identical to per-rule runs."""
    rules = [get_rule_cls(d["type"])(**d) for d, *_ in CASES]
    results = run_column_rules(tmp_table, rules, TASK_TS, collect_examples=0)
    for (_, total, failed, passed), res in zip(CASES, results):
        assert (res.total_records, res.failed, res.passed) == (total, failed, passed)


def test_column_vs_column_null_operand(spark):
    """FIXTURES.md F3 / test_rules.py:147-193: value may be another column;
    NULL operand ⇒ NULL predicate for gt (neither passed nor failed) but
    counted for null-safe eq/not."""
    df = spark.createDataFrame(
        [(1, 2, 1, 1), (1, 1, 1, None), (1, 1, 1, 1)],
        schema="value1 int, value2 int, value3 int, value4 int",
    )
    gt = get_rule_cls("gt")(name="g", type="gt", column="value2", value="value1")
    (res,) = run_column_rules(df, [gt], TASK_TS, collect_examples=0)
    assert (res.total_records, res.failed, res.passed) == (3, 2, 1)

    eq = get_rule_cls("eq")(name="e", type="eq", column="value4", value="value3")
    (res,) = run_column_rules(df, [eq], TASK_TS, collect_examples=0)
    # null-safe: NULL vs 1 is a definite False
    assert (res.total_records, res.failed, res.passed) == (3, 1, 2)


def test_value_as_sql_expression(spark):
    """test_rules.py:113-117 — value can be a SQL expression like now()."""
    df = spark.createDataFrame(
        [(datetime(2000, 1, 1),), (datetime(2999, 1, 1),), (None,)], schema="ts timestamp"
    )
    lt = get_rule_cls("lt")(name="l", type="lt", column="ts", value="now()")
    (res,) = run_column_rules(df, [lt], TASK_TS, collect_examples=0)
    assert (res.total_records, res.failed, res.passed) == (3, 1, 1)


def test_condition_filter(spark):
    """FIXTURES.md F2 / test_rules.py:79-144 — condition narrows scope."""
    df = spark.createDataFrame(
        [
            (1, True, None),
            (4, True, None),
            (5, False, None),
            (None, False, None),
            (4, False, datetime(2019, 10, 2, 13, 30)),
        ],
        schema="value int, conditional boolean, date timestamp",
    )
    gt = get_rule_cls("gt")(
        name="g", type="gt", column="value", value=2, condition="conditional is TRUE"
    )
    (res,) = run_column_rules(df, [gt], TASK_TS, collect_examples=0)
    assert (res.total_records, res.failed, res.passed) == (2, 1, 1)


def test_time_filter_scopes_rows(spark):
    """30-day window ending at task_ts (contessa/time_filter.py:83-102)."""
    df = spark.createDataFrame(
        [
            (1, datetime(2018, 9, 12, 11, 50)),
            (2, datetime(2018, 1, 12, 15, 50)),  # outside window
            (3, datetime(2018, 9, 11, 11, 50)),
        ],
        schema="value int, created_at timestamp",
    )
    nn = get_rule_cls("not_null")(
        name="n", type="not_null", column="value", time_filter="created_at"
    )
    (res,) = run_column_rules(df, [nn], TASK_TS, collect_examples=0)
    assert (res.total_records, res.failed, res.passed) == (2, 0, 2)


def test_only_failures_mode(tmp_table):
    """contessa/rules.py:80-82: total_records=0, failures counted."""
    nn = get_rule_cls("not_null")(
        name="n", type="not_null", column="value", only_failures_mode=True
    )
    (res,) = run_column_rules(tmp_table, [nn], TASK_TS, collect_examples=5)
    assert (res.total_records, res.failed, res.passed) == (0, 1, 0)
    assert res.failed_example == [(None,)]


def test_failed_examples_limited(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], schema="value int")
    lt = get_rule_cls("lt")(name="l", type="lt", column="value", value=0)
    (res,) = run_column_rules(df, [lt], TASK_TS, collect_examples=10)
    assert res.failed == 100
    assert len(res.failed_example) == 10


def test_description_mandatory():
    with pytest.raises(TypeError):
        get_rule_cls("gt")(name="g", type="gt", column="c", value=1, description="")


def test_unknown_rule_type():
    # ValueError, matching the reference (contessa/rules.py:317-324)
    with pytest.raises(ValueError):
        get_rule_cls("nope")
