"""Normalizer cross-product parity (test/unit/test_normalizer.py:8-217)."""

import pytest

from contessa_spark.normalizer import RuleNormalizer


def test_passthrough_when_normal():
    rules = [{"name": "n", "type": "not_null", "column": "a"}]
    out = RuleNormalizer.normalize(rules)
    assert out == [{"name": "n", "type": "not_null", "column": "a", "time_filter": None}] or out == rules


def test_columns_cross_time_filters():
    rules = [
        {
            "name": "r",
            "type": "not_null",
            "columns": ["a", "b", "c"],
            "separate_time_filters": [{"column": "c"}, {"column": "u"}],
            "condition": "d is TRUE",
        }
    ]
    out = RuleNormalizer.normalize(rules)
    assert len(out) == 6
    assert {(r["column"], r["time_filter"][0]["column"]) for r in out} == {
        (c, t) for c in "abc" for t in "cu"
    }
    assert all(r["condition"] == "d is TRUE" for r in out)
    assert all("columns" not in r and "separate_time_filters" not in r for r in out)


def test_columns_only():
    out = RuleNormalizer.normalize(
        [{"name": "r", "type": "not_null", "columns": ["a", "b"]}]
    )
    assert [r["column"] for r in out] == ["a", "b"]
    assert all(r["time_filter"] is None for r in out)


def test_single_separate_time_filter_rejected():
    with pytest.raises(ValueError):
        RuleNormalizer.normalize(
            [
                {
                    "name": "r",
                    "type": "not_null",
                    "column": "a",
                    "separate_time_filters": [{"column": "c"}],
                }
            ]
        )


def test_string_time_filters_stay_strings():
    out = RuleNormalizer.normalize(
        [
            {
                "name": "r",
                "type": "not_null",
                "columns": ["a"],
                "separate_time_filters": ["created", "updated"],
            }
        ]
    )
    assert [r["time_filter"] for r in out] == ["created", "updated"]
