"""check_expectations: exact metrics on a crafted table, gate raising
behavior, and edge semantics (empty table, all-null columns)."""

import pytest

from chronoxtract_spark.operators.expectations import (
    check_expectations,
    expect_or_raise,
)

ROWS = [
    # id, k,    v,     cat
    (1, "a", 5.0, "x"),
    (2, "b", 15.0, "y"),
    (3, None, 7.0, "x"),
    (4, "d", None, "z"),
    (4, "e", 2.0, "x"),  # duplicate id
    (6, "f", -1.0, None),
]
SCHEMA = "id long, k string, v double, cat string"


def _res(spark, rules, rows=ROWS):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["rule"]: r for r in check_expectations(df, rules).collect()}


def test_metrics_exact(spark):
    got = _res(spark, [
        {"type": "min_rows", "n": 5},
        {"type": "not_null", "col": "k", "min_frac": 0.9},
        {"type": "unique", "cols": ["id"], "min_frac": 1.0},
        {"type": "in_range", "col": "v", "lo": 0, "hi": 10, "min_frac": 0.5},
        {"type": "accepted_values", "col": "cat", "values": ["x", "y"],
         "min_frac": 0.8},
        {"type": "matches", "col": "k", "pattern": "^[a-c]$",
         "min_frac": 0.3},
    ])
    assert got["min_rows(5)"]["metric"] == 6.0
    assert got["min_rows(5)"]["passed"]
    # 5 of 6 non-null
    assert got["not_null(k)"]["metric"] == round(5 / 6, 6)
    assert not got["not_null(k)"]["passed"]  # 0.8333 < 0.9
    # ids: 1,2,3,6 unique; 4 appears twice -> 4 of 6 rows unique
    assert got["unique(id)"]["metric"] == round(4 / 6, 6)
    assert not got["unique(id)"]["passed"]
    # non-null v: 5 values; in [0,10]: 5.0, 7.0, 2.0 -> 3/5
    assert got["in_range(v,0,10)"]["metric"] == 0.6
    assert got["in_range(v,0,10)"]["passed"]
    # non-null cat: 5; in {x,y}: 4 -> 0.8
    assert got["accepted_values(cat)"]["metric"] == 0.8
    assert got["accepted_values(cat)"]["passed"]
    # non-null k: 5; matching ^[a-c]$: a, b -> 0.4
    assert got["matches(k)"]["metric"] == 0.4
    assert got["matches(k)"]["passed"]


def test_gate_raises_listing_failures(spark):
    df_rules = [
        {"type": "unique", "cols": ["id"], "min_frac": 1.0},
        {"type": "min_rows", "n": 100},
        {"type": "not_null", "col": "v", "min_frac": 0.5},
    ]
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError) as e:
        expect_or_raise(df, df_rules)
    msg = str(e.value)
    assert "unique(id)" in msg and "min_rows(100)" in msg
    assert "not_null(v)" not in msg  # that one passes (5/6 >= 0.5)
    # passing contract returns the frame
    ok = expect_or_raise(df, [{"type": "min_rows", "n": 2}])
    assert ok.collect()[0]["passed"]


def test_empty_and_allnull_edges(spark):
    got = _res(spark, [
        {"type": "min_rows", "n": 1},
        {"type": "not_null", "col": "k", "min_frac": 1.0},
        {"type": "in_range", "col": "v", "lo": 0, "hi": 1, "min_frac": 1.0},
    ], rows=[])
    assert not got["min_rows(1)"]["passed"]
    # vacuous truth on empty: fractions default 1.0 (documented)
    assert got["not_null(k)"]["metric"] == 1.0
    assert got["in_range(v,0,1)"]["metric"] == 1.0
    # all-null value column: non-null basis is empty -> vacuous 1.0
    rows = [(1, None, None, None), (2, None, None, None)]
    got2 = _res(spark, [
        {"type": "in_range", "col": "v", "lo": 0, "hi": 1, "min_frac": 1.0},
        {"type": "not_null", "col": "v", "min_frac": 0.5},
    ], rows=rows)
    assert got2["in_range(v,0,1)"]["metric"] == 1.0
    assert got2["not_null(v)"]["metric"] == 0.0
