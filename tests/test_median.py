"""operators/frequency.exact_median — edge cases the d31 oracle run
cannot reach: odd/even n, all-duplicate columns, duplicate mass at the
median, and the bracket-miss guard actually firing when the bracket is
wrong (injected via the `bracket` override)."""

from __future__ import annotations

import statistics

import pytest

from scopus_spark.operators.frequency import exact_median


def _median_of(spark, vals, **kw):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    row = exact_median(df, "v", **kw).collect()[0]
    return row.n_rows, row.median


def test_odd_and_even_n(spark):
    odd = [5.0, 1.0, 9.0, 3.0, 7.0]
    even = [4.0, 1.0, 3.0, 2.0]
    assert _median_of(spark, odd) == (5, statistics.median(odd))
    assert _median_of(spark, even) == (4, statistics.median(even))


def test_all_duplicates_degenerate_bracket(spark):
    vals = [2.5] * 101
    assert _median_of(spark, vals) == (101, 2.5)


def test_duplicate_mass_at_median(spark):
    vals = [1.0] * 40 + [2.0] * 40 + [3.0] * 40
    n, med = _median_of(spark, vals)
    assert (n, med) == (120, statistics.median(vals))


def test_bracket_miss_guard_fires(spark):
    """A bracket below all the data leaves the target ranks uncovered —
    the operator must refuse loudly, never return a wrong value."""
    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    with pytest.raises(RuntimeError, match="bracket missed"):
        _median_of(spark, vals, bracket=(0.0, 1.0))


def test_empty_input_rejected(spark):
    df = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError):
        exact_median(df, "v")
