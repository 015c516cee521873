"""Exact-arithmetic conventions for oracle-comparable floating point.

Problem: double arithmetic is engine-order-dependent (parallel partial sums)
and `round(double)` semantics differ between Spark (Java shortest-decimal-
representation + HALF_UP) and DuckDB (C-style on the raw binary).  Naively
rounding double aggregates therefore flaps on half-boundaries — observed on
this dataset: round(x, 2) disagreed on 21/60k lineitem rows at sf0.01.

Solution: the driver's numeric columns are exact 4-decimal values (verified
for every money/qty/discount column at sf0.01), so we do all value-changing
arithmetic in DECIMAL — exact, associative, engine-independent — and only
cast the final already-rounded result to DOUBLE.  Raw column passthrough
needs no treatment (same parquet bits on both sides).  Where doubles are
unavoidable (avg division, percentile interpolation), both engines are given
the *identical* operand values and the *identical* operation sequence, so
IEEE754 determinism yields bit-equal results.

The same conventions apply at 100 TB: decimal sums are exact at any
parallelism, so results don't drift with partitioning/AQE decisions.

Each Spark helper documents its DuckDB-side SQL twin; oracle strings in the
operator modules follow these shapes exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Input money/quantity columns: < 1e8 absolute, 4 decimals.
DEC = "decimal(12,4)"
# Factor columns like (1 - l_discount), (1 + l_tax): < 100, 4 decimals.
DEC_FACTOR = "decimal(6,4)"


def dec(col: Column | str) -> Column:
    """Exact 4-decimal view of a raw double column.
    DuckDB twin: CAST(col AS DECIMAL(12,4))"""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dec_factor(col: Column) -> Column:
    """Exact view of a small factor expression (e.g. 1 - l_discount).
    DuckDB twin: CAST(expr AS DECIMAL(6,4))"""
    return col.cast(DEC_FACTOR)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, rounded in decimal domain, output as double.
    DuckDB twin: CAST(round(sum(CAST(col AS DECIMAL(12,4))), scale) AS DOUBLE)"""
    return F.round(F.sum(dec(col)), scale).cast("double")


def dsum_expr(expr: Column, scale: int = 2) -> Column:
    """Same for an already-decimal product expression.
    DuckDB twin: CAST(round(sum(<decimal expr>), scale) AS DOUBLE)"""
    return F.round(F.sum(expr), scale).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average: identical double division in both engines.
    try_divide so an EMPTY input's global aggregate yields NULL like the
    oracle's x/0 instead of an ANSI DIVIDE_BY_ZERO abort (r10 review —
    the tests/test_empty_inputs.py degenerate-input bar).
    DuckDB twin: CAST(sum(CAST(col AS DECIMAL(12,4))) AS DOUBLE) / count(*)"""
    return F.try_divide(F.sum(dec(col)).cast("double"), F.count(F.lit(1)))


def cents(col: Column | str, scale: int = 4) -> Column:
    """Snap a 4-decimal double to an exact integer (x * 10^scale).  Both
    engines floor the same double product, so the result is identical;
    downstream order statistics then interpolate over exact integers.
    DuckDB twin: floor(col * 10000 + 0.5)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10 ** scale) + F.lit(0.5))
