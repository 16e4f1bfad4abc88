"""Floating-point determinism helpers (SURVEY §2.0 C3, refined in build).

Cross-engine FP rules established by the b1 rounding-boundary failure:

- **Per-row double arithmetic** (+,-,*,/ of the same doubles) is IEEE-754
  deterministic and bit-identical across Spark and DuckDB → emit RAW, never
  round (round() itself is the divergence: Spark rounds via BigDecimal of the
  shortest decimal repr, DuckDB via scaled-float nearbyint — they disagree
  near .00005 boundaries).
- **Money aggregates**: corpus money columns are exact ≤2dp decimals stored
  as double (FIXTURES.md). Cast to DECIMAL(9,2) BEFORE aggregating → exact
  decimal arithmetic in both engines → identical result → cast to DOUBLE at
  the end (nearest-double of the same exact decimal is identical).
- **Inherently inexact outputs** (avg ratios, stddev/corr, transcendentals):
  round(x, 4) both sides; residual boundary risk ~1e-8 per value (error is
  ~ulp-scale, grid spacing 1e-4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 9,2 keeps Spark's decimal-arithmetic precision growth within 38 digits even
# for triple products: (9,2)*(5,2)->(15,4), *(5,2)->(21,6), sum->(31,6).
MONEY = "decimal(9,2)"
SMALL = "decimal(4,2)"  # discounts/taxes in [0, 1)


def m(col: str | Column) -> Column:
    """Money column → exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def s(col: str | Column) -> Column:
    """Small-ratio column (discount/tax) → exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(SMALL)


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal sum emitted as double."""
    return F.sum(expr).cast("double").alias(alias)
