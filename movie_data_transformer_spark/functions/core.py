"""Reusable relational building blocks (SURVEY.md §7 M3).

These fill the operator categories the reference lacks entirely
(SURVEY.md §2.3: joins, sorts/limits/top-k, windows, grouping sets, set
ops, scalar functions) with built-in Catalyst operators only — no UDFs.

Float discipline: money aggregates go through decimal so results are
exact and order-independent — a distributed sum of doubles is not
deterministic across partitionings, which matters both for oracle
comparison and for reproducibility at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decimal_sum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Exact, order-independent sum: cast each value to decimal first.
    (Row-level double->decimal conversion is deterministic; decimal
    addition is exact, so the shuffle/partitioning cannot change the
    result — unlike sum(double).)"""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})"))
    return out.alias(alias) if alias else out


def money_out(col: Column | str, alias: str | None = None) -> Column:
    """Final-output form of an exact decimal money column: one cast to
    double. Registry results must never surface DecimalType — Spark
    toPandas() yields decimal.Decimal objects ('506627.00') while DuckDB
    .df() yields float64 ('506627.0'), so any stringifying
    canonicalization diverges exactly when the fraction has trailing
    zeros. Both engines' decimal->double casts are correctly rounded
    (probed bit-level vs Python float(Decimal)), so casting the SAME
    exact decimal on both sides is bit-identical. Keep decimal math
    internal; cast only at the final projection."""
    c = F.col(col) if isinstance(col, str) else col
    out = c.cast("double")
    name = alias if alias is not None else (col if isinstance(col, str) else None)
    return out.alias(name) if name else out


def deterministic_avg(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Average as exact-decimal-sum / count, rounded — one FP division on
    exact inputs, so identical on every engine and partitioning."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c), 6
    )
    return out.alias(alias) if alias else out


def top_k_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int, rank_col: str = "rk"
) -> DataFrame:
    """Top-k per group via row_number — one shuffle on the group keys.
    Callers must make `order` a total order (append a unique tiebreaker)
    or results are nondeterministic. At scale this beats a global sort:
    partial top-k runs map-side inside the window's sort, and only group
    partitions shuffle."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running_sum(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    value: Column,
    alias: str = "running_sum",
) -> DataFrame:
    """Cumulative sum with an explicit rows-frame (deterministic given a
    total order)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))
