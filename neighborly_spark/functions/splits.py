"""Deterministic dataset splitting / sampling for training pipelines.

randomSplit() is seed-dependent AND partition-order-dependent — rerunning on
a repartitioned table moves rows between splits. Training pipelines need
CONTENT-STABLE assignment: a row's split follows it across reruns, engines,
and layout changes. Standard trick: hash the stable key to a uniform bucket.

Uses the same portable hash32 (md5) as everything else, so split assignment
is reproducible in DuckDB for the oracle, and in any other system that can
md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neighborly_spark.functions.text import hash32, hash32_duckdb_sql

TWO32 = 4294967296.0


def split_assign(key: Column, weights: list[float], labels: list[str] | None = None) -> Column:
    """Stable split label from a key column. weights must sum to ~1."""
    if labels is None:
        labels = [f"split_{i}" for i in range(len(weights))]
    assert len(labels) == len(weights)
    u = hash32(key).cast("double") / F.lit(TWO32)  # uniform [0, 1)
    expr = F.lit(labels[-1])
    acc = 0.0
    bounds = []
    for w in weights[:-1]:
        acc += w
        bounds.append(acc)
    for label, bound in reversed(list(zip(labels[:-1], bounds))):
        expr = F.when(u < bound, F.lit(label)).otherwise(expr)
    return expr


def split_assign_duckdb_sql(key_expr: str, weights: list[float], labels: list[str] | None = None) -> str:
    if labels is None:
        labels = [f"split_{i}" for i in range(len(weights))]
    u = f"(CAST({hash32_duckdb_sql(key_expr)} AS DOUBLE) / {TWO32:.1f})"
    out = f"'{labels[-1]}'"
    acc = 0.0
    bounds = []
    for w in weights[:-1]:
        acc += w
        bounds.append(acc)
    for label, bound in reversed(list(zip(labels[:-1], bounds))):
        out = f"(CASE WHEN {u} < {bound!r} THEN '{label}' ELSE {out} END)"
    return out


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: list[float],
    labels: list[str] | None = None,
    out_col: str = "split",
) -> DataFrame:
    return df.withColumn(out_col, split_assign(F.col(key_col).cast("string"), weights, labels))


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Content-stable sample: keeps a row iff hash(key)/2^32 < fraction.
    Unlike df.sample(), membership survives reruns and repartitioning, and
    the complement (>= fraction) is exactly the rest — disjoint folds for
    free."""
    u = hash32(F.col(key_col).cast("string")).cast("double") / F.lit(TWO32)
    return df.filter(u < fraction)
