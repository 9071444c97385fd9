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


def stratified_sample_exact(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly n rows per stratum (fewer if the stratum is smaller),
    content-stable: rows ranked inside each stratum by (hash32(key), key) —
    the same rows win on every rerun, engine, and layout.

    Class rebalancing for curation pipelines (cap the dominant language /
    source). The window partitions by the stratum key — a keyed shuffle that
    scales with stratum count, NOT a global window; skewed strata sort only
    their own partition's rows.
    """
    from pyspark.sql.window import Window

    key = F.col(key_col).cast("string")
    w = Window.partitionBy(strata_col).orderBy(hash32(key).asc(), key.asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n_per_stratum).drop("_rn")


def stratified_sample_exact_duckdb_sql(
    table: str, strata_col: str, key_col: str, n_per_stratum: int, select_cols: str = "*"
) -> str:
    """DuckDB twin of stratified_sample_exact (same rank key, same rows)."""
    key = f"CAST({key_col} AS VARCHAR)"
    return f"""
SELECT {select_cols} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {strata_col}
    ORDER BY {hash32_duckdb_sql(key)} ASC, {key} ASC
  ) AS _rn FROM {table}
) WHERE _rn <= {n_per_stratum}
""".strip()


def stratified_hash_sample(
    df: DataFrame, strata_col: str, key_col: str, fractions: dict[str, float], default: float = 0.0
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downweight a dominant source to 10%
    while keeping 100% of a rare one), content-stable like hash_sample.
    One scan, no shuffle: the stratum only selects which threshold the
    row's uniform hash is compared against."""
    u = hash32(F.col(key_col).cast("string")).cast("double") / F.lit(TWO32)
    thresh = F.lit(float(default))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum, F.lit(float(frac))).otherwise(thresh)
    return df.filter(u < thresh)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture sampling: select documents so each group contributes
    ~weights[g] * total_tokens tokens — the data-mixing step every
    pretraining run configures (domain weights over web/code/books/...).

    Deterministic and content-stable: within each group, docs rank by
    (hash32(key), key) — the same layout-independent rank the stratified
    sampler uses — and the running token total cuts at the group's budget.
    The cut INCLUDES the first doc that crosses the budget (so a group
    with any data always contributes, and budgets are met, not
    undershot-by-one). Groups missing from `weights` are dropped; a group
    exhausting its data contributes everything it has (under-budget,
    reported by the caller comparing sums — sampling cannot mint data).

    Plan: one window per group partition (rank + running sum), one filter —
    a single shuffle by group; skew follows the group histogram, exactly
    like the sessionization/stratified operators.

    tokens_col: pre-computed token counts; None derives whitespace counts
    from text_col (functions.text.token_count).
    """
    from pyspark.sql.window import Window

    from neighborly_spark.functions.text import token_count

    toks = F.col(tokens_col) if tokens_col else token_count(F.col(text_col))
    key = F.col(key_col).cast("string")
    budget = F.lit(None).cast("double")
    for g, w in sorted(weights.items()):
        budget = F.when(F.col(group_col) == g, F.lit(float(w) * total_tokens)).otherwise(budget)
    w_rank = Window.partitionBy(group_col).orderBy(hash32(key).asc(), key.asc())
    out = (
        df.withColumn("_tok", toks)
        .withColumn("_budget", budget)
        .filter(F.col("_budget").isNotNull())
        .withColumn("_cum", F.sum("_tok").over(w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        # keep docs whose PRECEDING mass is under budget (first crosser kept)
        .filter(F.col("_cum") - F.col("_tok") < F.col("_budget"))
        .drop("_budget")
        .withColumnRenamed("_tok", "n_tokens_sampled")
        .withColumnRenamed("_cum", "cum_tokens")
    )
    return out
