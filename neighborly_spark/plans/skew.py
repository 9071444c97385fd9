"""Skew mitigation helpers.

AQE's skew-join handling covers the join side (enabled in session.py); what
it does NOT cover is a skewed AGGREGATION key whose single reducer becomes
the straggler (classic: one mega-document's shingle, one hot tag). The
standard fix is salting: split each key into `salt` sub-keys, aggregate
partially, then merge the partials. Works for any algebraic aggregate
(sum/count/min/max + anything with a merge function).

At 100 TB this is the difference between a 5-minute stage and a 5-hour
straggler when key frequencies are Zipfian — which shingle/tag/user keys
always are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation over salted keys.

    partial_aggs: aggregates over (key, salt) groups, each aliased.
    merge_aggs: aggregates over the partial columns that merge them, each
    aliased to the final name.

    Example — skew-proof count + sum:
        salted_agg(df, ["k"],
                   [F.count("*").alias("c"), F.sum("v").alias("s")],
                   [F.sum("c").alias("n"), F.sum("s").alias("total")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def salted_count(df: DataFrame, key_cols: list[str], salt: int = 16, out_col: str = "n") -> DataFrame:
    """Skew-proof count per key."""
    return salted_agg(
        df,
        key_cols,
        [F.count(F.lit(1)).alias("_pc")],
        [F.sum("_pc").alias(out_col)],
        salt,
    )
