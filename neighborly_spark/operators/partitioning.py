"""Partitioning helpers for python-compute-bound stages.

Round 11 (guide §2.1/§2.5 — scale-adaptive partitioning): a
vectorized-mapInPandas stage runs at its INPUT's partitioning. That is
the right default at scale (a 100 TB query table arrives as thousands
of splits), but a NARROW input — e.g. a cached ``limit(n)`` query
batch, which is ONE partition by construction (GlobalLimit) — would
serialize the whole python stage onto a single worker while the rest of
the cluster idles. The in-plan forms these stages replaced paid an
Exchange that happened to re-distribute the rows; the mapInPandas forms
must ask for their width explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen_for_python_stage(df: DataFrame, key: str = "query_id") -> DataFrame:
    """Hash-repartition ``df`` on ``key`` up to defaultParallelism when it
    has fewer partitions; return it UNCHANGED (zero added shuffle) when it
    is already at least that wide.

    The repartition moves only the stage's input columns (for a 100k x
    64-dim query batch: ~50 MB, trivially parallel) — orders of magnitude
    cheaper than running the python compute single-task. Hash on the key
    column rather than round-robin: round-robin repartition pays a local
    sort for retry determinism. Results are invariant: every consumer is
    a per-row function followed by its own key repartition/aggregation.
    """
    width = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width, F.col(key))
