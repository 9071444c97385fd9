"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query definitions live in neighborly_spark/parity.py (the registry);
this module is a thin adapter over it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neighborly_spark.parity import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact k-NN (euclidean top-10) on sf0.001."""
    return REGISTRY["knn_euclidean"].build(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: pq.build for name, pq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: pq.oracle for name, pq in REGISTRY.items() if pq.oracle is not None}
