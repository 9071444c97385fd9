"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query definitions live in neighborly_spark/parity.py (the registry);
this module is a thin adapter over it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import independent of
# the caller's working directory / sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from neighborly_spark.parity import REGISTRY  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact k-NN (5-metric labeled top-10 union) on sf0.001."""
    return REGISTRY["knn_five_metrics"].build(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: pq.build for name, pq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: pq.oracle for name, pq in REGISTRY.items() if pq.oracle is not None}
