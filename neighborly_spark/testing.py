"""Deterministic synthetic fixtures mirroring FIXTURES.md instances.

The reference's benchmark datasets are seed-42 uniform [-1, 1] vectors
(Tests/HNSWBenchmarkTests.cs:33-49); these builders reproduce those shapes
(vectors_small: 1000 x 128, vectors_medium: 5000 x 256) with NumPy's seeded
generator — deterministic across runs, not bit-matched to .NET Random
(SURVEY §7.3: bit-identical cross-runtime RNG is impossible; recall-based
acceptance doesn't need it).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def uniform_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """n vectors of dim floats uniform in [-1, 1], ids 'vector_{i}'
    (the reference's naming, Tests/HNSWBenchmarkTests.cs:45)."""
    rng = np.random.default_rng(seed)
    mat = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    rows = [(f"vector_{i}", mat[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "id string, embedding array<float>")
    if partitions:
        df = df.repartition(partitions)
    return df


def uniform_queries(n: int, dim: int, seed: int = 43) -> list[list[float]]:
    """Query vectors drawn from a different seed so queries != data
    (FIXTURES.md §3)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32).tolist()
