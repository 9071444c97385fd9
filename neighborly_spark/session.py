"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the configs below are the ones that also
matter on a real cluster (AQE, Arrow, sane shuffle partitioning). Cluster
deployments would add executor sizing externally — nothing here hardcodes
single-node assumptions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "neighborly-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    - AQE on: runtime coalescing + skew-join handling — at 100 TB the static
      shuffle-partition count is always wrong for some stage; AQE fixes it.
    - Arrow on: every pandas-UDF boundary is Arrow-batched.
    - shuffle.partitions defaults to the core count locally; a cluster job
      would set it ~2-3x total cores (AQE coalesces the excess).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # timestamp math (as-of/interval/session ops) assumes epoch-preserving
        # TIMESTAMP_NTZ <-> TIMESTAMP casts; pin the session tz so the parity
        # contract doesn't depend on the host's zone
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def local_relation_queries(spark: SparkSession, queries, elem_type: str = "double"):
    """(query_id, query_embedding) DataFrame as a JVM LocalRelation
    (VALUES clause) — NOT createDataFrame(list), which builds a
    python-RDD-backed plan whose every scan round-trips a python worker
    (measured ~4 s/query on serving paths; a crossJoin of two such frames
    even compiles to a defaultParallelism^2-task CartesianProduct).
    D-suffixed literals pin DOUBLE elements (bare decimals parse as
    DECIMAL); ``elem_type='float'`` casts the array for float32 consumers.
    Non-finite values raise — their SQL literals don't exist, and a NaN
    query is undefined in every consumer anyway."""
    import math

    queries = list(queries)
    if not queries:
        # 'FROM VALUES ' with zero rows is a ParseException; preserve the old
        # createDataFrame behavior of an empty frame with the right schema.
        return spark.sql(
            "SELECT cast(null as bigint) query_id, "
            f"cast(null as array<{elem_type}>) query_embedding WHERE false"
        )

    rows = []
    for qid, vec in queries:
        if any(not math.isfinite(float(v)) for v in vec):
            raise ValueError("query vectors contain NaN/Inf — distances would be undefined")
        vals = ", ".join(repr(float(v)) + "D" for v in vec)
        rows.append(f"({int(qid)}, array({vals}))")
    emb = "col2" if elem_type == "double" else f"cast(col2 as array<{elem_type}>)"
    return spark.sql(
        f"SELECT cast(col1 as bigint) query_id, {emb} query_embedding "
        f"FROM VALUES {', '.join(rows)}"
    )
