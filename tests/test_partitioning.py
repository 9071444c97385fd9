"""widen_for_python_stage (round 11): a python-compute stage must get
cluster-wide parallelism even when its input is a narrow (e.g. cached
``limit()``) query batch — and must NOT pay a shuffle when the input is
already wide. Result invariance through the two consumers (hnsw routing,
ivfpq probe assignment) is pinned against the narrow-input plan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators.partitioning import widen_for_python_stage


@pytest.fixture(scope="module")
def narrow_queries(spark):
    """A cached global-limit query table — ONE partition by construction,
    the exact shape of the bench's 100k-query caches."""
    df = (
        spark.range(64)
        .select(
            F.col("id").alias("query_id"),
            F.array(
                (F.col("id") % 7).cast("double"),
                (F.col("id") % 5).cast("double"),
                (F.col("id") % 3).cast("double"),
            ).alias("query_embedding"),
        )
        .limit(48)
        .cache()
    )
    df.count()
    return df


def test_narrow_input_is_widened(spark, narrow_queries):
    assert narrow_queries.rdd.getNumPartitions() == 1
    wide = widen_for_python_stage(narrow_queries)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_wide_input_is_untouched(spark, narrow_queries):
    width = spark.sparkContext.defaultParallelism
    already = narrow_queries.repartition(width + 2, "query_id")
    assert widen_for_python_stage(already) is already  # zero added shuffle


def test_rows_are_invariant(narrow_queries):
    wide = widen_for_python_stage(narrow_queries)
    assert sorted(map(tuple, narrow_queries.collect())) == sorted(
        map(tuple, wide.collect())
    )


def test_hnsw_routing_same_from_narrow_and_wide(spark, narrow_queries):
    """hnsw_route_queries widens internally: assignments from the
    1-partition cache equal assignments from a pre-widened copy, and both
    match the _route driver reference per query."""
    from neighborly_spark.operators.hnsw import _route, hnsw_route_queries

    routing = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0], 2.0),
            (1, [5.0, 5.0, 5.0], 2.5),
            (2, [0.0, 6.0, 0.0], 1.0),
            (3, [6.0, 0.0, 3.0], 1.5),
        ],
        "part_id int, centroid array<double>, radius double",
    )
    rows = routing.collect()

    def key(df):
        out = {}
        for r in df.collect():
            out.setdefault(int(r["query_id"]), []).append(int(r["part_id"]))
        return out

    got = key(hnsw_route_queries(routing, narrow_queries, 2))
    wide = key(
        hnsw_route_queries(
            routing, narrow_queries.repartition(8, "query_id"), 2
        )
    )
    assert got == wide
    for r in narrow_queries.collect():
        q = np.asarray(r["query_embedding"], dtype=np.float64)
        assert got[int(r["query_id"])] == _route(rows, q, 2)


def test_ivfpq_probe_assign_same_from_narrow_and_wide(narrow_queries):
    from neighborly_spark.operators.ivfpq import _probe_assign

    coarse = np.asarray(
        [[0.0, 0.0, 0.0], [4.0, 4.0, 2.0], [1.0, 5.0, 0.0]], dtype=np.float64
    )

    def key(df):
        out = {}
        for r in df.collect():
            out.setdefault(int(r["query_id"]), []).append(int(r["_cell"]))
        return out

    narrow = key(_probe_assign(narrow_queries, coarse, 2))
    wide = key(
        _probe_assign(narrow_queries.repartition(8, "query_id"), coarse, 2)
    )
    assert narrow == wide
    # reference: same squared-distance + stable argsort, driver-side
    for r in narrow_queries.collect():
        q = np.asarray(r["query_embedding"], dtype=np.float64)
        d = ((q[None, :] - coarse) ** 2).sum(-1)
        assert narrow[int(r["query_id"])] == list(
            np.argsort(d, kind="stable")[:2]
        )
