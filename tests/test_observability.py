"""Observability surface (§2.10): counters/spans mirror the reference's
OTEL instruments; sql_metrics reads Spark-native executed-plan numbers."""

from __future__ import annotations

from pyspark.sql import functions as F

from neighborly_spark.observability import Metrics, sql_metrics
from neighborly_spark.search_service import SearchService

SF = "/root/testdata/sf0.001"


def test_metrics_counters_spans_and_instrumentation(spark):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed("vec_id", "id")
    )
    q = emb.filter(F.col("id") == 0).select("embedding").collect()[0].embedding
    m = Metrics()
    svc = SearchService(emb, dim=64)
    m.instrument(svc)
    svc.search(query_vec=list(q), k=5).collect()
    svc.search(query_vec=list(q), k=5, method="linear").collect()
    svc.range_search(list(q), radius=1.0).collect()
    snap = m.snapshot()
    assert snap["counters"]["search.count"] == 2
    assert snap["counters"]["range_search.count"] == 1
    assert snap["latency"]["search.latency"]["count"] == 2
    assert snap["latency"]["search.latency"]["max_sec"] > 0


def test_sql_metrics_reads_executed_plan(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = emb.filter(F.col("vec_id") < 100).select("vec_id")
    df.collect()
    metrics = sql_metrics(df)
    # some node reports output rows for the 100-row result
    rows = [
        v.get("numOutputRows") or v.get("number of output rows")
        for v in metrics.values()
    ]
    assert any(r is not None and int(r) >= 100 for r in rows)


def test_worker_cache_stats_probe(spark):
    """The ops probe reaches the python workers and reports the shared
    cache's shape (round 9 — the sizing dashboard for NB_WORKER_CACHE_MB)."""
    from neighborly_spark.observability import worker_cache_stats

    rows = worker_cache_stats(spark)
    assert rows
    for r in rows:
        assert {"pid", "entries", "bytes", "budget", "evictions",
                "hnsw_snapshot", "ivfpq_cells"} <= set(r)
        assert r["budget"] > 0 and r["bytes"] >= 0
