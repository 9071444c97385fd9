"""Shared byte-budgeted worker cache (operators/worker_cache.py) — round 9,
r8 VERDICT 4: the snapshot tiers' count caps become one byte budget, so
mixed hnsw+ivfpq serving degrades by evicting the coldest bytes instead of
overshooting executor memory."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators.worker_cache import ByteBudgetLRU, WORKER_CACHE


def test_byte_budget_lru_unit():
    lru = ByteBudgetLRU(100)
    lru.put("a", 1, 40)
    lru.put("b", 2, 40)
    assert lru.get("a") == 1  # a becomes MRU
    lru.put("c", 3, 40)  # 120 > 100: evict LRU = b
    assert lru.get("b") is None and lru.get("a") == 1 and lru.get("c") == 3
    assert lru.evictions == 1 and lru.bytes == 80
    # re-put same key replaces, not double-charges
    lru.put("a", 9, 60)
    assert lru.bytes == 100 and lru.get("a") == 9
    # a single over-budget entry still serves (never evict the insert)
    lru.put("big", "x", 10_000)
    assert lru.get("big") == "x" and len(lru) == 1
    lru.clear()
    assert lru.bytes == 0 and len(lru) == 0


def test_budget_resolution(monkeypatch):
    from neighborly_spark.operators import worker_cache as wc

    monkeypatch.setenv("NB_WORKER_CACHE_MB", "3")
    assert wc._budget_bytes() == 3 << 20
    monkeypatch.delenv("NB_WORKER_CACHE_MB")
    monkeypatch.setenv("PYSPARK_EXECUTOR_MEMORY_MB", "1024")
    assert wc._budget_bytes() == 512 << 20  # half the python worker budget
    monkeypatch.delenv("PYSPARK_EXECUTOR_MEMORY_MB")
    assert wc._budget_bytes() == 256 << 20  # ~ the old count caps' envelope


def test_mixed_hnsw_ivfpq_serving_evicts_under_budget(spark, tmp_path):
    """Both snapshot loaders share ONE budget: interleaved shard+cell
    loads beyond it evict the coldest entries (across tiers), and every
    re-load after eviction returns arrays equal to the evicted ones —
    eviction costs latency, never correctness. Exercised through the
    loaders the worker tasks call (same code path, driver process)."""
    from neighborly_spark.operators import hnsw as H
    from neighborly_spark.operators import ivfpq as IVFPQ
    from neighborly_spark.operators.ivf import CLUSTER_COL

    rows = [
        (i, [float(i % 13), float(i % 7), float(i % 5), 1.0], [int(i % 2)])
        for i in range(600)
    ]
    df = spark.createDataFrame(
        rows, "id long, embedding array<float>, tags array<smallint>"
    ).cache()
    df.count()
    g = H.hnsw_build(df, dim=4, num_partitions=3, tags_col="tags")
    gpath = str(tmp_path / "graph")
    g.write.partitionBy("part_id").parquet(gpath)
    model = IVFPQ.ivfpq_train(df, 4, nlist=4, m=2, num_centroids=16)
    enc = IVFPQ.ivfpq_encode(df, model)
    cpath = str(tmp_path / "codes")
    enc.write.partitionBy(CLUSTER_COL).parquet(cpath)

    m, kp = model.pq.m, model.pq.num_centroids
    WORKER_CACHE.clear()
    old_budget = WORKER_CACHE.budget
    try:
        # budget below the working set of 3 shards + 4 cells: first pass
        # to learn real sizes, then pin the budget under their sum
        for pid in range(3):
            H._load_snapshot_shard(gpath, pid, "v1")
        for cell in range(4):
            IVFPQ._load_snapshot_cell(cpath, cell, "v1", "id", m, kp)
        full_bytes = WORKER_CACHE.bytes
        assert full_bytes > 0
        baseline = {
            pid: H._load_snapshot_shard(gpath, pid, "v1") for pid in range(3)
        }
        base_cells = {
            c: IVFPQ._load_snapshot_cell(cpath, c, "v1", "id", m, kp)
            for c in range(4)
        }
        WORKER_CACHE.clear()
        WORKER_CACHE.budget = full_bytes // 2
        for _round in range(2):
            for pid in range(3):
                ids, graph, tags, kind = H._load_snapshot_shard(gpath, pid, "v1")
                bids, bgraph, btags, _ = baseline[pid]
                assert np.array_equal(ids, bids) and tags == btags
                assert np.array_equal(graph.nbr, bgraph.nbr)
            for cell in range(4):
                ids_s, idx_s, tbc = IVFPQ._load_snapshot_cell(
                    cpath, cell, "v1", "id", m, kp
                )
                b_ids, b_idx, b_tbc = base_cells[cell]
                assert np.array_equal(ids_s, b_ids)
                assert np.array_equal(idx_s, b_idx)
                assert {k: v[0] for k, v in tbc.items()} == {
                    k: v[0] for k, v in b_tbc.items()
                }
        assert WORKER_CACHE.evictions > 0  # the budget really bound
        assert WORKER_CACHE.bytes <= WORKER_CACHE.budget or len(WORKER_CACHE) == 1
        # end-to-end: both snapshot tiers still serve correct results while
        # the (worker-side) caches churn
        qrows = df.limit(4).select(
            F.col("id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_embedding"),
        )
        got = sorted(
            (r.query_id, r.id, r.dist)
            for r in IVFPQ.ivfpq_knn_join_snapshot(
                spark, cpath, model, qrows, 5, version="v1", nprobe=4, df=df
            ).collect()
        )
        want = sorted(
            (r.query_id, r.id, r.dist)
            for r in IVFPQ.ivfpq_knn_join(
                enc, model, qrows, 5, nprobe=4, df=df
            ).collect()
        )
        assert got == want and len(got) == 20
    finally:
        WORKER_CACHE.budget = old_budget
        WORKER_CACHE.clear()
        df.unpersist()


def test_byte_budget_lru_properties():
    """Property law vs an independent model LRU: under any op sequence,
    (a) resident bytes == sum of entry charges, (b) bytes <= budget unless
    a single oversized entry, (c) get returns the LAST put value for a
    resident key, (d) RESIDENCY AND ORDER equal a reference
    least-recently-used model (so eviction order is pinned, not just
    byte accounting)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ops = st.lists(
        st.one_of(
            st.tuples(st.just("put"), st.integers(0, 9), st.integers(1, 60)),
            st.tuples(st.just("get"), st.integers(0, 9), st.just(0)),
        ),
        max_size=60,
    )

    @settings(max_examples=200, deadline=None)
    @given(ops=ops, budget=st.integers(20, 150))
    def run(ops, budget):
        lru = ByteBudgetLRU(budget)
        model: dict = {}  # key -> nbytes, insertion order = LRU order
        last_put: dict = {}

        def model_evict():
            while sum(model.values()) > budget and len(model) > 1:
                model.pop(next(iter(model)))

        for op, key, nbytes in ops:
            if op == "put":
                val = (key, nbytes, len(last_put))
                lru.put(key, val, nbytes)
                last_put[key] = val
                model.pop(key, None)
                model[key] = nbytes
                model_evict()
            else:
                got = lru.get(key)
                if key in model:
                    assert got == last_put[key]
                    model[key] = model.pop(key)  # MRU
                else:
                    assert got is None
        sizes = {k: v[1] for k, v in lru._d.items()}
        assert lru.bytes == sum(sizes.values())
        assert lru.bytes <= lru.budget or len(lru) == 1
        assert list(lru._d.keys()) == list(model.keys())  # order pinned

    run()
