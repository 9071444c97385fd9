"""Physical-plan audits: the 100 TB posture is only real if the plans show
it. Each test asserts the plan SHAPE, not timing — pushdown reaching the
parquet scan, broadcasts where a small side exists, distributed top-k
instead of global sort, no Python in JVM-able paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators.knn import knn, knn_join
from neighborly_spark.parity import REGISTRY

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark):
    # other modules cache this exact subplan; a cached InMemoryRelation would
    # replace the FileScan and hide PushedFilters/ReadSchema from the asserts
    spark.catalog.clearCache()
    return spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed("vec_id", "id")


def test_knn_is_distributed_topk(emb):
    # orderBy+limit must compile to TakeOrderedAndProject (per-partition heap
    # + merge of k rows), NOT a global Sort -> Exchange.
    q = [0.0] * 64
    plan = _plan(knn(emb, q, 10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # the global-sort smell


def test_point_lookup_pushes_filter_to_scan(emb):
    plan = _plan(emb.filter(F.col("id") == 7).select("id", "label"))
    assert "PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,7)]" in plan


def test_column_pruning_reaches_scan(emb):
    # a 2-column projection must not read the embedding column
    plan = _plan(emb.select("id", "label"))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "embedding" not in read_schema


def test_knn_join_broadcasts_query_side(spark, emb):
    queries = emb.limit(5).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    plan = _plan(knn_join(emb, queries, k=3))
    assert "BroadcastNestedLoopJoin" in plan  # small side shipped, big side never shuffles pre-join


def test_tag_resolution_uses_broadcast_hash_join(spark):
    from neighborly_spark.operators.crud import resolve_tags

    df = spark.createDataFrame(
        [("a", [1, 2])], "id string, tags array<smallint>"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "tag_id smallint, tag string")
    plan = _plan(resolve_tags(df, dim))
    assert "BroadcastHashJoin" in plan


def test_distance_exprs_stay_jvm_side(emb):
    # Higher-order array expressions evaluate JVM-side (interpreted — Spark
    # doesn't codegen HOFs) with the scan itself codegen'd; the assertion
    # that matters at scale: NO Python evaluation nodes in the hot path.
    from neighborly_spark.functions.distance import euclidean

    df = emb.select(euclidean(F.col("embedding"), F.lit([0.0] * 64).cast("array<float>")).alias("d"))
    plan = _plan(df)
    assert "*(1)" in plan  # codegen'd scan stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_oracle_queries_contain_no_python_udfs(spark):
    # every parity builder must stay JVM-side (SURVEY §7.0 design stance);
    # sanctioned Python: mapInPandas in multimodal (not here), and
    # rerank_topk, whose WHOLE POINT is oracle-checking the Arrow UDF path
    # (the cross-encoder slot) — it must use Arrow, never row-Python.
    for name, pq in REGISTRY.items():
        plan = _plan(pq.build(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
        if name == "rerank_topk":
            assert "ArrowEvalPython" in plan, "rerank must be Arrow-batched"
        else:
            assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF needlessly"


def test_range_search_filter_before_sort(emb):
    from neighborly_spark.operators.knn import range_search

    plan = _plan(range_search(emb, [0.0] * 64, 1.0))
    # the radius filter must run before the sort (sort input is pre-filtered)
    assert plan.index("Filter") > plan.index("Sort")  # executedPlan prints top-down: Sort above Filter


def test_interval_join_is_equi_join_not_bnl(spark):
    # a bare containment predicate would fall into BroadcastNestedLoopJoin;
    # bucketization must turn it into a hash EQUI-join
    plan = _plan(REGISTRY["event_interval_join"].build(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_asof_join_has_no_join_node(spark):
    # both directions compile to union + one keyed window — no join operator
    for q in ("purchase_asof_click", "signup_next_purchase_asof"):
        plan = _plan(REGISTRY[q].build(spark, SF))
        assert "Join" not in plan, q
        assert plan.count("Window") == 1, q


def test_unigram_freq_join_never_shuffles_doc_tokens(spark):
    # the exploded doc-token side must meet the frequency table via a
    # broadcast hash join (no Exchange between Generate and the join)
    plan = _plan(REGISTRY["unigram_logprob"].build(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_exact_substr_plan_shape(spark):
    """ExactSubstr (expr tier): the dup-hash aggregate is map-side partial
    (HashAggregate pair), the windows stage stays JVM-side (no Python
    nodes before the islands window), and the python tier's only Python
    node is the fingerprint mapInPandas."""
    from neighborly_spark.operators.dedup import exact_substr_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 50")
    plan = _plan(exact_substr_spans(docs, min_tokens=4))
    assert "HashAggregate" in plan  # partial+final count aggregate
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    # python tier, lazy: the window-hash MapInPandas appears once per
    # CONSUMER (dup aggregate + position join) — the double-evaluation
    # materialize=True removes
    lazy = _plan(exact_substr_spans(docs, min_tokens=4, engine="python"))
    assert lazy.count("MapInPandas") == 2
    # materialized: the checkpoint ran the pass ONCE; downstream reads the
    # materialized rows (Scan ExistingRDD), zero Python nodes left
    pyplan = _plan(exact_substr_spans(docs, min_tokens=4, engine="python", materialize=True))
    assert "MapInPandas" not in pyplan and "Scan ExistingRDD" in pyplan
    assert "BatchEvalPython" not in pyplan


def test_winnow_python_tier_single_python_boundary(spark):
    """winnow engine='python': one MapInPandas (the fingerprint table);
    candidate generation and scoring stay JVM-side."""
    from neighborly_spark.operators.dedup import winnow_neardup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 50")
    plan = _plan(
        winnow_neardup_pairs(docs, threshold=0.3, engine="python", n_docs=50, materialize=True)
    )
    # materialized fingerprint table: the hashlib pass ran once at the
    # checkpoint; the candidate join reads Scan ExistingRDD, no Python left
    assert "MapInPandas" not in plan and "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan
