"""Exact search operator tests (Tests/VectorDatabaseTests.cs:234-280,
Tests/RangeSearchTests.cs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators import knn as K


def test_knn_nearest_is_1_2_3(spark, tiny_vectors):
    # Tests/VectorDatabaseTests.cs:238-256: query [2,3,4] -> nearest [1,2,3]
    rows = K.knn(tiny_vectors, [2.0, 3.0, 4.0], k=1).collect()
    assert [r.id for r in rows] == ["v3"] or rows[0].embedding == [2.0, 3.0, 4.0]
    # exclude the exact-equal row: nearest proper neighbor
    rows = K.knn(tiny_vectors.filter(F.col("id") != "v3"), [2.0, 3.0, 4.0], k=1).collect()
    assert rows[0].id == "v1"
    assert rows[0].dist == pytest.approx(math.sqrt(3.0))


def test_knn_exact_match_first(spark, tiny_vectors):
    # Tests/VectorDatabaseTests.cs:258-280: query == a stored vector -> itself at dist 0
    rows = K.knn(tiny_vectors, [1.0, 2.0, 3.0], k=1).collect()
    assert rows[0].id == "v1" and rows[0].dist == 0.0


def test_knn_id_tiebreak(spark, tiny_vectors):
    # v5 and v6 both at distance 1 from origin -> id order (KDTree.cs:381-386)
    rows = K.knn(tiny_vectors, [0.0, 0.0, 0.0], k=3).collect()
    assert [r.id for r in rows] == ["v4", "v5", "v6"]


def test_knn_k_exceeds_n(spark, tiny_vectors):
    assert K.knn(tiny_vectors, [0.0, 0.0, 0.0], k=100).count() == 8


def test_range_search_ordering(spark, tiny_vectors):
    rows = K.range_search(tiny_vectors, [0.0, 0.0, 0.0], radius=1.0).collect()
    assert [r.id for r in rows] == ["v4", "v5", "v6"]
    assert rows[-1].dist <= 1.0


def test_range_search_empty(spark, tiny_vectors):
    assert K.range_search(tiny_vectors, [100.0, 100.0, 100.0], radius=0.5).count() == 0


def test_knn_cosine_similarity_ordering(spark, tiny_vectors):
    # cosine: larger similarity = closer (parity quirk ordering)
    rows = K.knn(tiny_vectors.filter(F.size("embedding") == 3), [1.0, 2.0, 3.0], k=2, metric="cosine").collect()
    assert rows[0].id in ("v1",)  # identical direction -> sim 1.0
    assert rows[0].dist == pytest.approx(1.0)


def test_knn_join_per_query_topk(spark, tiny_vectors):
    queries = spark.createDataFrame(
        [("q1", [0.0, 0.0, 0.0]), ("q2", [4.0, 5.0, 6.0])],
        "query_id string, query_embedding array<float>",
    )
    out = K.knn_join(tiny_vectors, queries, k=2)
    got = {(r.query_id, r.id) for r in out.collect()}
    assert got == {("q1", "v4"), ("q1", "v5"), ("q2", "v2"), ("q2", "v3")}


def test_threshold_filter_basic(spark, tiny_vectors):
    scored = K.with_distance(tiny_vectors, F.lit([0.0, 0.0, 0.0]).cast("array<float>"))
    out = K.threshold_filter(scored, threshold=1.5, dim=3)
    assert {r.id for r in out.collect()} == {"v4", "v5", "v6"}


def test_threshold_filter_bypass_heuristic(spark):
    # SearchService.cs:174-184: dim>50 AND any dist>5 AND threshold>1.5 -> no filtering
    df = spark.createDataFrame([("a", 0.1), ("b", 6.0)], "id string, dist double")
    out = K.threshold_filter(df, threshold=2.0, dim=64)
    assert out.count() == 2  # bypassed
    out2 = K.threshold_filter(df, threshold=2.0, dim=3)
    assert {r.id for r in out2.collect()} == {"a"}  # dim<=50 -> filter applies
    out3 = K.threshold_filter(df, threshold=1.0, dim=64)
    assert {r.id for r in out3.collect()} == {"a"}  # threshold<=1.5 -> filter applies


def test_default_threshold_for_text():
    # SearchService.cs:82-102
    assert K.default_threshold_for_text("hi") == 0.9
    assert K.default_threshold_for_text("hello there") == 0.8
    assert K.default_threshold_for_text("a much longer query string") == 0.5


def test_text_range_search_via_service(spark, tiny_vectors):
    from neighborly_spark.search_service import SearchService
    from neighborly_spark.functions.embedding import hash_embedding
    from pyspark.sql import functions as F

    # vectors whose embeddings come from the hash embedder, so text query
    # "apple pie" lands exactly on v1's embedding -> dist 0 within any radius
    embedded = tiny_vectors.withColumn("embedding", hash_embedding(F.col("original_text"), 4))
    svc = SearchService(embedded, dim=4)
    rows = svc.range_search(text="apple pie", radius=0.1).collect()
    assert [r.id for r in rows] == ["v1"] and rows[0].dist == 0.0


def test_knn_vectorized_matches_exact(spark, tiny_vectors):
    from neighborly_spark.operators.knn import knn, knn_vectorized

    exact = [(r.id, round(r.dist, 9)) for r in knn(tiny_vectors, [2.0, 3.0, 4.0], k=4).collect()]
    fast = [(r.id, round(r.dist, 9)) for r in knn_vectorized(tiny_vectors, [2.0, 3.0, 4.0], k=4).collect()]
    assert exact == fast
