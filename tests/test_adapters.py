"""Serving adapter parity — Tests/Integration/{GrpcTests,RestTests}.cs and
Adapters.SemanticKernel behaviors, minus the wire."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neighborly_spark.adapters import MemoryStore, VectorStore


@pytest.fixture()
def store(spark, tiny_vectors):
    return VectorStore(tiny_vectors, dim=3)


def _row(spark, id_, emb, text):
    return spark.createDataFrame(
        [(id_, emb, [], text)],
        "id string, embedding array<float>, tags array<smallint>, original_text string",
    )


def test_rpc_roundtrip(spark, store):
    assert store.get_vectors().count() == 8
    store.add_vector(_row(spark, "v9", [3.0, 3.0, 3.0], "nine"))
    assert store.get_vectors().count() == 9
    assert store.get_vector_by_id("v9").collect()[0].original_text == "nine"
    store.update_vector(_row(spark, "v9", [4.0, 4.0, 4.0], "nine-updated"))
    assert store.get_vector_by_id("v9").collect()[0].original_text == "nine-updated"
    store.remove_vector("v9")
    assert store.get_vector_by_id("v9").count() == 0
    store.clear_vectors()
    assert store.get_vectors().count() == 0


def test_search_nearest_server_defaults(spark, store):
    # server default threshold 0.5: exact-match query returns its row (dist 0)
    rows = store.search_nearest([1.0, 2.0, 3.0], k=3).collect()
    assert [r.id for r in rows] == ["v1"]  # only dist<=0.5 survives


def test_memory_store_collections_and_relevance(spark):
    ms = MemoryStore(spark, dim=3)
    ms.upsert("facts", _row(spark, "a", [1.0, 0.0, 0.0], "x"))
    ms.upsert("facts", _row(spark, "b", [0.0, 1.0, 0.0], "y"))
    ms.upsert("other", _row(spark, "c", [1.0, 0.0, 0.0], "z"))

    assert ms.get("facts", ["a", "b"]).count() == 2
    assert ms.get("other", ["a"]).count() == 0  # collection isolation

    # nearest by cosine relevance, min_relevance_score filters
    m = ms.get_nearest_matches("facts", [1.0, 0.0, 0.0], limit=2, min_relevance_score=0.5)
    rows = m.collect()
    assert [r.id for r in rows] == ["a"] and rows[0].relevance == pytest.approx(1.0)

    # upsert replaces within collection
    ms.upsert("facts", _row(spark, "a", [0.0, 0.0, 1.0], "x2"))
    assert ms.df.filter((F.col("collection") == "facts") & (F.col("id") == "a")).count() == 1
    ms.remove("facts", ["a"])
    assert ms.get("facts", ["a"]).count() == 0
