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


def test_rest_server_routes_and_status_codes(spark):
    """S11 wire layer: the six reference REST routes with the reference's
    status codes (RestServices.cs:15-92), end-to-end over HTTP against a
    live VectorStore."""
    import json
    import urllib.request

    from neighborly_spark.adapters import VectorStore
    from neighborly_spark.server import RestServer

    rows = [
        ("a", [0.0, 0.0, 0.0, 0.0], [1], "doc a"),
        ("b", [1.0, 0.0, 0.0, 0.0], [2], "doc b"),
        ("c", [0.0, 2.0, 0.0, 0.0], [], "doc c"),
    ]
    df = spark.createDataFrame(
        rows, "id string, embedding array<float>, tags array<smallint>, original_text string"
    )
    srv = RestServer(VectorStore(df, dim=4))
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"

    def call(method, path, body=None):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                raw = r.read()
                return r.status, (json.loads(raw) if raw else None), dict(r.headers)
        except urllib.error.HTTPError as e:
            return e.code, None, dict(e.headers)

    try:
        code, dto, _ = call("GET", "/vector/a")
        assert code == 200 and dto["values"] == [0.0, 0.0, 0.0, 0.0] and dto["tags"] == [1]
        assert call("GET", "/vector/zzz")[0] == 404

        code, _, headers = call(
            "POST", "/vector", {"id": "d", "values": [9.0, 9.0, 9.0, 9.0], "tags": [3]}
        )
        assert code == 201 and headers["Location"] == "/vector/d"
        assert call("GET", "/vector/d")[0] == 200

        code, dto, _ = call("PUT", "/vector/d", {"values": [8.0, 8.0, 8.0, 8.0]})
        assert code == 200
        assert call("GET", "/vector/d")[1]["values"] == [8.0, 8.0, 8.0, 8.0]
        assert call("PUT", "/vector/zzz", {"values": [0.0, 0.0, 0.0, 0.0]})[0] == 404

        code, hits, _ = call("POST", "/vectors/searchNearest?k=2", {"values": [0.0, 0.0, 0.0, 0.0]})
        assert code == 200 and hits[0]["id"] == "a"  # dist 0 clears the 0.5 threshold

        assert call("DELETE", "/vector/d")[0] == 204
        assert call("GET", "/vector/d")[0] == 404
        assert call("DELETE", "/vector/d")[0] == 404

        assert call("DELETE", "/db/clear")[0] == 204
        assert call("GET", "/vector/a")[0] == 404
    finally:
        srv.stop()
