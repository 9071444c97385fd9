"""CRUD + tag ops — Tests/VectorDatabaseTests.cs:27-230 analogues."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators import crud


def test_add_and_count(spark, tiny_vectors):
    new = spark.createDataFrame(
        [("v9", [9.0, 9.0, 9.0], [1], "nine")],
        "id string, embedding array<float>, tags array<smallint>, original_text string",
    )
    assert crud.add(tiny_vectors, new).count() == 9


def test_upsert_replaces_and_appends(spark, tiny_vectors):
    updates = spark.createDataFrame(
        [("v1", [0.5, 0.5, 0.5], [1], "updated"), ("v10", [1.0, 1.0, 1.0], [], "new")],
        "id string, embedding array<float>, tags array<smallint>, original_text string",
    )
    out = crud.upsert(tiny_vectors, updates)
    assert out.count() == 9
    assert out.filter(F.col("id") == "v1").collect()[0].original_text == "updated"


def test_remove_and_clear(spark, tiny_vectors):
    assert crud.remove_by_id(tiny_vectors, ["v1", "v2"]).count() == 6
    ids_df = spark.createDataFrame([("v3",)], "id string")
    assert crud.remove_by_id(tiny_vectors, ids_df).count() == 7
    emptied = crud.clear(tiny_vectors)
    assert emptied.count() == 0 and emptied.schema == tiny_vectors.schema


def test_get_find_contains(spark, tiny_vectors):
    assert crud.get_by_id(tiny_vectors, "v7").collect()[0].original_text == "far away"
    assert crud.find(tiny_vectors, F.col("original_text").startswith("plain")).count() == 1
    assert crud.find_all(tiny_vectors, F.size("tags") == 1).count() == 6
    probe = spark.createDataFrame([("v1",), ("nope",)], "id string")
    assert {r.id for r in crud.contains(tiny_vectors, probe).collect()} == {"v1"}


def test_tag_dim_sequential_short_ids(spark):
    raw = spark.createDataFrame(
        [("  Alpha ",), ("beta",), ("ALPHA",), ("gamma",), ("",)], "tag string"
    )
    dim = crud.build_tag_dim(raw)
    rows = {r.tag: r.tag_id for r in dim.collect()}
    # lowercased, trimmed, deduped, ids sequential from 1 (VectorTags.cs:47-66)
    assert rows == {"alpha": 1, "beta": 2, "gamma": 3}
    assert dict(dim.dtypes)["tag_id"] == "smallint"


def test_tag_filters(spark, tiny_vectors):
    # single tag
    assert {r.id for r in crud.filter_by_tag(tiny_vectors, 1).collect()} == {"v1", "v2"}
    # all-of
    assert {r.id for r in crud.filter_by_all_tags(tiny_vectors, [1, 2]).collect()} == {"v2"}
    # any-of
    assert {r.id for r in crud.filter_by_any_tag(tiny_vectors, [2, 3]).collect()} == {
        "v2", "v3", "v5", "v6",
    }


def test_inverted_tag_map(spark, tiny_vectors):
    inv = {r.tag_id: r.vector_ids for r in crud.inverted_tag_map(tiny_vectors).collect()}
    assert inv[1] == ["v1", "v2"] and inv[3] == ["v5", "v6"]


def test_resolve_tags(spark, tiny_vectors):
    dim = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta"), (5, "epsilon")],
        "tag_id smallint, tag string",
    )
    out = crud.resolve_tags(tiny_vectors, dim)
    names = {r.id: r.tag_names for r in out.collect()}
    assert names["v2"] == ["alpha", "beta"]
    assert names["v4"] == []


def test_resolve_tags_preserves_duplicate_rows(spark):
    """The surrogate-row-key regroup keeps fully identical input rows as
    separate output rows (a groupBy-all-columns formulation collapses them)."""
    dim = spark.createDataFrame([(1, "alpha")], "tag_id smallint, tag string")
    df = spark.createDataFrame(
        [("d", [1]), ("d", [1]), ("e", [])],
        "id string, tags array<smallint>",
    )
    out = crud.resolve_tags(df.withColumn("tags", F.col("tags").cast("array<smallint>")), dim)
    rows = out.collect()
    assert len(rows) == 3  # both duplicates survive
    assert sorted((r.id, tuple(r.tag_names)) for r in rows) == [
        ("d", ("alpha",)), ("d", ("alpha",)), ("e", ()),
    ]


def test_hash_sample_stable_and_disjoint(spark, tiny_vectors):
    from neighborly_spark.functions.splits import hash_sample

    s1 = {r.id for r in hash_sample(tiny_vectors, "id", 0.5).collect()}
    s2 = {r.id for r in hash_sample(tiny_vectors.repartition(7), "id", 0.5).collect()}
    assert s1 == s2  # stable under repartitioning (df.sample is not)
    rest = {r.id for r in tiny_vectors.collect()} - s1
    s3 = {r.id for r in hash_sample(tiny_vectors, "id", 1.0).collect()}
    assert s3 == s1 | rest  # fraction 1.0 keeps everything


def test_deterministic_split_partitions_everything(spark, tiny_vectors):
    from neighborly_spark.functions.splits import deterministic_split

    out = deterministic_split(tiny_vectors, "id", [0.5, 0.5], ["a", "b"])
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 8


def test_stratified_sample_exact_counts_and_stability(spark):
    from neighborly_spark.functions.splits import stratified_sample_exact

    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "id int, stratum string")
    out = stratified_sample_exact(df, "stratum", "id", 8)
    counts = {r.stratum: r['count'] for r in out.groupBy("stratum").count().collect()}
    assert counts == {"big": 8, "small": 8}
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(r.id for r in stratified_sample_exact(df.repartition(5), "stratum", "id", 8).collect())
    assert ids1 == ids2  # content-stable under relayout
    # stratum smaller than n -> keep all of it
    tiny = stratified_sample_exact(df, "stratum", "id", 45)
    assert tiny.filter("stratum = 'small'").count() == 10


def test_stratified_hash_sample_rates(spark):
    from neighborly_spark.functions.splits import stratified_hash_sample

    rows = [(i, "keep" if i % 2 else "drop") for i in range(100)]
    df = spark.createDataFrame(rows, "id int, stratum string")
    out = stratified_hash_sample(df, "stratum", "id", {"keep": 1.0})
    got = {(r.id, r.stratum) for r in out.collect()}
    assert got == {(i, "keep") for i in range(100) if i % 2}  # default 0.0 drops the rest


def test_mixture_sample_budgets_and_stability(spark):
    """Domain-mixture sampling: per-group token sums land within one doc of
    the budget, membership is layout-independent, unlisted groups drop."""
    from neighborly_spark.functions.splits import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    weights = {"src1": 0.6, "src2": 0.4}
    total = 1_000  # each source holds ~1.2k tokens, so both budgets are met
    out = mixture_sample(docs, weights, total).cache()
    got = {r.source: r for r in out.groupBy("source").agg(
        F.sum("n_tokens_sampled").alias("toks"), F.max("n_tokens_sampled").alias("maxdoc")
    ).collect()}
    assert set(got) == set(weights)  # both weighted sources present in data
    for g, r in got.items():
        budget = weights[g] * total
        # budget met and overshoot smaller than one doc (first-crosser rule)
        assert budget <= r.toks < budget + r.maxdoc, (g, r.toks, budget)
    # content-stable: same membership after repartitioning
    again = mixture_sample(docs.repartition(13), weights, total)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    out.unpersist()
