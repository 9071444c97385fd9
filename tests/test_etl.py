"""ETL round-trip fidelity per format — Tests/ETLTest.cs:14-50 analogue
(FIXTURES.md §5): export the 3-row set, re-import, field-by-field equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neighborly_spark.sources import etl


@pytest.fixture(scope="module")
def three_rows(spark):
    rows = [
        ("00000000-0000-0000-0000-000000000001", [1.0, 2.0, 3.0], [1], "Original Text 1"),
        ("00000000-0000-0000-0000-000000000002", [4.0, 5.0, 6.0], [1, 2], "Original Text 2"),
        ("00000000-0000-0000-0000-000000000003", [7.0, 8.0, 9.0], [], "Original Text 3"),
    ]
    return spark.createDataFrame(
        rows, "id string, embedding array<float>, tags array<smallint>, original_text string"
    )


def _collect(df):
    return sorted(
        (r.id, [round(v, 5) for v in r.embedding], list(r.tags), r.original_text)
        for r in df.collect()
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "jsonz", "parquet"])
def test_roundtrip(spark, three_rows, tmp_path, fmt):
    path = str(tmp_path / f"rt_{fmt}")
    etl.exporter(fmt)(three_rows, path)
    back = etl.importer(fmt)(spark, path)
    assert _collect(back) == _collect(three_rows)
    # attribute defaults ride along (the wire formats don't carry them)
    assert {"priority", "user_id", "org_id"} <= set(back.columns)


def test_jsonz_actually_gzipped(spark, three_rows, tmp_path):
    path = tmp_path / "gz"
    etl.export_jsonz(three_rows, str(path))
    assert any(p.name.endswith(".json.gz") for p in path.iterdir())


def test_hdf5_declared_unsupported(spark, three_rows, tmp_path):
    # parity: Neighborly/ETL/HDF5.cs:18-28 throws NotImplementedException
    with pytest.raises(NotImplementedError):
        etl.export_hdf5(three_rows, str(tmp_path / "h5"))
    with pytest.raises(NotImplementedError):
        etl.import_hdf5(spark, str(tmp_path / "h5"))


def test_unknown_format_raises():
    with pytest.raises(ValueError, match="unknown content type"):
        etl.importer("xml")


def test_directory_scan(spark, three_rows, tmp_path):
    # S6: import every *.csv in a directory — Spark's glob subsumes
    etl.export_csv(three_rows, str(tmp_path / "d1"))
    etl.export_csv(three_rows, str(tmp_path / "d2"))
    back = etl.import_csv(spark, str(tmp_path / "d*"))
    assert back.count() == 6


def test_snapshot_save_load(spark, three_rows, tmp_path):
    from neighborly_spark.operators.lsh import fit_lsh

    model = fit_lsh(three_rows, dim=3, num_hash_tables=2)
    path = str(tmp_path / "snap")
    etl.save_database(three_rows, path, dim=3, models={"lsh": model})
    back, manifest = etl.load_database(spark, path)
    assert _collect(back) == _collect(three_rows)
    assert manifest["version"] == 1 and manifest["dim"] == 3
    assert manifest["indexes"] == ["lsh"]
    # the saved model reloads
    from pyspark.ml.feature import BucketedRandomProjectionLSHModel

    m2 = BucketedRandomProjectionLSHModel.load(f"{path}/indexes/lsh")
    assert m2.getNumHashTables() == 2


def test_snapshot_load_without_manifest_marks_dirty(spark, three_rows, tmp_path):
    # V0 semantics: no manifest -> indexes dirty, caller rebuilds
    path = str(tmp_path / "v0")
    three_rows.write.parquet(f"{path}/vectors")
    back, manifest = etl.load_database(spark, path)
    assert back.count() == 3
    assert manifest.get("dirty") is True


def test_csv_roundtrip_hostile_text(spark, tmp_path):
    """Text containing the delimiter, quotes, commas, and newlines must
    survive CSV round-trip (the reference's CsvHelper quotes these;
    Spark quotes on write but needs multiLine on read for embedded
    newlines)."""
    rows = [
        ("h1", [1.0], [1], "semi;colon and , comma"),
        ("h2", [2.0], [], 'quo"ted "text" here'),
        ("h3", [3.0], [2], "line\nbreak inside"),
        ("h4", [4.0], [], ""),
    ]
    df = spark.createDataFrame(
        rows, "id string, embedding array<float>, tags array<smallint>, original_text string"
    )
    path = str(tmp_path / "hostile")
    etl.export_csv(df, path)
    back = etl.import_csv(spark, path)
    got = {r.id: (list(r.embedding), list(r.tags), r.original_text) for r in back.collect()}
    assert got["h1"] == ([1.0], [1], "semi;colon and , comma")
    assert got["h2"] == ([2.0], [], 'quo"ted "text" here')
    assert got["h3"] == ([3.0], [2], "line\nbreak inside")
    assert got["h4"][2] == ""


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join contract: two tables bucketed by the same key join
    with ZERO Exchange nodes — the shuffle simply does not exist in the
    plan. The non-bucketed twin of the same join DOES exchange, proving the
    bucket layout (not AQE or size) removed it."""
    from neighborly_spark.sources.etl import read_bucketed, write_bucketed

    import shutil

    for t in ("b_vec", "b_pay"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a previously failed run can leave the managed location without a
        # catalog entry; saveAsTable refuses to reuse it
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    vec = emb.select("vec_id", "embedding")
    pay = emb.select("vec_id", "label")
    write_bucketed(vec, "b_vec", "vec_id", n_buckets=8)
    write_bucketed(pay, "b_pay", "vec_id", n_buckets=8)
    a, b = read_bucketed(spark, "b_vec"), read_bucketed(spark, "b_pay")
    # the fixture tables fit under the broadcast threshold, which would
    # mask the bucket layout (planner picks BHJ and ignores buckets);
    # disable it to see the plan a 100 TB join would get
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "vec_id")
        assert joined.count() == emb.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # control: same join off plain parquet shuffles (or broadcasts) — the
    # point is the bucketed plan needed NEITHER
    plain = emb.select("vec_id", "embedding").join(
        emb.select("vec_id", "label").repartition(7), "vec_id"
    )
    plain.count()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan or "Broadcast" in plain_plan
    spark.sql("DROP TABLE IF EXISTS b_vec")
    spark.sql("DROP TABLE IF EXISTS b_pay")


def test_webdataset_roundtrip_and_wide(spark, tmp_path):
    """WebDataset tar shards: write from long rows, read back identical
    members, pivot to one row per sample with binary columns."""
    from neighborly_spark.sources.webdataset import (
        read_webdataset, samples_wide, write_webdataset,
    )

    rows = []
    for i in range(20):
        key = f"{i:06d}"
        rows.append((key, "img", bytes([i]) * (i + 1)))
        rows.append((key, "txt", f"caption {i}".encode()))
        if i % 3 == 0:
            rows.append((key, "json", b'{"label": %d}' % i))
    df = spark.createDataFrame(rows, "key string, ext string, data binary")
    out = str(tmp_path / "shards")
    n = write_webdataset(df.repartitionByRange(3, "key"), out)
    assert n == 3

    back = read_webdataset(spark, f"{out}/*.tar")
    got = {(r.key, r.ext): bytes(r.data) for r in back.collect()}
    assert got == {(k, e): d for k, e, d in rows}

    wide = samples_wide(back, ["img", "txt", "json"])
    w = {r.key: r for r in wide.collect()}
    assert len(w) == 20
    assert bytes(w["000004"].img) == bytes([4]) * 5
    assert w["000004"].json is None and w["000003"].json is not None
    # samples are contiguous inside each shard (key-ordered members)
    import tarfile as tfmod

    shard0 = sorted(__import__("os").listdir(out))[0]
    with tfmod.open(f"{out}/{shard0}") as tf:
        names = [m.name for m in tf]
    keys_in_order = [n.split(".", 1)[0] for n in names]
    assert keys_in_order == sorted(keys_in_order)


def test_webdataset_write_with_empty_partitions(spark, tmp_path):
    """repartition(n) > rows leaves empty partitions; the writer must skip
    them instead of crashing in pd.concat([]) (round-2 ADVICE), and no
    .inprogress temp files may survive the commit rename."""
    import os

    from neighborly_spark.sources.webdataset import read_webdataset, write_webdataset

    df = spark.createDataFrame(
        [("a", "txt", b"x"), ("b", "txt", b"y")], "key string, ext string, data binary"
    )
    out = str(tmp_path / "sparse_shards")
    n = write_webdataset(df.repartition(8), out)
    assert 1 <= n <= 2
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]
    back = {(r.key, r.ext): bytes(r.data) for r in read_webdataset(spark, f"{out}/*.tar").collect()}
    assert back == {("a", "txt"): b"x", ("b", "txt"): b"y"}


def test_webdataset_to_multimodal_features(spark, tmp_path):
    """End-to-end multimodal path: tar shards -> wide samples -> asset rows
    -> Arrow-batched feature extraction. The full ingestion a multimodal
    training pipeline runs, with the decode slot on the deterministic fake."""
    from neighborly_spark.operators import multimodal as MM
    from neighborly_spark.sources.webdataset import (
        read_webdataset, samples_wide, write_webdataset,
    )

    rows = []
    for i in range(12):
        key = f"{i:06d}"
        rows.append((key, "img", bytes([i % 7]) * (50 + i)))
        rows.append((key, "txt", f"caption {i}".encode()))
    df = spark.createDataFrame(rows, "key string, ext string, data binary")
    out = str(tmp_path / "shards")
    write_webdataset(df.repartitionByRange(2, "key"), out)

    wide = samples_wide(read_webdataset(spark, f"{out}/*.tar"), ["img", "txt"])
    assets = wide.select(
        F.col("key").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("img").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = MM.extract_features(assets, dim=8, fake=True).collect()
    assert len(feats) == 12
    assert all(len(r.features) == 8 and r.n_bytes >= 50 for r in feats)
    # determinism: the same shard bytes give the same features
    again = {r.asset_id: r.features for r in MM.extract_features(assets, dim=8, fake=True).collect()}
    assert all(again[r.asset_id] == r.features for r in feats)


def test_orc_roundtrip(spark, tmp_path):
    """ORC (round 9, beyond-reference): Spark-native columnar round-trip
    through the factory — same vectors-schema contract as parquet."""
    from neighborly_spark.sources.etl import exporter, importer

    df = spark.createDataFrame(
        [(1, [0.1, 0.2], [1, 2], "a"), (2, [0.3, 0.4], None, None)],
        "id long, embedding array<float>, tags array<smallint>, original_text string",
    )
    path = str(tmp_path / "vectors_orc")
    exporter("orc")(df, path)
    back = importer("orc")(spark, path)
    assert sorted((r.id, list(r.embedding)) for r in back.collect()) == [
        (1, [pytest.approx(0.1), pytest.approx(0.2)]),
        (2, [pytest.approx(0.3), pytest.approx(0.4)]),
    ]


def test_snapshot_save_load_file_scheme_uri(spark, three_rows, tmp_path):
    """Round-11 (r10 VERDICT item 2): save_database/load_database route
    their JSON manifest through the Hadoop FileSystem API, so a
    `file:`-scheme URI — which driver-local open() cannot write — works
    end to end. This is the same code path an s3a:// or hdfs:// store
    path takes."""
    path = f"file://{tmp_path}/snap_uri"
    etl.save_database(three_rows, path, dim=3)
    back, manifest = etl.load_database(spark, path)
    assert _collect(back) == _collect(three_rows)
    assert manifest["version"] == 1 and manifest["dim"] == 3
