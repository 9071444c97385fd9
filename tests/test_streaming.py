"""Streaming ingest + Q13 debounce semantics + multimodal plumbing."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators import multimodal as MM
from neighborly_spark.streaming.ingest import (
    DebouncedIndexRefresher,
    normalize_events_to_vectors,
    start_ingest,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def events_landing(spark, tmp_path_factory):
    # stage the events table as a streaming landing dir with ts as epoch
    # MICROS longs (parity.load normalizes whichever physical type the
    # driver shipped — nanos longs in round 1, timestamp[us] in round 2)
    from neighborly_spark.parity import load

    d = tmp_path_factory.mktemp("landing")
    ev = load(spark, SF, "events").withColumn("ts", F.unix_micros(F.col("ts")))
    ev.write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


def test_stream_ingest_appends_vectors(spark, events_landing, tmp_path):
    rebuilds = []
    refresher = DebouncedIndexRefresher(lambda: rebuilds.append(1), debounce_seconds=0.0)
    q = start_ingest(
        spark,
        events_landing,
        EVENTS_SCHEMA,
        str(tmp_path / "vectors"),
        str(tmp_path / "ckpt"),
        dim=8,
        refresher=refresher,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "vectors"))
    assert out.count() == 1000
    assert dict(out.dtypes)["embedding"] == "array<float>"
    assert out.filter(F.size("embedding") != 8).count() == 0
    # debounce 0 -> the batch triggered a rebuild (Q13 eventual freshness)
    assert refresher.rebuild_count >= 1


def test_stream_ingest_idempotent_replay(spark, events_landing, tmp_path):
    """idempotent=True: a micro-batch that fails AFTER its target write
    (before the offset commit) replays on restart with the same _batch_id
    and REPLACES its partition — the vectors table never shows duplicate
    rows (same read-view contract as the serving sink, round-7 VERDICT 5)."""
    target = str(tmp_path / "vectors")
    ckpt = str(tmp_path / "ckpt")
    boom = {"armed": True}

    def explode_once(df):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected post-write failure")

    q = start_ingest(
        spark, events_landing, EVENTS_SCHEMA, target, ckpt,
        dim=8, on_batch=explode_once, idempotent=True,
    )
    with pytest.raises(Exception, match="injected post-write failure"):
        q.awaitTermination(120)
        q.processAllAvailable()
    # batch 0's write landed before the failure
    assert spark.read.parquet(target).count() == 1000

    q2 = start_ingest(
        spark, events_landing, EVENTS_SCHEMA, target, ckpt,
        dim=8, idempotent=True,
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(target)
    rows = out.count()
    assert rows == 1000  # replay replaced, not appended
    assert "_batch_id" in out.columns
    assert out.select("id").distinct().count() == 1000


def test_debounce_waits_for_quiet_period():
    rebuilds = []
    r = DebouncedIndexRefresher(lambda: rebuilds.append(1), debounce_seconds=5.0)
    t0 = time.monotonic()
    r.mark_modified(t0)
    assert r.maybe_rebuild(t0 + 1.0) is False  # still hot (VectorDatabase.cs:517-524)
    assert r.maybe_rebuild(t0 + 5.1) is True
    assert rebuilds == [1]
    assert r.maybe_rebuild(t0 + 99.0) is False  # nothing modified since


def test_windowed_event_counts_streaming(spark, events_landing, tmp_path):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_landing)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_events) s FROM wincounts").collect()[0].s
    assert got == 1000


def test_normalize_events_schema(spark):
    from neighborly_spark.parity import load

    ev = load(spark, SF, "events").limit(5)
    v = normalize_events_to_vectors(ev, dim=4)
    cols = dict(v.dtypes)
    assert cols["id"] == "string" and cols["embedding"] == "array<float>"
    assert v.count() == 5


# --- multimodal plumbing ----------------------------------------------------


def test_multimodal_fake_decode_pipeline(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    assets = MM.make_assets_from_text(docs, "doc_id", "text")
    assert [(f.name, f.dataType) for f in assets.schema.fields] == [
        (f.name, f.dataType) for f in MM.ASSET_SCHEMA.fields
    ]
    feats = MM.extract_features(assets, dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == 8 for r in rows)
    # deterministic: same input -> same features
    again = {r.asset_id: r.features for r in MM.extract_features(assets, dim=8, fake=True).collect()}
    assert all(again[r.asset_id] == r.features for r in rows)


def test_multimodal_stub_raises_without_decoder(spark):
    if MM._PILImage is not None:
        pytest.skip("Pillow installed: fake=False takes the real decode path")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(2)
    assets = MM.make_assets_from_text(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        MM.extract_features(assets, dim=4, fake=False).collect()


def test_frame_sample_explodes_by_duration(spark):
    rows = [("a", "video", b"x", None, None, 3500), ("b", "video", b"y", None, None, 500)]
    df = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    out = MM.frame_sample(df, every_ms=1000)
    got = {(r.asset_id, r.frame_ts_ms) for r in out.collect()}
    assert got == {("a", 0), ("a", 1000), ("a", 2000), ("b", 0)}


def test_resize_image_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    assets = MM.make_assets_from_text(docs, "doc_id", "text")
    out = MM.resize_image(assets, width=8, height=4, fake=True)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in MM.ASSET_SCHEMA.fields
    ]
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r.payload) == 32 and r.width == 8 and r.height == 4 for r in rows)
    # deterministic payloads, chainable into the feature extractor
    again = {r.asset_id: r.payload for r in MM.resize_image(assets, 8, 4, fake=True).collect()}
    assert all(again[r.asset_id] == r.payload for r in rows)
    feats = MM.extract_features(out, dim=4, fake=True)
    assert feats.count() == 10
    if MM._PILImage is None:
        with pytest.raises(Exception, match="NotImplementedError|image resize"):
            MM.resize_image(assets, 8, 4, fake=False).collect()


def test_streaming_sessionization_matches_batch(spark, events_landing):
    """session_stats is the SAME plan under Structured Streaming: watermark +
    append mode emits exactly the watermark-closed sessions, all agreeing
    with the batch twin."""
    from neighborly_spark.operators.sessions import session_stats

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_landing)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
        .withWatermark("ts", "1 hour")
    )
    q = (
        session_stats(stream, gap_sec=7200, value_col=None)
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM stream_sessions").collect()}

    from neighborly_spark.parity import load

    ev = load(spark, SF, "events")
    batch = {tuple(r) for r in session_stats(ev, gap_sec=7200, value_col=None).collect()}
    assert got <= batch          # append emits only closed sessions
    assert len(got) >= len(batch) * 0.5  # and the watermark closed most of them


def test_streaming_funnel_matches_batch(spark, events_landing):
    """funnel_steps is a plain keyed aggregation, so it runs unchanged under
    Structured Streaming in complete mode — full equality with the batch
    result once all data is processed."""
    from neighborly_spark.operators.sessions import funnel_steps

    steps = ["signup", "click", "purchase"]
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_landing)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    q = (
        funnel_steps(stream, steps)
        .writeStream.format("memory")
        .queryName("stream_funnel")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM stream_funnel").collect()}

    from neighborly_spark.parity import load

    ev = load(spark, SF, "events")
    batch = {tuple(r) for r in funnel_steps(ev, steps).collect()}
    assert got == batch and len(got) > 0


def test_multimodal_real_decode_with_pillow(spark, tmp_path):
    """Real decode path: only runs where Pillow is installed (try-import in
    multimodal.py). Generates a tiny PNG, checks features come from true
    pixel data and resize re-encodes at the new size."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = PIL.new("L", (4, 4), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    rows = [("p1", "image", buf.getvalue(), 4, 4, None)]
    df = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    feats = MM.extract_features(df, dim=4, fake=False).collect()
    assert len(feats) == 1 and all(abs(v - 128 / 255) < 1e-6 for v in feats[0].features)
    out = MM.resize_image(df, 2, 2, fake=False).collect()[0]
    resized = PIL.open(io.BytesIO(bytes(out.payload)))
    assert resized.size == (2, 2) and (out.width, out.height) == (2, 2)


def test_stream_ingest_incremental_hnsw(spark, events_landing, tmp_path):
    """Q13 with real graph maintenance: each ingested micro-batch flows
    into a live SearchService via on_batch=add_vectors — after the stream
    drains, the HNSW index serves the newly ingested vectors (an ingested
    embedding finds itself at distance 0)."""
    from neighborly_spark.search_service import SearchService
    from neighborly_spark.streaming.ingest import normalize_events_to_vectors

    base = (
        spark.createDataFrame([], "id string, embedding array<float>, tags array<smallint>, "
                              "original_text string, priority tinyint, user_id long, org_id long")
        .repartition(2)
    )
    svc = SearchService(base, dim=8)
    svc.build_index("hnsw")
    q = start_ingest(
        spark,
        events_landing,
        EVENTS_SCHEMA,
        str(tmp_path / "vectors"),
        str(tmp_path / "ckpt"),
        dim=8,
        on_batch=svc.add_vectors,
    )
    q.awaitTermination(120)
    assert svc._hnsw_graph.count() == 1000
    probe = svc.df.limit(1).collect()[0]
    got = svc.search(query_vec=list(probe.embedding), k=3, method="hnsw").collect()
    assert got[0].dist == 0.0


def test_stream_ingest_incremental_quantizers(spark, events_landing, tmp_path):
    """Q13 for the quantizer family: micro-batches flow into a live
    SearchService via on_batch=add_vectors; the bq/sq/ivfpq artifacts
    APPEND the new rows encoded against the models trained on the base
    (no retrain), and each serves an ingested embedding at distance 0
    via its exact-rerank tier."""
    import numpy as np

    from neighborly_spark.search_service import SearchService

    rng = np.random.default_rng(3)
    base_rows = [
        (f"base-{i}", [float(x) for x in rng.normal(0, 1, 8)], None, None, None, None, None)
        for i in range(50)
    ]
    base = spark.createDataFrame(
        base_rows,
        "id string, embedding array<float>, tags array<smallint>, "
        "original_text string, priority tinyint, user_id long, org_id long",
    ).repartition(2)
    svc = SearchService(base, dim=8)
    for m in ("bq", "sq", "ivfpq"):
        svc.build_index(m)
    models = (svc._bq_threshold, svc._sq_model, svc._ivfpq_model)
    q = start_ingest(
        spark,
        events_landing,
        EVENTS_SCHEMA,
        str(tmp_path / "vectors"),
        str(tmp_path / "ckpt"),
        dim=8,
        on_batch=svc.add_vectors,
    )
    q.awaitTermination(120)
    # artifacts cover base + ingested rows; models untouched (append path)
    assert svc._sq_codes.count() == 1050
    assert svc._ivfpq_encoded.count() == 1050
    assert svc._bq_codes.count() == 1050
    assert (svc._bq_threshold, svc._sq_model, svc._ivfpq_model) == models
    probe = svc.df.filter(F.col("id").startswith("base-") == False).limit(1).collect()[0]  # noqa: E712
    # sq default (r6) is the pure dequantized tier: the self-query ranks
    # first but its reported distance is the quantized one (~decode eps),
    # not exact 0.0 — the rerank tier stays exact opt-in
    got = svc.search(query_vec=list(probe.embedding), k=3, method="sq").collect()
    assert got[0].id == probe.id, "sq"
    got = svc.search(query_vec=list(probe.embedding), k=3, method="sq", sq_rerank=True).collect()
    assert got[0].id == probe.id and got[0].dist == 0.0, "sq rerank"
    got = svc.search(query_vec=list(probe.embedding), k=3, method="ivfpq").collect()
    assert got[0].id == probe.id and got[0].dist == 0.0, "ivfpq"


def test_stream_ingest_idempotent_rejects_plain_append_target(spark, events_landing, tmp_path):
    """Round-9 ADVICE: idempotent=True on a target already holding plain-
    append (non-partitioned) parquet would mix root-level files with
    _batch_id=... partition directories and break partition discovery —
    detected up front, raised with a migration hint."""
    target = str(tmp_path / "vectors")
    spark.range(3).withColumnRenamed("id", "x").write.parquet(target)
    with pytest.raises(ValueError, match="fresh target"):
        start_ingest(
            spark, events_landing, EVENTS_SCHEMA, target,
            str(tmp_path / "ckpt"), dim=8, idempotent=True,
        )
