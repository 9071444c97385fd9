"""applyInPandasWithState streaming dedup: first occurrence emitted once,
replays dropped — within a batch (normalization collisions) and across
micro-batch runs (checkpointed state). Plus the streaming as-of join's
batch-equality twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from neighborly_spark.streaming.stateful import streaming_asof_join, streaming_dedup

SCHEMA = "id string, text string"


def _write_batch(spark, path, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(path / name)
    )


def _run_stream(spark, landing, tmp_path):
    """Run to completion, return all rows emitted so far (parquet sink —
    the memory sink can't recover from a checkpoint across runs)."""
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing / "*"))
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(str(tmp_path / "out")).collect()


def test_streaming_dedup_within_and_across_batches(spark, tmp_path):
    landing = tmp_path / "docs"
    landing.mkdir()
    # fewer state partitions: each one spawns a Python worker per micro-batch
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        # batch 0: a1/a2 normalize to the SAME fingerprint; b1 unique
        _write_batch(
            spark,
            landing,
            [("a1", "hello world"), ("a2", "hello  WORLD "), ("b1", "doc two")],
            "b0",
        )
        first = _run_stream(spark, landing, tmp_path)
        assert len(first) == 2
        assert {r.id for r in first} == {"a1", "b1"}  # min-id representative wins

        # batch 1 replays an old doc + adds a new one; checkpointed state
        # carries the seen fingerprints, so only the new doc is emitted
        _write_batch(spark, landing, [("a9", "hello world"), ("c1", "doc three")], "b1")
        all_emitted = _run_stream(spark, landing, tmp_path)
        emitted = {r.id for r in all_emitted}
        assert "c1" in emitted and "a9" not in emitted
        assert len(all_emitted) == 3  # each fingerprint exactly once
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


LEFT_SCHEMA = "event_id long, user_id long, us long"
RIGHT_SCHEMA = "user_id long, us long, click_event_id long"


def test_streaming_asof_join_matches_batch(spark, tmp_path):
    """streaming_asof_join twin: the union+state formulation emits exactly
    the batch asof_join's matched rows — within one micro-batch AND across
    a checkpoint restart where the match's right row arrived in the earlier
    batch (state carry-over)."""
    from neighborly_spark.operators.joins import asof_join
    from neighborly_spark.parity import load

    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "us", F.unix_micros(F.col("ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us"
    )
    batch = asof_join(
        purchases, clicks, on="user_id", ts_col="us",
        right_cols=["click_event_id"], how="inner",
    )
    expected = {
        (r.user_id, r.us, r.event_id, r.r_us, r.r_click_event_id)
        for r in batch.collect()
    }
    assert expected  # fixture sanity: the join is non-trivial

    # stage each side in two TIME phases (per-key in-order across batches —
    # the operator's documented contract), one file per phase = one
    # micro-batch per run
    mid = ev.select(F.percentile_approx("us", 0.5).alias("m")).first().m
    lland, rland = tmp_path / "left", tmp_path / "right"
    lland.mkdir(), rland.mkdir()

    def stage(phase, pred):
        purchases.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(lland / f"p{phase}")
        )
        clicks.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(rland / f"c{phase}")
        )

    def run():
        ls = spark.readStream.schema(LEFT_SCHEMA).parquet(str(lland / "*"))
        rs = spark.readStream.schema(RIGHT_SCHEMA).parquet(str(rland / "*"))
        out = streaming_asof_join(ls, rs, on="user_id", ts_col="us",
                                  right_cols=["click_event_id"])
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out")).collect()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.col("us") < mid)
        first = run()
        stage(1, F.col("us") >= mid)
        rows = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r.user_id, r.us, r.event_id, r.r_us, r.r_click_event_id) for r in rows
    }
    assert len(first) < len(rows)  # both runs emitted
    assert got == expected


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Native stream-stream interval join twin: purchases landing inside
    click sessions (2h gap) — same rows as the batch bucketized
    interval_join on the full data."""
    from neighborly_spark.operators.joins import interval_join
    from neighborly_spark.operators.sessions import session_stats
    from neighborly_spark.parity import load
    from neighborly_spark.streaming.joins import streaming_interval_join

    # sf0.01 + 8h gap: 20 containment matches (sf0.001's 2h sessions
    # contain zero purchases — too sparse to test anything)
    ev = load(spark, "/root/testdata/sf0.01", "events")
    intervals = session_stats(
        ev.filter(F.col("event_type") == "click"), gap_sec=28800, value_col=None
    ).select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("start_ts"),
        F.timestamp_micros(F.col("end_us")).alias("end_ts"),
        "start_us",
        "end_us",
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.unix_micros(F.col("ts")).alias("us")
    )
    batch = interval_join(
        points.select("event_id", "user_id", "us"),
        intervals.select("user_id", "start_us", "end_us"),
        on="user_id",
    )
    expected = {
        (r.event_id, r.user_id, r.start_us, r.end_us) for r in batch.collect()
    }
    assert expected

    (points.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "p" / "f0")))
    (intervals.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "i" / "f0")))
    ps = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, us long"
    ).parquet(str(tmp_path / "p" / "*"))
    is_ = spark.readStream.schema(
        "user_id long, start_ts timestamp, end_ts timestamp, start_us long, end_us long"
    ).parquet(str(tmp_path / "i" / "*"))
    out = streaming_interval_join(
        ps, is_, on="user_id", point_ts="ts", start_ts="start_ts", end_ts="end_ts",
        watermark="1 hour", max_interval="30 days",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("stream_ij")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {
        (r.event_id, r.user_id, r.start_us, r.end_us)
        for r in spark.sql("SELECT * FROM stream_ij").collect()
    }
    assert got == expected


def test_streaming_asof_join_forward_matches_batch(spark, tmp_path):
    """Forward streaming as-of twin: signups pick up the NEXT purchase.
    Lefts whose match arrives in the LATER batch must buffer in state and
    emit on the second run — the forward-specific capability."""
    from neighborly_spark.operators.joins import asof_join
    from neighborly_spark.parity import load
    from neighborly_spark.streaming.stateful import streaming_asof_join_forward

    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "us", F.unix_micros(F.col("ts"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("next_purchase_id"))
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "us"
    )
    batch = asof_join(
        signups, purchases, on="user_id", ts_col="us",
        right_cols=["next_purchase_id"], how="inner", direction="forward",
    )
    expected = {
        (r.user_id, r.us, r.event_id, r.r_us, r.r_next_purchase_id)
        for r in batch.collect()
    }
    assert expected

    mid = ev.select(F.percentile_approx("us", 0.5).alias("m")).first().m
    lland, rland = tmp_path / "left", tmp_path / "right"
    lland.mkdir(), rland.mkdir()

    def stage(phase, pred):
        signups.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(lland / f"s{phase}")
        )
        purchases.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(rland / f"p{phase}")
        )

    def run():
        ls = spark.readStream.schema("event_id long, user_id long, us long").parquet(
            str(lland / "*")
        )
        rs = spark.readStream.schema(
            "user_id long, us long, next_purchase_id long"
        ).parquet(str(rland / "*"))
        out = streaming_asof_join_forward(
            ls, rs, on="user_id", ts_col="us", right_cols=["next_purchase_id"]
        )
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out")).collect()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.col("us") < mid)
        first = run()
        stage(1, F.col("us") >= mid)
        rows = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r.user_id, r.us, r.event_id, r.r_us, r.r_next_purchase_id) for r in rows
    }
    # cross-batch buffering actually exercised: run 2 emitted new matches
    assert len(first) < len(rows)
    assert got == expected


def test_streaming_funnel_matches_batch_across_restart(spark, tmp_path):
    """streaming_funnel twin: per-key earliest-greedy chains from the
    stateful operator equal the batch funnel_steps output — with events
    HASH-split across two checkpointed runs (arbitrary arrival order: the
    second batch delivers events that precede the first batch in event
    time, exercising the late-data chain recompute)."""
    from neighborly_spark.operators.sessions import funnel_steps
    from neighborly_spark.parity import load
    from neighborly_spark.streaming.stateful import streaming_funnel

    steps = ["signup", "click", "purchase"]
    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "us", F.unix_micros(F.col("ts"))
    )
    batch = funnel_steps(ev, steps)
    expected = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us, r.steps_completed, r.converted)
        for r in batch.collect()
    }
    assert expected

    schema = "event_id long, user_id long, us long, event_type string"
    src = ev.select("event_id", "user_id", "us", "event_type")
    landing = tmp_path / "ev"
    landing.mkdir()

    def stage(phase, pred):
        src.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"b{phase}")
        )

    def run():
        stream = spark.readStream.schema(schema).parquet(str(landing / "*"))
        out = streaming_funnel(stream, steps)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.xxhash64("event_id") % 2 == 0)
        first = run().collect()
        stage(1, F.xxhash64("event_id") % 2 != 0)
        final = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    from pyspark.sql import Window

    latest = (
        final.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("_rev").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_rev")
    )
    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us, r.steps_completed, r.converted)
        for r in latest.collect()
    }
    assert len(first) > 0
    assert got == expected


def test_streaming_minhash_neardup_matches_batch(spark, tmp_path):
    """streaming_minhash_neardup twin: the union of pair emissions over
    hash-split arrivals (with a checkpoint restart between them) equals
    the batch minhash_lsh_pairs output — same candidates, same exact
    verified jaccard values."""
    from neighborly_spark.operators.dedup import minhash_lsh_pairs
    from neighborly_spark.streaming.stateful import streaming_minhash_neardup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert batch  # fixture produces near-dups

    landing = tmp_path / "docs"
    landing.mkdir()

    def stage(phase, pred):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"b{phase}")
        )

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(landing / "*")
        )
        out = streaming_minhash_neardup(stream, threshold=0.3)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.xxhash64("doc_id") % 2 == 0)
        first = run().count()
        stage(1, F.xxhash64("doc_id") % 2 != 0)
        final = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {(r.id_a, r.id_b, r.jaccard) for r in final.distinct().collect()}
    assert first < final.count() or first == 0
    assert got == batch


def test_streaming_simhash_neardup_matches_batch(spark, tmp_path):
    """streaming_simhash_neardup twin: pair emissions over hash-split
    arrivals (checkpoint restart between them) equal the batch
    simhash_pairs output — same pigeonhole candidates, same hamming."""
    from neighborly_spark.operators.dedup import simhash_pairs
    from neighborly_spark.streaming.stateful import streaming_simhash_neardup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    assert batch

    landing = tmp_path / "docs"
    landing.mkdir()

    def stage(phase, pred):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"b{phase}")
        )

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(landing / "*")
        )
        out = streaming_simhash_neardup(stream, max_hamming=3)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.xxhash64("doc_id") % 2 == 0)
        run()
        stage(1, F.xxhash64("doc_id") % 2 != 0)
        final = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {(r.id_a, r.id_b, r.hamming) for r in final.distinct().collect()}
    assert got == batch


def test_streaming_winnow_neardup_matches_batch(spark, tmp_path):
    """streaming_winnow_neardup twin (round-3 VERDICT item 6 — family
    symmetry): pair emissions over hash-split arrivals with a checkpoint
    restart between them equal the batch winnow_neardup_pairs output —
    same fingerprint buckets, same exact set-Jaccard values."""
    from neighborly_spark.operators.dedup import winnow_neardup_pairs
    from neighborly_spark.streaming.stateful import streaming_winnow_neardup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        (r.id_a, r.id_b, r.winnow_jaccard)
        for r in winnow_neardup_pairs(docs, threshold=0.3).collect()
    }
    assert batch  # fixture produces near-dups

    landing = tmp_path / "docs"
    landing.mkdir()

    def stage(phase, pred):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"b{phase}")
        )

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(landing / "*")
        )
        out = streaming_winnow_neardup(stream, threshold=0.3)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.xxhash64("doc_id") % 2 == 0)
        run()
        stage(1, F.xxhash64("doc_id") % 2 != 0)
        final = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {(r.id_a, r.id_b, r.winnow_jaccard) for r in final.distinct().collect()}
    assert got == batch


def test_streaming_semantic_neardup_matches_batch(spark, tmp_path):
    """streaming_semantic_neardup twin (SemDeDup): pair emissions over
    hash-split arrivals with a checkpoint restart between them equal the
    batch exact tier — same literal-centroid assignment (shared Column
    expression), same cluster-bounded comparisons, and bit-identical
    cos_sim values (cosine+round run in the plan on the stored float32
    vectors, not in Python)."""
    from neighborly_spark.operators.dedup import semantic_dedup_pairs
    from neighborly_spark.streaming.stateful import streaming_semantic_neardup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    batch = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in semantic_dedup_pairs(
            emb, threshold=0.3, centroids=cents, materialize=True
        ).collect()
    }
    assert batch  # fixture produces near-dups at this threshold

    landing = tmp_path / "vecs"
    landing.mkdir()

    def stage(phase, pred):
        emb.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"b{phase}")
        )

    def run():
        stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(
            str(landing / "*")
        )
        out = streaming_semantic_neardup(stream, cents, threshold=0.3)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.xxhash64("vec_id") % 2 == 0)
        run()
        stage(1, F.xxhash64("vec_id") % 2 != 0)
        final = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {(r.id_a, r.id_b, r.cos_sim) for r in final.distinct().collect()}
    assert got == batch


def test_streaming_exact_substr_marks_matches_batch(spark, tmp_path):
    """streaming_exact_substr_marks twin (ExactSubstr family symmetry):
    marked duplicated-window emissions over hash-split arrivals with a
    checkpoint restart between them equal the batch operator's marked set
    — including occurrences that arrived BEFORE their window hash crossed
    min_count (they buffer in state and flush on the crossing arrival)."""
    from neighborly_spark.operators.dedup import _window_hashes
    from neighborly_spark.streaming.stateful import streaming_exact_substr_marks

    L = 4
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # batch marked set: all (doc,pos) windows whose hash occurs >= 2 times
    wins = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(_window_hashes(F.col("text"), L)).alias("pos", "wh"),
    )
    dup = wins.groupBy("wh").count().filter(F.col("count") >= 2).select("wh")
    batch = {(r.doc_id, r.pos) for r in wins.join(dup, "wh").select("doc_id", "pos").collect()}
    assert batch  # the low-vocab corpus has duplicated 4-token runs

    landing = tmp_path / "docs"
    landing.mkdir()

    def stage(phase, pred):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"b{phase}")
        )

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(landing / "*")
        )
        out = streaming_exact_substr_marks(stream, min_tokens=L, n_buckets=8)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stage(0, F.xxhash64("doc_id") % 2 == 0)
        run()
        stage(1, F.xxhash64("doc_id") % 2 != 0)
        run()
        # at-least-once REPLAY: re-deliver batch 0's docs in a new file —
        # the per-bucket seen-docs guard must not double-count their windows
        stage(2, F.xxhash64("doc_id") % 2 == 0)
        final = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {(r.doc_id, r.pos) for r in final.distinct().collect()}
    assert got == batch


def test_streaming_exact_substr_in_batch_replay_and_id_guard(spark, tmp_path):
    """Round 7: (a) an at-least-once duplicate landing INSIDE one
    micro-batch must not double-count window hashes (the prior-batch guard
    can't see it — the (doc,pos) in-batch guard must); (b) non-integral id
    columns fail loudly at plan time instead of crashing the state fn."""
    import pytest

    from neighborly_spark.streaming.stateful import streaming_exact_substr_marks

    rows = [
        (1, "alpha beta gamma delta unique one"),
        (2, "totally different words here now friend"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    landing = tmp_path / "in"
    landing.mkdir()
    # doc 1 delivered TWICE in the same micro-batch (union of itself)
    docs.filter(F.col("doc_id") == 1).unionAll(
        docs.filter(F.col("doc_id") == 1)
    ).unionAll(docs.filter(F.col("doc_id") == 2)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "b0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(landing / "*")
    )
    out = streaming_exact_substr_marks(stream, min_tokens=4, n_buckets=4)
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out")).collect()
    # no window hash truly repeats across docs, so NOTHING is duplicated —
    # the old guard double-counted doc 1's own windows and marked them all
    assert got == []

    with pytest.raises(ValueError, match="integral"):
        streaming_exact_substr_marks(
            spark.readStream.schema("doc_id string, text string").parquet(
                str(landing / "*")
            ),
            min_tokens=4,
        )
