"""applyInPandasWithState streaming dedup: first occurrence emitted once,
replays dropped — within a batch (normalization collisions) and across
micro-batch runs (checkpointed state)."""

from __future__ import annotations

from neighborly_spark.streaming.stateful import streaming_dedup

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
