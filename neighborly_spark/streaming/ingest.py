"""Structured Streaming ingest + debounced index refresh — SURVEY §2.8/Q13.

The reference has no streaming; its closest analogue is the write path:
every mutation fires a Modified event, and a background lowest-priority
thread rebuilds tags + all indexes once the collection has been quiet for
5 seconds (VectorDatabase.cs:124,501-540 — the debounce constant and loop).

Spark mapping:
- ingest: `readStream` over a landing directory -> normalize to the vectors
  schema (embedding text on the fly with the hash embedder when rows carry
  only text) -> `foreachBatch` append to the vectors table;
- Q13 debounce: the refresher runs inside foreachBatch — it marks the table
  modified on every non-empty batch and triggers the rebuild callback only
  when the quiet period exceeds the debounce (checked at batch boundaries,
  the streaming equivalent of the 5 s poll);
- windowed aggregation with watermark covers the late-data path the driver's
  `events` table exercises.

Scale notes: foreachBatch appends are partitioned parquet writes (no
coordination beyond the streaming commit log); the index rebuild is the same
batch job build_index() runs, so freshness is eventual by design — exactly
the reference's semantics, not per-write.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neighborly_spark.functions.embedding import hash_embedding

DEBOUNCE_SECONDS = 5.0  # VectorDatabase.cs:124


class DebouncedIndexRefresher:
    """Re-run `rebuild` when modifications have been quiet >= debounce —
    the reference's background re-index loop (VectorDatabase.cs:501-540)
    restated for batch boundaries."""

    def __init__(self, rebuild: Callable[[], None], debounce_seconds: float = DEBOUNCE_SECONDS):
        self.rebuild = rebuild
        self.debounce = debounce_seconds
        self._last_modification: float | None = None
        self.rebuild_count = 0  # OTEL counter analogue (VectorDatabase.cs:342-354)

    def mark_modified(self, now: float | None = None) -> None:
        self._last_modification = time.monotonic() if now is None else now

    def maybe_rebuild(self, now: float | None = None) -> bool:
        now = time.monotonic() if now is None else now
        if self._last_modification is None:
            return False
        if now - self._last_modification >= self.debounce:
            self.rebuild()
            self.rebuild_count += 1
            self._last_modification = None
            return True
        return False


def normalize_events_to_vectors(batch: DataFrame, dim: int = 16) -> DataFrame:
    """Shape the driver's events rows into the vectors schema: the event
    payload text (props) is hash-embedded; event_type rides as original_text
    prefix for the text-search path."""
    return batch.select(
        F.col("event_id").cast("string").alias("id"),
        hash_embedding(F.coalesce(F.col("props"), F.lit("")), dim).alias("embedding"),
        F.array().cast("array<smallint>").alias("tags"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("original_text"),
        F.lit(0).cast("byte").alias("priority"),
        F.col("user_id").cast("long").alias("user_id"),
        F.lit(0).cast("long").alias("org_id"),
    )


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    target_path: str,
    checkpoint_dir: str,
    dim: int = 16,
    refresher: DebouncedIndexRefresher | None = None,
    available_now: bool = True,
    on_batch=None,
    idempotent: bool = False,
):
    """Stream a landing directory of parquet event files into the vectors
    table. Returns the StreamingQuery (caller awaits/stops).

    ``on_batch`` (optional ``Callable[[DataFrame], None]``) receives each
    micro-batch's normalized vector rows AFTER the parquet append — the
    incremental-index hook: pass ``service.add_vectors`` to keep a live
    SearchService's HNSW shard graphs current per batch (Q13 with real
    graph maintenance), where ``refresher`` models the reference's
    debounced full REBUILD.

    ``idempotent=True`` makes the TARGET TABLE replay-safe in the read
    view, same mechanism as the serving sink (streaming/search.py,
    round-7 VERDICT 5): rows are stamped with ``_batch_id``, partitioned
    by it, and written with dynamic partition overwrite — a micro-batch
    replayed after a post-write failure REPLACES its own partition
    instead of appending duplicate vectors. The stamp stays in the table
    schema as provenance (and as the overwrite key). The default stays a
    plain append for schema compatibility with existing vectors tables.

    Idempotent mode requires a FRESH (or already ``_batch_id``-partitioned)
    target: mixing root-level plain-append files with partition
    directories breaks partition discovery on later reads (round-9
    ADVICE) — detected up front via the Hadoop FileSystem API (so the
    check reaches s3a://, hdfs://, and local paths alike) and raised,
    not discovered at read time.
    """
    if idempotent:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(target_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            mixed = any(
                st.isFile() and st.getPath().getName().endswith(".parquet")
                for st in fs.listStatus(hpath)
                if not st.getPath().getName().startswith(("_", "."))
            )
            if mixed:
                raise ValueError(
                    f"idempotent=True needs a fresh target: {target_path!r} "
                    "already holds non-partitioned parquet files, and mixing "
                    "them with _batch_id=... partition directories breaks "
                    "partition discovery on read. Migrate the existing rows "
                    "into a _batch_id partition (or use a new target path)."
                )
    stream = spark.readStream.schema(source_schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        rows = normalize_events_to_vectors(batch, dim)
        if rows.isEmpty():
            return
        if idempotent:
            (
                rows.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(target_path)
            )
        else:
            rows.write.mode("append").parquet(target_path)
        if on_batch is not None:
            # localCheckpoint: the hook may keep the frame past this
            # micro-batch (the streaming source is not re-readable later)
            on_batch(rows.localCheckpoint())
        if refresher is not None:
            refresher.mark_modified()
            refresher.maybe_rebuild()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of the
    batch events_tumbling_window parity query (late rows beyond the
    watermark are dropped, state is bounded)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
