"""Streaming query serving — unbounded query streams against a prebuilt
index (SURVEY §2.8 x Q8/Q10).

The reference's server serves an unbounded stream of search RPCs against
the in-memory database (API.gRPC/Services/VectorService.cs:73-85 — each
request is a point query against the live indexes). The Spark-first
restatement is Structured Streaming over the DataFrame-native batch
tiers (round 7): a `readStream` of (query_id, query_embedding) rows,
`foreachBatch` handing each micro-batch — a plain DataFrame — to
`SearchService.search_batch`, which serves it from the prebuilt artifact
in ONE pass per micro-batch (hnsw: one rehydration per shard per batch;
ivfpq: one probed-cells pass; sq/bq: one code scan). No collect anywhere:
the micro-batch flows into the tier as a table, so a batch of 10 rows and
a batch of 10 million rows take the same plan shape.

Scale notes (100 TB serving): throughput is bounded by the per-batch
artifact pass, so latency/throughput trades via the trigger interval —
exactly Structured Streaming's knob. The snapshot tiers compose: a
snapshot-backed service serves every micro-batch worker-resident — hnsw
graph bytes (hnsw_search_batch_snapshot) and ivfpq code bytes
(ivfpq_knn_join_snapshot) move executor<-storage once per worker per
version, queries are the only per-batch shuffle.

Sink delivery is effectively-once IN THE READ VIEW (round-7 VERDICT 5):
foreachBatch itself is at-least-once (a failure after the write but
before the offset commit replays the batch), but the sink partitions by
`_batch_id` and writes with dynamic partition overwrite — a replayed
micro-batch atomically REPLACES its own partition instead of appending a
duplicate, so `spark.read.parquet(sink_path)` never shows two copies of
a batch. Readers need no dedup pass; `_batch_id` stays in the schema as
provenance (and as the overwrite key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_query_stream(
    queries_stream: DataFrame,
    service,
    checkpoint_dir: str,
    k: int = 10,
    method: str = "hnsw",
    sink_path: str | None = None,
    available_now: bool = True,
    on_results=None,
    **search_kw,
):
    """Serve a streaming (query_id, query_embedding) source against a
    SearchService's prebuilt index. Returns the StreamingQuery.

    Each micro-batch goes through ``service.search_batch(batch, k=k,
    method=method, **search_kw)`` — the DataFrame-native path, so tag
    filters (``tag_any=``/``tag_all=``), ``metric='cosine'``,
    ``hnsw_probe_shards=`` and the snapshot tier all compose unchanged.
    Results land in ``sink_path`` (parquet, partitioned by the stamped
    ``_batch_id``) via dynamic partition overwrite, so a replayed
    micro-batch replaces its own partition — the read view is
    replay-safe with no reader-side dedup (round-7 VERDICT 5).
    ``on_results`` (optional ``Callable[[DataFrame], None]``) receives
    each batch's results after the write (localCheckpoint'd — safe to
    keep past the batch)."""
    from pyspark.sql import functions as F

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out = service.search_batch(batch, k=k, method=method, **search_kw)
        if on_results is not None:
            # checkpoint BEFORE the write so the search pipeline runs once:
            # writing first and checkpointing after would re-execute the
            # whole index search a second time (localCheckpoint is eager
            # and the plan is uncached)
            out = out.localCheckpoint()
        if sink_path is not None:
            # idempotent on replay: only the _batch_id=N partition present
            # in this write is overwritten (dynamic mode); other batches'
            # partitions are untouched
            (
                out.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(sink_path)
            )
        if on_results is not None:
            on_results(out)

    writer = (
        queries_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
