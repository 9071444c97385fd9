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
exactly Structured Streaming's knob. The snapshot tier composes: a
snapshot-backed service serves every micro-batch worker-resident (graph
bytes move executor<-storage once per worker per version, queries are
the only per-batch shuffle). Delivery to the sink is at-least-once (a
replayed micro-batch appends its rows again — foreachBatch's contract);
every result row carries its `_batch_id`, so readers dedup replays with
one `row_number() over (partition by query_id, id, _batch_id)`-style
pass or by max-batch-id per key.
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
    Results append to ``sink_path`` (parquet) with the micro-batch id
    stamped for exactly-once dedup on replay; ``on_results`` (optional
    ``Callable[[DataFrame], None]``) receives each batch's results after
    the append (localCheckpoint'd — safe to keep past the batch)."""
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
            out.withColumn("_batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink_path)
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
