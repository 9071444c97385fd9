"""A/B: hash repartition vs repartitionByRange on the snapshot tier's
group keys (round 8 follow-up to the AQE-serialization fix). Hash
placement of G groups into P partitions is balls-in-bins (max load ~2-3x
mean at G ~= 2P); range placement is contiguous and balanced by sampled
row counts. Both are AQE-coalescing-exempt and satisfy the grouped
applyInPandas clustering (verified: one Exchange either way).

Usage: python scripts/ab_snapshot_partitioner.py [n_runs]
Builds the bench's 100k-query spatial-snapshot shape at sf0.1 and times
hnsw_search_batch_snapshot under NB_SNAP_RANGE=0/1, alternating.

RESULT (2026-08-16, 150k rows / 16 shards / salt 4 / 100k queries,
local[32]): hash 28.5 / 29.8 s, range 36.2 / 38.2 s — range LOST ~30%.
The boundary-sampling pass re-scans the embedding-carrying assignment
rows, and boundaries sampled over only ~64 distinct keys can collapse
neighboring groups into one partition. The production code keeps the
hash repartition (hnsw.py documents this negative result); the
NB_SNAP_RANGE toggle it exercised has been removed, so re-running this
script now times hash against itself unless the toggle is restored.
"""

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neighborly_spark.session import get_spark


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    from neighborly_spark.operators.hnsw import (
        hnsw_build,
        hnsw_routing_table,
        hnsw_search_batch_snapshot,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf)
    import bench  # the bench's synthetic 150k-vector table (orders-hash-embedded)

    vec = bench._synth_vectors(spark, sf)
    n = vec.count()
    print(f"rows={n}")
    g = hnsw_build(vec, dim=64, num_partitions=16, spatial=True).cache()
    g.count()
    rt = hnsw_routing_table(g).cache()
    rt.count()
    path = tempfile.mkdtemp(prefix="ab_snap_") + "/graph"
    g.write.partitionBy("part_id").parquet(path)
    pids = [r.part_id for r in g.select("part_id").distinct().collect()]
    ver = uuid.uuid4().hex
    g.unpersist()
    qdf = vec.select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).limit(100_000).cache()
    qdf.count()

    def run(mode: str) -> float:
        os.environ["NB_SNAP_RANGE"] = mode
        t0 = time.perf_counter()
        out = hnsw_search_batch_snapshot(
            spark, path, pids, qdf, 10, version=ver, ef=64,
            probe_shards=2, routing=rt, query_salt=4,
        )
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("0")  # warm worker LRUs once, untimed
    for i in range(n_runs):
        for mode, label in (("0", "hash "), ("1", "range")):
            print(f"run {i} {label}: {run(mode):.2f} s", flush=True)


if __name__ == "__main__":
    main()
