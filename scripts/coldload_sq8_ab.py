"""Cold-load A/B for SQ8-quantized hnsw snapshot artifacts (round 10,
VERDICT 5): time hnsw_search_batch_snapshot over a float artifact vs an
SQ8 artifact of the SAME graph with the worker LRU defeated (a fresh
version string per sample forces every shard to re-read + rehydrate), so
each sample pays the full cold path the quantization shrinks. Local runs
under-state the win: the OS page cache hides most of the 4x byte
reduction that dominates on remote storage (s3/hdfs); what remains
visible locally is parquet decode + rehydrate over fewer bytes.

Also prints the artifact byte totals and a WARM sample per tier (version
held fixed) to show resident serving is unchanged.

Usage: python scripts/coldload_sq8_ab.py [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(d)
        for f in fs
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench  # noqa: E402
    from neighborly_spark.operators.hnsw import (  # noqa: E402
        hnsw_build,
        hnsw_search_batch_snapshot,
        hnsw_snapshot_write,
    )
    from neighborly_spark.session import get_spark  # noqa: E402

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
    spark = get_spark(app_name="coldload_sq8_ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf = bench._relayout(spark, bench.SF_DIR, cpus)
    vec = bench._synth_vectors(spark, sf)
    g = hnsw_build(vec, dim=64).cache()
    g.count()
    queries = [(int(r.id), list(r.embedding)) for r in vec.limit(32).collect()]
    base = tempfile.mkdtemp(prefix="sq8_ab_")
    paths = {"float": f"{base}/float", "sq8": f"{base}/sq8"}
    sq8 = {
        "float": hnsw_snapshot_write(g, paths["float"]),
        "sq8": hnsw_snapshot_write(g, paths["sq8"], dim=64, sq8=True),
    }
    pids = [r.part_id for r in g.select("part_id").distinct().collect()]

    def sample(tier: str, version: str) -> float:
        t0 = time.perf_counter()
        bench._force(
            hnsw_search_batch_snapshot(
                spark, paths[tier], pids, queries, 10,
                version=version, sq8=sq8[tier],
            )
        )
        return round(time.perf_counter() - t0, 4)

    out: dict = {
        "entry": "hnsw_snapshot32_150k_coldload",
        "bytes": {t: _dir_bytes(p) for t, p in paths.items()},
        "cold": {}, "warm": {},
    }
    for tier in ("float", "sq8"):
        sample(tier, uuid.uuid4().hex)  # one throwaway: JIT/codegen warm
        cold = [sample(tier, uuid.uuid4().hex) for _ in range(runs)]
        ver = uuid.uuid4().hex
        sample(tier, ver)  # fill the LRU
        warm = [sample(tier, ver) for _ in range(3)]
        out["cold"][tier] = {"median": sorted(cold)[len(cold) // 2], "runs": cold}
        out["warm"][tier] = {"median": sorted(warm)[1], "runs": warm}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
