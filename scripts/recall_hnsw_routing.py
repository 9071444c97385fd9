"""Recall-vs-probe_shards evidence for HNSW shard routing (round-3 VERDICT
item 1): on the clusterable 150k x 64d tier (same deterministic
Gaussian-mixture synthetic as recall_clusterable.py), build the graph twice —
hash-sharded (the default layout) and SPATIAL (coarse-quantizer cells) — and
measure recall@10 at probe_shards p in {1, 2, 4, 8, all} over 20 held-out
point queries, with per-batch wall time.

Expected shape (and the reason hnsw_build grew `spatial=`): hash shards are
uniform subsamples of the dataset, so probing p of S recovers ~p/S recall —
routing CANNOT discriminate over them; spatial shards cover regions, so a
small p holds the 0.8 bar while doing p/S of the work. The table lands in
docs/RECALL.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from pyspark.sql import functions as F  # noqa: E402

from neighborly_spark.operators.hnsw import (  # noqa: E402
    hnsw_build,
    hnsw_routing_table,
    hnsw_search_batch,
)
from neighborly_spark.operators.knn import knn  # noqa: E402
from neighborly_spark.session import get_spark  # noqa: E402
from recall_clusterable import mixture  # noqa: E402

N, DIM, NCLUST, K, NQUERY, SHARDS = 150_000, 64, 64, 10, 20, 16


def main() -> None:
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = get_spark(app_name="recall-hnsw-routing", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    vec = mixture(spark, N, DIM, NCLUST, 2.0, cpus)
    vec.count()
    queries = [list(r.embedding) for r in vec.orderBy(F.xxhash64("id")).limit(NQUERY).collect()]
    truth = [{r.id for r in knn(vec, q, K).collect()} for q in queries]

    rows = []
    for layout, spatial in (("hash", False), ("spatial", True)):
        t0 = time.perf_counter()
        g = hnsw_build(vec, dim=DIM, num_partitions=SHARDS, spatial=spatial).cache()
        g.count()
        build_sec = time.perf_counter() - t0
        rt = hnsw_routing_table(g).cache()
        rt.count()
        for p in (1, 2, 4, 8, None):
            t0 = time.perf_counter()
            got = hnsw_search_batch(
                g, list(enumerate(queries)), K, probe_shards=p, routing=rt
            ).collect()
            batch_sec = time.perf_counter() - t0
            by_q: dict[int, set] = {}
            for r in got:
                by_q.setdefault(r.query_id, set()).add(r.id)
            rec = sum(len(truth[i] & by_q.get(i, set())) for i in range(NQUERY)) / (K * NQUERY)
            rows.append((layout, "all" if p is None else str(p), rec, batch_sec, build_sec))
        rt.unpersist()
        g.unpersist()

    print(f"\n| layout | probe_shards (of {SHARDS}) | recall@10 | batch sec ({NQUERY} queries) | build sec |")
    print("|--------|--------------|-----------|-----------|-----------|")
    for layout, p, rec, bsec, bld in rows:
        print(f"| {layout} | {p} | {rec:.2f} | {bsec:.2f} | {bld:.1f} |")


if __name__ == "__main__":
    main()
