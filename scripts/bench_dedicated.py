"""Dedicated-session bench A/B: run ONE bench entry alone in a fresh
SparkSession (warm-up + median-of-3, the bench protocol) so a cross-round
delta can be adjudicated code-vs-environment without the shared set's
cache pressure. This is the method that settled pq_search_150k (round 8)
and knn_join_32x150k / hnsw_search_150k (round 9, NOTES.md) — checked in
so the adjudications stay reproducible.

Usage:
  python scripts/bench_dedicated.py <entry_name> [repo_root]

Pass a worktree path as repo_root to time ANOTHER round's code on the
same host/hour (e.g. `git worktree add /tmp/wt_rN <commit>` then
`python scripts/bench_dedicated.py knn_join_32x150k /tmp/wt_rN`).
Prints one JSON line {entry, root, median, runs}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    name = sys.argv[1]
    root = os.path.abspath(sys.argv[2]) if len(sys.argv) > 2 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench  # noqa: E402  (resolved from `root`)
    from neighborly_spark.session import get_spark  # noqa: E402

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
    spark = get_spark(app_name=f"dedicated_{name}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf = bench._relayout(spark, bench.SF_DIR, cpus)
    bench.SF_DIR = sf
    build = (
        bench.BENCH_LOCAL.get(name)
        or bench.BENCH_STEADY.get(name)
        or bench.BENCH_SINGLE.get(name)
    )
    if build is None:
        raise SystemExit(f"unknown bench entry {name!r}")
    bench._force(build(spark, sf))  # warm-up + untimed fits
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        bench._force(build(spark, sf))
        runs.append(round(time.perf_counter() - t0, 4))
    print(json.dumps(
        {"entry": name, "root": root, "median": sorted(runs)[1], "runs": runs}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
