"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver materialization cost). Two timed runs per query, min taken, to damp
JIT/cache noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

from neighborly_spark.parity import REGISTRY
from neighborly_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: representative of each operator family, heaviest first.
BENCH_QUERIES: list[str] = [
    "knn_euclidean",
    "knn_cosine",
    "knn_manhattan",
    "range_search_euclidean",
    "knn_join",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
    spark = get_spark(app_name="neighborly-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths once
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        build = REGISTRY[name].build
        _force(build(spark, SF_DIR))  # warm-up run (parquet footer cache, codegen)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(build(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
