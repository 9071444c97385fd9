"""Recall evidence at the bench's 150k x 64d tier: MLlib trainers vs the
sampled one-pass trainers (quantization.pq_train_sampled /
ivf.ivf_train_sampled). Regenerates the '150k tier' table in
docs/RECALL.md — the gate for making sampled trainers the
SearchService.build_index default (NOTES.md round-2 item 3).

Method: 150k vectors = orders rows hash-embedded at dim 64 (exactly the
bench's _synth_vectors), 8 held-out query vectors, recall@10 vs exact kNN,
plus wall-clock train time for each trainer.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from neighborly_spark.functions.embedding import hash_embedding_fast
from neighborly_spark.operators import ivf as IVF
from neighborly_spark.operators import quantization as QZ
from neighborly_spark.operators.knn import knn
from neighborly_spark.parity import load
from neighborly_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM, K = 64, 10


def main() -> None:
    spark = get_spark(app_name="recall-at-scale", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    spark.sparkContext.setLogLevel("ERROR")
    orders = load(spark, SF_DIR, "orders")
    vec = (
        orders.select(
            F.col("o_orderkey").alias("id"),
            hash_embedding_fast(
                F.concat_ws(" ", "o_orderpriority", "o_orderstatus", F.col("o_totalprice").cast("string")), DIM
            ).alias("embedding"),
        )
        .repartition(int(os.environ["SPARK_GRAFT_CPUS"]))
        .cache()
    )
    n = vec.count()
    queries = [r.embedding for r in vec.orderBy(F.xxhash64("id")).limit(5).collect()]
    truth = [
        {r.id for r in knn(vec, list(q), K).collect()} for q in queries
    ]

    def recall(result_sets):
        hits = sum(len(t & g) for t, g in zip(truth, result_sets))
        return hits / (K * len(truth))

    rows = []

    for name, trainer in [("pq_mllib", QZ.pq_train), ("pq_sampled", QZ.pq_train_sampled)]:
        print(f"training {name}...", file=sys.stderr)
        t0 = time.perf_counter()
        model = trainer(vec, DIM, num_centroids=64, max_iter=20)
        t_train = time.perf_counter() - t0
        codes = QZ.pq_encode(vec, model).cache()
        codes.count()
        got = [
            {r.id for r in QZ.pq_search(codes, model, list(q), K).collect()} for q in queries
        ]
        rows.append((name, f"m={model.m},k={model.num_centroids}", recall(got), t_train))
        codes.unpersist()

    for name, trainer in [("ivf_mllib", IVF.ivf_train), ("ivf_sampled", IVF.ivf_train_sampled)]:
        print(f"training {name}...", file=sys.stderr)
        t0 = time.perf_counter()
        model = trainer(vec, nlist=32)
        t_train = time.perf_counter() - t0
        assigned = IVF.ivf_assign(vec, model).cache()
        assigned.count()
        got = [
            {r.id for r in IVF.ivf_search(assigned, model, list(q), K, nprobe=4).collect()}
            for q in queries
        ]
        rows.append((name, "nlist=32,nprobe=4", recall(got), t_train))
        assigned.unpersist()

    print(f"\n| trainer | params | recall@10 | train sec | (n={n}) |")
    print("|---------|--------|-----------|-----------|--|")
    for name, params, rec, t_train in rows:
        print(f"| {name} | {params} | {rec:.2f} | {t_train:.1f} | |")


if __name__ == "__main__":
    main()
