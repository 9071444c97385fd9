"""Recall evidence on CLUSTERABLE data (VERDICT r2 item 4).

The 150k hash-embedded tier in recall_at_scale.py is uniform-random — the
adversarial case for quantizers, where IVF/PQ measured 0.36-0.78 (below the
reference's 0.80 acceptance bar, Tests/HNSWBenchmarkTests.cs:169). Real
embedding corpora are clustered; this script produces the evidence on that
regime: a deterministic Gaussian-mixture-style synthetic (150k x 64d,
64 components, hash-derived noise — no RNG in the plan, same data every
run) at two separations, measuring IVF (sampled trainer) and PQ (sampled
trainer, pure-ADC and ADC+rerank) recall@10 over 20 held-out point queries.

Writes the markdown table pasted into docs/RECALL.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from neighborly_spark.operators import ivf as IVF
from neighborly_spark.operators import quantization as QZ
from neighborly_spark.operators.knn import knn
from neighborly_spark.session import get_spark

N, DIM, NCLUST, K, NQUERY = 150_000, 64, 64, 10, 20


def mixture(spark, n: int, dim: int, nclust: int, noise_scale: float, cpus: int):
    """id -> component by modulo; embedding = component center + uniform
    hash-noise in [-scale/2, scale/2) per dim. Centers ~ N(0,1)^dim from a
    fixed NumPy seed (driver-side constant, broadcast as a literal); the
    per-row noise is xxhash64(id, dim_index) — fully deterministic, no RNG
    expression in the plan."""
    centers = np.random.RandomState(7).standard_normal((nclust, dim))
    centers_lit = F.lit([[float(v) for v in row] for row in centers]).cast("array<array<double>>")
    comp = (F.col("id") % nclust).cast("int")
    center = F.element_at(centers_lit, comp + 1)
    emb = F.transform(
        center,
        lambda x, j: (
            x + (F.pmod(F.xxhash64(F.col("id"), j), 1_000_000) / 1_000_000.0 - 0.5) * noise_scale
        ).cast("float"),
    )
    return (
        spark.range(n)
        .select(F.col("id"), emb.alias("embedding"))
        .repartition(cpus)
        .cache()
    )


def main() -> None:
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = get_spark(app_name="recall-clusterable", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for regime, scale in [("separated", 2.0), ("overlapping", 4.0)]:
        vec = mixture(spark, N, DIM, NCLUST, scale, cpus)
        vec.count()
        queries = [list(r.embedding) for r in vec.orderBy(F.xxhash64("id")).limit(NQUERY).collect()]
        truth = [{r.id for r in knn(vec, q, K).collect()} for q in queries]

        def recall(got):
            return sum(len(t & g) for t, g in zip(truth, got)) / (K * len(truth))

        t0 = time.perf_counter()
        ivf_model = IVF.ivf_train_sampled(vec, nlist=NCLUST)
        t_ivf = time.perf_counter() - t0
        assigned = IVF.ivf_assign(vec, ivf_model).cache()
        assigned.count()
        for nprobe in (1, 2, 4):
            got = [
                {r.id for r in IVF.ivf_search(assigned, ivf_model, q, K, nprobe=nprobe).collect()}
                for q in queries
            ]
            rows.append((regime, "ivf_sampled", f"nlist={NCLUST},nprobe={nprobe}", recall(got), t_ivf))
        assigned.unpersist()

        t0 = time.perf_counter()
        pq_model = QZ.pq_train_sampled(vec, DIM, m=16, num_centroids=64, max_iter=20)
        t_pq = time.perf_counter() - t0
        codes = QZ.pq_encode(vec, pq_model).cache()
        codes.count()
        got = [{r.id for r in QZ.pq_search(codes, pq_model, q, K).collect()} for q in queries]
        rows.append((regime, "pq_adc", "m=16,k=64", recall(got), t_pq))
        for shortlist in (100, 500):
            got = [
                {r.id for r in QZ.pq_search_rerank(vec, codes, pq_model, q, K, shortlist=shortlist).collect()}
                for q in queries
            ]
            rows.append((regime, "pq_adc+rerank", f"m=16,k=64,shortlist={shortlist}", recall(got), t_pq))
        codes.unpersist()
        vec.unpersist()

    print(f"\n| data | method | params | recall@10 | train sec | (n={N}, {NQUERY} queries) |")
    print("|------|--------|--------|-----------|-----------|--|")
    for regime, name, params, rec, t_train in rows:
        print(f"| {regime} | {name} | {params} | {rec:.2f} | {t_train:.1f} | |")


if __name__ == "__main__":
    main()
