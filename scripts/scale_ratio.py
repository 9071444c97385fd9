"""Two-size scale-ratio evidence (round-3 VERDICT item 4): the 100 TB
claims are design-argued and plan-asserted; this measures them on two real
sizes. Runs the dedup family, the kNN-join, and HNSW build+search at
sf0.01 and sf0.1 — the driver's own generator at a 10x row ratio, so the
duplicate-rate/content characteristics match across sizes (synthetic
replication would inflate near-dup candidate counts quadratically and
poison the ratio) — and records wall time, output-pair counts, and
candidate counts.

Reading the table: near-linear wall ratios (<= ~10x for 10x data, minus
the Spark fixed overhead that dominates the small size) confirm the
candidate-generation designs; a superlinear pair-count ratio is the signal
an operator degenerates to all-pairs. Results land in docs/SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from pyspark.sql import functions as F  # noqa: E402

from neighborly_spark.functions.embedding import hash_embedding_fast  # noqa: E402
from neighborly_spark.session import get_spark  # noqa: E402

SIZES = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]


def _force(df) -> int:
    return df.count()


def main() -> None:
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = get_spark(app_name="scale-ratio", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    import math

    from neighborly_spark.operators.dedup import (
        exact_substr_spans,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        semantic_dedup_pairs,
        simhash_pairs,
        winnow_neardup_pairs,
    )
    from neighborly_spark.operators.ivf import ivf_train_sampled
    from neighborly_spark.operators.hnsw import hnsw_build, hnsw_search
    from neighborly_spark.operators.knn import knn_join_vectorized

    results: list[tuple[str, str, int, int, float]] = []  # (op, size, rows_in, rows_out, sec)

    for label, sf_dir in SIZES:
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cpus)
            .cache()
        )
        n_docs = docs.count()
        vec = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(
                F.col("o_orderkey").alias("id"),
                hash_embedding_fast(
                    F.concat_ws(
                        " ", "o_orderpriority", "o_orderstatus", F.col("o_totalprice").cast("string")
                    ),
                    64,
                ).alias("embedding"),
            )
            .repartition(cpus)
            .cache()
        )
        n_vec = vec.count()

        # SemDeDup coarse quantizer: sampled trainer (constant cost in N)
        # runs once per size untimed — the timed op is assign + within-
        # cluster join + verify; nlist follows the paper's sqrt(N) rule
        sem_cents = ivf_train_sampled(
            vec, nlist=max(8, int(math.sqrt(n_vec))), vec_col="embedding"
        ).centroids

        ops = {
            "dedup_minhash": lambda: minhash_lsh_pairs(docs, threshold=0.3, materialize=True),
            "dedup_simhash": lambda: simhash_pairs(docs, max_hamming=3, materialize=True),
            "dedup_jaccard": lambda: ngram_jaccard_pairs(
                docs, threshold=0.3, materialize=True, n_docs=n_docs
            ),
            "dedup_winnow": lambda: winnow_neardup_pairs(
                docs, threshold=0.3, n_docs=n_docs, materialize=True, engine="python"
            ),
            "exact_substr": lambda: exact_substr_spans(docs, min_tokens=4),
            "dedup_semantic": lambda: semantic_dedup_pairs(
                vec, threshold=0.9, centroids=sem_cents, id_col="id", engine="blas"
            ),
            "knn_join_32q": lambda: knn_join_vectorized(
                vec,
                vec.limit(32).select(
                    F.col("id").alias("query_id"), F.col("embedding").alias("query_embedding")
                ),
                k=10,
            ),
        }
        for op, build in ops.items():
            _force(build())  # warm-up
            t0 = time.perf_counter()
            out_rows = _force(build())
            sec = time.perf_counter() - t0
            rows_in = (
                n_docs
                if (op.startswith(("dedup", "exact")) and op != "dedup_semantic")
                else n_vec
            )
            results.append((op, label, rows_in, out_rows, sec))

        # SQ8: train (one min/max pass) + encode timed as index build;
        # search = the rerank serving default. Expected near-linear build
        # (one scan) and sublinear-ish search growth (scan of 1/4 bytes +
        # constant shortlist rerank).
        from neighborly_spark.operators.quantization import (
            sq_encode_expr,
            sq_search_precoded,
            sq_train,
        )

        t0 = time.perf_counter()
        sq_model = sq_train(vec, 64, "embedding")
        sq_codes = vec.select(
            "id", sq_encode_expr("embedding", sq_model).alias("code")
        ).cache()
        sq_codes.count()
        results.append(("sq_build", label, n_vec, n_vec, time.perf_counter() - t0))
        qv = [0.1] * 64
        sq_search_precoded(vec, sq_codes, sq_model, qv, 10).collect()  # warm
        t0 = time.perf_counter()
        sq_search_precoded(vec, sq_codes, sq_model, qv, 10).collect()
        results.append(("sq_search", label, n_vec, 10, time.perf_counter() - t0))

        # IVFPQ: sampled trainers (constant in N) + Arrow encode as build;
        # search = ADC over nprobe/nlist of the rows + shortlist rerank.
        from neighborly_spark.operators.ivfpq import (
            ivfpq_encode,
            ivfpq_search_rerank,
            ivfpq_train,
        )

        t0 = time.perf_counter()
        ip_model = ivfpq_train(vec, 64, nlist=32, m=8)
        ip_enc = ivfpq_encode(vec, ip_model).cache()
        ip_enc.count()
        results.append(("ivfpq_build", label, n_vec, n_vec, time.perf_counter() - t0))
        ivfpq_search_rerank(vec, ip_enc, ip_model, qv, 10, nprobe=4).collect()  # warm
        t0 = time.perf_counter()
        ivfpq_search_rerank(vec, ip_enc, ip_model, qv, 10, nprobe=4).collect()
        results.append(("ivfpq_search", label, n_vec, 10, time.perf_counter() - t0))
        sq_codes.unpersist()
        ip_enc.unpersist()

        # HNSW: build timed separately from search (index-build vs query cost);
        # shard count auto-sized, so it grows with the data as it would at 100 TB
        t0 = time.perf_counter()
        g = hnsw_build(vec, dim=64, rows_hint=n_vec).cache()  # auto-sized (10k-row target)
        g.count()
        build_sec = time.perf_counter() - t0
        results.append(("hnsw_build", label, n_vec, n_vec, build_sec))
        hnsw_search(g, [0.1] * 64, 10).collect()  # warm
        t0 = time.perf_counter()
        hnsw_search(g, [0.1] * 64, 10).collect()
        results.append(("hnsw_search", label, n_vec, 10, time.perf_counter() - t0))
        g.unpersist()
        docs.unpersist()
        vec.unpersist()

    print("\n| operator | size | rows in | rows out | sec |")
    print("|----------|------|---------|----------|-----|")
    for op, label, rin, rout, sec in results:
        print(f"| {op} | {label} | {rin} | {rout} | {sec:.2f} |")
    print("\nratios (sf0.1 / sf0.01):")
    by_op: dict[str, dict[str, tuple]] = {}
    for op, label, rin, rout, sec in results:
        by_op.setdefault(op, {})[label] = (rin, rout, sec)
    print("\n| operator | data ratio | out-rows ratio | wall ratio |")
    print("|----------|-----------|----------------|------------|")
    for op, d in by_op.items():
        (ri1, ro1, s1), (ri2, ro2, s2) = d["sf0.01"], d["sf0.1"]
        ro_ratio = (ro2 / ro1) if ro1 else float("inf")
        print(f"| {op} | {ri2 / ri1:.1f}x | {ro_ratio:.1f}x | {s2 / s1:.1f}x |")


if __name__ == "__main__":
    main()
