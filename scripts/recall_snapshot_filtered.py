"""Tag-filtered recall sweep through the SNAPSHOT serving tier
(round-7 VERDICT 6): the round-6 DataFrame-path sweep (docs/RECALL.md,
selectivities 1/2 .. 1/200) re-run through hnsw_search_batch_snapshot —
worker-resident shard loads, tags parsed from the shard parquet into the
LRU entry, filtered descent (ef-inflation band) AND the
ef_eff-cap -> exact-scan routing band both exercised.

Method: sf0.01 orders hash-embedded at 64d (~15k rows, same recipe as
recall_at_scale.py), modulus tags at 4 selectivity tiers, 3-shard graph
built with tags_col and saved partitionBy('part_id'), 10 queries, k=10,
recall vs the tag-filtered exact oracle. Regenerates the snapshot
selectivity table in docs/RECALL.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from neighborly_spark.functions.embedding import hash_embedding_fast  # noqa: E402
from neighborly_spark.operators.hnsw import hnsw_build, hnsw_search_batch_snapshot  # noqa: E402
from neighborly_spark.operators.knn import knn  # noqa: E402
from neighborly_spark.parity import load  # noqa: E402
from neighborly_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DIM, K, EF = 64, 10, 200
#: (tag literal, modulus) — tag m+offset kept by ~1/m of rows
TIERS = [(1, 2), (15, 10), (120, 50), (1100, 200)]


def main() -> None:
    import tempfile

    spark = get_spark(app_name="recall-snapshot-filtered", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    spark.sparkContext.setLogLevel("ERROR")
    orders = load(spark, SF_DIR, "orders")
    vec = (
        orders.select(
            F.col("o_orderkey").alias("id"),
            hash_embedding_fast(
                F.concat_ws(
                    " ", "o_orderpriority", "o_orderstatus", F.col("o_totalprice").cast("string")
                ),
                DIM,
            ).alias("embedding"),
        )
        .withColumn(
            "tags",
            F.array(
                (F.col("id") % 2).cast("int"),                   # ~1/2
                (F.lit(10) + F.col("id") % 10).cast("int"),      # ~1/10
                (F.lit(100) + F.col("id") % 50).cast("int"),     # ~1/50
                (F.lit(1000) + F.col("id") % 200).cast("int"),   # ~1/200
            ),
        )
        .repartition(int(os.environ["SPARK_GRAFT_CPUS"]))
        .cache()
    )
    n = vec.count()
    g = hnsw_build(vec, dim=DIM, num_partitions=3, tags_col="tags").cache()
    g.count()
    path = tempfile.mkdtemp(prefix="snap_filtered_") + "/graph"
    g.write.partitionBy("part_id").parquet(path)
    pids = [r.part_id for r in g.select("part_id").distinct().collect()]

    qrows = vec.orderBy(F.xxhash64("id")).limit(10).collect()
    qs = [(i, list(r.embedding)) for i, r in enumerate(qrows)]

    print(f"n={n} shards={len(pids)} k={K} ef={EF} queries={len(qs)}")
    print("| selectivity | allowed rows | recall (snapshot filtered) |")
    print("|-------------|--------------|----------------------------|")
    for tag, mod in TIERS:
        allowed_df = vec.filter(F.array_contains("tags", tag)).cache()
        n_allowed = allowed_df.count()
        truth = [
            {r.id for r in knn(allowed_df, list(qr.embedding), K).collect()}
            for qr in qrows
        ]
        got: dict[int, set] = {}
        out = hnsw_search_batch_snapshot(
            spark, path, pids, qs, K, version="v1", ef=EF, tag_any=[tag]
        )
        for r in out.collect():
            got.setdefault(r.query_id, set()).add(r.id)
        hits = sum(len(t & got.get(i, set())) for i, t in enumerate(truth))
        denom = sum(min(K, len(t)) for t in truth)
        print(f"| 1/{mod} | {n_allowed} | {hits / denom:.2f} |")
        allowed_df.unpersist()
    g.unpersist()
    vec.unpersist()


if __name__ == "__main__":
    main()
