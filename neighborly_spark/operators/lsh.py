"""Approximate nearest-neighbor search via MLlib LSH — Q7 parity.

The reference's LSHSearch (Search/LSHSearch.cs:51-235) is a random-projection
sign-hash scheme: `tableCount` tables x `hashFunctionCount` bits, candidates
from matching buckets, exact rerank. Spark's BucketedRandomProjectionLSH is
the same family (random projection for euclidean distance), distributed and
battle-tested — the right primitive per the MLlib-for-batch-indexing north
star. RNG differs from .NET, so parity is checked by RECALL >= 0.8 vs exact
k-NN (the reference's own acceptance bar, Tests/HNSWBenchmarkTests.cs:169),
never row-hash equality.

Scale notes:
- fit() computes random hyperplanes only (no data pass beyond schema) —
  cheap at any scale.
- approxSimilarityJoin is a bucket-equality join: the shuffle fans in only
  same-bucket pairs, which IS the candidate pruning (vs the quadratic
  crossJoin of the exact path).
- The reference's auto-params (LSHSearch.cs:223-235) are mapped:
  tableCount -> numHashTables; hashFunctionCount has no direct knob
  (BRP-LSH uses one projection per table); bucketLength plays its
  precision role. We keep the table-count formula.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neighborly_spark.operators.knn import knn as exact_knn


def auto_table_count(dim: int) -> int:
    """The reference's table-count auto-tune (LSHSearch.cs:228):
    min(20, max(8, dim/20))."""
    return min(20, max(8, dim // 20))


def _with_features(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("_features", array_to_vector(F.col(vec_col)))


def fit_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int | None = None,
    dim: int | None = None,
    seed: int = 42,
):
    """Fit a BucketedRandomProjectionLSH model (seed 42 = the reference's
    convention, LSHSearch.cs:122)."""
    if num_hash_tables is None:
        num_hash_tables = auto_table_count(dim or 64)
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    return lsh.fit(_with_features(df, vec_col))


def lsh_knn(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    model=None,
    **fit_kw,
) -> DataFrame:
    """Approximate k-NN of one query. Returns the df rows + distCol 'dist'."""
    from pyspark.ml.linalg import Vectors

    feats = _with_features(df, vec_col)
    if model is None:
        model = fit_lsh(df, vec_col, dim=len(query_vec), **fit_kw)
    out = model.approxNearestNeighbors(feats, Vectors.dense(query_vec), k, distCol="dist")
    return out.drop("_features", "_hashes")


def approx_similarity_join(
    a: DataFrame,
    b: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    model=None,
    dim: int | None = None,
    **fit_kw,
) -> DataFrame:
    """All pairs within euclidean `threshold` (approximate, bucket-pruned).
    Returns datasetA/datasetB struct columns + 'dist'."""
    fa, fb = _with_features(a, vec_col), _with_features(b, vec_col)
    if model is None:
        model = fit_lsh(a, vec_col, dim=dim, **fit_kw)
    return model.approxSimilarityJoin(fa, fb, threshold, distCol="dist")


def approx_knn_join(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    radius: float,
    id_col: str = "id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    **fit_kw,
) -> DataFrame:
    """Batch approximate k-NN: LSH-join candidates within `radius`, then
    per-query top-k. The scale path for knn_join when |queries| is too large
    to broadcast-crossJoin (SURVEY §2.5)."""
    from pyspark.sql.window import Window

    qf = queries.withColumnRenamed(query_vec_col, vec_col)
    joined = approx_similarity_join(data, qf, radius, vec_col, **fit_kw)
    flat = joined.select(
        F.col(f"datasetB.{query_id_col}").alias(query_id_col),
        F.col(f"datasetA.{id_col}").alias(id_col),
        F.col("dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return flat.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def hnsw_equivalent_knn(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "id",
    exact_cutoff: int = 100_000,
    approx_count: int | None = None,
) -> DataFrame:
    """Q8 capability mapping (SURVEY §2.4 Q8, §7.2 phase 5): the reference's
    HNSW is an online, pointer-chasing graph — wrong shape for a batch scan
    engine. We match the CAPABILITY (top-k approximate, recall >= 0.8,
    Tests/HNSWBenchmarkTests.cs:169) with: exact distributed top-k under a
    size cutoff (it IS fast in batch), high-recall LSH above it."""
    # LIMIT-probe instead of a full count: the cutoff only needs to know
    # whether the table exceeds exact_cutoff rows, and a limit(c+1).count()
    # short-circuits after c+1 rows — a full count() per single-query call
    # scanned the whole (possibly uncached 100k+-row) table before the
    # actual search even started
    n = (
        approx_count
        if approx_count is not None
        else df.limit(exact_cutoff + 1).count()
    )
    if n <= exact_cutoff:
        return exact_knn(df, query_vec, k, "euclidean", id_col, vec_col)
    return lsh_knn(df, query_vec, k, vec_col, num_hash_tables=max(12, auto_table_count(len(query_vec))))
