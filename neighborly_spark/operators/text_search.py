"""Text k-NN search — Q3 parity (Search/SearchService.cs:104-131).

Pipeline (matching the reference step-for-step, SURVEY §3.1):
1. embed the query text (deterministic hash embedder = the reference's
   hash fallback, EmbeddingGenerator.cs:139-156);
2. exact k-NN against the vectors table (default euclidean — LinearSearch
   uses Vector.Distance which is euclidean);
3. threshold post-filter with the length-based default threshold
   (SearchService.cs:82-102) and the bypass heuristic (:171-189);
4. for short queries (<20 chars): union case-insensitive prefix matches on
   original_text, distinct by id, re-take k (SearchService.cs:121-127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neighborly_spark.functions.embedding import hash_embedding
from neighborly_spark.operators.knn import (
    default_threshold_for_text,
    knn,
    threshold_filter,
    with_distance,
)

PREFIX_UNION_MAX_LEN = 20  # SearchService.cs:121


def embed_table(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 16,
    out_col: str = "embedding",
) -> DataFrame:
    """Attach the deterministic hash embedding of a text column."""
    return df.withColumn(out_col, hash_embedding(F.col(text_col), dim))


def text_search(
    vectors: DataFrame,
    text: str,
    k: int,
    dim: int,
    threshold: float | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
    text_col: str = "original_text",
    round_to: int | None = None,
) -> DataFrame:
    """k-NN by text with the reference's threshold + prefix-union semantics.

    Returns (id, original_text, dist); prefix-union rows that weren't in the
    k-NN result carry their true distance too (computed in the same plan).
    """
    if threshold is None:
        threshold = default_threshold_for_text(text)

    # steps 1-2: embed + exact k-NN (euclidean, the engine default)
    q = hash_embedding(F.lit(text), dim)
    hits = knn(vectors, q, k, "euclidean", id_col, vec_col, round_to=round_to)
    # step 3: threshold filter with bypass heuristic
    hits = threshold_filter(hits, threshold, dim)
    hits = hits.select(id_col, text_col, "dist")

    # step 4: prefix-match union for short queries. The reference takes the
    # first k in insertion order (FindAll().Take(k)); the deterministic
    # distributed equivalent is id order.
    if len(text) < PREFIX_UNION_MAX_LEN:
        prefix = (
            vectors.filter(F.lower(F.col(text_col)).startswith(text.lower()))
            .orderBy(F.col(id_col).asc())
            .limit(k)
        )
        prefix = with_distance(prefix, q, "euclidean", vec_col, "dist", round_to).select(
            id_col, text_col, "dist"
        )
        hits = (
            hits.unionByName(prefix)
            .dropDuplicates([id_col])
            .orderBy(F.col("dist").asc(), F.col(id_col).asc())
            .limit(k)
        )
    return hits
