"""Serving-surface adapters — S10/S11/S12 capability parity.

The reference ships a gRPC+REST server with 6 RPCs
(API.gRPC/Protos/Vector.proto:31-39, Services/VectorService.cs:19-110,
Services/RestServices.cs:15-92) and a Semantic Kernel IMemoryStore adapter
(Adapters.SemanticKernel/NeighborlyMemoryStore.cs:16-205). Per SURVEY §2.1
the batch equivalents are DataFrame operations; these classes expose them
under the reference's METHOD SURFACE so a caller of the reference can map
every call 1:1. The thin HTTP wrapper that delegates to these methods
lives in neighborly_spark.server (RestServer — the reference's six REST
routes with matching status codes over stdlib http.server).

State model: each mutate returns/installs a NEW immutable DataFrame (the
reference mutates in place under locks; SURVEY §1.5 maps that to batch set
algebra). `VectorStore` holds the current version like the reference's
VectorDatabase holds its VectorList.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neighborly_spark.operators import crud
from neighborly_spark.search_service import SearchService


class VectorStore:
    """gRPC/REST service surface (S10/S11): GetVectors, AddVector,
    GetVectorById, UpdateVector, SearchNearest, ClearVectors + the REST
    DELETE /vector/{id}."""

    def __init__(self, df: DataFrame, dim: int, id_col: str = "id"):
        self.df = df
        self.dim = dim
        self.id_col = id_col
        self._svc = SearchService(df, dim, id_col=id_col)

    def _swap(self, df: DataFrame) -> None:
        self.df = df
        self._svc = SearchService(df, self.dim, id_col=self.id_col)

    # --- RPCs ----------------------------------------------------------------

    def get_vectors(self) -> DataFrame:
        return self.df

    def add_vector(self, rows: DataFrame) -> None:
        self._swap(crud.add(self.df, rows))

    def get_vector_by_id(self, vec_id) -> DataFrame:
        return crud.get_by_id(self.df, vec_id, self.id_col)

    def update_vector(self, rows: DataFrame) -> None:
        self._swap(crud.upsert(self.df, rows, self.id_col))

    def remove_vector(self, vec_id) -> None:
        self._swap(crud.remove_by_id(self.df, [vec_id], self.id_col))

    def search_nearest(self, query_vec: list[float], k: int = 10) -> DataFrame:
        # server default: KDTree method, threshold 0.5
        # (API.gRPC/Services/VectorService.cs:73-85) — kdtree == exact path
        return self._svc.search(query_vec=query_vec, k=k, method="kdtree", threshold=0.5)

    def clear_vectors(self) -> None:
        self._swap(crud.clear(self.df))


class MemoryStore:
    """Semantic-Kernel-style memory store (S12): upsert/get/remove (+batch)
    and GetNearestMatch(es) with minRelevanceScore
    (Adapters.SemanticKernel/NeighborlyMemoryStore.cs:133-205).

    Relevance = cosine similarity (the SK convention); min_relevance_score
    filters on it. 'Collections' are a partition column, like the reference
    adapter fakes collections over its single store (:102-131).
    """

    COLLECTION_COL = "collection"

    def __init__(self, spark: SparkSession, dim: int):
        self.spark = spark
        self.dim = dim
        schema = (
            f"{self.COLLECTION_COL} string, id string, embedding array<float>, "
            "tags array<smallint>, original_text string"
        )
        self.df = spark.createDataFrame([], schema)

    def upsert(self, collection: str, rows: DataFrame) -> None:
        tagged = rows.withColumn(self.COLLECTION_COL, F.lit(collection)).select(self.df.columns)
        keep = self.df.join(
            tagged.select(self.COLLECTION_COL, "id"), on=[self.COLLECTION_COL, "id"], how="left_anti"
        )
        self.df = keep.unionByName(tagged)

    def get(self, collection: str, ids: list[str]) -> DataFrame:
        return self.df.filter(
            (F.col(self.COLLECTION_COL) == collection) & F.col("id").isin(ids)
        )

    def remove(self, collection: str, ids: list[str]) -> None:
        self.df = self.df.filter(
            ~((F.col(self.COLLECTION_COL) == collection) & F.col("id").isin(ids))
        )

    def get_nearest_matches(
        self,
        collection: str,
        query_vec: list[float],
        limit: int = 1,
        min_relevance_score: float = 0.0,
    ) -> DataFrame:
        from neighborly_spark.operators.knn import knn

        coll = self.df.filter(F.col(self.COLLECTION_COL) == collection)
        out = knn(coll, query_vec, limit, metric="cosine")
        return out.filter(F.col("dist") >= min_relevance_score).withColumnRenamed(
            "dist", "relevance"
        )
