"""Corpus-level operators for training-data pipelines: document chunking
and vocabulary statistics.

Extensions beyond the reference (north star): the reference stores one
embedding per document; a real pipeline splits documents into model-context
windows first and embeds per chunk, and vocabulary/frequency tables drive
filtering (stop-shingles, rare-token cleanup). Both are pure DataFrame
plans with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neighborly_spark.functions.text import chunks_duckdb_sql, chunks_expr, tokens, tokens_duckdb_sql


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into sliding token windows:
    (id, chunk_id, chunk_text, n_tokens), one row per chunk.

    Scale: chunking is embarrassingly parallel (no shuffle — a projection +
    generator). Chunk ids are per-document ordinals, so (id, chunk_id) is a
    stable global key for downstream embed/dedup stages.
    """
    ch = chunks_expr(F.col(text_col), chunk_tokens, overlap)
    return (
        df.select(F.col(id_col), F.explode(ch).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tokens").alias("n_tokens"),
        )
    )


def chunk_documents_duckdb_sql(
    chunk_tokens: int,
    overlap: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    ch = chunks_duckdb_sql(text_col, chunk_tokens, overlap)
    return f"""
SELECT {id_col}, c.chunk_id AS chunk_id, c.chunk_text AS chunk_text, c.n_tokens AS n_tokens
FROM (SELECT {id_col}, unnest({ch}) AS c FROM {table})
""".strip()


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Top-k corpus vocabulary: (token, n_total, n_docs), ordered by
    (n_total desc, token asc).

    Plan: tokenize -> explode -> two-level aggregate. The per-document
    distinct for n_docs happens BEFORE the global shuffle (array_distinct on
    the token array), so the exchange carries one row per (doc, distinct
    token), with map-side partial aggregation on top — no quadratic blowup
    on repetitive documents.
    """
    toks = tokens(F.col(text_col))
    totals = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    docs = (
        df.select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    out = totals.join(docs, "token").filter(F.col("n_total") >= min_count)
    return out.orderBy(F.col("n_total").desc(), F.col("token").asc()).limit(k)


def vocab_topk_duckdb_sql(
    k: int = 100,
    min_count: int = 1,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    toks = tokens_duckdb_sql(text_col)
    return f"""
WITH totals AS (
  SELECT t AS token, count(*) AS n_total
  FROM (SELECT unnest({toks}) AS t FROM {table}) GROUP BY 1
),
docs AS (
  SELECT t AS token, count(*) AS n_docs
  FROM (SELECT unnest(list_distinct({toks})) AS t FROM {table}) GROUP BY 1
)
SELECT totals.token, n_total, n_docs FROM totals JOIN docs USING (token)
WHERE n_total >= {min_count}
ORDER BY n_total DESC, token ASC
LIMIT {k}
""".strip()
