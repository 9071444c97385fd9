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
from pyspark.sql.window import Window

from neighborly_spark.functions.embedding import hash_embedding
from neighborly_spark.operators.knn import (
    default_threshold_for_text,
    knn,
    threshold_filter,
    with_distance,
)

from neighborly_spark.functions.text import tokens, tokens_duckdb_sql

PREFIX_UNION_MAX_LEN = 20  # SearchService.cs:121


def embed_table(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 16,
    out_col: str = "embedding",
) -> DataFrame:
    """Attach the deterministic hash embedding of a text column."""
    return df.withColumn(out_col, hash_embedding(F.col(text_col), dim))


def _bm25_terms(query: str) -> list[str]:
    """Distinct lowercased whitespace terms, first-seen order."""
    return list(dict.fromkeys(query.lower().split()))


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """BM25 ranked lexical retrieval — the keyword-search complement to the
    vector-search operators (north-star extension; the reference's only text
    matching is the k-NN prefix union, Search/SearchService.cs:121-127).

    Okapi BM25 with the Lucene idf form ln((N - df + 0.5)/(df + 0.5) + 1):
    one corpus-stats aggregate (N, total token length, per-term doc
    frequency — a single reduce to ONE row, broadcast back into the scoring
    scan), then a per-doc score and a distributed top-k. Two passes over the
    corpus total; at scale the stats pass amortizes across queries by
    materializing the aggregate once per corpus version.

    Determinism: token counts are integers; the score arithmetic is fixed
    left-to-right double math, rounded to `round_to` — oracle-checkable
    (bm25_topk_duckdb_sql is the twin). Ties order by id.
    """
    terms = _bm25_terms(query)
    if not terms:
        raise ValueError("empty BM25 query")

    toks = tokens(F.col(text_col))

    # corpus stats: one row — tokenize once per row via the let-bound struct
    def stats_body(t: F.Column) -> F.Column:
        return F.struct(
            F.size(t).alias("dl"),
            *[F.array_contains(t, term).cast("long").alias(f"has{i}") for i, term in enumerate(terms)],
        )

    stats_struct = F.element_at(F.transform(F.array(toks), stats_body), 1)
    stats = (
        df.withColumn("_cs", stats_struct)
        .select("_cs.*")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_len"),
            *[F.sum(f"has{i}").alias(f"df{i}") for i in range(len(terms))],
        )
    )

    # per-doc (dl, tf_i) — same let-bind so the regex split runs once per row
    def doc_body(t: F.Column) -> F.Column:
        return F.struct(
            F.size(t).alias("dl"),
            *[
                F.size(F.filter(t, lambda x: x == F.lit(term))).alias(f"tf{i}")
                for i, term in enumerate(terms)
            ],
        )

    scored = (
        df.withColumn("_st", F.element_at(F.transform(F.array(toks), doc_body), 1))
        .select(id_col, "_st.*")
        .crossJoin(F.broadcast(stats))
    )

    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs").cast("double") - F.col(f"df{i}").cast("double") + 0.5)
            / (F.col(f"df{i}").cast("double") + 0.5)
            + 1.0
        )
        tf = F.col(f"tf{i}").cast("double")
        term_score = idf * (tf * (1.0 + float(k1))) / (tf + F.lit(float(k1)) * norm)
        score = term_score if score is None else score + term_score

    out = scored.withColumn("score", F.round(score, round_to)).filter(F.col("score") > 0.0)
    return out.select(id_col, "score").orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _q(term: str) -> str:
    """SQL-escape a query term for the DuckDB twin (a term containing an
    apostrophe would otherwise break — or inject into — the generated
    oracle SQL; the Spark side matches terms by literal equality and is
    unaffected)."""
    return term.replace("'", "''")


def bm25_topk_duckdb_sql(
    query: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """DuckDB twin of bm25_topk — identical operation order and rounding."""
    terms = _bm25_terms(query)
    toks = tokens_duckdb_sql(text_col)
    has = ", ".join(
        f"sum(CASE WHEN list_contains(toks, '{_q(t)}') THEN 1::BIGINT ELSE 0::BIGINT END) AS df{i}"
        for i, t in enumerate(terms)
    )
    tfs = ", ".join(
        f"len(list_filter(toks, x -> x = '{_q(t)}')) AS tf{i}" for i, t in enumerate(terms)
    )
    norm = f"(1.0 - {b!r} + {b!r} * CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
    parts = []
    for i in range(len(terms)):
        idf = f"ln((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
        parts.append(
            f"({idf} * (CAST(tf{i} AS DOUBLE) * (1.0 + {k1!r})) / (CAST(tf{i} AS DOUBLE) + {k1!r} * {norm}))"
        )
    score = " + ".join(parts)
    return f"""
WITH toked AS (SELECT {id_col}, {toks} AS toks FROM {table}),
stats AS (SELECT count(*) AS n_docs, sum(len(toks)) AS total_len, {has} FROM toked),
docs AS (SELECT {id_col}, len(toks) AS dl, {tfs} FROM toked),
scored AS (SELECT {id_col}, round({score}, {round_to}) AS score FROM docs, stats)
SELECT {id_col}, score FROM scored WHERE score > 0.0
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
""".strip()


def hybrid_search_rrf(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked result sets (the standard
    lexical+vector hybrid): score(d) = sum over lists of 1/(rrf_k + rank_d),
    ranks 1-based within each list, docs absent from a list contribute 0.

    Inputs are the two (already top-n) result DataFrames: `lexical` ranked
    by (score desc, id asc) — bm25_topk's output order — and `semantic`
    ranked by (dist asc, id asc) — knn's. Both are k-row results, so the
    fusion is a join of two tiny sides at any data scale; rank assignment
    partitions by nothing but operates on <= n rows (safe single-task
    window over an already-reduced result, not over the corpus).

    Rank arithmetic is exact integers; the fused score is a fixed-order
    double sum rounded to `round_to` — oracle-checkable.
    """
    lex = lexical.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
        .alias("_rl"),
    )
    sem = semantic.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("dist").asc(), F.col(id_col).asc()))
        .alias("_rs"),
    )
    fused = lex.join(sem, id_col, "full_outer").select(
        id_col,
        (
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("_rl")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("_rs")), F.lit(0.0))
        ).alias("_score"),
    )
    out = fused.withColumn("rrf_score", F.round(F.col("_score"), round_to)).drop("_score")
    return out.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()).limit(k)


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


def stub_rerank_topk(
    candidates: DataFrame,
    query: str,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Model-in-the-loop rerank plumbing: score every candidate with an
    Arrow-batched pandas UDF (the slot a cross-encoder occupies), keep the
    top k by (score DESC, id ASC). Returns (id, rerank_score).

    The stand-in scorer is DETERMINISTIC AND CROSS-ENGINE: md5 of
    '{query}::{text}' -> first 8 hex chars as uint32 / 2^32, identical to a
    SQL expression in any engine — so unlike typical UDF stages this one is
    oracle-checked end to end (the parity gate proves the Arrow batch path
    returns exactly what the SQL twin computes). Swap the body for a real
    model; the plumbing (batch iterator, schema, top-k) is the product.

    Scale: candidates are an already-reduced top-N (retrieval happened
    upstream), so the UDF touches N rows, not the corpus; the final top-k
    is a distributed TakeOrderedAndProject.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no annotations: postponed-evaluation strings ('pd.Series') break
    # pandas_udf's signature inference under `from __future__ import
    # annotations`; the returnType argument carries the schema instead
    @pandas_udf("double")
    def _score(texts):
        def one(t: str) -> float:
            h = hashlib.md5(f"{query}::{t}".encode()).hexdigest()[:8]
            return round(int(h, 16) / 4294967296.0, round_to)

        return texts.map(one)

    scored = candidates.select(
        F.col(id_col), _score(F.col(text_col)).alias("rerank_score")
    )
    return scored.orderBy(F.col("rerank_score").desc(), F.col(id_col).asc()).limit(k)
