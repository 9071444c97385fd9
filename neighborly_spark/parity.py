"""Parity-query registry: every oracle-checked operator lives here.

Each entry pairs a Spark DataFrame builder `(spark, sf_dir) -> DataFrame`
with an equivalent DuckDB SQL string over the same parquet tables. The
driver (and tests/test_parity.py) run both and compare row-count, schema,
and order-insensitive value hashes — so builders and SQL must agree on
column NAMES and on VALUES to the last rounded digit.

Determinism contract (verified bit-identical in tests/test_parity.py):
- float32 -> float64 casts are exact; all folds are sequential left folds
  (Spark `aggregate` == DuckDB `list_reduce`);
- squares/cubes written as repeated multiplication, never pow(x, n);
- distances rounded to 6dp in BOTH engines before ordering, so top-k
  selection sees identical keys; (dist, id) tiebreak everywhere
  (reference: Search/KDTree.cs:381-386).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neighborly_spark.functions import distance as D
from neighborly_spark.operators import knn as K

ROUND = 6


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- DuckDB SQL fragments mirroring functions/distance.py ------------------

def _dd(a: str, b: str, i: str = "i") -> str:
    return f"({a}[{i}]::DOUBLE - {b}[{i}]::DOUBLE)"


def sql_sq_euclidean(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> {_dd(a, b)} * {_dd(a, b)}), (s, x) -> s + x)"
    )


def sql_euclidean(a: str, b: str) -> str:
    return f"sqrt({sql_sq_euclidean(a, b)})"


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (s, x) -> s + x)"
    )


def sql_magnitude(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (s, x) -> s + x))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_magnitude(a)} * {sql_magnitude(b)}))"


def sql_manhattan(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> abs({_dd(a, b)})), (s, x) -> s + x)"
    )


def sql_chebyshev(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, len({a})+1), "
        f"i -> abs({_dd(a, b)})), 'max')"
    )


def sql_minkowski3(a: str, b: str) -> str:
    s = (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> abs({_dd(a, b)}) * abs({_dd(a, b)}) * abs({_dd(a, b)})), (s, x) -> s + x)"
    )
    return f"pow({s}, 1.0/3.0)"


SQL_METRICS = {
    "euclidean": sql_euclidean,
    "cosine": sql_cosine,
    "manhattan": sql_manhattan,
    "chebyshev": sql_chebyshev,
    "minkowski": sql_minkowski3,
}


# --- registry ---------------------------------------------------------------

@dataclass
class ParityQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records a weaker rows-only check
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, ParityQuery] = {}


def register(name: str, oracle: str | None = None, tags: list[str] | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = ParityQuery(name, fn, oracle, tags or [])
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact search operators (SURVEY §2.4 Q1/Q2/Q4/Q5/Q6 — exact path)
# ---------------------------------------------------------------------------

def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> DataFrame:
    """One-row query side; broadcast so the scan side never shuffles."""
    return (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").alias("qe"))
    )


def _knn_metric_build(metric: str, k: int = 10):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        q = _query_vec(spark, sf_dir)
        scored = emb.crossJoin(F.broadcast(q)).select(
            "vec_id",
            "label",
            F.round(D.metric_expr(metric, F.col("embedding"), F.col("qe")), ROUND).alias("dist"),
        )
        order = [F.col("dist").desc() if metric == "cosine" else F.col("dist").asc(), F.col("vec_id").asc()]
        return scored.orderBy(*order).limit(k)

    return build


def _knn_metric_oracle(metric: str, k: int = 10) -> str:
    direction = "DESC" if metric == "cosine" else "ASC"
    dist = SQL_METRICS[metric]("e.embedding", "q.qe")
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label, round({dist}, {ROUND}) AS dist
FROM embeddings e, q
ORDER BY dist {direction}, e.vec_id ASC
LIMIT {k}
""".strip()


for _m in ["euclidean", "cosine", "manhattan", "chebyshev", "minkowski"]:
    register(f"knn_{_m}", _knn_metric_oracle(_m), tags=["search", "exact"])(_knn_metric_build(_m))


@register(
    "range_search_euclidean",
    f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({sql_euclidean('e.embedding', 'q.qe')}, {ROUND}) AS dist
FROM embeddings e, q
WHERE round({sql_euclidean('e.embedding', 'q.qe')}, {ROUND}) <= 1.5
ORDER BY dist ASC, e.vec_id ASC
""".strip(),
    tags=["search", "exact"],
)
def range_search_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q5: radius search with (dist, id) deterministic order
    (Search/LinearRangeSearch.cs:19-55, KDTree.cs:381-386)."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(D.euclidean(F.col("embedding"), F.col("qe")), ROUND).alias("dist"),
    )
    return scored.filter(F.col("dist") <= 1.5).orderBy(F.col("dist").asc(), F.col("vec_id").asc())


@register(
    "knn_join",
    f"""
WITH queries AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
data AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, d.vec_id,
         round({sql_euclidean('d.embedding', 'q.qe')}, {ROUND}) AS dist
  FROM data d CROSS JOIN queries q
)
SELECT query_id, vec_id, dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM scored
) WHERE rn <= 3
""".strip(),
    tags=["search", "join"],
)
def knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join (SURVEY §2.5): broadcast queries, per-query top-k
    window. The reference's one-query-per-RPC server loop, batched."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    data = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    out = K.knn_join(
        data, queries, k=3, id_col="vec_id", round_to=ROUND,
    )
    return out.select("query_id", "vec_id", "dist")
