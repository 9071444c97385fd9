"""IVF+PQ composed index — the canonical billion-scale ANN recipe.

Extension beyond the reference (driver north star: "an IVF or LSH-bucketed
variant as the scale path"). The reference ships IVF-style coarse search and
PQ separately; composing them (Jegou et al. 2011, "Product Quantization for
Nearest Neighbor Search", the FAISS IVFPQ design) is what actually serves at
100 TB:

- **coarse quantizer** (IVF): nlist centroids; a query probes only the
  nprobe nearest cells — with the encoded table written PARTITIONED BY cell
  (ivf.ivf_write layout), the probe filter is partition pruning: zero I/O
  for unprobed cells.
- **residual PQ**: each vector is encoded as PQ codes of its RESIDUAL
  r = x - centroid[cell]. Residuals are centered near zero with far smaller
  spread than raw vectors, so the same codebook budget quantizes them much
  more finely — the reason the composition beats flat PQ at equal bytes.
- **ADC search**: per probed cell, the query's residual q - centroid[cell]
  gives an m x k' lookup table; distances are LUT sums over code bytes —
  the scan reads only (cell_id, m-byte code) rows of the probed cells.
- **rerank tier**: ADC shortlist -> exact float rerank via an id point-join
  (same shape as quantization.pq_search_rerank) — the serving default, so
  the tier meets the repo's >= 0.8 recall evidence bar on hard data.

Scan shape at 100 TB: read nprobe/nlist of the partitions, each row costing
m bytes (dim*4/m compression); the float table is touched for `shortlist`
rows only. Both trainers are the deterministic sampled one-pass paths
(hash-ordered sample + seeded driver Lloyd), so recall measurements are
reproducible run to run — gate-able as literal oracle rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neighborly_spark.functions.distance import euclidean
from neighborly_spark.operators.ivf import CLUSTER_COL, IVFModel, ivf_assign, ivf_train_sampled
from neighborly_spark.operators.quantization import PQModel, pq_train_sampled

CODE_COL = "pq_code"


class IVFPQModel:
    """Coarse quantizer + residual product quantizer pair."""

    def __init__(self, ivf: IVFModel, pq: PQModel):
        self.ivf = ivf
        self.pq = pq

    def compression_ratio(self, dim: int) -> float:
        # float32*dim bytes -> m code bytes + the (cheap) cell id
        return (dim * 4.0) / self.pq.m


def _residual_expr(vec_col: str, centroids: list[list[float]], cluster_col: str = CLUSTER_COL):
    """r = x - centroid[cell], as a pure Column zip_with against the
    broadcast centroid literals (JVM-side; null vec or null cell -> null)."""
    cents_lit = F.lit(centroids).cast("array<array<double>>")
    own = F.element_at(cents_lit, F.col(cluster_col) + 1)
    return F.zip_with(F.col(vec_col), own, lambda x, c: x.cast("double") - c)


def ivfpq_train(
    df: DataFrame,
    dim: int,
    nlist: int = 16,
    m: int | None = None,
    num_centroids: int = 256,
    vec_col: str = "embedding",
    seed: int = 42,
) -> IVFPQModel:
    """Train the coarse quantizer, then the PQ codebooks ON RESIDUALS:
    assign each vector its cell, subtract the cell centroid in-plan, and
    hand the residual column to the sampled PQ trainer. Two passes total
    (one sample scan each); both trainers are deterministic (hash-ordered
    samples, seeded Lloyd)."""
    ivf = ivf_train_sampled(df, nlist=nlist, vec_col=vec_col, seed=seed)
    assigned = ivf_assign(df, ivf, vec_col)
    residuals = assigned.select(
        _residual_expr(vec_col, ivf.centroids).alias("_res")
    )
    pq = pq_train_sampled(
        residuals, dim, m=m, num_centroids=num_centroids, vec_col="_res", seed=seed
    )
    return IVFPQModel(ivf, pq)


def ivfpq_encode(
    df: DataFrame,
    model: IVFPQModel,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow pass: assign the cell, form the residual, PQ-encode it.
    Returns (id, ivf_cluster, pq_code) — the index artifact (write it with
    ivf.ivf_write for the partition-pruned layout). Vectorized mapInPandas:
    a (batch x dim)@(dim x nlist) matmul for the assign plus m
    (batch x sub_dim)@(sub_dim x k') matmuls for the codes — the same
    throughput tier (and the same first-minimal-index tie contract) as
    ivf_assign_vectorized / pq_encode_vectorized, which the recall-gated
    consumers document. Null embeddings keep a null cell + null codes and
    rank last in every consumer."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    coarse = np.asarray(model.ivf.centroids, dtype=np.float64)  # (nlist, dim)
    coarse_sq = (coarse * coarse).sum(axis=1)
    books = [np.asarray(c, dtype=np.float64) for c in model.pq.centroids]  # m x (k', sub_dim)
    books_sq = [(c * c).sum(axis=1) for c in books]
    sub_dim, m = model.pq.sub_dim, model.pq.m

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                valid = pdf[vec_col].notna().to_numpy()
                cells = pd.array([pd.NA] * len(pdf), dtype="Int32")
                out_codes: list = [None] * len(pdf)
                if valid.any():
                    x = np.asarray(
                        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col][valid]]
                    )
                    d = coarse_sq[None, :] - 2.0 * (x @ coarse.T)
                    cell = d.argmin(axis=1)
                    res = x - coarse[cell]
                    codes = np.empty((len(x), m), dtype=np.int32)
                    for s in range(m):
                        rs = res[:, s * sub_dim : (s + 1) * sub_dim]
                        ds = books_sq[s][None, :] - 2.0 * (rs @ books[s].T)
                        codes[:, s] = ds.argmin(axis=1)
                    idx = np.nonzero(valid)[0]
                    cells[idx] = cell.astype(np.int32)
                    for j, row in zip(idx, codes):
                        out_codes[int(j)] = row
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        CLUSTER_COL: cells,
                        CODE_COL: out_codes,
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        CLUSTER_COL: pd.Series([], dtype="int32"),
                        CODE_COL: pd.Series([], dtype="object"),
                    }
                )

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    # FRESH StructType (StructType.add mutates in place)
    schema = StructType(
        [
            df.schema[id_col],
            StructField(CLUSTER_COL, IntegerType()),
            StructField(CODE_COL, ArrayType(IntegerType())),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(encode, schema)


def _probe_cells(model: IVFPQModel, query_vec: list[float], nprobe: int) -> list[int]:
    dists = [
        (ci, math.sqrt(sum((a - b) ** 2 for a, b in zip(query_vec, c))))
        for ci, c in enumerate(model.ivf.centroids)
    ]
    return [ci for ci, _ in sorted(dists, key=lambda t: (t[1], t[0]))[:nprobe]]


def ivfpq_search(
    encoded: DataFrame,
    model: IVFPQModel,
    query_vec: list[float],
    k: int,
    nprobe: int = 4,
    id_col: str = "id",
) -> DataFrame:
    """Pure-ADC tier: filter to the nprobe nearest cells (partition pruning
    on an ivf_write layout), then rank by LUT sums. The per-cell LUTs use
    the query's PER-CELL residual q - centroid[cell] (the residual trick:
    one nprobe x m x k' double literal, built on the driver, broadcast as
    part of the plan — nprobe*m*k' is a few thousand doubles)."""
    probes = _probe_cells(model, query_vec, nprobe)
    sub_dim, m = model.pq.sub_dim, model.pq.m
    books = model.pq.centroids  # [m][k'][sub_dim]
    lut3 = []  # [probe_pos][s][ci]
    for ci in probes:
        cent = model.ivf.centroids[ci]
        rq = [a - b for a, b in zip(query_vec, cent)]
        lut = []
        for s in range(m):
            qs = rq[s * sub_dim : (s + 1) * sub_dim]
            lut.append([sum((a - b) ** 2 for a, b in zip(qs, c)) for c in books[s]])
        lut3.append(lut)

    flt = encoded.filter(F.col(CLUSTER_COL).isin(probes))
    pos = F.array_position(F.lit(probes).cast("array<int>"), F.col(CLUSTER_COL))
    my_lut = F.element_at(F.lit(lut3).cast("array<array<array<double>>>"), pos.cast("int"))
    total = None
    for s in range(m):
        term = F.element_at(
            F.element_at(my_lut, s + 1), F.element_at(F.col(CODE_COL), s + 1) + 1
        )
        total = term if total is None else total + term
    return (
        flt.withColumn("dist", F.sqrt(total))
        .orderBy(F.col("dist").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_search_rerank(
    df: DataFrame,
    encoded: DataFrame,
    model: IVFPQModel,
    query_vec: list[float],
    k: int,
    nprobe: int = 4,
    shortlist: int | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist -> exact float rerank (the serving default): the probe
    scan reads only probed-cell code rows; the float table is touched for
    `shortlist` rows via an id join AQE converts to broadcast."""
    if shortlist is None:
        shortlist = max(5 * k, 50)
    cand = ivfpq_search(encoded, model, query_vec, shortlist, nprobe, id_col).select(id_col)
    joined = df.join(cand, id_col)
    d = euclidean(F.col(vec_col), F.lit(query_vec).cast("array<float>"))
    return (
        joined.withColumn("dist", d)
        .orderBy(F.col("dist").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )
