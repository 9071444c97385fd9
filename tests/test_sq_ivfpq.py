"""SQ8 scalar quantization + composed IVF+PQ invariants.

Extensions beyond the reference's BQ/PQ family (driver north star: the
similarity-search scale tiers). Bars mirror the reference's own acceptance
style: recall >= 0.8 vs exact k-NN (Tests/HNSWBenchmarkTests.cs:169) plus
structural invariants in the BinaryQuantizationTests/ProductQuantizationTests
mold (error bounds, determinism, null safety, partition-pruned layout).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neighborly_spark.operators import ivfpq as IVFPQ
from neighborly_spark.operators import quantization as QZ
from neighborly_spark.operators.knn import knn as exact_knn

SF = "/root/testdata/sf0.01"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .withColumnRenamed("vec_id", "id")
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def query(emb):
    return emb.filter(F.col("id") == 7).select("embedding").collect()[0].embedding


@pytest.fixture(scope="module")
def sq_model(emb):
    return QZ.sq_train(emb, 64)


@pytest.fixture(scope="module")
def ivfpq_model(emb):
    return IVFPQ.ivfpq_train(emb, 64, nlist=16, m=16, num_centroids=32)


def _recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


# --- SQ8 ---------------------------------------------------------------------


def test_sq_recall_pure_and_rerank(emb, query, sq_model):
    """Both tiers clear the bar; the pure tier alone is near-lossless
    (per-dim error <= scale/2), which is SQ's reason to exist."""
    codes = QZ.sq_encode_table(emb, sq_model)
    exact = [r.id for r in exact_knn(emb, query, K).collect()]
    pure = [
        r.id
        for r in QZ.sq_search_precoded(emb, codes, sq_model, query, K, rerank=False).collect()
    ]
    rer = [r.id for r in QZ.sq_search_precoded(emb, codes, sq_model, query, K).collect()]
    assert _recall(pure, exact) >= 0.8
    assert _recall(rer, exact) >= 0.8
    # the query vector is row 7: both tiers find it first at ~0 distance
    assert pure[0] == 7 and rer[0] == 7
    codes.unpersist()


def test_sq_error_bound_and_compression(emb, sq_model):
    """Dequantized values honor the per-dimension error bound scale/2
    (+ float slack) on every row; 64 float32 dims -> 8 packed longs = 4x."""
    assert sq_model.compression_ratio() == 4.0
    rows = emb.limit(50).collect()
    scale = sq_model.scale
    spark = emb.sparkSession
    sample = emb.limit(50)
    dec = sample.select(
        "id",
        "embedding",
        QZ.sq_encode_expr("embedding", sq_model).alias("code"),
    )
    got = {r.id: (list(r.embedding), list(r.code)) for r in dec.collect()}
    for rid, (vec, code) in got.items():
        for d, x in enumerate(vec):
            w, j = divmod(d, QZ.SQ_BYTES_PER_WORD)
            byte = (code[w] >> (8 * j)) & 255
            deq = sq_model.vmin[d] + byte * scale[d]
            bound = (scale[d] / 2 if scale[d] else 0.0) + 1e-6
            assert abs(deq - x) <= bound, (rid, d)
    assert len(rows) == 50


def test_sq_determinism_and_degenerate_dim(spark):
    """min/max training is order-independent -> bit-identical across
    repartitionings; a constant dimension encodes to byte 0 and decodes
    exactly to vmin."""
    rows = [(i, [float(i % 7), 3.25, -2.0 + 0.5 * i]) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, embedding array<float>")
    m1 = QZ.sq_train(df, 3)
    m2 = QZ.sq_train(df.repartition(7), 3)
    assert m1.vmin == m2.vmin and m1.vmax == m2.vmax
    assert m1.vmin[1] == m1.vmax[1] == 3.25 and m1.scale[1] == 0.0
    enc = df.select("id", QZ.sq_encode_expr("embedding", m1).alias("code"))
    got = enc.filter(F.col("id") == 5).collect()[0].code
    assert ((got[0] >> 8) & 255) == 0  # degenerate dim -> code 0


def test_sq_null_embedding_ranks_last(spark, sq_model, emb, query):
    """A null embedding yields null code words -> null distance -> ranked
    after every real row by asc_nulls_last (never surfaces in top-k)."""
    base = emb.select("id", "embedding").limit(20)
    with_null = base.unionByName(
        spark.createDataFrame([(999999, None)], base.schema)
    )
    codes = with_null.select(
        "id", QZ.sq_encode_expr("embedding", sq_model).alias("code")
    )
    out = QZ.sq_search_precoded(
        with_null, codes, sq_model, query, 5, rerank=False
    ).collect()
    assert all(r.id != 999999 for r in out)


def test_sq_knn_join_null_embedding_ranks_last(spark, sq_model, emb):
    """Batch-path twin of the single-query null test (round-5 ADVICE high):
    null code words must be dropped BEFORE the dequantized knn_join —
    knn_join's struct array_sort orders null-dist structs FIRST, so without
    the prefilter the null rows displace every real candidate."""
    base = emb.select("id", "embedding").limit(20)
    nulls = spark.createDataFrame(
        [(999000 + i, None) for i in range(10)], base.schema
    )
    with_null = base.unionByName(nulls)
    codes = with_null.select(
        "id", QZ.sq_encode_expr("embedding", sq_model).alias("code")
    )
    queries = emb.filter(F.col("id") < 2).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    for rer in (False, True):
        got = {}
        out = QZ.sq_knn_join(
            codes, sq_model, queries, 5,
            df=with_null if rer else None, rerank=rer,
        ).collect()
        for r in out:
            got.setdefault(r.query_id, []).append(r.id)
        for qid, ids in got.items():
            assert len(ids) == 5, (rer, qid)
            assert all(i < 999000 for i in ids), (rer, qid, ids)


def test_sq_scan_reads_codes_not_floats(spark, emb, sq_model, tmp_path):
    """The pure tier's plan reads ONLY the packed-code parquet (the 4x I/O
    claim): a fresh-path code table scored without rerank never touches the
    float table's files, and the read schema carries no float array."""
    QZ.sq_encode_table(emb, sq_model, path=str(tmp_path / "codes"))
    codes = spark.read.parquet(str(tmp_path / "codes"))
    q = emb.filter(F.col("id") == 7).collect()[0].embedding
    out = QZ.sq_search_precoded(None, codes, sq_model, list(q), 5, rerank=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan  # pure codegen


# --- IVF+PQ ------------------------------------------------------------------


def test_ivfpq_recall_rerank(emb, query, ivfpq_model):
    """ADC-shortlist + exact-rerank clears the bar on the adversarial
    uniform table at nprobe=10/nlist=16 (measured 0.87 over 10 queries;
    single-query here)."""
    enc = IVFPQ.ivfpq_encode(emb, ivfpq_model).cache()
    enc.count()
    exact = [r.id for r in exact_knn(emb, query, K).collect()]
    got = [
        r.id
        for r in IVFPQ.ivfpq_search_rerank(
            emb, enc, ivfpq_model, query, K, nprobe=10
        ).collect()
    ]
    assert _recall(got, exact) >= 0.8
    enc.unpersist()


def test_ivfpq_encode_matches_manual_numpy(emb, ivfpq_model):
    """Cell = argmin ||x - coarse_centroid||; code_s = argmin over
    codebook s of the RESIDUAL's sub-vector — verified against a direct
    NumPy computation row by row (first-minimal-index ties)."""
    enc = {r.id: (r.ivf_cluster, list(r.pq_code)) for r in
           IVFPQ.ivfpq_encode(emb.limit(20), ivfpq_model).collect()}
    rows = {r.id: np.asarray(r.embedding, dtype=np.float64) for r in emb.limit(20).collect()}
    coarse = np.asarray(ivfpq_model.ivf.centroids)
    books = [np.asarray(c) for c in ivfpq_model.pq.centroids]
    sd = ivfpq_model.pq.sub_dim
    for rid, x in rows.items():
        cell = int(np.argmin(((x[None, :] - coarse) ** 2).sum(axis=1)))
        res = x - coarse[cell]
        want = [
            int(np.argmin(((res[s * sd : (s + 1) * sd][None, :] - books[s]) ** 2).sum(axis=1)))
            for s in range(ivfpq_model.pq.m)
        ]
        assert enc[rid] == (cell, want), rid
    assert ivfpq_model.compression_ratio(64) == 16.0  # 256 B -> 16 code bytes


def test_ivfpq_train_deterministic(emb):
    m1 = IVFPQ.ivfpq_train(emb, 64, nlist=8, m=8, num_centroids=16)
    m2 = IVFPQ.ivfpq_train(emb, 64, nlist=8, m=8, num_centroids=16)
    assert m1.ivf.centroids == m2.ivf.centroids
    assert m1.pq.centroids == m2.pq.centroids


def test_ivfpq_partition_pruned_layout(spark, emb, ivfpq_model, tmp_path):
    """The encoded artifact written partitionBy(cell) partition-prunes the
    probe filter — the nprobe/nlist I/O claim is visible in the plan."""
    from neighborly_spark.operators.ivf import CLUSTER_COL, ivf_read, ivf_write

    ivf_write(IVFPQ.ivfpq_encode(emb, ivfpq_model), str(tmp_path / "enc"))
    back = ivf_read(spark, str(tmp_path / "enc"))
    pruned = back.filter(F.col(CLUSTER_COL).isin([0, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and CLUSTER_COL in plan


def test_ivfpq_null_embedding_safe(spark, emb, ivfpq_model, query):
    """Null embedding -> null cell + null codes; never probed, never
    surfaced."""
    base = emb.select("id", "embedding").limit(20)
    with_null = base.unionByName(
        spark.createDataFrame([(999999, None)], base.schema)
    )
    enc = IVFPQ.ivfpq_encode(with_null, ivfpq_model)
    nrow = enc.filter(F.col("id") == 999999).collect()[0]
    assert nrow.ivf_cluster is None and nrow.pq_code is None
    out = IVFPQ.ivfpq_search(enc, ivfpq_model, list(query), 5, nprobe=16).collect()
    assert all(r.id != 999999 for r in out)


def test_ivfpq_beats_flat_pq_at_equal_bytes_on_clustered_data(spark):
    """The residual trick's value proposition: on CLUSTERED data (where a
    coarse centroid actually centers its cell, so residual spread << raw
    spread), pure-ADC ranking from residual codes beats flat PQ's pure-ADC
    ranking at the SAME code budget (m=8, k'=16) — the reason the
    composition exists. Uniform data shows no gap (the gate's sf0.01 table
    measures flat ~= residual there — no cluster structure to exploit),
    which is exactly why this test builds Gaussian blobs. Seeded, so the
    margin is stable run to run; measured over 10 queries to avoid
    single-query luck."""
    rng = np.random.default_rng(42)
    n, dim, nblobs = 3000, 32, 12
    blob_cents = rng.normal(0.0, 8.0, (nblobs, dim))
    X = blob_cents[rng.integers(0, nblobs, n)] + rng.normal(0.0, 1.0, (n, dim))
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, embedding array<float>").cache()
    df.count()

    qrows = df.filter(F.col("id") < 10).orderBy("id").collect()
    exact_sets = {
        r.id: {x.id for x in exact_knn(df, list(r.embedding), K).collect()} for r in qrows
    }

    flat = QZ.pq_train_sampled(df, dim=dim, m=8, num_centroids=16)
    flat_enc = QZ.pq_encode(df, flat).cache()
    flat_enc.count()
    ip = IVFPQ.ivfpq_train(df, dim, nlist=nblobs, m=8, num_centroids=16)
    ip_enc = IVFPQ.ivfpq_encode(df, ip).cache()
    ip_enc.count()
    flat_hits = ip_hits = 0
    for r in qrows:
        q = list(r.embedding)
        f_ids = {x.id for x in QZ.pq_search(flat_enc, flat, q, K).collect()}
        i_ids = {x.id for x in IVFPQ.ivfpq_search(ip_enc, ip, q, K, nprobe=nblobs).collect()}
        flat_hits += len(f_ids & exact_sets[r.id])
        ip_hits += len(i_ids & exact_sets[r.id])
    assert ip_hits > flat_hits, (ip_hits, flat_hits)
    # and the composed index clears the recall bar at a LOW probe count
    # (the clusterable operating point the docstrings claim: nprobe/nlist
    # = 4/12 = 1/3, vs 10/16 needed on uniform data). shortlist=150 so the
    # coarse routing is the ONLY approximation under test — at this tight
    # m=8/k'=16 budget the ADC ordering within a blob is noisy (sub-vector
    # spacing ~ residual sigma), so the default 5*k shortlist would measure
    # code resolution, not routing (full-probe sl=50 also sits ~0.7 here).
    # Measured: 0.98 at nprobe=4/sl=150; 1.00 at sl=250.
    lowprobe_hits = 0
    for r in qrows:
        i_ids = {
            x.id
            for x in IVFPQ.ivfpq_search_rerank(
                df, ip_enc, ip, list(r.embedding), K, nprobe=4, shortlist=150
            ).collect()
        }
        lowprobe_hits += len(i_ids & exact_sets[r.id])
    assert lowprobe_hits / (K * len(qrows)) >= 0.8
    flat_enc.unpersist()
    ip_enc.unpersist()
    df.unpersist()


# --- batched (one-scan) serving tiers -----------------------------------------


def test_sq_knn_join_equals_single_query(emb, sq_model):
    """sq_knn_join answers every query in ONE code-table scan; results equal
    the per-query sq_search_precoded loop exactly (both tiers)."""
    codes = QZ.sq_encode_table(emb, sq_model)
    qrows = emb.filter(F.col("id") < 5).orderBy("id").collect()
    queries = emb.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    for rer in (True, False):
        batch = QZ.sq_knn_join(
            codes, sq_model, queries, K, df=emb if rer else None, rerank=rer
        )
        got = {}
        for r in batch.collect():
            got.setdefault(r.query_id, []).append((r.id, round(r.dist, 6)))
        for r in qrows:
            single = [
                (x.id, round(x.dist, 6))
                for x in QZ.sq_search_precoded(
                    emb, codes, sq_model, list(r.embedding), K, rerank=rer
                ).collect()
            ]
            assert sorted(got[r.id]) == sorted(single), (rer, r.id)
    codes.unpersist()


def test_ivfpq_knn_join_equals_single_query(emb, ivfpq_model):
    """ivfpq_knn_join scores each probed-cell code row against every query
    that probes its cell (per-(query,cell) residual LUT gather-sums) and
    emits only per-partition top-shortlist rows; the merged candidates and
    reranked top-k equal the single-query path exactly — both orderings are
    (dist, id)."""
    enc = IVFPQ.ivfpq_encode(emb, ivfpq_model).cache()
    enc.count()
    qrows = emb.filter(F.col("id") < 5).orderBy("id").collect()
    qlist = [(int(r.id), list(r.embedding)) for r in qrows]
    batch = IVFPQ.ivfpq_knn_join(enc, ivfpq_model, qlist, K, nprobe=10, df=emb)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.id, round(r.dist, 6)))
    for qid, qv in qlist:
        single = [
            (x.id, round(x.dist, 6))
            for x in IVFPQ.ivfpq_search_rerank(
                emb, enc, ivfpq_model, qv, K, nprobe=10
            ).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid
    # pure-ADC tier too
    pure = IVFPQ.ivfpq_knn_join(enc, ivfpq_model, qlist, K, nprobe=10, rerank=False)
    got = {}
    for r in pure.collect():
        got.setdefault(r.query_id, []).append((r.id, round(r.dist, 6)))
    for qid, qv in qlist:
        single = [
            (x.id, round(x.dist, 6))
            for x in IVFPQ.ivfpq_search(enc, ivfpq_model, qv, K, nprobe=10).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid
    enc.unpersist()


def test_sq_knn_join_plan_reads_codes_only_without_rerank(spark, emb, sq_model, tmp_path):
    """The batched no-rerank plan touches ONLY the packed-code parquet and
    stays fully JVM-side (decode + score + partial top-k in codegen)."""
    QZ.sq_encode_table(emb, sq_model, path=str(tmp_path / "codes"))
    codes = spark.read.parquet(str(tmp_path / "codes"))
    qrows = emb.filter(F.col("id") < 3).collect()
    # literal queries: the only parquet in the plan must be the code table
    queries = spark.createDataFrame(
        [(int(r.id), [float(v) for v in r.embedding]) for r in qrows],
        "query_id bigint, query_embedding array<float>",
    )
    out = QZ.sq_knn_join(codes, sq_model, queries, 5, rerank=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    assert "MapInPandas" not in plan


# --- non-finite hygiene --------------------------------------------------------


def test_non_finite_vectors_do_not_poison_models(spark):
    """One NaN/Inf row must not silently collapse a quantizer: Spark orders
    NaN greatest (it would become vmax), an Inf makes a dim's scale infinite
    (all codes collapse to one byte), and a NaN in a k-means sample poisons
    every centroid mean it touches. Trainers ignore non-finite input;
    encoders give NaN/null rows null codes (rank last, consistent with the
    exact path's NaN-sorts-last) and clip ±Inf."""
    import math

    rows = [(i, [float(i % 5), 0.5 * i, 1.0]) for i in range(30)] + [
        (100, [float("nan"), 1.0, 1.0]),
        (101, [float("inf"), 1.0, 1.0]),
        (102, [1.0, float("-inf"), 1.0]),
        (103, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, embedding array<float>")

    m = QZ.sq_train(df, 3)
    assert all(math.isfinite(v) for v in m.vmin + m.vmax + m.scale)
    codes = df.select("id", QZ.sq_encode_expr("embedding", m).alias("code"))
    got = {r.id: r.code for r in codes.collect()}

    def nulled(code):  # null array OR null words — either nulls the distance
        return code is None or all(w is None for w in code)

    assert nulled(got[100]) and nulled(got[103])  # NaN/null -> null words
    assert not nulled(got[101]) and not nulled(got[102])  # Inf clips
    # NaN/null rows never surface (clipped Inf rows MAY rank: they are
    # real vectors whose out-of-range dim saturates, by design)
    out = QZ.sq_search_precoded(df, codes, m, [1.0, 1.0, 1.0], 5, rerank=False).collect()
    assert all(r.id not in (100, 103) for r in out)

    thr = QZ.bq_global_threshold(df)
    assert math.isfinite(thr)

    ip = IVFPQ.ivfpq_train(df, 3, nlist=4, m=1, num_centroids=4)
    flat = [v for c in ip.ivf.centroids for v in c] + [
        v for book in ip.pq.centroids for c in book for v in c
    ]
    assert all(math.isfinite(v) for v in flat)
    enc = {r.id: (r.ivf_cluster, r.pq_code) for r in IVFPQ.ivfpq_encode(df, ip).collect()}
    assert enc[100] == (None, None) and enc[103] == (None, None)
    out = IVFPQ.ivfpq_search(
        IVFPQ.ivfpq_encode(df, ip), ip, [1.0, 1.0, 1.0], 5, nprobe=4
    ).collect()
    assert all(r.id not in (100, 103) for r in out)

    pq = QZ.pq_train_sampled(df, dim=3, m=1, num_centroids=4)
    flat = [v for book in pq.centroids for c in book for v in c]
    assert all(math.isfinite(v) for v in flat)


def test_bq_knn_join_equals_single_query(spark, emb):
    """bq_knn_join (one code-table scan for all queries) equals the
    per-query bq_search_precoded loop — including a query that forces the
    per-query 3k-closest fallback while others pass the prefilter."""
    thr = QZ.bq_global_threshold(emb)
    codes = QZ.bq_encode_table(emb, dim=64, threshold=thr)
    qrows = emb.filter(F.col("id") < 4).orderBy("id").collect()
    # an adversarial far-away query: all-hamming-distant -> fallback fires
    far = [1000.0] * 64
    queries = spark.createDataFrame(
        [(int(r.id), [float(v) for v in r.embedding]) for r in qrows]
        + [(999, far)],
        "query_id bigint, query_embedding array<float>",
    )
    batch = QZ.bq_knn_join(emb, codes, queries, 5, 64, thr)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.id, round(r.dist, 6)))
    for qid, qv in [(int(r.id), list(r.embedding)) for r in qrows] + [(999, far)]:
        single = [
            (x.id, round(x.dist, 6))
            for x in QZ.bq_search_precoded(emb, codes, qv, 5, 64, thr).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid
    codes.unpersist()


def test_sq_range_search_equals_exact(emb, query, sq_model):
    """The decode-error bound makes the quantized radius prefilter lossless:
    output rows (ids AND distances) equal operators.knn.range_search at
    every radius, while the prefilter scans only the code table."""
    from neighborly_spark.operators.knn import range_search

    codes = QZ.sq_encode_table(emb, sq_model)
    for radius in (0.5, 1.1, 1.4):
        exact = [
            (r.id, round(r.dist, 9))
            for r in range_search(emb, query, radius, round_to=6).collect()
        ]
        got = [
            (r.id, round(r.dist, 9))
            for r in QZ.sq_range_search(
                emb, codes, sq_model, query, radius, round_to=6
            ).collect()
        ]
        assert got == exact, radius
    codes.unpersist()


def test_cosine_ann_via_normalization_sq_ivfpq(spark, emb, query):
    """The cosine bridge extends to the new quantizers: euclidean SQ/IVFPQ
    over L2-normalized vectors ranks by cosine — recall measured against
    brute-force cosine (same contract as the IVF/LSH bridge test)."""
    from neighborly_spark.functions.distance import normalize

    normed = emb.select("id", normalize(F.col("embedding")).alias("embedding")).cache()
    normed.count()
    qn = list(normed.filter(F.col("id") == 7).collect()[0].embedding)
    exact_cos = [r.id for r in exact_knn(emb, query, K, metric="cosine").collect()]

    m = QZ.sq_train(normed, 64)
    codes = QZ.sq_encode_table(normed, m)
    sq_ids = [r.id for r in QZ.sq_search_precoded(normed, codes, m, qn, K).collect()]
    assert _recall(sq_ids, exact_cos) >= 0.8
    codes.unpersist()

    ip = IVFPQ.ivfpq_train(normed, 64, nlist=16, m=16, num_centroids=32)
    enc = IVFPQ.ivfpq_encode(normed, ip).cache()
    enc.count()
    ip_ids = [
        r.id
        for r in IVFPQ.ivfpq_search_rerank(normed, enc, ip, qn, K, nprobe=10).collect()
    ]
    assert _recall(ip_ids, exact_cos) >= 0.8
    enc.unpersist()
    normed.unpersist()


# --- cosine through the quantized tiers (round 6 — VERDICT 8) -----------------


def test_cosine_metric_matrix_quantized_tiers(spark, emb):
    """method x metric matrix: bq/sq/ivfpq built with metric='cosine'
    serve search(metric='cosine') — recall gated vs the exact cosine
    oracle, reported values equal the true similarity via cos = 1 - d^2/2
    on the rerank tiers, batch path agrees with single, and metric
    mismatch (either direction) raises instead of serving garbage."""
    from neighborly_spark.search_service import SearchService

    q = list(emb.filter(F.col("id") == 7).first().embedding)
    exact = [
        (r.id, float(r.dist))
        for r in exact_knn(emb, q, K, metric="cosine").collect()
    ]
    exact_ids = [i for i, _ in exact]
    exact_sim = dict(exact)

    svc = SearchService(emb, dim=64)
    for method in ("sq", "ivfpq", "bq"):
        svc.build_index(method, metric="cosine")
    assert svc._index_metric["sq"] == "cosine"

    # sq: near-lossless -> top-k ids equal the exact cosine oracle
    got = [(r.id, float(r.dist)) for r in svc.search(
        query_vec=q, k=K, method="sq", metric="cosine", sq_rerank=True
    ).collect()]
    assert _recall([i for i, _ in got], exact_ids) >= 0.9
    for rid, sim in got:
        if rid in exact_sim:
            assert abs(sim - exact_sim[rid]) < 5e-5, (rid, sim, exact_sim[rid])
    # similarity DESC ordering (the exact path's D2 semantics)
    sims = [s for _, s in got]
    assert sims == sorted(sims, reverse=True)
    # default (no-rerank) tier still clears the bar on ids
    got_nr = [r.id for r in svc.search(query_vec=q, k=K, method="sq", metric="cosine").collect()]
    assert _recall(got_nr, exact_ids) >= 0.8

    # ivfpq rerank tier: recall bar + true similarities
    got = [(r.id, float(r.dist)) for r in svc.search(
        query_vec=q, k=K, method="ivfpq", metric="cosine", ivfpq_nprobe=10
    ).collect()]
    assert _recall([i for i, _ in got], exact_ids) >= 0.8
    for rid, sim in got:
        if rid in exact_sim:
            assert abs(sim - exact_sim[rid]) < 5e-5

    # bq: only-allowed semantics (strict prefilter may return < k), values true
    got = [(r.id, float(r.dist)) for r in svc.search(
        query_vec=q, k=K, method="bq", metric="cosine"
    ).collect()]
    assert got and got[0][0] == 7  # the query row survives its own prefilter
    for rid, sim in got:
        if rid in exact_sim:
            assert abs(sim - exact_sim[rid]) < 5e-5

    # hnsw: graph built over normalized vectors, similarities reported
    svc_h = SearchService(emb, dim=64)
    got = [(r.id, float(r.dist)) for r in svc_h.search(
        query_vec=q, k=K, method="hnsw", metric="cosine"
    ).collect()]
    assert svc_h._index_metric["hnsw"] == "cosine"
    assert _recall([i for i, _ in got], exact_ids) >= 0.8
    for rid, sim in got:
        if rid in exact_sim:
            assert abs(sim - exact_sim[rid]) < 5e-5
    with pytest.raises(ValueError, match="metric"):
        svc_h.search(query_vec=q, k=5, method="hnsw")  # euclid on cosine graph
    # batch facade too
    hb = {}
    for r in svc_h.search_batch([(7, q)], k=5, method="hnsw", metric="cosine").collect():
        hb.setdefault(r.query_id, []).append(r.id)
    assert _recall(hb[7], exact_ids[:5]) >= 0.8

    # ivf / pq: cosine builds (normalized assignments / codebooks) +
    # similarity values on the intersecting ids
    svc_ip = SearchService(emb, dim=64)
    for m in ("ivf", "pq"):
        svc_ip.build_index(m, metric="cosine")
        # nprobe=10/16 for ivf: normalized uniform data is the adversarial
        # geometry (same operating point the ivfpq gate leg documents)
        got = [(r.id, float(r.dist)) for r in svc_ip.search(
            query_vec=q, k=K, method=m, metric="cosine", ivf_nprobe=10
        ).collect()]
        assert _recall([i for i, _ in got], exact_ids) >= 0.8, m
        for rid, sim in got:
            if rid in exact_sim:
                assert abs(sim - exact_sim[rid]) < 5e-5, m
        with pytest.raises(ValueError, match="metric"):
            svc_ip.search(query_vec=q, k=5, method=m)

    # lsh: no cosine build exists (data-independent hyperplanes) — the
    # query-time bridge alone serves it
    svc_l = SearchService(emb, dim=64)
    got = [(r.id, float(r.dist)) for r in svc_l.search(
        query_vec=q, k=K, method="lsh", metric="cosine"
    ).collect()]
    assert _recall([i for i, _ in got], exact_ids) >= 0.8
    for rid, sim in got:
        if rid in exact_sim:
            assert abs(sim - exact_sim[rid]) < 5e-5
    with pytest.raises(ValueError, match="cosine"):
        svc_l.build_index("lsh", metric="cosine")

    # batch path agrees with the single-query path (sq, rounded values)
    qdf = [(7, q), (11, list(emb.filter(F.col("id") == 11).first().embedding))]
    batch = {}
    for r in svc.search_batch(qdf, k=5, method="sq", metric="cosine").collect():
        batch.setdefault(r.query_id, []).append((r.id, round(r.dist, 9)))
    single = [
        (r.id, round(r.dist, 9))
        for r in svc.search(query_vec=q, k=5, method="sq", metric="cosine", sq_rerank=True).collect()
    ]
    assert sorted(batch[7]) == sorted(single)

    # mismatch guards, both directions
    with pytest.raises(ValueError, match="metric"):
        svc.search(query_vec=q, k=5, method="sq")  # euclidean on cosine build
    svc_e = SearchService(emb, dim=64)
    svc_e.build_index("sq")  # euclidean build
    with pytest.raises(ValueError, match="metric"):
        svc_e.search(query_vec=q, k=5, method="sq", metric="cosine")
    with pytest.raises(ValueError, match="cosine"):
        svc_e.search_batch(qdf, k=5, method="linear", metric="cosine")


def test_cosine_composes_with_tag_filters(spark, emb):
    """metric='cosine' x tag filters: the filtered exact cosine oracle is
    matched set-wise by the lossless sq tier, and every quantized tier
    returns only allowed rows with true similarity values."""
    from neighborly_spark.search_service import SearchService

    tagged = emb.withColumn("tags", F.array((F.col("id") % 3).cast("smallint"))).cache()
    tagged.count()
    svc = SearchService(tagged, dim=64)
    for m in ("sq", "ivfpq"):
        svc.build_index(m, metric="cosine")
    q = list(emb.filter(F.col("id") == 7).first().embedding)
    allowed_df = tagged.filter(F.array_contains("tags", 1))
    allowed = {r.id for r in allowed_df.select("id").collect()}
    exact = {
        r.id: float(r.dist)
        for r in exact_knn(allowed_df, q, 5, metric="cosine").collect()
    }
    got = [(r.id, float(r.dist)) for r in svc.search(
        query_vec=q, k=5, method="sq", metric="cosine", tag_any=[1], sq_rerank=True
    ).collect()]
    assert {i for i, _ in got} == set(exact)
    for rid, sim in got:
        assert abs(sim - exact[rid]) < 5e-5
    ip = [(r.id, float(r.dist)) for r in svc.search(
        query_vec=q, k=5, method="ivfpq", metric="cosine", tag_any=[1]
    ).collect()]
    assert {i for i, _ in ip} <= allowed and 7 in {i for i, _ in ip}
    tagged.unpersist()


def test_cosine_index_snapshot_roundtrip(spark, emb, tmp_path):
    """A cosine-built sq index survives save/load: the loaded service
    knows the metric and serves identical results."""
    from neighborly_spark.search_service import SearchService

    q = list(emb.filter(F.col("id") == 7).first().embedding)
    svc = SearchService(emb, dim=64)
    svc.build_index("sq", metric="cosine")
    want = [(r.id, round(r.dist, 9)) for r in svc.search(
        query_vec=q, k=5, method="sq", metric="cosine").collect()]
    path = str(tmp_path / "snap_cos")
    svc.save(path)
    loaded = SearchService.load(spark, path)
    assert loaded._index_metric.get("sq") == "cosine"
    got = [(r.id, round(r.dist, 9)) for r in loaded.search(
        query_vec=q, k=5, method="sq", metric="cosine").collect()]
    assert got == want
    with pytest.raises(ValueError, match="metric"):
        loaded.search(query_vec=q, k=5, method="sq")


def test_ivfpq_knn_join_dataframe_queries_equal_list(spark, emb, ivfpq_model):
    """Round-6 VERDICT 1: a (query_id, query_embedding) DataFrame flows
    through ivfpq_knn_join with ZERO query-side collects — probe
    assignment is a vectorized mapInPandas, residual LUTs are computed
    inside the (cell, salt) cogroup tasks from broadcast codebooks, and
    results are bit-equal to the list path (same numpy reductions). Also
    exercises empty salt buckets (data_salt larger than small cells) and
    plan-build laziness."""
    enc = IVFPQ.ivfpq_encode(emb, ivfpq_model).cache()
    enc.count()
    qrows = emb.filter(F.col("id") < 6).orderBy("id").collect()
    qlist = [(int(r.id), list(r.embedding)) for r in qrows]
    qdf = spark.createDataFrame(
        [(qid, [float(v) for v in vec]) for qid, vec in qlist],
        "query_id bigint, query_embedding array<double>",
    )
    # plan construction fires no jobs (no query-side collect anywhere)
    sc = spark.sparkContext
    sc.setJobGroup("ivfpq-df-lazy", "")
    out = IVFPQ.ivfpq_knn_join(enc, ivfpq_model, qdf, K, nprobe=10, df=emb)
    assert list(sc.statusTracker().getJobIdsForGroup("ivfpq-df-lazy")) == []
    sc.setJobGroup("ivfpq-df-lazy-done", "")

    want = sorted(
        (r.query_id, r.id, round(r.dist, 9))
        for r in IVFPQ.ivfpq_knn_join(
            enc, ivfpq_model, qlist, K, nprobe=10, df=emb
        ).collect()
    )
    got = sorted((r.query_id, r.id, round(r.dist, 9)) for r in out.collect())
    assert got == want and len(got) == len(qlist) * K

    # probes into an EMPTY cell (all rows of one probed cell removed):
    # the cogroup group has an empty code side — must yield the same
    # candidates as the list path on the same pruned table, not crash
    some_cell = enc.filter(F.col("ivf_cluster").isNotNull()).first().ivf_cluster
    pruned = enc.filter(F.col("ivf_cluster") != some_cell)
    a_empty = sorted(
        (r.query_id, r.id, round(r.dist, 9))
        for r in IVFPQ.ivfpq_knn_join(
            pruned, ivfpq_model, qdf, K, nprobe=16, rerank=False
        ).collect()
    )
    b_empty = sorted(
        (r.query_id, r.id, round(r.dist, 9))
        for r in IVFPQ.ivfpq_knn_join(
            pruned, ivfpq_model, qlist, K, nprobe=16, rerank=False
        ).collect()
    )
    assert a_empty == b_empty and len(a_empty) == len(qlist) * K

    # pure-ADC tier, odd salt count, and a salt count guaranteed to leave
    # some (cell, salt) buckets empty on this 16-cell table
    for salt in (1, 3, 64):
        pure_df = sorted(
            (r.query_id, r.id, round(r.dist, 9))
            for r in IVFPQ.ivfpq_knn_join(
                enc, ivfpq_model, qdf, K, nprobe=10, rerank=False, data_salt=salt
            ).collect()
        )
        pure_list = sorted(
            (r.query_id, r.id, round(r.dist, 9))
            for r in IVFPQ.ivfpq_knn_join(
                enc, ivfpq_model, qlist, K, nprobe=10, rerank=False
            ).collect()
        )
        assert pure_df == pure_list, salt
    enc.unpersist()


def test_sq_range_search_cosine_equals_exact(spark, emb, query):
    """Round-6 VERDICT 7: the lossless SQ radius tier serves cosine. The
    reference's D2 quirk applies (similarity through dist<=radius keeps
    LOW-similarity rows); against a cosine-built index the quantized
    prefilter (d_q >= sqrt(2-2t) - eps - slack over normalized codes) has
    no false negatives, so rows AND dist values equal the exact cosine
    range scan at every radius — including the service facade and the
    drift-voided fallback."""
    from neighborly_spark.functions.distance import normalize
    from neighborly_spark.operators.knn import range_search
    from neighborly_spark.search_service import SearchService

    normed = emb.select("id", normalize(F.col("embedding")).alias("embedding")).cache()
    normed.count()
    m = QZ.sq_train(normed, 64)
    codes = QZ.sq_encode_table(normed, m)
    # similarity thresholds spanning keep-few to keep-most (the quirk
    # keeps sim <= t, so LOW t = few rows)
    for t in (-0.2, 0.05, 0.3, 0.95):
        exact = [
            (r.id, round(r.dist, 9))
            for r in range_search(emb, query, t, metric="cosine", round_to=6).collect()
        ]
        got = [
            (r.id, round(r.dist, 9))
            for r in QZ.sq_range_search_cosine(
                emb, codes, m, query, t, round_to=6
            ).collect()
        ]
        assert got == exact, (t, len(exact), len(got))
    codes.unpersist()
    normed.unpersist()

    # service facade: cosine-built index serves range_search(metric='cosine')
    svc = SearchService(emb.select("id", "embedding"), dim=64)
    svc.build_index("sq", metric="cosine")
    exact = [
        (r.id, round(r.dist, 9))
        for r in range_search(emb, query, 0.3, metric="cosine").collect()
    ]
    got = [
        (r.id, round(r.dist, 9))
        for r in svc.range_search(query_vec=query, radius=0.3, metric="cosine", method="sq").collect()
    ]
    assert got == exact

    # metric mismatch refuses; drift-voided appends fall back to the exact
    # scan (same rows, no byte savings)
    with pytest.raises(ValueError, match="metric"):
        svc.range_search(query_vec=query, radius=0.3, metric="euclidean", method="sq")
    # a one-hot direction normalizes to a unit axis vector — its dim-0
    # value 1.0 escapes the trained box of normalized hash embeddings
    # (cosine appends normalize before encoding, so a plain big vector
    # would NOT drift — the box is over the normalized table)
    out_of_range = spark.createDataFrame(
        [(990001, [100.0] + [0.0] * 63)], "id long, embedding array<float>"
    )
    svc.add_vectors(out_of_range)
    assert svc._sq_drift["out_of_range_rows"] > 0
    exact2 = {
        (r.id, round(r.dist, 9))
        for r in range_search(svc.df, query, 0.3, metric="cosine").collect()
    }
    got2 = {
        (r.id, round(r.dist, 9))
        for r in svc.range_search(query_vec=query, radius=0.3, metric="cosine", method="sq").collect()
    }
    assert got2 == exact2


def test_bq_sq_batch_refuse_beyond_broadcast_budget(spark, emb, sq_model):
    """Round-7 VERDICT 2: bq/sq batch joins broadcast the query side, so a
    beyond-budget query TABLE must raise with route-to-hnsw/ivfpq
    guidance instead of collecting 100k+ rows to the driver. The guard
    fires before any code-table scan (the error comes from the bounded
    query-count job), and bounded batches are untouched."""
    import pytest as _pytest

    from neighborly_spark.plans.knn_planner import MAX_COLLECTED_QUERIES

    big = spark.range(MAX_COLLECTED_QUERIES + 1).select(
        F.col("id").alias("query_id"),
        F.array(*[F.lit(0.5)] * 64).cast("array<float>").alias("query_embedding"),
    )
    thr = QZ.bq_global_threshold(emb)
    codes = QZ.bq_encode_table(emb, dim=64, threshold=thr)
    with _pytest.raises(ValueError, match="broadcast budget.*hnsw"):
        QZ.bq_knn_join(emb, codes, big, 5, 64, thr)
    sq_codes = QZ.sq_encode_table(emb, sq_model)
    with _pytest.raises(ValueError, match="broadcast budget.*hnsw"):
        QZ.sq_knn_join(sq_codes, sq_model, big, 5, df=emb)
    # an explicit budget raise keeps the tier usable when the caller KNOWS
    # the driver can hold the broadcast; a tiny explicit budget refuses a
    # tiny frame (the knob is honored in both directions)
    small = big.limit(3)
    with _pytest.raises(ValueError, match="broadcast budget"):
        QZ.sq_knn_join(sq_codes, sq_model, small, 5, df=emb, max_broadcast_queries=2)
    out = QZ.sq_knn_join(
        sq_codes, sq_model, small, 5, df=emb, max_broadcast_queries=3
    )
    assert out.select("query_id").distinct().count() == 3
    codes.unpersist()
    sq_codes.unpersist()


def test_ivfpq_df_lut_chunking_is_bit_identical(spark, emb, ivfpq_model, monkeypatch):
    """Round 8: the (cell, salt) cogroup computes residual LUTs in bounded
    query chunks (the unchunked broadcast-subtract was multi-GB per task
    at 100k-query fan-in). Chunking must not change a single bit: force a
    2-query chunk so a 5-query batch spans 3 chunks and compare against
    the single-query path exactly."""
    from neighborly_spark.operators import ivfpq as IVFPQ_mod

    monkeypatch.setattr(IVFPQ_mod, "_LUT_QUERY_CHUNK", 2)
    enc = IVFPQ.ivfpq_encode(emb, ivfpq_model).cache()
    enc.count()
    qdf = emb.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    )
    batch = IVFPQ.ivfpq_knn_join(enc, ivfpq_model, qdf, K, nprobe=10, df=emb)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.id, r.dist))
    for r in emb.filter(F.col("id") < 5).collect():
        single = [
            (x.id, x.dist)
            for x in IVFPQ.ivfpq_search_rerank(
                emb, enc, ivfpq_model, list(r.embedding), K, nprobe=10
            ).collect()
        ]
        assert sorted(got[r.id]) == sorted(single), r.id  # exact floats
    enc.unpersist()


def test_ivfpq_snapshot_tier_bit_equal_to_cogroup(spark, emb, ivfpq_model, tmp_path):
    """Round 8: ivfpq_knn_join_snapshot serves a SAVED code table
    worker-resident (only probe assignments enter the plan) and is
    bit-equal to the in-memory cogroup path — shared ADC kernel, shared
    merge/rerank, so (query_id, id, dist) triples match exactly, for
    DataFrame and list query inputs, any query_salt, rerank on and off."""
    from neighborly_spark.operators.ivf import CLUSTER_COL

    enc = IVFPQ.ivfpq_encode(emb, ivfpq_model).cache()
    enc.count()
    path = str(tmp_path / "codes")
    enc.write.partitionBy(CLUSTER_COL).parquet(path)
    qrows = emb.limit(7).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    qrows.count()

    want = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join(
            enc, ivfpq_model, qrows, K, nprobe=4, df=emb
        ).collect()
    )
    got_df = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, ivfpq_model, qrows, K, version="v1", nprobe=4, df=emb
        ).collect()
    )
    assert got_df == want and len(want) == 7 * K
    qlist = [(int(r.query_id), list(r.query_embedding)) for r in qrows.collect()]
    got_list = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, ivfpq_model, qlist, K, version="v1", nprobe=4, df=emb
        ).collect()
    )
    assert got_list == want
    got_salted = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, ivfpq_model, qrows, K, version="v1", nprobe=4, df=emb,
            query_salt=3,
        ).collect()
    )
    assert got_salted == want
    # ADC-only tier (no rerank) matches too
    want_adc = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join(
            enc, ivfpq_model, qrows, K, nprobe=4, rerank=False
        ).collect()
    )
    got_adc = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, ivfpq_model, qrows, K, version="v1", nprobe=4, rerank=False
        ).collect()
    )
    assert got_adc == want_adc
    enc.unpersist()
    qrows.unpersist()


def test_ivfpq_snapshot_cell_loader_lru(spark, emb, ivfpq_model, tmp_path):
    """Unit tier of the worker-side cell loader: one cache entry per
    (path, cell, version), warm second load, empty cells cached as empty,
    a new version is a separate entry (re-saves can never serve stale
    codes)."""
    from neighborly_spark.operators.ivf import CLUSTER_COL

    enc = IVFPQ.ivfpq_encode(emb.limit(200), ivfpq_model)
    path = str(tmp_path / "codes")
    enc.write.partitionBy(CLUSTER_COL).parquet(path)
    a_cell = enc.select(CLUSTER_COL).first()[0]
    m, kp = ivfpq_model.pq.m, ivfpq_model.pq.num_centroids

    from neighborly_spark.operators.worker_cache import WORKER_CACHE

    WORKER_CACHE.clear()
    IVFPQ._SNAPSHOT_CELL_STATS.update(hits=0, misses=0)
    ids1, idx1, tags1 = IVFPQ._load_snapshot_cell(path, int(a_cell), "v1", "id", m, kp)
    assert len(ids1) > 0 and idx1.shape == (len(ids1), m)
    assert list(ids1) == sorted(ids1)  # id-sorted for the stable tiebreak
    assert tags1 == {}  # no tag passthrough columns in this artifact
    ids2, idx2, _ = IVFPQ._load_snapshot_cell(path, int(a_cell), "v1", "id", m, kp)
    assert ids2 is ids1 and idx2 is idx1  # warm, same arrays
    assert IVFPQ._SNAPSHOT_CELL_STATS == {"hits": 1, "misses": 1}
    # a cell no row was assigned to: cached empty, not an error
    empty_ids, empty_idx, _ = IVFPQ._load_snapshot_cell(path, 9999, "v1", "id", m, kp)
    assert len(empty_ids) == 0 and empty_idx.shape == (0, m)
    # a new version is a fresh entry
    IVFPQ._load_snapshot_cell(path, int(a_cell), "v2", "id", m, kp)
    assert IVFPQ._SNAPSHOT_CELL_STATS["misses"] == 3
    assert len(WORKER_CACHE) == 3


def test_search_service_ivfpq_snapshot_roundtrip(spark, emb, tmp_path):
    """save() backs the live service's ivfpq batch tier with the snapshot
    it wrote; load() restores it; results equal the pre-save run;
    tag-filtered queries fall back to the artifact path; mutations clear
    the snapshot."""
    from neighborly_spark.search_service import SearchService

    tagged = emb.withColumn(
        "tags", F.array((F.col("id") % 2).cast("smallint"))
    ).cache()
    tagged.count()
    svc = SearchService(tagged, dim=64)
    svc.build_index("ivfpq")
    qdf = tagged.limit(5).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    )
    before = sorted(
        (r.query_id, r.id, r.dist)
        for r in svc.search_batch(qdf, k=K, method="ivfpq").collect()
    )
    assert svc._ivfpq_snapshot is None
    svc.save(str(tmp_path / "snap"))
    assert svc._ivfpq_snapshot is not None
    after_save = sorted(
        (r.query_id, r.id, r.dist)
        for r in svc.search_batch(qdf, k=K, method="ivfpq").collect()
    )
    assert after_save == before
    loaded = SearchService.load(spark, str(tmp_path / "snap"))
    assert loaded._ivfpq_snapshot is not None
    after_load = sorted(
        (r.query_id, r.id, r.dist)
        for r in loaded.search_batch(qdf, k=K, method="ivfpq").collect()
    )
    assert after_load == before
    # tag filter: since round 9 served FROM THE SNAPSHOT (worker-side
    # mask over artifact-embedded tags — zero-reship holds under
    # filtering), every hit satisfies the filter, and results equal the
    # in-memory pushdown-filtered artifact path per query
    from unittest import mock

    with mock.patch.object(
        IVFPQ, "ivfpq_knn_join_snapshot", wraps=IVFPQ.ivfpq_knn_join_snapshot
    ) as spy:
        filtered = loaded.search_batch(qdf, k=5, method="ivfpq", tag_any=[1]).collect()
    assert spy.call_count == 1 and spy.call_args.kwargs["tag_any"] == [1]
    assert filtered and all(r.id % 2 == 1 for r in filtered)
    want_filtered = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join(
            loaded._ivfpq_encoded.filter(
                F.arrays_overlap(F.col("tags"), F.lit([1]).cast("array<smallint>"))
            ),
            loaded._ivfpq_model, qdf, 5, nprobe=10, df=tagged.filter("id % 2 = 1"),
        ).collect()
    )
    assert sorted((r.query_id, r.id, r.dist) for r in filtered) == want_filtered
    # mutation invalidates the snapshot (the in-memory artifact diverges)
    new_row = tagged.limit(1).select(
        (F.col("id") + 1_000_000).alias("id"), *[c for c in tagged.columns if c != "id"]
    )
    loaded.add_vectors(new_row)
    assert loaded._ivfpq_snapshot is None
    tagged.unpersist()


def test_ivfpq_snapshot_tag_filter_worker_resident(spark, emb, ivfpq_model, tmp_path):
    """Round 9 (r8 VERDICT 2): tag filters ride the ivfpq snapshot tier —
    the mask evaluates worker-side over artifact-embedded tags BEFORE ADC
    scoring, so (a) results are bit-equal to the in-memory cogroup path
    over the pushdown-filtered artifact, (b) disallowed rows never crowd
    the shortlist (recall vs the tag-filtered exact oracle holds at both
    sweep-band selectivities), and (c) a tags-less snapshot raises with
    rebuild guidance instead of silently serving unfiltered."""
    from neighborly_spark.operators.ivf import CLUSTER_COL

    # selectivity 1/2 (id % 2) and 1/20 (id % 20) tag bands
    tagged = emb.withColumn(
        "tags",
        F.array(
            (F.col("id") % 2).cast("smallint"),
            (F.col("id") % 20 + 100).cast("smallint"),
        ),
    ).cache()
    tagged.count()
    enc = IVFPQ.ivfpq_encode(tagged, ivfpq_model).join(
        tagged.select("id", "tags"), "id"
    ).cache()
    enc.count()
    path = str(tmp_path / "codes_tagged")
    enc.write.partitionBy(CLUSTER_COL).parquet(path)
    qrows = tagged.limit(5).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    qrows.count()

    for tag_any, sel_pred in (([1], "id % 2 = 1"), ([103], "id % 20 = 3")):
        got = sorted(
            (r.query_id, r.id, r.dist)
            for r in IVFPQ.ivfpq_knn_join_snapshot(
                spark, path, ivfpq_model, qrows, K, version="vt1",
                nprobe=8, df=tagged, tag_any=tag_any,
            ).collect()
        )
        # zero-reship holds under filtering: the snapshot plan never
        # scans the code table (only probe assignments + the rerank
        # float join enter the plan)
        snap_df = IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, ivfpq_model, qrows, K, version="vt1",
            nprobe=8, df=tagged, tag_any=tag_any,
        )
        plan = snap_df._jdf.queryExecution().executedPlan().toString()
        assert "codes_tagged" not in plan and "pq_code" not in plan
        # bit-equal to the in-memory cogroup path over the pushdown-
        # filtered artifact (the shared kernel sees the same allowed rows)
        want = sorted(
            (r.query_id, r.id, r.dist)
            for r in IVFPQ.ivfpq_knn_join(
                enc.filter(F.arrays_overlap(
                    F.col("tags"), F.lit(tag_any).cast("array<smallint>"))),
                ivfpq_model, qrows, K, nprobe=8, df=tagged,
            ).collect()
        )
        assert got == want and got
        # every hit satisfies the tag predicate (mask applied pre-scoring)
        allowed_ids = set(r.id for r in tagged.filter(sel_pred).select("id").collect())
        assert all(i in allowed_ids for _, i, _ in got)
        # recall vs the tag-filtered exact oracle at the tier's lossless-
        # coarse operating point (nprobe=nlist): with every cell probed
        # the only loss left is PQ quantization + the rerank cut — the
        # filter itself must not cost recall (disallowed rows can no
        # longer crowd the shortlist). nprobe<nlist recall is the tier's
        # usual coarse-pruning tradeoff, unchanged by filtering.
        full = sorted(
            (r.query_id, r.id)
            for r in IVFPQ.ivfpq_knn_join_snapshot(
                spark, path, ivfpq_model, qrows, K, version="vt1",
                nprobe=16, df=tagged, tag_any=tag_any,
            ).collect()
        )
        allowed = tagged.filter(sel_pred)
        for qid, vec in [(int(r.query_id), list(r.query_embedding)) for r in qrows.collect()]:
            hits = [i for q, i in full if q == qid]
            exact_ids = [r.id for r in exact_knn(allowed, vec, K).collect()]
            assert _recall(hits, exact_ids) >= 0.8, (qid, tag_any)

    # tags-less snapshot: raise, don't silently serve unfiltered
    enc_plain = IVFPQ.ivfpq_encode(emb, ivfpq_model)
    plain_path = str(tmp_path / "codes_plain")
    enc_plain.write.partitionBy(CLUSTER_COL).parquet(plain_path)
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="no 'tags' column"):
        IVFPQ.ivfpq_knn_join_snapshot(
            spark, plain_path, ivfpq_model, qrows, K, version="vp1",
            nprobe=4, df=emb, tag_any=[1],
        ).collect()
    tagged.unpersist()
    enc.unpersist()
    qrows.unpersist()


# --- OPQ (round 9, beyond-reference: Ge et al. 2013) -------------------------


def _anisotropic_df(spark, n=3000, dim=16, seed=7):
    """Synthetic anisotropic vectors: a few high-variance directions mixed
    across ALL coordinates (random orthogonal mix of a decaying spectrum)
    — the regime plain PQ handles poorly because every subspace sees a
    slice of the same dominant directions, and the regime OPQ exists for."""
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(dim, dim))
    scales = np.linspace(6.0, 0.05, dim)
    x = (rng.randn(n, dim) * scales) @ q.T
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_opq_rotation_is_orthogonal_and_deterministic(spark):
    df = _anisotropic_df(spark, n=800, dim=16)
    r1 = IVFPQ.opq_train_rotation(df, 16, m=4, num_centroids=16, iters=3)
    r2 = IVFPQ.opq_train_rotation(df, 16, m=4, num_centroids=16, iters=3)
    assert np.array_equal(r1, r2)  # seeded per (iter, subspace): bit-stable
    assert np.allclose(r1 @ r1.T, np.eye(16), atol=1e-9)


def _concentrated_df(spark, n=3000, dim=16, seed=7):
    """Energy concentrated in the first PQ subspace (no mixing) — the
    textbook OPQ case: plain PQ burns 7 of 8 codebooks on noise while one
    2-d subspace holds everything; eigenvalue allocation redistributes."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, dim) * np.array([8.0, 6.0] + [0.08] * (dim - 2))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_opq_improves_pure_adc_recall_on_anisotropic_data(spark):
    """The headline claim at the tier that feels quantization error most:
    PURE-ADC (rerank off) recall at identical code bytes, all cells probed
    (pure code-quality regime). On the concentrated geometry the
    eigenvalue-allocation init is worth measured 0.51 -> 0.93 recall (and
    35x lower flat-PQ quantization MSE); the mixed geometry below asserts
    no-harm."""
    from neighborly_spark.operators.knn import knn_join_vectorized

    df = _concentrated_df(spark).cache()
    df.count()
    queries = df.limit(24).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    queries.count()
    exact = {
        qid: {r.id for r in grp}
        for qid, grp in __import__("itertools").groupby(
            sorted(
                knn_join_vectorized(df, queries, 10).collect(),
                key=lambda r: (r.query_id, r.dist, r.id),
            ),
            key=lambda r: r.query_id,
        )
    }

    def mean_recall(model):
        enc = IVFPQ.ivfpq_encode(df, model)
        got = IVFPQ.ivfpq_knn_join(
            enc, model, queries, 10, nprobe=4, rerank=False
        ).collect()
        import itertools

        per_q = {
            qid: {r.id for r in grp}
            for qid, grp in itertools.groupby(
                sorted(got, key=lambda r: r.query_id), key=lambda r: r.query_id
            )
        }
        return float(np.mean([
            len(per_q.get(q, set()) & exact[q]) / 10 for q in exact
        ]))

    plain = IVFPQ.ivfpq_train(df, 16, nlist=4, m=8, num_centroids=64)
    opq = IVFPQ.ivfpq_train(df, 16, nlist=4, m=8, num_centroids=64, opq=True)
    assert opq.rotation is not None and plain.rotation is None
    r_plain, r_opq = mean_recall(plain), mean_recall(opq)
    # the gain is the point (measured 0.51 -> 0.93); generous margins
    # keep the gate robust to sample jitter
    assert r_opq >= r_plain + 0.2, (r_plain, r_opq)
    assert r_opq >= 0.8, r_opq
    df.unpersist()
    queries.unpersist()


def test_opq_no_harm_on_mixed_anisotropy(spark):
    """On a random-orthogonal mix (where IVF residuals already absorb the
    dominant directions) OPQ must not cost recall: within a small epsilon
    of the plain build at the same operating point."""
    import itertools

    from neighborly_spark.operators.knn import knn_join_vectorized

    df = _anisotropic_df(spark).cache()
    df.count()
    queries = df.limit(24).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    queries.count()
    exact = {
        qid: {r.id for r in grp}
        for qid, grp in itertools.groupby(
            sorted(
                knn_join_vectorized(df, queries, 10).collect(),
                key=lambda r: (r.query_id, r.dist, r.id),
            ),
            key=lambda r: r.query_id,
        )
    }

    def mean_recall(model):
        enc = IVFPQ.ivfpq_encode(df, model)
        got = IVFPQ.ivfpq_knn_join(
            enc, model, queries, 10, nprobe=4, rerank=False
        ).collect()
        per_q = {
            qid: {r.id for r in grp}
            for qid, grp in itertools.groupby(
                sorted(got, key=lambda r: r.query_id), key=lambda r: r.query_id
            )
        }
        return float(np.mean([
            len(per_q.get(q, set()) & exact[q]) / 10 for q in exact
        ]))

    plain = IVFPQ.ivfpq_train(df, 16, nlist=8, m=8, num_centroids=64)
    opq = IVFPQ.ivfpq_train(df, 16, nlist=8, m=8, num_centroids=64, opq=True)
    r_plain, r_opq = mean_recall(plain), mean_recall(opq)
    assert r_opq >= r_plain - 0.05, (r_plain, r_opq)
    df.unpersist()
    queries.unpersist()


def test_opq_paths_agree_and_roundtrip(spark, tmp_path):
    """All ivfpq query paths rotate consistently: single-query, list-batch,
    DataFrame-batch, and the worker-resident snapshot tier return the same
    candidates for an OPQ model; SearchService build_index(opq=True) +
    save/load round-trips the rotation."""
    from neighborly_spark.operators.ivf import CLUSTER_COL
    from neighborly_spark.search_service import SearchService

    df = _anisotropic_df(spark, n=1200, dim=16).cache()
    df.count()
    model = IVFPQ.ivfpq_train(df, 16, nlist=6, m=4, num_centroids=32, opq=True)
    enc = IVFPQ.ivfpq_encode(df, model).cache()
    enc.count()
    qrows = df.limit(5).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    qrows.count()
    qlist = [(int(r.query_id), list(r.query_embedding)) for r in qrows.collect()]

    want = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join(enc, model, qrows, 5, nprobe=3, df=df).collect()
    )
    got_list = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join(enc, model, qlist, 5, nprobe=3, df=df).collect()
    )
    assert got_list == want
    path = str(tmp_path / "opq_codes")
    enc.write.partitionBy(CLUSTER_COL).parquet(path)
    got_snap = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, model, qrows, 5, version="v1", nprobe=3, df=df
        ).collect()
    )
    assert got_snap == want
    # single-query path agrees with the batch paths per query
    qid0, vec0 = qlist[0]
    single = sorted(
        (r.id, round(r.dist, 9))
        for r in IVFPQ.ivfpq_search_rerank(df, enc, model, vec0, 5, nprobe=3).collect()
    )
    batch0 = sorted((i, round(d, 9)) for q, i, d in want if q == qid0)
    assert single == batch0

    # service integration + snapshot persistence of the rotation
    svc = SearchService(df, dim=16)
    svc.build_index("ivfpq", opq=True)
    assert svc._ivfpq_model.rotation is not None
    before = sorted(
        (r.query_id, r.id, r.dist)
        for r in svc.search_batch(qrows, k=5, method="ivfpq").collect()
    )
    svc.save(str(tmp_path / "svc_snap"))
    loaded = SearchService.load(spark, str(tmp_path / "svc_snap"))
    assert loaded._ivfpq_model.rotation is not None
    after = sorted(
        (r.query_id, r.id, r.dist)
        for r in loaded.search_batch(qrows, k=5, method="ivfpq").collect()
    )
    assert after == before
    df.unpersist()
    enc.unpersist()
    qrows.unpersist()


def test_opq_composes_with_cosine_builds(spark):
    """metric='cosine' + opq=True: normalize-then-rotate at build time,
    and the query paths apply the same order (search_batch normalizes,
    the ivfpq tier rotates) — recall vs exact cosine stays over the bar
    and every similarity is in [-1, 1]. Self-contained small synthetic
    (not the shared 64-d fixture): this is a COMPOSITION test, and the
    fixture-sized version was memory-flaky late in full-suite sessions."""
    from neighborly_spark.functions.distance import normalize
    from neighborly_spark.operators.knn import knn_join
    from neighborly_spark.search_service import SearchService

    emb = _anisotropic_df(spark, n=1200, dim=16, seed=11).cache()
    emb.count()
    svc = SearchService(emb, dim=16)
    svc.build_index("ivfpq", metric="cosine", opq=True)
    assert svc._ivfpq_model.rotation is not None
    qdf = emb.limit(8).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    qdf.count()
    got = svc.search_batch(qdf, k=K, method="ivfpq", metric="cosine",
                           ivfpq_nprobe=16).collect()
    assert got and all(-1.0001 <= r.dist <= 1.0001 for r in got)
    # exact cosine oracle: euclidean knn over the normalized table
    norm_df = emb.withColumn("embedding", normalize(F.col("embedding")))
    norm_q = qdf.withColumn("query_embedding", normalize(F.col("query_embedding")))
    exact = knn_join(norm_df, norm_q, K)
    import itertools

    exact_ids = {
        qid: {r.id for r in grp}
        for qid, grp in itertools.groupby(
            sorted(exact.collect(), key=lambda r: r.query_id),
            key=lambda r: r.query_id,
        )
    }
    per_q = {
        qid: {r.id for r in grp}
        for qid, grp in itertools.groupby(
            sorted(got, key=lambda r: r.query_id), key=lambda r: r.query_id
        )
    }
    recalls = [len(per_q.get(q, set()) & exact_ids[q]) / K for q in exact_ids]
    assert float(np.mean(recalls)) >= 0.8, recalls
    qdf.unpersist()
    emb.unpersist()


def test_snapshot_cell_loader_prunes_payload_columns(spark, emb, ivfpq_model, tmp_path):
    """Round-9 ADVICE: ivfpq_knn_join_snapshot is a public operator over
    any ivf_write layout — a snapshot that carries the embedding array (or
    other float-list payloads) must NOT pay their I/O or python-set parse
    at cell load. Only id, code, and tag-shaped (int/string list) columns
    are read; the float-list embedding never reaches the cache entry."""
    from neighborly_spark.operators.ivf import CLUSTER_COL
    from neighborly_spark.operators.worker_cache import WORKER_CACHE

    enc = IVFPQ.ivfpq_encode(emb.limit(200), ivfpq_model)
    # the "generic layout": codes + the raw embedding + an int tag column
    fat = (
        enc.join(emb.limit(200).select("id", "embedding"), "id")
        .withColumn("tags", F.array((F.col("id") % 2).cast("int")))
    )
    path = str(tmp_path / "fat_codes")
    fat.write.partitionBy(CLUSTER_COL).parquet(path)
    a_cell = enc.select(CLUSTER_COL).first()[0]
    m, kp = ivfpq_model.pq.m, ivfpq_model.pq.num_centroids

    WORKER_CACHE.clear()
    ids, idx, tags_by_col = IVFPQ._load_snapshot_cell(path, int(a_cell), "vfat", "id", m, kp)
    assert len(ids) > 0 and idx.shape == (len(ids), m)
    assert set(tags_by_col) == {"tags"}  # embedding pruned, tags kept
    tags, kind = tags_by_col["tags"]
    assert kind is int and all(isinstance(t, frozenset) for t in tags)


def test_snapshot_cell_loader_confirms_nonexistence(spark, emb, ivfpq_model, tmp_path, monkeypatch):
    """Round-9 ADVICE: an OSError whose message LOOKS like a 404 must not
    be cached as an empty cell when the partition actually exists (the
    eventually-consistent-store hazard) — the loader now confirms
    nonexistence with an explicit filesystem probe. A genuinely missing
    partition still caches as empty."""
    import pyarrow.dataset as pds

    from neighborly_spark.operators.ivf import CLUSTER_COL
    from neighborly_spark.operators.worker_cache import WORKER_CACHE

    enc = IVFPQ.ivfpq_encode(emb.limit(200), ivfpq_model)
    path = str(tmp_path / "codes_404")
    enc.write.partitionBy(CLUSTER_COL).parquet(path)
    a_cell = int(enc.select(CLUSTER_COL).first()[0])
    m, kp = ivfpq_model.pq.m, ivfpq_model.pq.num_centroids

    real_dataset = pds.dataset

    def flaky_dataset(*a, **kw):
        raise OSError("404: NoSuchKey (transient)")

    WORKER_CACHE.clear()
    monkeypatch.setattr(pds, "dataset", flaky_dataset)
    # cell EXISTS -> the probe refutes the 404 -> re-raise (Spark retries)
    with pytest.raises(OSError, match="404"):
        IVFPQ._load_snapshot_cell(path, a_cell, "v404", "id", m, kp)
    # cell genuinely missing -> probe confirms -> cached empty
    ids, idx, _ = IVFPQ._load_snapshot_cell(path, 424242, "v404", "id", m, kp)
    assert len(ids) == 0 and idx.shape == (0, m)
    monkeypatch.setattr(pds, "dataset", real_dataset)
    # the transient failure was NOT cached: the cell now loads fine
    ids2, _, _ = IVFPQ._load_snapshot_cell(path, a_cell, "v404", "id", m, kp)
    assert len(ids2) > 0


def test_flat_pq_opq_pure_adc_recall(spark):
    """OPQ for the FLAT pq method (round 10, VERDICT 6 — the ivfpq
    trainer is method-agnostic, this is the plumbed-through knob): at
    identical code bytes, pure-ADC recall on the concentrated geometry
    must jump the way the ivfpq table does (no coarse layer here, so the
    codebooks feel the full anisotropy). Also gates: the HOF oracle
    encode tier refuses rotated models loudly."""
    from neighborly_spark.operators import quantization as QZ
    from neighborly_spark.operators.knn import knn

    df = _concentrated_df(spark).cache()
    df.count()
    queries = [(int(r.id), list(r.embedding)) for r in df.limit(12).collect()]
    exact = {qid: {r.id for r in knn(df, q, 10).collect()} for qid, q in queries}

    def mean_recall(model, enc):
        rs = []
        for qid, q in queries:
            got = {r.id for r in QZ.pq_search(enc, model, q, 10).collect()}
            rs.append(len(got & exact[qid]) / 10)
        return float(np.mean(rs))

    plain = QZ.pq_train_sampled(df, 16, m=8, num_centroids=64)
    opq = QZ.pq_train_sampled(df, 16, m=8, num_centroids=64, opq=True)
    assert opq.rotation is not None and plain.rotation is None
    enc_p = QZ.pq_encode_vectorized(df, plain).cache()
    enc_o = QZ.pq_encode_vectorized(df, opq).cache()
    r_plain, r_opq = mean_recall(plain, enc_p), mean_recall(opq, enc_o)
    # measured 0.258 -> 0.792 pure-ADC (docs/RECALL.md round-10 table);
    # generous margins against sample jitter. Flat PQ's path to the
    # absolute 0.8 bar is the rerank tier (the pq_search_rerank docstring
    # doctrine) — gated below at the same operating point
    assert r_opq >= r_plain + 0.2, (r_plain, r_opq)
    assert r_opq >= 0.7, r_opq
    rr = float(np.mean([
        len(
            {r.id for r in QZ.pq_search_rerank(df, enc_o, opq, q, 10).collect()}
            & exact[qid]
        ) / 10
        for qid, q in queries
    ]))
    assert rr >= 0.9, rr  # measured 1.0 (plain reranks to 0.792 here)
    with pytest.raises(ValueError, match="pq_encode_vectorized"):
        QZ.pq_encode(df, opq)
    enc_p.unpersist()
    enc_o.unpersist()
    df.unpersist()


def test_flat_pq_opq_no_harm_rerank_and_service_roundtrip(spark, tmp_path):
    """Mixed anisotropy: flat-PQ OPQ must not cost recall (same epsilon
    as the ivfpq no-harm gate). The rerank tier scores ORIGINAL floats
    against the ORIGINAL query (orthogonality preserves distances), so
    the query's own row reranks to dist 0.0; SearchService
    build_index('pq', opq=True) + save/load round-trips the rotation."""
    from neighborly_spark.operators import quantization as QZ
    from neighborly_spark.operators.knn import knn
    from neighborly_spark.search_service import SearchService

    df = _anisotropic_df(spark).cache()
    df.count()
    queries = [(int(r.id), list(r.embedding)) for r in df.limit(12).collect()]
    exact = {qid: {r.id for r in knn(df, q, 10).collect()} for qid, q in queries}

    def mean_recall(model, enc):
        rs = []
        for qid, q in queries:
            got = {r.id for r in QZ.pq_search(enc, model, q, 10).collect()}
            rs.append(len(got & exact[qid]) / 10)
        return float(np.mean(rs))

    plain = QZ.pq_train_sampled(df, 16, m=8, num_centroids=64)
    opq = QZ.pq_train_sampled(df, 16, m=8, num_centroids=64, opq=True)
    enc_p = QZ.pq_encode_vectorized(df, plain).cache()
    enc_o = QZ.pq_encode_vectorized(df, opq).cache()
    r_plain, r_opq = mean_recall(plain, enc_p), mean_recall(opq, enc_o)
    assert r_opq >= r_plain - 0.05, (r_plain, r_opq)

    svc = SearchService(df, dim=16)
    svc.build_index("pq", opq=True)
    assert svc._pq_model.rotation is not None
    qid0, q0 = queries[0]
    want = [
        (r.id, round(r.dist, 9))
        for r in svc.search(query_vec=q0, k=5, method="pq").collect()
    ]
    assert want[0] == (qid0, 0.0)  # rerank on original floats
    path = str(tmp_path / "pq_opq_svc")
    svc.save(path)
    loaded = SearchService.load(spark, path)
    assert loaded._pq_model.rotation == svc._pq_model.rotation
    got = [
        (r.id, round(r.dist, 9))
        for r in loaded.search(query_vec=q0, k=5, method="pq").collect()
    ]
    assert got == want
    enc_p.unpersist()
    enc_o.unpersist()
    df.unpersist()


def test_ivfpq_snapshot_float_tags_stay_filterable(spark, emb, ivfpq_model, tmp_path):
    """Round-10 review: the column-pruned cell read must not drop FLOAT-
    typed tag columns (the round-9 prune excluded every float-list column
    to keep embeddings out of the read — but the tier's mask supports
    kind=float, and the hnsw snapshot tier serves float tags). The
    embedding payload is pruned BY NAME instead."""
    from neighborly_spark.operators.ivf import CLUSTER_COL

    tagged = emb.withColumn(
        "tags", F.array((F.col("id") % 2).cast("double"))
    ).cache()
    tagged.count()
    enc = IVFPQ.ivfpq_encode(tagged, ivfpq_model).join(
        tagged.select("id", "tags", "embedding"), "id"
    ).cache()
    enc.count()
    path = str(tmp_path / "codes_ftags")
    # artifact carries BOTH a float tags column AND the embedding payload
    enc.write.partitionBy(CLUSTER_COL).parquet(path)
    qrows = tagged.limit(3).select(
        F.col("id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    ).cache()
    qrows.count()
    got = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join_snapshot(
            spark, path, ivfpq_model, qrows, K, version="vft1",
            nprobe=8, df=tagged, tag_any=[1.0],
        ).collect()
    )
    want = sorted(
        (r.query_id, r.id, r.dist)
        for r in IVFPQ.ivfpq_knn_join(
            enc.drop("embedding").filter(
                F.arrays_overlap(F.col("tags"), F.lit([1.0]).cast("array<double>"))
            ),
            ivfpq_model, qrows, K, nprobe=8, df=tagged,
        ).collect()
    )
    assert got == want and got
    assert all(i % 2 == 1 for _, i, _ in got)
    tagged.unpersist()
    enc.unpersist()
    qrows.unpersist()


def test_topk_stable_matches_stable_argsort_under_ties():
    """Round-11 kernel rebuild: _topk_stable must equal the full stable
    argsort EXACTLY — including rows where duplicate distance values
    straddle the fetch boundary (the partition fallback path) and rows
    shorter than fetch."""
    import numpy as np

    from neighborly_spark.operators.ivfpq import _topk_stable

    rng = np.random.default_rng(7)
    fetch = 8
    # adversarial: few distinct values -> heavy boundary ties
    for ncols, nvals in ((40, 5), (40, 2), (6, 3), (200, 7), (200, 1000)):
        dist = rng.integers(0, nvals, size=(17, ncols)).astype(np.float64)
        want = np.argsort(dist, axis=1, kind="stable")[:, :fetch]
        got = _topk_stable(dist, fetch)
        assert np.array_equal(want, got), (ncols, nvals)
    # NaN rows fall back to the stable argsort
    dist = rng.random(size=(5, 30))
    dist[2, ::3] = np.nan
    dist[4, :] = np.nan
    want = np.argsort(dist, axis=1, kind="stable")[:, :fetch]
    got = _topk_stable(dist, fetch)
    assert np.array_equal(want, got)


def test_adc_dists_blocked_gather_bit_equal():
    """Round-11 gather-layout rebuild: _adc_dists (per-subspace transposed
    block gathers accumulating in (n, chunk) with one final contiguous
    transpose) must be BIT-equal to the reference sequential column
    gather — same addends in the same s-ascending order, any shape."""
    import numpy as np

    from neighborly_spark.operators.ivfpq import _adc_dists

    rng = np.random.default_rng(11)
    for chunk, n, m, kp in (
        (512, 2345, 8, 256),  # the bench tier's shapes
        (1, 1, 8, 16),
        (7, 500, 4, 32),
        (33, 3, 2, 4),
        (512, 3, 16, 32),  # n < fetch-sized tail cells
    ):
        ld = rng.random((chunk, m * kp))
        codes = rng.integers(0, kp, size=(n, m))
        idx = codes + (np.arange(m) * kp)[None, :]
        want = ld[:, idx[:, 0]].copy()
        for s in range(1, m):
            want += ld[:, idx[:, s]]
        got = _adc_dists(ld, idx, m)
        assert got.shape == (chunk, n)
        assert got.flags["C_CONTIGUOUS"]
        assert np.array_equal(got, want), (chunk, n, m, kp)


def test_probe_cells_distinct_equals_probe_assign_cells(spark, emb, ivfpq_model):
    """Round-11 cells-only probe pass: the pruning semi-join's build side
    (_probe_cells_distinct) must yield exactly the cell SET _probe_assign
    emits — same distance matrix + stable argsort — with and without an
    OPQ-style rotation."""
    import numpy as np

    from neighborly_spark.operators import ivfpq as IVFPQ_mod

    coarse = np.asarray(ivfpq_model.ivf.centroids, dtype=np.float64)
    qdf = emb.filter(F.col("id") < 9).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    rng = np.random.default_rng(3)
    rot, _ = np.linalg.qr(rng.standard_normal((coarse.shape[1], coarse.shape[1])))
    for rotation in (None, rot):
        want = {
            r._cell
            for r in IVFPQ_mod._probe_assign(qdf, coarse, 3, rotation=rotation)
            .select("_cell")
            .distinct()
            .collect()
        }
        got = {
            r._cell
            for r in IVFPQ_mod._probe_cells_distinct(
                qdf, coarse, 3, rotation=rotation
            ).collect()
        }
        assert got == want and got
