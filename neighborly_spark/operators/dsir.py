"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023; public method). Score every raw-corpus document by how much more
likely its hashed n-gram counts are under a TARGET corpus's n-gram
distribution than under the raw corpus's own, then resample by those
importance weights — the standard "make 100 TB of web text look like the
target domain" selection step of LLM data pipelines.

Extension beyond the reference (north star operator set — the reference
has no corpus-selection surface at all); sibling of the quality /
decontamination / mixture operators in operators/corpus.py.

Math (paper §3, restated over buckets):

    features      c_b(x) = count of doc x's n-grams hashing to bucket b
    bag-of-grams  log w(x) = sum_b c_b(x) * (log p_b - log q_b)
    smoothing     p_b = (tgt_b + 1) / (N_tgt + B)   (add-one over B buckets)

Because c_b(x) just counts the doc's own n-grams, the per-doc sum never
needs a B-wide vector: it is SUM over the doc's n-gram occurrences of
(log p - log q) at that gram's bucket, minus nothing — i.e. one
explode -> broadcast-join(bucket scores) -> per-doc sum.

Cross-engine float contract (see parity.py module docstring): every log
is integerized per DISTINCT bucket count — round(ln(c+1) * scale) as
BIGINT — so the per-document aggregation is an exact integer sum, order-
independent under any shuffle, and bit-identical in DuckDB
(dsir_logweights_duckdb_sql). The normalizer ln(N+B) terms are folded
into one integer constant applied per n-gram occurrence.

Scale shape (100 TB):
- Bucket histograms aggregate with map-side partial combine down to at
  most ``buckets`` rows per side — the exploded grams of the RAW corpus
  shuffle only as (bucket, partial-count) rows.
- The raw corpus tokenizes twice (q-histogram pass, then the scoring
  pass) — deliberate, same contract as corpus.unigram_logprob: scans
  pipeline, a materialized gram table would not. Profiled at sf0.1: the
  md5 bucket hash adds nothing measurable over the tokenize+explode
  itself (histogram pass 0.81 s md5 vs 0.87 s xxhash64 on ~540k grams),
  so there is no Spark-only fast-hash tier — portable md5 everywhere.
- The per-bucket score table is ``buckets`` rows (default 65536, ~1 MB)
  and is BROADCAST; the raw corpus then never shuffles its grams for
  scoring — only the per-doc (id, partial-sum) aggregate moves.
- Sampling is content-stable Gumbel top-k: rank key = scaled-int
  log-weight + scaled-int Gumbel(hash32(id)) — deterministic across
  reruns, engines, and layout (no RNG state), exactly like
  functions/splits.py's hash-rank samplers. Top-k is a
  TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neighborly_spark.functions.text import (
    hash32,
    hash32_duckdb_sql,
    tokens,
    tokens_duckdb_sql,
)

#: Paper default is 10k buckets for unigram+bigram features; 65536 keeps
#: collisions rarer at the same broadcast cost (8 B/bucket of scores).
DEFAULT_BUCKETS = 65536
TWO32 = 4294967296.0


def ngram_multiset(text: Column, n_max: int = 2) -> Column:
    """All n-gram occurrences (1..n_max words, space-joined) of the text —
    a MULTISET (duplicates kept: DSIR features are counts, unlike
    shingles(), which is the distinct set). The token array is let-bound
    via the one-element-transform trick (Catalyst does not CSE across
    lambda bodies — see functions/text.py shingles()).

    Zero-length tokens are filtered (round-9 ADVICE): whitespace-only
    text tokenizes to [""], and without the filter its empty-string
    unigram would be a real (hashed, scored) feature — the featureless
    path must cover empty AND whitespace-only docs. The DuckDB twin
    filters identically."""

    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")

    def body(toks: Column) -> Column:
        n = F.size(toks)

        # one-arg lambda via factory: a `lambda i, k=k:` default arg would
        # make it 2-ary and PySpark's HOF arity inspection would pass the
        # POSITION as k (see operators/sessions.py first_match note)
        def gram_of(k: int):
            return lambda i: F.concat_ws(" ", F.slice(toks, i, k))

        parts = []
        for k in range(1, n_max + 1):
            raw = F.transform(F.sequence(F.lit(1), n - (k - 1)), gram_of(k))
            # sequence(1, m) is DESCENDING for m < 1, not empty — guard
            parts.append(
                F.when(n < k, F.array().cast("array<string>")).otherwise(raw)
            )
        return F.concat(*parts)

    # the empty-token filter runs BEFORE the let-bind so the bound element
    # is the filtered array (a filter inside body would re-run per lambda
    # reference — the no-CSE-across-lambdas rule)
    filtered = F.filter(tokens(text), lambda t: F.length(t) > 0)
    return F.element_at(F.transform(F.array(filtered), body), 1)


def ngram_multiset_duckdb_sql(t: str, n_max: int = 2) -> str:
    toks = f"list_filter({tokens_duckdb_sql(t)}, _t -> len(_t) > 0)"
    parts = [
        f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' '))"
        for k in range(1, n_max + 1)
    ]
    return " || ".join(f"({p})" for p in parts)


def _bucket(gram: Column, buckets: int) -> Column:
    # hash32 is a nonnegative uint32-in-BIGINT, so pmod == % in DuckDB
    return F.pmod(hash32(gram), F.lit(int(buckets)))


def _int_ln(c: Column, scale: int) -> Column:
    """round(ln(c) * scale) as BIGINT — the repo's portable-log contract."""
    return F.round(F.log(c.cast("double")) * scale, 0).cast("long")


def _bucket_counts(
    df: DataFrame, text_col: str, buckets: int, n_max: int
) -> DataFrame:
    """(bucket, n) histogram of a corpus's hashed n-grams. Map-side
    partial combine bounds the shuffle at ``buckets`` rows/partition."""
    return (
        df.select(F.explode(ngram_multiset(F.col(text_col), n_max)).alias("_g"))
        .select(_bucket(F.col("_g"), buckets).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


class DSIRModel:
    """Fitted DSIR distributions: the per-bucket integer score table (a
    <= ``buckets``-row DataFrame), the integer normalizer constant, and
    the featurization params. Fit ONCE (two corpus histogram passes),
    score ANY table or stream against it — the p/q estimates never need
    the scoring data (paper §3.1 fits both on samples)."""

    def __init__(self, score: DataFrame, norm_int: int, buckets: int, n_max: int, scale: int):
        self.score = score  # (_b, _score_int)
        self.norm_int = int(norm_int)
        self.buckets = int(buckets)
        self.n_max = int(n_max)
        self.scale = int(scale)

    def save(self, path: str) -> None:
        """Durable form: score table as parquet + params as JSON — a
        nightly-fitted model scores tomorrow's stream without refitting."""
        import json

        self.score.write.mode("overwrite").parquet(f"{path}/score")
        with open(f"{path}/model.json", "w") as f:
            json.dump(
                {"norm_int": self.norm_int, "buckets": self.buckets,
                 "n_max": self.n_max, "scale": self.scale}, f,
            )

    @classmethod
    def load(cls, spark, path: str) -> "DSIRModel":
        import json

        with open(f"{path}/model.json") as f:
            p = json.load(f)
        return cls(spark.read.parquet(f"{path}/score"), p["norm_int"],
                   p["buckets"], p["n_max"], p["scale"])


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    n_max: int = 2,
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DSIRModel:
    """Fit the two hashed-n-gram distributions -> DSIRModel. ``raw`` is
    the q-estimate corpus (a sample suffices, paper §3.1); ``target`` the
    p-estimate. One histogram pass over each; the normalizer constant is
    ONE collected integer (two 1-row aggregates)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    s = int(scale)
    # localCheckpoint the two histograms (round 11): each is consumed by
    # TWO jobs — the score-table join and the normalizer aggregate — and
    # without materialization each job re-runs the full corpus tokenize +
    # explode + aggregate that produced it (measured: the norm .first()
    # alone re-tokenized both corpora). The checkpointed frames are
    # BOUNDED at <= ``buckets`` rows (~1 MB at the default 65536) — this
    # is model-sized state, not the corpus-sized gram table the module
    # docstring rules out materializing.
    tgt = _bucket_counts(target, text_col, buckets, n_max).localCheckpoint()
    q = _bucket_counts(raw, text_col, buckets, n_max).localCheckpoint()
    # add-one smoothing covers buckets absent from either histogram, so
    # the score table is the OUTER join of two <=B-row frames (never a
    # dense B-row sequence — only buckets some gram actually hits can be
    # looked up by a doc).
    score = (
        tgt.withColumnRenamed("_n", "_np")
        .join(q.withColumnRenamed("_n", "_nq"), "_b", "outer")
        .select(
            "_b",
            (
                _int_ln(F.coalesce(F.col("_np"), F.lit(0)) + 1, s)
                - _int_ln(F.coalesce(F.col("_nq"), F.lit(0)) + 1, s)
            ).alias("_score_int"),
        )
    )
    # normalizer constant per n-gram occurrence: ln(N_tgt + B) - ln(N_raw + B)
    norm_int = (
        tgt.select(F.coalesce(F.sum("_n"), F.lit(0)).alias("_tn"))
        .crossJoin(q.select(F.coalesce(F.sum("_n"), F.lit(0)).alias("_qn")))
        .select(
            (
                _int_ln(F.col("_tn") + buckets, s) - _int_ln(F.col("_qn") + buckets, s)
            ).alias("_norm_int")
        )
        .first()["_norm_int"]
    )
    return DSIRModel(score, norm_int, buckets, n_max, s)


def dsir_score(
    docs: DataFrame,
    model: DSIRModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ANY doc table against a fitted DSIRModel — including docs the
    fit never saw (the incremental/streaming shape: fit nightly, score
    each arriving batch; compose with streaming via foreachBatch or
    df.transform). Returns (id, n_grams, log_weight) with the same
    contract as dsir_logweights."""
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_multiset(F.col(text_col), model.n_max)).alias("_g")
    ).select(id_col, _bucket(F.col("_g"), model.buckets).alias("_b"))
    # an unseen bucket (no gram of either fit corpus hashed there) still
    # carries the smoothing score ln(0+1) - ln(0+1) = 0, so the left join
    # + coalesce is exact, not an approximation
    per_doc = (
        doc_grams.join(F.broadcast(model.score), "_b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_score_int"), F.lit(0))).alias("_s"),
        )
    )
    scored = per_doc.select(
        id_col,
        "n_grams",
        F.round(
            (F.col("_s") - F.col("n_grams") * F.lit(model.norm_int))
            / F.lit(float(model.scale)),
            6,
        ).alias("log_weight"),
    )
    # featureless docs: keep them, weight 0 (join-lost by the explode).
    # Detected DIRECTLY — a doc has zero n-grams iff its nonempty-token
    # array is empty — instead of the previous anti-join against
    # ``scored``, whose build side re-ran the whole corpus-sized
    # tokenize + explode + per-doc aggregate a second time (round 11:
    # the plan showed the full gram subtree duplicated under the
    # anti-join). One narrow filter pass, no join, no shuffle.
    no_grams = F.col(text_col).isNull() | (
        F.size(F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)) == 0
    )
    return scored.unionByName(
        docs.filter(no_grams).select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(0.0).alias("log_weight"),
        )
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    n_max: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document DSIR log importance weight of every ``raw`` doc
    toward ``target``'s hashed-n-gram distribution:
    (id, n_grams, log_weight), log_weight rounded to 6dp. Docs with zero
    n-grams (empty/whitespace text) get log_weight 0.0 (the paper's
    featureless docs carry no evidence either way).

    One-shot convenience over dsir_fit + dsir_score (both histograms are
    estimated from the inputs themselves); to score OTHER data — new
    batches, a stream, a bigger corpus than the q-sample — fit once and
    call dsir_score (the round-8 incremental shape)."""
    return dsir_score(
        docs=raw,
        model=dsir_fit(raw, target, buckets=buckets, n_max=n_max,
                       text_col=text_col, scale=scale),
        id_col=id_col, text_col=text_col,
    )


def dsir_logweights_duckdb_sql(
    raw_where: str,
    target_where: str,
    buckets: int = DEFAULT_BUCKETS,
    n_max: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> str:
    s = int(scale)
    grams = ngram_multiset_duckdb_sql(text_col, n_max)
    bucket = f"({hash32_duckdb_sql('_g')} % {buckets})"
    return f"""
WITH tg AS (
  SELECT {bucket} AS _b, count(*) AS _np
  FROM (SELECT unnest({grams}) AS _g FROM {table} WHERE {target_where}) GROUP BY 1
), qg AS (
  SELECT {bucket} AS _b, count(*) AS _nq
  FROM (SELECT unnest({grams}) AS _g FROM {table} WHERE {raw_where}) GROUP BY 1
), score AS (
  SELECT coalesce(tg._b, qg._b) AS _b,
         CAST(round(ln(coalesce(_np, 0) + 1) * {s}, 0) AS BIGINT)
       - CAST(round(ln(coalesce(_nq, 0) + 1) * {s}, 0) AS BIGINT) AS _score_int
  FROM tg FULL OUTER JOIN qg ON tg._b = qg._b
), norm AS (
  SELECT CAST(round(ln((SELECT coalesce(sum(_np), 0) FROM tg) + {buckets}) * {s}, 0) AS BIGINT)
       - CAST(round(ln((SELECT coalesce(sum(_nq), 0) FROM qg) + {buckets}) * {s}, 0) AS BIGINT) AS _norm_int
), dg AS (
  SELECT {id_col}, {bucket} AS _b
  FROM (SELECT {id_col}, unnest({grams}) AS _g FROM {table} WHERE {raw_where})
), pd AS (
  SELECT {id_col}, count(*) AS n_grams, sum(_score_int) AS _s
  FROM dg JOIN score USING (_b) GROUP BY {id_col}
)
SELECT {id_col}, n_grams, round((_s - n_grams * _norm_int) / {s}.0, 6) AS log_weight
FROM pd, norm
UNION ALL
SELECT {id_col}, 0 AS n_grams, 0.0 AS log_weight
FROM {table} WHERE {raw_where} AND {id_col} NOT IN (SELECT {id_col} FROM pd)
""".strip()


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    buckets: int = DEFAULT_BUCKETS,
    n_max: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Select ``k`` raw docs by Gumbel-top-k importance resampling (the
    paper's sampling-without-replacement step): rank key =
    log_weight + Gumbel noise, both as scaled BIGINTs, noise derived
    content-stably from hash32(id) — so the selected set is deterministic
    across reruns, engines, and layouts (no RNG state), while still being
    a faithful w(x)-proportional sample. Returns the selected rows with
    (log_weight, gumbel_key) attached; top-k plans as
    TakeOrderedAndProject, never a global sort."""
    s = int(scale)
    lw = dsir_logweights(
        raw, target, buckets=buckets, n_max=n_max, id_col=id_col,
        text_col=text_col, scale=s,
    )
    # u in (0,1) strictly: (h + 0.5) / 2^32 — avoids ln(0) at both ends
    u = (hash32(F.concat(F.col(id_col).cast("string"), F.lit(":gumbel"))) + 0.5) / F.lit(TWO32)
    key = (
        F.round(F.col("log_weight") * s, 0).cast("long")
        + F.round(-F.log(-F.log(u)) * s, 0).cast("long")
    )
    ranked = lw.withColumn("gumbel_key", key)
    top = ranked.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc()).limit(int(k))
    return raw.join(
        top.select(id_col, "log_weight", "gumbel_key"), id_col
    )


def dsir_sample_duckdb_sql(
    raw_where: str,
    target_where: str,
    k: int,
    buckets: int = DEFAULT_BUCKETS,
    n_max: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of dsir_sample's SELECTION (returns (id, log_weight,
    gumbel_key) of the k selected docs): same integerized rank key —
    round(log_weight * s) + round(-ln(-ln((hash32(id||':gumbel') + 0.5)
    / 2^32)) * s) — so the selected SET is engine-identical, proving the
    content-stable claim rather than asserting it."""
    s = int(scale)
    lw = dsir_logweights_duckdb_sql(
        raw_where, target_where, buckets=buckets, n_max=n_max,
        table=table, id_col=id_col, text_col=text_col, scale=s,
    )
    key_expr = f"CAST({id_col} AS VARCHAR) || ':gumbel'"
    u = f"(({hash32_duckdb_sql(key_expr)} + 0.5) / {TWO32:.1f})"
    return f"""
WITH lw AS ({lw})
SELECT {id_col}, log_weight,
       CAST(round(log_weight * {s}, 0) AS BIGINT)
     + CAST(round(-ln(-ln({u})) * {s}, 0) AS BIGINT) AS gumbel_key
FROM lw
ORDER BY gumbel_key DESC, {id_col} ASC
LIMIT {int(k)}
""".strip()
