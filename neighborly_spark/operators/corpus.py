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
from pyspark.sql.window import Window

from neighborly_spark.functions.text import (
    chunks_duckdb_sql,
    chunks_expr,
    shingles,
    shingles_duckdb_sql,
    tokens,
    tokens_duckdb_sql,
)


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


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    n-token shingle with a benchmark/eval set. Returns contaminated docs
    only: (id, n_overlap) where n_overlap counts the distinct shared
    shingles (shingles() is already distinct per doc, so a plain count).

    Scale: the realistic asymmetry is a petabyte train side vs a tiny
    benchmark side, so by default the benchmark's distinct shingle set is
    BROADCAST — the train side never shuffles its exploded grams, only the
    final per-doc count aggregates (map-side partial first). The broadcast
    HINT overrides Spark's size threshold, so a "benchmark" that is itself
    corpus-sized (cross-corpus decontamination) would be collected to the
    driver regardless — pass ``broadcast_bench=False`` there: the join is
    left unhinted, AQE still broadcasts a small side and falls back to a
    shuffle join on (_gram) for a big one.
    """
    bench_grams = bench.select(
        F.explode(shingles(F.col(text_col), n)).alias("_gram")
    ).distinct()
    train_grams = train.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("_gram")
    )
    bg = F.broadcast(bench_grams) if broadcast_bench else bench_grams
    return (
        train_grams.join(bg, "_gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate_duckdb_sql(
    train_where: str,
    bench_where: str,
    n: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    sh = shingles_duckdb_sql(text_col, n)
    return f"""
WITH bg AS (
  SELECT DISTINCT g AS _gram FROM (SELECT unnest({sh}) AS g FROM {table} WHERE {bench_where})
),
tg AS (
  SELECT {id_col}, unnest({sh}) AS _gram FROM {table} WHERE {train_where}
)
SELECT {id_col}, count(*) AS n_overlap FROM tg JOIN bg USING (_gram) GROUP BY {id_col}
""".strip()


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 512,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for pretraining: concatenate each group's documents
    in ``id_col`` order and chop the token stream at ``budget_tokens``
    boundaries (the GPT-style pack-then-split discipline — no padding waste,
    a document crossing a boundary CONTINUES in the next sequence). Emits
    per document: token count, start offset in the group's stream, and the
    first/last bin (training sequence) it lands in.

    This formulation is exactly window-expressible — one running sum per
    group, integer division for bin ids — unlike greedy first-fit packing,
    which is an inherently sequential recurrence. Cost: ONE exchange on the
    group key + per-partition sort; bin ids are integer arithmetic (div,
    never float division — exact beyond 2^53 token offsets).

    Scale: groups are independent; a giant group degrades one partition's
    sort only. For unbounded groups, sub-shard by hash(id) first — packing
    within shards is still valid (bins never span shards).
    """
    b = int(budget_tokens)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.size(tokens(F.col(text_col))).cast("long")
    return (
        df.select(F.col(id_col), F.col(group_col), n.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
        )
        .withColumn("first_bin", F.expr(f"start_offset div {b}"))
        .withColumn("last_bin", F.expr(f"(start_offset + n_tokens - 1) div {b}"))
        .withColumn("n_bins", F.col("last_bin") - F.col("first_bin") + F.lit(1))
    )


def pack_sequences_duckdb_sql(
    budget_tokens: int = 512,
    group_col: str = "lang",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    b = int(budget_tokens)
    return f"""
WITH t AS (
  SELECT {id_col}, {group_col}, len({tokens_duckdb_sql(text_col)})::BIGINT AS n_tokens
  FROM {table}
), o AS (
  SELECT *, coalesce(sum(n_tokens) OVER (
    PARTITION BY {group_col} ORDER BY {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
  FROM t WHERE n_tokens > 0
)
SELECT {id_col}, {group_col}, n_tokens, start_offset,
       start_offset // {b} AS first_bin,
       (start_offset + n_tokens - 1) // {b} AS last_bin,
       (start_offset + n_tokens - 1) // {b} - start_offset // {b} + 1 AS n_bins
FROM o
""".strip()


def unigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """CCNet-style unigram LM quality signal: per document, the mean
    negative log-probability of its tokens under the corpus's own unigram
    distribution (higher = rarer vocabulary). Returns
    (id, n_tokens, avg_neg_logprob).

    Cross-engine float contract: ln(tf) is scaled by ``scale`` and rounded
    to an exact BIGINT per DISTINCT token frequency, so the per-document
    aggregation is an integer sum — order-independent under any shuffle.
    The only float steps are one ln+round per distinct tf value and one
    final division of exact integers, both reproducible across engines.

    Scale: token frequencies aggregate with map-side partial combine; the
    doc↔frequency join shuffles on the token key (AQE broadcasts the
    frequency side when the vocabulary is small); the per-doc sum shuffles
    on the doc key. The corpus total derives from the frequency table
    (sum of tf — a vocabulary-sized aggregate), NOT a third corpus scan,
    so the text tokenizes twice, not three times. (Measured dead end: a
    single-tokenize (doc, token) pre-aggregation trades the saved regex
    pass for an extra full-width shuffle and loses ~40% — scans pipeline,
    exchanges don't.)
    """
    s = int(scale)
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
    freqs = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_tf"))
    lp = freqs.withColumn(
        "_lp", F.round(F.log(F.col("_tf").cast("double")) * s, 0).cast("long")
    )
    total = freqs.select(
        F.round(F.log(F.sum("_tf").cast("double")) * s, 0).cast("long").alias("_ln_n")
    )
    per_doc = (
        toks.join(lp, "_tok")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("_lp").alias("_s"))
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        F.round(
            (F.col("n_tokens") * F.col("_ln_n") - F.col("_s"))
            / F.col("n_tokens")
            / F.lit(float(s)),
            6,
        ).alias("avg_neg_logprob"),
    )


def unigram_logprob_duckdb_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> str:
    s = int(scale)
    return f"""
WITH tk AS (
  SELECT {id_col}, unnest({tokens_duckdb_sql(text_col)}) AS _tok FROM {table}
), fr AS (
  SELECT _tok, CAST(round(ln(count(*)::DOUBLE) * {s}, 0) AS BIGINT) AS _lp
  FROM tk GROUP BY _tok
), tot AS (
  SELECT CAST(round(ln(count(*)::DOUBLE) * {s}, 0) AS BIGINT) AS _ln_n FROM tk
), d AS (
  SELECT {id_col}, count(*) AS n_tokens, sum(_lp) AS _s
  FROM tk JOIN fr USING (_tok) GROUP BY {id_col}
)
SELECT {id_col}, n_tokens,
       round((n_tokens * _ln_n - _s) / n_tokens / {s}.0, 6) AS avg_neg_logprob
FROM d, tot
""".strip()


def bigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Bigram LM predictability signal (the CCNet perplexity-filter idea —
    Wenzek et al., LREC 2020 — with the corpus's OWN MLE bigram model
    instead of an external KenLM): per document, the mean negative
    conditional log-probability -mean(ln P(w_i | w_{i-1})) with
    P(w2|w1) = c(w1 w2) / c(w1 ·). LOW avg_neg_logprob = predictable,
    templated transitions (boilerplate); HIGH = unusual transitions
    (noisy/garbled text). Complements unigram_logprob_score, which sees
    token RARITY but not ORDER — "the the the the" scores maximally
    predictable here and ordinary there. Returns
    (id, n_bigrams, avg_neg_logprob); docs with fewer than two tokens
    carry n_bigrams=0 and a NULL score.

    Scoring the counting corpus itself means every scored bigram was
    counted (c12 >= 1 always), so MLE needs no smoothing or backoff —
    there is no unseen mass. Apply the model only to its own corpus; a
    held-out scorer would need the smoothing this deliberately omits.

    Cross-engine float contract (same scheme as unigram_logprob_score):
    ln(c12) and ln(c1dot) are EACH scaled and rounded to exact BIGINTs
    per distinct bigram, so per-document aggregation is an integer sum —
    order-independent under any shuffle; one final exact-integer division
    rounds to 6dp.

    Scale: bigram frequencies aggregate with map-side partial combine
    (vocabulary-bounded output); the conditional denominator c(w1 ·)
    derives FROM the bigram table (one more vocabulary-sized aggregate —
    no extra corpus scan); the doc<->bigram join shuffles on the bigram
    key; the per-doc sum shuffles on the doc key. Tokenization runs once
    per consumer over a let-bound array column (Catalyst does not CSE
    across lambda bodies — the cross-engine contract's standing rule)."""
    s = int(scale)
    arr = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_arr")
    ).withColumn(
        "_bgs",
        F.zip_with(
            F.slice(F.col("_arr"), 1, F.greatest(F.size("_arr") - 1, F.lit(0))),
            F.slice(F.col("_arr"), 2, F.greatest(F.size("_arr") - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )
    bg = arr.select(F.col(id_col), F.explode(F.col("_bgs")).alias("_bg"))
    freqs = bg.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = (
        freqs.withColumn("_w1", F.substring_index(F.col("_bg"), " ", 1))
        .groupBy("_w1")
        .agg(F.sum("_c12").alias("_c1"))
    )
    lp = (
        freqs.withColumn("_w1", F.substring_index(F.col("_bg"), " ", 1))
        .join(c1, "_w1")
        .select(
            "_bg",
            (
                F.round(F.log(F.col("_c12").cast("double")) * s, 0).cast("long")
                - F.round(F.log(F.col("_c1").cast("double")) * s, 0).cast("long")
            ).alias("_lp"),
        )
    )
    per_doc = (
        bg.join(lp, "_bg")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("_lp").alias("_s"))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(
                    -F.col("_s").cast("double")
                    / F.col("n_bigrams")
                    / F.lit(float(s)),
                    6,
                ),
            ).alias("avg_neg_logprob"),
        )
    )


def bigram_logprob_duckdb_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> str:
    s = int(scale)
    return f"""
WITH base AS (
  SELECT {id_col}, {tokens_duckdb_sql(text_col)} AS _arr FROM {table}
), bg AS (
  SELECT {id_col},
         unnest(list_transform(range(1, greatest(len(_arr), 1)),
                               i -> _arr[i] || ' ' || _arr[i + 1])) AS _bg
  FROM base
), fr AS (
  SELECT _bg, count(*) AS _c12 FROM bg GROUP BY _bg
), c1 AS (
  SELECT split_part(_bg, ' ', 1) AS _w1, sum(_c12) AS _c1
  FROM fr GROUP BY 1
), lp AS (
  SELECT _bg,
         CAST(round(ln(_c12::DOUBLE) * {s}, 0) AS BIGINT)
         - CAST(round(ln(_c1::DOUBLE) * {s}, 0) AS BIGINT) AS _lp
  FROM fr JOIN c1 ON split_part(fr._bg, ' ', 1) = c1._w1
), d AS (
  SELECT {id_col}, count(*) AS n_bigrams, sum(_lp) AS _s
  FROM bg JOIN lp USING (_bg) GROUP BY {id_col}
)
SELECT b.{id_col},
       coalesce(d.n_bigrams, 0) AS n_bigrams,
       CASE WHEN d.n_bigrams > 0
            THEN round(-_s::DOUBLE / d.n_bigrams / {s}.0, 6)
       END AS avg_neg_logprob
FROM (SELECT {id_col} FROM {table}) b LEFT JOIN d USING ({id_col})
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


def source_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    chars_col: str = "n_chars",
    round_to: int = 6,
    approx_distinct: bool = False,
) -> DataFrame:
    """Corpus report card: per-source doc counts, token totals, exact-dup
    rate (distinct fingerprints), mean quality, mean length — the summary a
    curation pass is steered by. Single keyed aggregate with map-side
    partials; quality is integerized per row (6dp-scaled BIGINT) so the
    mean is an exact-integer sum under any shuffle order.

    approx_distinct=True swaps count_distinct(fingerprint) for
    approx_count_distinct (HyperLogLog++, default ~2% rsd) — the 100 TB
    tier: the exact form needs a per-source distinct (Expand + two-phase
    agg) whose state is one entry PER DISTINCT FINGERPRINT; the HLL sketch
    is constant memory per source and one pass. dup_frac then inherits the
    sketch's error; everything else stays exact. (The parity gate pins the
    exact form — sketches are engine-specific and cannot hash-match an
    oracle.)"""
    from neighborly_spark.functions import text as T

    p = df.select(
        F.col(group_col),
        F.col(chars_col),
        T.token_count(F.col(text_col)).alias("n_tok"),
        T.fingerprint(F.col(text_col)).alias("fp"),
        F.round(T.quality_score(F.col(text_col)) * 1_000_000, 0).cast("long").alias("q_int"),
    )
    n = F.count(F.lit(1))
    nd = (
        F.approx_count_distinct(F.col("fp"))
        if approx_distinct
        else F.count_distinct(F.col("fp"))
    )
    return p.groupBy(group_col).agg(
        n.alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        nd.alias("n_distinct"),
        F.round(F.lit(1.0) - nd / n, round_to).alias("dup_frac"),
        F.round((F.sum("q_int") / n) / F.lit(1_000_000.0), round_to).alias("mean_quality"),
        F.round(F.sum(chars_col) / n, 1).alias("mean_chars"),
    )


def curation_pipeline(
    docs: DataFrame,
    bench: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    splits: tuple = (0.8, 0.1, 0.1),
    decontaminate_n: int = 8,
    gopher_rules: bool = False,
    near_dup_keep: str = "min_id",
) -> DataFrame:
    """The end-to-end training-data curation pass, composed from this
    engine's operators in the order production pipelines run them:

    1. quality gate  (functions.text.quality_score >= min_quality;
       ``gopher_rules=True`` additionally requires the Gopher A1.1
       keep verdict — functions.text.gopher_quality_flags)
    2. exact dedup   (min-id fingerprint survivor)
    3. near-dup dedup (MinHash-banded Jaccard >= jaccard_threshold;
       ``near_dup_keep='min_id'`` keeps the min-id cluster member,
       ``'max_quality'`` keeps the highest-quality one — the stage-1
       score is reused, ties to min id)
    4. decontamination (drop docs sharing any n-gram with `bench`)
    5. deterministic split assignment (content-stable train/val/test)

    Returns the surviving docs with (quality, split) attached. Everything
    is DataFrame-in/DataFrame-out and lazily composed — ONE job when the
    caller writes the result. Each stage is individually oracle-checked by
    its own gate query; this composition is the integration artifact.
    Line-level boilerplate removal (dedup.line_dedup) and duplicated-span
    removal (dedup.exact_substr_dedup) REWRITE text rather than filter
    rows, so they run as explicit pre-passes, not pipeline stages.

    Scale shape: the quality gate is a scan-stage filter (prunes before
    any shuffle); both dedups shuffle slim (fingerprint/id) projections;
    decontamination broadcasts the benchmark shingle set; the split is a
    pure projection.
    """
    from neighborly_spark.functions import text as T
    from neighborly_spark.functions.splits import deterministic_split
    from neighborly_spark.operators import dedup as DD

    scored = docs.withColumn("quality", F.round(T.quality_score(F.col(text_col)), 6)).filter(
        F.col("quality") >= min_quality
    )
    if gopher_rules:
        scored = scored.filter(T.gopher_quality_flags(F.col(text_col))["keep"])
    survivors = DD.exact_dedup(scored, id_col=id_col, text_col=text_col)
    pairs = DD.minhash_lsh_pairs(
        survivors.select(id_col, text_col), threshold=jaccard_threshold
    )
    if near_dup_keep == "max_quality":
        near_survivors = DD.dedup_survivors_from_pairs(
            survivors, pairs, id_col=id_col, keep="max_score", score_col="quality"
        )
    elif near_dup_keep == "min_id":
        near_survivors = DD.dedup_survivors_from_pairs(survivors, pairs, id_col=id_col)
    else:
        raise ValueError(
            f"unknown near_dup_keep {near_dup_keep!r} (expected 'min_id' or 'max_quality')"
        )
    if bench is not None:
        contaminated = decontaminate(
            near_survivors, bench, id_col=id_col, text_col=text_col, n=decontaminate_n
        ).select(id_col)
        near_survivors = near_survivors.join(contaminated, id_col, "left_anti")
    return deterministic_split(
        near_survivors, id_col, list(splits), ["train", "val", "test"]
    )


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
