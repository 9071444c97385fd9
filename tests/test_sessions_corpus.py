"""Hand-computed cases for sessionization, repetition signals, and
decontamination (the DuckDB-parity checks live in test_parity.py via the
registry; these pin the semantics on tiny inputs)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neighborly_spark.functions.text import repetition_stats_expr
from neighborly_spark.operators.corpus import decontaminate
from neighborly_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def _events(spark, offsets_sec):
    rows = [(1, T0 + dt.timedelta(seconds=s), i, 1.0) for i, s in enumerate(offsets_sec)]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, value double")


def test_session_boundary_semantics(spark):
    # diff == gap CONTINUES the session (native session_window merges
    # adjacent windows); diff > gap breaks — both paths must agree.
    df = _events(spark, [0, 100, 200.000001])
    assert session_stats(df, gap_sec=100, value_col=None).count() == 2
    seqs = [r.session_seq for r in sessionize(df, gap_sec=100).orderBy("event_id").collect()]
    assert seqs == [1, 1, 2]


def test_session_stats_values(spark):
    df = _events(spark, [0, 50, 5000, 5020, 5040, 99999])
    out = {r.start_us: r for r in session_stats(df, gap_sec=100).collect()}
    assert len(out) == 3
    s1 = out[int(T0.timestamp() * 1e6)]
    assert (s1.n_events, s1.duration_sec, s1.total_value) == (2, 50, 2.0)
    s2 = out[int(T0.timestamp() * 1e6) + 5000_000000]
    assert (s2.n_events, s2.duration_sec, s2.total_value) == (3, 40, 3.0)
    # duration uses event extent, not the gap-padded window end
    df2 = _events(spark, [0, 90, 180])
    (s3,) = session_stats(df2, gap_sec=100).collect()
    assert (s3.n_events, s3.duration_sec) == (3, 180)


def test_sessionize_multi_user_and_ties(spark):
    rows = [
        (1, T0, 0, 1.0),
        (1, T0, 1, 1.0),  # equal ts -> same session, deterministic via event_id tiebreak
        (2, T0 + dt.timedelta(seconds=500), 2, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, value double")
    got = {(r.user_id, r.event_id): r.session_seq for r in sessionize(df, gap_sec=100).collect()}
    assert got == {(1, 0): 1, (1, 1): 1, (2, 2): 1}


def test_repetition_stats_hand_cases(spark):
    cases = [
        (0, "a a a b", (3, 2, 2)),        # bigrams: "a a" x2, "a b"
        (1, "x", (0, 0, 0)),              # shorter than n
        (2, "", (0, 0, 0)),
        (3, "a b a b a", (4, 2, 2)),      # "a b" x2, "b a" x2
        (4, "w w w w w", (4, 1, 4)),      # pure repetition: all mass in one gram
        (5, "p q r s", (3, 3, 1)),        # no repetition
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases], "doc_id int, text string")
    out = {
        r.doc_id: (r.total_ngrams, r.distinct_ngrams, r.top_ngram_count)
        for r in df.select("doc_id", repetition_stats_expr(F.col("text"), 2).alias("r"))
        .select("doc_id", "r.*")
        .collect()
    }
    for i, _, want in cases:
        assert out[i] == want, (i, out[i], want)


def test_repetition_trigram(spark):
    df = spark.createDataFrame([(0, "a b c a b c a b c")], "doc_id int, text string")
    (r,) = df.select(repetition_stats_expr(F.col("text"), 3).alias("r")).select("r.*").collect()
    # trigrams: abc x3, bca x2, cab x2 -> total 7, distinct 3, top 3
    assert (r.total_ngrams, r.distinct_ngrams, r.top_ngram_count) == (7, 3, 3)


def test_decontaminate_hand_case(spark):
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),     # shares "the quick brown fox" + "quick brown fox jumps"
            (1, "a completely different doc"),    # clean
            (2, "quick brown fox jumps high"),    # shares "quick brown fox jumps"
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over")], "doc_id int, text string"
    )
    got = {r.doc_id: r.n_overlap for r in decontaminate(train, bench, n=4).collect()}
    assert got == {0: 2, 2: 1}


def test_decontaminate_broadcasts_bench(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = decontaminate(docs, docs.limit(5), n=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decontaminate_unhinted_when_bench_is_big(spark):
    """broadcast_bench=False drops the broadcast HINT (which would force a
    driver collect of a corpus-sized 'benchmark' regardless of Spark's
    size threshold) and leaves the join strategy to the optimizer/AQE —
    values identical."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.limit(5)
    hinted = decontaminate(docs, bench, n=4)
    unhinted = decontaminate(docs, bench, n=4, broadcast_bench=False)
    analyzed = unhinted._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()  # no ResolvedHint(broadcast)
    got_h = sorted((r.doc_id, r.n_overlap) for r in hinted.collect())
    got_u = sorted((r.doc_id, r.n_overlap) for r in unhinted.collect())
    assert got_h == got_u and got_h


def test_unigram_logprob_hand_case(spark):
    import math
    import pytest
    from neighborly_spark.operators.corpus import unigram_logprob_score

    # corpus tokens: a:2 b:2 c:1, N=5
    df = spark.createDataFrame([(0, "a a b"), (1, "b c")], "doc_id int, text string")
    got = {r.doc_id: (r.n_tokens, r.avg_neg_logprob) for r in unigram_logprob_score(df).collect()}
    assert got[0][0] == 3 and got[1][0] == 2
    assert got[0][1] == pytest.approx(math.log(5 / 2), abs=2e-6)
    assert got[1][1] == pytest.approx((math.log(5 / 2) + math.log(5)) / 2, abs=2e-6)


def test_centroid_outliers_hand_case(spark):
    from neighborly_spark.operators.dedup import centroid_outliers

    emb = spark.createDataFrame(
        [(0, 0, [0.0, 0.0]), (1, 0, [1.0, 0.0]), (2, 0, [10.0, 0.0]),
         (3, 1, [5.0, 5.0])],
        "vec_id int, label int, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [5.0, 5.0])], "label int, centroid array<double>"
    )
    out = {r.vec_id: (r.dist, r.cutoff, r.is_outlier)
           for r in centroid_outliers(emb, cents, q=0.5).collect()}
    # label 0 dists [1, 0, 9] -> p50 (discrete, lower-value rule) = 1
    assert out[0] == (1.0, 1.0, False)
    assert out[1] == (0.0, 1.0, False)
    assert out[2] == (9.0, 1.0, True)
    assert out[3] == (0.0, 0.0, False)


def test_funnel_hand_case(spark):
    from neighborly_spark.operators.sessions import funnel_steps

    rows = [
        # user 1 completes s->c->p (greedy: s@0, first c after = 20, p after = 30)
        (1, T0, 0, "signup"), (1, _sec(10), 1, "purchase"), (1, _sec(20), 2, "click"),
        (1, _sec(30), 3, "purchase"),
        # user 2 clicks before signup -> only reaches step 1 via signup@50, no click after
        (2, _sec(40), 4, "click"), (2, _sec(50), 5, "signup"),
        # user 3 never signs up
        (3, _sec(5), 6, "click"), (3, _sec(6), 7, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, event_type string")
    got = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.steps_completed, r.converted)
        for r in funnel_steps(df, ["signup", "click", "purchase"]).collect()
    }
    us = lambda s: int(T0.timestamp() * 1e6) + s * 1_000_000  # noqa: E731
    assert got[1] == (us(0), us(20), us(30), 3, True)
    assert got[2] == (us(50), None, None, 1, False)
    assert got[3] == (None, None, None, 0, False)


def test_source_stats_approx_variant(spark):
    """The HLL tier of source_stats: approx distinct within the sketch's
    documented error of the exact count; every non-sketch column identical."""
    from neighborly_spark.operators.corpus import source_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r.source: r for r in source_stats(docs).collect()}
    approx = {r.source: r for r in source_stats(docs, approx_distinct=True).collect()}
    assert exact.keys() == approx.keys()
    for src, e in exact.items():
        a = approx[src]
        assert (e.n_docs, e.total_tokens, e.mean_quality, e.mean_chars) == (
            a.n_docs, a.total_tokens, a.mean_quality, a.mean_chars
        )
        assert abs(a.n_distinct - e.n_distinct) <= max(2, 0.1 * e.n_distinct)


def test_curation_pipeline_end_to_end(spark):
    """Integration: quality gate -> exact dedup -> near-dup dedup ->
    decontamination -> split, composed lazily; invariants checked against
    the individual (oracle-checked) stages."""
    from pyspark.sql import functions as F

    from neighborly_spark.functions.text import quality_score
    from neighborly_spark.operators.corpus import curation_pipeline
    from neighborly_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # synthesize exact dups + a benchmark slice so every stage fires
    dups = docs.filter(F.col("doc_id") < 30).withColumn("doc_id", F.col("doc_id") + 100000)
    full = docs.unionByName(dups)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    out = curation_pipeline(full, bench=bench, min_quality=0.5, jaccard_threshold=0.8)
    rows = out.collect()
    assert rows

    # 1) every survivor passes the quality gate
    assert all(r.quality >= 0.5 for r in rows)
    # 2) no exact duplicates survive (fingerprint-unique)
    q = full.withColumn("quality", F.round(quality_score(F.col("text")), 6)).filter(
        F.col("quality") >= 0.5
    )
    exact_ids = {r.doc_id for r in exact_dedup(q).select("doc_id").collect()}
    out_ids = {r.doc_id for r in rows}
    assert out_ids <= exact_ids
    # 3) nothing from the benchmark's own doc ids survives decontamination
    #    (a bench doc's full text shares all its 8-grams with itself)
    bench_ids = {r.doc_id for r in bench.collect()}
    assert not (out_ids & bench_ids)
    # 4) split labels complete and content-stable across recomputation
    assert {r.split for r in rows} <= {"train", "val", "test"}
    again = {r.doc_id: r.split for r in curation_pipeline(
        full, bench=bench, min_quality=0.5, jaccard_threshold=0.8
    ).collect()}
    assert all(again[r.doc_id] == r.split for r in rows)


def test_curation_pipeline_gopher_rules(spark):
    """gopher_rules=True additionally applies the Gopher A1.1 keep verdict
    as a scan-stage filter — survivors are a subset of the default run and
    every survivor passes the flags."""
    from pyspark.sql import functions as F

    from neighborly_spark.functions.text import gopher_quality_flags
    from neighborly_spark.operators.corpus import curation_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    base_ids = {r.doc_id for r in curation_pipeline(docs, min_quality=0.0).collect()}
    gop = curation_pipeline(docs, min_quality=0.0, gopher_rules=True)
    gop_ids = {r.doc_id for r in gop.collect()}
    assert gop_ids <= base_ids
    kept = {
        r.doc_id
        for r in docs.filter(gopher_quality_flags(F.col("text"))["keep"]).collect()
    }
    assert gop_ids <= kept


def test_text_pipeline_full_chain(spark):
    """The complete text-curation story a FineWeb/Dolma-style user runs:
    line-level boilerplate removal -> ExactSubstr span removal (both
    REWRITE text) -> quality gate (incl. Gopher rules) -> exact +
    near-dup dedup -> split. Asserts each rewrite stage actually fired
    and the final survivors pass every gate."""
    from pyspark.sql import functions as F

    from neighborly_spark.functions.text import gopher_quality_flags
    from neighborly_spark.operators.corpus import curation_pipeline
    from neighborly_spark.operators.dedup import exact_substr_dedup, line_dedup

    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("doc_id") < 150
    )
    # synthesize multi-line docs with shared boilerplate + a duplicated run
    run = " ".join(f"shared{i}" for i in range(12))
    docs = base.select(
        "doc_id",
        F.concat(
            F.lit("COOKIE BANNER\n"), F.col("text"), F.lit(f"\n{run}\nall rights reserved")
        ).alias("text"),
    )

    step1 = line_dedup(docs, min_docs=2)
    assert step1.agg(F.sum("n_removed")).collect()[0][0] > 0  # boilerplate lines went

    step2 = exact_substr_dedup(
        step1.select("doc_id", "text"), min_tokens=12, engine="python"
    )
    assert step2.agg(F.sum("n_removed_tokens")).collect()[0][0] > 0  # the run went

    out = curation_pipeline(
        step2.select("doc_id", "text"), min_quality=0.3, gopher_rules=False
    )
    rows = out.collect()
    assert rows
    assert all(r.quality >= 0.3 for r in rows)
    # the duplicated run is gone from every survivor
    assert all(run not in r.text for r in rows)
    # gopher flags still computable on rewritten text (no nulls/crashes)
    flags = step2.select(gopher_quality_flags(F.col("text")).alias("g")).collect()
    assert all(r.g is not None for r in flags)


def test_curation_pipeline_max_quality_survivor(spark):
    """near_dup_keep='max_quality': the near-dup stage keeps each cluster's
    highest-quality member instead of the min-id one; survivor count is
    policy-independent."""
    from pyspark.sql import functions as F

    from neighborly_spark.operators.corpus import curation_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    a = curation_pipeline(docs, min_quality=0.0, jaccard_threshold=0.3)
    b = curation_pipeline(
        docs, min_quality=0.0, jaccard_threshold=0.3, near_dup_keep="max_quality"
    )
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb)
    qa = {r.doc_id: r.quality for r in ra}
    qb = {r.doc_id: r.quality for r in rb}
    # the quality policy never keeps a LOWER total quality than min-id
    assert sum(qb.values()) >= sum(qa.values())


def test_bigram_logprob_hand_case_and_duckdb_twin(spark):
    """bigram_logprob_score (round 10): MLE bigram predictability. Hand
    case checks the conditionals; the DuckDB twin must be value-identical
    on edge shapes (single-token docs -> n_bigrams 0 + NULL score, heavy
    repetition, multi-space) — the property a future gate rotation rests
    on."""
    import math

    import duckdb
    import pytest

    from neighborly_spark.operators.corpus import (
        bigram_logprob_duckdb_sql,
        bigram_logprob_score,
    )

    # corpus bigrams: "a a":1, "a b":3, "b a":1  => c(a .)=4, c(b .)=1
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a b a b")], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in bigram_logprob_score(df).collect()
    }
    # doc 0: P(a|a)=1/4, P(b|a)=3/4 -> mean(-ln) = (ln4 + ln(4/3))/2
    assert got[0][0] == 2
    assert got[0][1] == pytest.approx((math.log(4) + math.log(4 / 3)) / 2, abs=2e-6)
    # doc 1: P(b|a)=3/4 twice, P(a|b)=1/1 -> (2*ln(4/3) + 0)/3
    assert got[1][0] == 3
    assert got[1][1] == pytest.approx(2 * math.log(4 / 3) / 3, abs=2e-6)

    rows = [
        (0, "the quick brown fox the quick dog"),
        (1, "x"),                      # single token: 0 bigrams, NULL score
        (2, ""),                       # empty text
        (3, "  spark   JOIN  merge  "),
        (4, "a a a a a a"),            # maximally predictable
        (5, "the quick brown fox the quick dog"),  # exact dup of 0
    ]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    spark_rows = sorted(
        (r.doc_id, r.n_bigrams, r.avg_neg_logprob)
        for r in bigram_logprob_score(sdf).collect()
    )
    con = duckdb.connect()
    con.register("docs_in", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_in")
    duck_rows = sorted(
        (int(a), int(b), c)
        for a, b, c in con.sql(bigram_logprob_duckdb_sql()).fetchall()
    )
    assert spark_rows == duck_rows
