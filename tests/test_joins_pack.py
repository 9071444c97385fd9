"""Hand-computed cases for the temporal joins (as-of, interval), sequence
packing, and PII redaction (DuckDB parity — incl. an independent native
ASOF JOIN oracle — lives in test_parity.py via the registry)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neighborly_spark.functions.text import pii_counts, redact_pii
from neighborly_spark.operators.corpus import pack_sequences
from neighborly_spark.operators.joins import asof_join, interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l0"), (1, _ts(20), "l1"), (1, _ts(4), "l2"), (2, _ts(7), "l3")],
        "user_id int, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100), (1, _ts(10), 200), (1, _ts(15), 300), (3, _ts(1), 900)],
        "user_id int, ts timestamp, v int",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, right_cols=["v"])
    got = {r.lbl: (r.r_v, r.r_ts) for r in out.collect()}
    # l0 at 10 matches the EQUAL-ts right row (ties match, like DuckDB ASOF);
    # l1 at 20 takes the latest before (15); l2 at 4 precedes all -> dropped
    # (inner); l3's key has no right rows -> dropped.
    assert got == {"l0": (200, _ts(10)), "l1": (300, _ts(15))}


def test_asof_left_and_tolerance(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, right_cols=["v"], how="left")
    got = {r.lbl: r.r_v for r in out.collect()}
    assert got == {"l0": 200, "l1": 300, "l2": None, "l3": None}
    # tolerance 4s: l1 (gap 5s to ts=15) falls out of the window
    tol = asof_join(left, right, right_cols=["v"], how="inner", tolerance_sec=4)
    assert {r.lbl: r.r_v for r in tol.collect()} == {"l0": 200}
    tol_left = asof_join(left, right, right_cols=["v"], how="left", tolerance_sec=4)
    got = {r.lbl: r.r_v for r in tol_left.collect()}
    assert got == {"l0": 200, "l1": None, "l2": None, "l3": None}


def test_asof_no_join_node(spark):
    left, right = _sides(spark)
    plan = asof_join(left, right, right_cols=["v"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window only — never a nested loop


def test_interval_join_hand_case(spark):
    points = spark.createDataFrame(
        [(1, 0, 50), (1, 1, 150), (1, 2, 3_600_000_005), (2, 3, 50)],
        "user_id int, event_id int, us long",
    )
    intervals = spark.createDataFrame(
        # [0, 100] and an OVERLAPPING [40, 3_600_000_010] (spans 2 one-hour
        # buckets), plus another key's interval
        [(1, 0, 100), (1, 40, 3_600_000_010), (2, 200, 300)],
        "user_id int, start_us long, end_us long",
    )
    out = interval_join(points, intervals)
    got = sorted((r.event_id, r.start_us) for r in out.collect())
    # point 0 (us=50) is inside BOTH intervals; point 1 only the long one;
    # point 2 hits the long interval in its second bucket; point 3 misses.
    assert got == [(0, 0), (0, 40), (1, 40), (2, 40)]


def test_pack_sequences_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (0, "en", "a b c"),          # 3 tokens, start 0 -> bin 0
            (1, "en", "d e f g"),        # 4 tokens, start 3 -> crosses into bin 1
            (2, "en", "h i"),            # start 7 -> bin 1
            (3, "fr", "x " * 11),        # 11 tokens alone: bins 0..2
        ],
        "doc_id int, lang string, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_bin, r.last_bin, r.n_bins)
        for r in pack_sequences(docs, budget_tokens=5).collect()
    }
    assert out[0] == (3, 0, 0, 0, 1)
    assert out[1] == (4, 3, 0, 1, 2)
    assert out[2] == (2, 7, 1, 1, 1)
    assert out[3] == (11, 0, 0, 2, 3)


def test_redact_pii_hand_case(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.org now"),
            (1, "host 192.168.0.1 up"),
            (2, "call +1 555-867-5309 today"),
            (3, "clean text with numbers 1 2 3"),
            (4, "a@b.io and 10.0.0.7 and 00 11 22 33"),
        ],
        "id int, t string",
    )
    rows = df.select(
        "id", redact_pii(F.col("t")).alias("red"), *pii_counts(F.col("t"))
    ).collect()
    got = {r.id: (r.red, r.n_email, r.n_ip, r.n_phone) for r in rows}
    assert got[0] == ("mail <EMAIL> now", 1, 0, 0)
    assert got[1] == ("host <IP> up", 0, 1, 0)
    assert got[2] == ("call <PHONE> today", 0, 0, 1)
    assert got[3] == ("clean text with numbers 1 2 3", 0, 0, 0)
    assert got[4] == ("<EMAIL> and <IP> and <PHONE>", 1, 1, 1)


def test_asof_forward_semantics(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, right_cols=["v"], direction="forward", how="left")
    got = {r.lbl: r.r_v for r in out.collect()}
    # l0 at 10 matches the EQUAL-ts right row; l1 at 20 has nothing after;
    # l2 at 4 takes the next (5); l3's key has no right rows.
    assert got == {"l0": 200, "l1": None, "l2": 100, "l3": None}
    tol = asof_join(left, right, right_cols=["v"], direction="forward",
                    how="inner", tolerance_sec=0)
    assert {r.lbl: r.r_v for r in tol.collect()} == {"l0": 200}


def test_interval_join_auto_bucket(spark):
    from neighborly_spark.operators.joins import auto_bucket_us

    intervals = spark.createDataFrame(
        [(1, 0, 99), (1, 200, 299), (2, 0, 399)],
        "user_id int, start_us long, end_us long",
    )
    # lengths 100, 100, 400 -> median 100 -> 2^round(log2(100)) = 128
    assert auto_bucket_us(intervals) == 128
    points = spark.createDataFrame(
        [(1, 0, 50), (1, 1, 250), (2, 2, 350), (2, 3, 500)],
        "user_id int, event_id int, us long",
    )
    got = sorted((r.event_id, r.start_us) for r in
                 interval_join(points, intervals, bucket_us=None).collect())
    assert got == [(0, 0), (1, 200), (2, 0)]


def test_asof_null_timestamps_never_match(spark):
    """Round 8: null timestamps must never match — Spark sorts nulls FIRST,
    so an unguarded null-ts right row would carry its payload into every
    backward frame, and a null-ts left row would see every right row in
    its forward frame. Both now behave like the oracle (comparison with
    null is never true): right nulls are dropped, left nulls are
    unmatched (null payload under how='left', dropped under 'inner')."""
    left = spark.createDataFrame(
        [(1, _ts(10), "l0"), (1, None, "lnull")],
        "user_id int, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, None, 666), (1, _ts(5), 100)],
        "user_id int, ts timestamp, v int",
    )
    back = asof_join(left, right, right_cols=["v"], how="left")
    got = {r.lbl: r.r_v for r in back.collect()}
    assert got == {"l0": 100, "lnull": None}  # 666 never surfaces
    back_inner = asof_join(left, right, right_cols=["v"], how="inner")
    assert {r.lbl for r in back_inner.collect()} == {"l0"}
    fwd = asof_join(left, right, right_cols=["v"], how="left", direction="forward")
    got = {r.lbl: r.r_v for r in fwd.collect()}
    # l0 at 10 has no right row at/after it (5 < 10; null dropped)
    assert got == {"l0": None, "lnull": None}
