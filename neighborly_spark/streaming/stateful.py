"""Custom stateful streaming operators via applyInPandasWithState.

The driver's north star calls for `applyInPandasWithState` where built-in
streaming operators can't express the semantics. The canonical
training-pipeline case: STREAMING DEDUP — emit each document the first time
its content fingerprint appears, drop replays forever after (bounded by a
state timeout). GroupBy+dropDuplicates in streaming keeps unbounded state
and can't emit "first occurrence only with custom payload"; the stateful
map can.

State model: keyed by fingerprint; state value = (first_seen_count). The
operator emits rows only for keys with no prior state. With a processing-
time timeout, state for cold fingerprints expires — the at-scale memory
bound (exactly how production streaming dedup caps state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from neighborly_spark.functions.text import fingerprint

#: per-key state: how many times this fingerprint has been seen
_STATE_SCHEMA = StructType([StructField("seen", LongType(), False)])

_OUTPUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType(), False),
        StructField("id", StringType(), False),
        StructField("text", StringType(), True),
    ]
)


def _make_dedup_fn(state_ttl_ms: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()  # cold fingerprint: forget it (memory bound)
            return
        seen = state.get[0] if state.exists else 0
        first_rows = None
        total = 0
        for pdf in pdfs:
            total += len(pdf)
            if seen == 0 and len(pdf) > 0:
                # deterministic representative: min id across ALL Arrow
                # chunks of this batch group — a fingerprint group can span
                # chunks, so the first non-empty chunk's min is not enough
                head = pdf.sort_values("id").head(1)
                if first_rows is None or head["id"].iloc[0] < first_rows["id"].iloc[0]:
                    first_rows = head
        state.update((seen + total,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if seen == 0 and first_rows is not None:
            yield pd.DataFrame(
                {
                    "fingerprint": [key[0]],
                    "id": first_rows["id"].iloc[0:1].values,
                    "text": first_rows["text"].iloc[0:1].values,
                }
            )

    return _dedup_fn


_SPARK_TO_STATE = {
    "bigint": LongType(),
    "string": StringType(),
}


def streaming_asof_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str = "user_id",
    ts_col: str = "us",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Streaming BACKWARD as-of join: each left row picks up the latest
    right row at or before it per key — the streaming twin of
    operators.joins.asof_join (the Flink temporal-join capability).

    Formulation: union both sides tagged (exactly the batch operator's
    no-join-node shape), groupBy key, applyInPandasWithState. Per batch the
    group's rows resolve with a vectorized pd.merge_asof; keyed state
    carries the LATEST right row forward so matches survive micro-batch
    boundaries. Equal timestamps match (allow_exact_matches), mirroring the
    batch operator's right-sorts-before-left tiebreak.

    Contracts and bounds:
    - ``ts_col`` is an epoch-microsecond long (streams carry longs; the
      batch twin accepts either).
    - inner semantics: unmatched left rows are dropped (how='inner').
    - state is ONE right row per key — O(keys) memory, the streaming
      analogue of the window's running `last(...)`. Cross-batch correctness
      therefore assumes per-key in-order arrival ACROSS batches (a left row
      must not arrive in a later batch than a right row that precedes it in
      event time) — the same in-order contract a watermarked stream
      provides. Within a batch, order is irrelevant (merge_asof sorts).
    - forward as-of lives in streaming_asof_join_forward: it must BUFFER
      unmatched left rows (a forward match can lie arbitrarily far in the
      future), where backward only carries one right row per key.
    """
    if right_cols is None:
        right_cols = [c for c in right_stream.columns if c not in (on, ts_col)]
    left_cols = [c for c in left_stream.columns if c not in (on, ts_col)]
    l_types = dict(left_stream.dtypes)
    r_types = dict(right_stream.dtypes)
    for c in [on, ts_col] + right_cols:
        if r_types[c] not in _SPARK_TO_STATE and c != on:
            raise ValueError(f"streaming_asof_join supports long/string columns, got {c}: {r_types[c]}")

    r = right_stream.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_cols],
    )
    l = left_stream.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r_types[c]).alias(c) for c in right_cols],
        *[F.col(c) for c in left_cols],
    )
    tagged = r.unionByName(l)

    state_schema = StructType(
        [StructField(ts_col, LongType(), False)]
        + [StructField(c, _SPARK_TO_STATE[r_types[c]], True) for c in right_cols]
    )
    out_fields = (
        f"{on} {l_types[on]}, {ts_col} long, "
        + ", ".join(f"{c} {l_types[c]}" for c in left_cols)
        + (", " if left_cols else "")
        + f"{prefix}{ts_col} long, "
        + ", ".join(f"{prefix}{c} {r_types[c]}" for c in right_cols)
    )

    rename = {ts_col: prefix + ts_col, **{c: prefix + c for c in right_cols}}

    # the union's null padding upcasts each side's long columns to float64
    # in the other side's rows; restore exact ints after subsetting (state
    # holds LongType — feeding numpy floats corrupts the round-trip)
    r_ints = {c: "int64" for c in [ts_col] + right_cols if r_types.get(c, "bigint") == "bigint"}
    l_ints = {c: "int64" for c in [ts_col] + left_cols if l_types.get(c, "bigint") == "bigint"}

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        rights = pdf[pdf["_side"] == 0][[ts_col] + right_cols].astype(r_ints)
        if state.exists:
            prev = pd.DataFrame([tuple(state.get)], columns=[ts_col] + right_cols)
            rights = pd.concat([prev, rights], ignore_index=True)
        rights = rights.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        if len(rights):
            state.update(tuple(rights.iloc[-1]))
        lefts = (
            pdf[pdf["_side"] == 1][[ts_col] + left_cols]
            .astype(l_ints)
            .sort_values(ts_col, kind="mergesort")
            .reset_index(drop=True)
        )
        if not len(lefts) or not len(rights):
            return
        merged = pd.merge_asof(
            lefts,
            rights.rename(columns=rename),
            left_on=ts_col,
            right_on=prefix + ts_col,
            direction="backward",
            allow_exact_matches=True,
        )
        matched = merged[merged[prefix + ts_col].notna()].copy()
        if not len(matched):
            return
        matched.insert(0, on, key[0])
        # merge_asof promotes unmatched ints to float NaN; matched rows cast back
        matched[prefix + ts_col] = matched[prefix + ts_col].astype("int64")
        for c in right_cols:
            if r_types[c] == "bigint":
                matched[prefix + c] = matched[prefix + c].astype("int64")
        yield matched

    return tagged.groupBy(on).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_asof_join_forward(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str = "user_id",
    ts_col: str = "us",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
    max_buffer: int = 100_000,
) -> DataFrame:
    """Streaming FORWARD as-of join: each left row picks up the EARLIEST
    right row at or after it per key (the batch operator's
    direction='forward').

    Unlike backward (one right row of state per key), forward must BUFFER
    unmatched left rows — their match can arrive in any later batch. Keyed
    state is therefore (array-typed) columns of the buffered lefts: a left
    row is emitted the moment a right row with ts >= its ts exists, and
    removed from state; under the per-key in-order arrival contract the
    first such right IS the earliest overall, so emissions are final.

    Bounds: state per key = its currently-unmatched lefts, capped at
    ``max_buffer`` rows (oldest dropped with a lost match — the explicit
    trade a production temporal join makes; size it to the worst expected
    left-burst between rights). Lefts with no future right ever remain
    buffered — drain-style runs simply never emit them (inner semantics).
    """
    import numpy as np

    if right_cols is None:
        right_cols = [c for c in right_stream.columns if c not in (on, ts_col)]
    left_cols = [c for c in left_stream.columns if c not in (on, ts_col)]
    l_types = dict(left_stream.dtypes)
    r_types = dict(right_stream.dtypes)
    for c in [ts_col] + right_cols + left_cols:
        t = r_types.get(c, l_types.get(c))
        if t not in _SPARK_TO_STATE:
            raise ValueError(f"streaming_asof_join_forward supports long/string columns, got {c}: {t}")

    r = right_stream.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_cols],
    )
    l = left_stream.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("_side"),
        *[F.lit(None).cast(r_types[c]).alias(c) for c in right_cols],
        *[F.col(c) for c in left_cols],
    )
    tagged = r.unionByName(l)

    from pyspark.sql.types import ArrayType

    lbuf_cols = [ts_col] + left_cols
    rlast_cols = [ts_col] + right_cols
    # state = buffered unmatched lefts (array columns) + the latest right
    # row (scalar columns) — the latter covers the equal-timestamp boundary
    # where a left arrives in a later batch than its same-ts right
    state_schema = StructType(
        [StructField("_b_" + c, ArrayType(_SPARK_TO_STATE[l_types[c]]), True) for c in lbuf_cols]
        + [StructField("_r_" + c, _SPARK_TO_STATE[r_types[c]], True) for c in rlast_cols]
    )
    out_fields = (
        f"{on} {l_types[on]}, {ts_col} long, "
        + ", ".join(f"{c} {l_types[c]}" for c in left_cols)
        + (", " if left_cols else "")
        + f"{prefix}{ts_col} long, "
        + ", ".join(f"{prefix}{c} {r_types[c]}" for c in right_cols)
    )
    rename = {ts_col: prefix + ts_col, **{c: prefix + c for c in right_cols}}
    r_ints = {c: "int64" for c in [ts_col] + right_cols if r_types[c] == "bigint"}
    l_ints = {c: "int64" for c in lbuf_cols if l_types[c] == "bigint"}

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        lefts = pdf[pdf["_side"] == 1][lbuf_cols].astype(l_ints)
        last_right = None
        if state.exists:
            prev = state.get
            buf = pd.DataFrame({c: np.asarray(arr) for c, arr in zip(lbuf_cols, prev)})
            lefts = pd.concat([buf.astype(l_ints), lefts], ignore_index=True)
            if prev[len(lbuf_cols)] is not None:
                last_right = tuple(prev[len(lbuf_cols):])
        lefts = lefts.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        rights = pdf[pdf["_side"] == 0][[ts_col] + right_cols].astype(r_ints)
        if last_right is not None:
            prev_r = pd.DataFrame([last_right], columns=[ts_col] + right_cols)
            rights = pd.concat([prev_r.astype(r_ints), rights], ignore_index=True)
        rights = rights.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        if len(rights) and len(lefts):
            merged = pd.merge_asof(
                lefts,
                rights.rename(columns=rename),
                left_on=ts_col,
                right_on=prefix + ts_col,
                direction="forward",
                allow_exact_matches=True,
            )
            hit = merged[prefix + ts_col].notna()
            matched = merged[hit].copy()
            remaining = lefts[~hit.values]
            if len(matched):
                matched.insert(0, on, key[0])
                matched[prefix + ts_col] = matched[prefix + ts_col].astype("int64")
                for c in right_cols:
                    if r_types[c] == "bigint":
                        matched[prefix + c] = matched[prefix + c].astype("int64")
                yield matched
        else:
            remaining = lefts
        remaining = remaining.tail(max_buffer)
        new_last = (
            tuple(rights.iloc[-1]) if len(rights) else (None,) * len(rlast_cols)
        )
        state.update(
            tuple(remaining[c].tolist() for c in lbuf_cols) + new_last
        )

    return tagged.groupBy(on).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    stream_df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-only streaming dedup keyed by content fingerprint.

    state_ttl_ms: expire state for fingerprints not seen in this window —
    the at-scale memory bound for CONTINUOUS streams. Leave None for
    drain-style runs (trigger availableNow): processing-time timeouts keep
    re-scheduling batches, so an availableNow query with a TTL never
    terminates.
    """
    keyed = stream_df.select(
        fingerprint(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
    ).groupBy("fingerprint")
    return keyed.applyInPandasWithState(
        _make_dedup_fn(state_ttl_ms),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_funnel(
    stream_df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "us",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of operators.sessions.funnel_steps: per key, the
    earliest-greedy completion chain of ``steps``, re-emitted whenever the
    key receives new events.

    Late data is the hard part: a late step-1 event can LOWER t1, which can
    pull every later step earlier — the chain is not incrementally
    monotone, so carrying only the current chain in state is wrong. State
    instead holds, per step, the sorted list of that step's distinct event
    times seen so far (tiebreak columns cannot change the emitted t_i
    values — equal timestamps share one us), and each batch re-derives the
    chain from the merged history. That is exactly the information the
    batch operator's per-key collect_list holds, restricted to tracked
    types and deduped per (step, us) — so stream output == batch output on
    ANY arrival order, not just per-key in-order streams (the twin test
    delivers events hash-split across batches to prove it).

    Memory bound: O(distinct tracked-event times per key) — the same bound
    the batch operator pays per task; a TTL would cap it for continuous
    runs (NoTimeout here: availableNow + processing-time timeouts never
    terminate, NOTES.md).

    Emission: append-mode sink friendly — each batch that touches a key
    yields ONE row with a per-key monotone `_rev` (total tracked events
    seen); downstream takes max(_rev) per key for current-state semantics
    (the parquet-sink analogue of update mode).

    Reference semantics: Tests cover funnel over events the same way the
    batch operator does; see funnel_steps docstring for the earliest-greedy
    contract.
    """
    k = len(steps)
    key_type = dict(stream_df.dtypes)[key_col]
    step_ix = {s: i for i, s in enumerate(steps)}

    ev = stream_df.filter(F.col(type_col).isin(steps)).select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col)).alias("_us")
        if dict(stream_df.dtypes)[ts_col] == "timestamp"
        else F.col(ts_col).cast("long").alias("_us"),
        F.col(type_col).alias("_t"),
    )

    state_schema = StructType(
        [StructField(f"s{i}", ArrayType(LongType()), True) for i in range(k)]
        + [StructField("n", LongType(), False)]
    )
    out_fields = (
        f"{key_col} {key_type}, "
        + ", ".join(f"t{i}_us long" for i in range(1, k + 1))
        + ", steps_completed int, converted boolean, _rev long"
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import bisect

        if state.exists:
            prev = state.get
            times = [list(prev[i]) if prev[i] is not None else [] for i in range(k)]
            n = prev[k]
        else:
            times, n = [[] for _ in range(k)], 0
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            for t, us in zip(pdf["_t"].values, pdf["_us"].values):
                lst = times[step_ix[t]]
                pos = bisect.bisect_left(lst, us)
                if pos == len(lst) or lst[pos] != us:
                    lst.insert(pos, int(us))
        if batch_n == 0:
            return
        n += batch_n
        state.update(tuple(times) + (n,))

        chain: list = []
        prev_us = None
        for i in range(k):
            lst = times[i]
            if i == 0:
                t_i = lst[0] if lst else None
            else:
                pos = bisect.bisect_right(lst, prev_us)
                t_i = lst[pos] if pos < len(lst) else None
            chain.append(t_i)
            if t_i is None:
                chain.extend([None] * (k - i - 1))
                break
            prev_us = t_i
        done = sum(1 for c in chain if c is not None)
        row = {key_col: [key[0]]}
        for i in range(k):
            row[f"t{i+1}_us"] = pd.array([chain[i]], dtype="Int64")
        row["steps_completed"] = [done]
        row["converted"] = [chain[k - 1] is not None]
        row["_rev"] = [n]
        yield pd.DataFrame(row)

    return ev.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _set_jaccard_state_fn(set_col: str):
    """Shared bucket-membership state transition for the set-Jaccard
    streaming near-dup twins (MinHash buckets, winnowing fingerprint
    buckets): each arrival verifies exact set Jaccard against every doc
    already in the bucket (state + earlier same-batch arrivals, processed
    in ascending-id order so twin runs agree), emitting the integer
    components; the division/threshold happens in the Spark plan so
    rounding matches the batch operator bit-for-bit. State = (ids, sets),
    the same rows the batch shuffle groups."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev = state.get
            ids = list(prev[0]) if prev[0] is not None else []
            sets = [frozenset(s) for s in prev[1]] if prev[1] is not None else []
        else:
            ids, sets = [], []
        out_a, out_b, out_c, out_na, out_nb = [], [], [], [], []
        arrived = 0
        for pdf in pdfs:
            # deterministic intra-batch order so twin runs agree
            pdf = pdf.sort_values("_id")
            for did, sharr in zip(pdf["_id"].values, pdf[set_col].values):
                did = int(did)
                if did in ids:
                    continue  # replay of a doc already in the bucket
                new_set = frozenset(int(x) for x in sharr)
                for oid, oset in zip(ids, sets):
                    common = len(new_set & oset)
                    union = len(new_set) + len(oset) - common
                    if union:  # all components emitted; threshold applied in the plan
                        a, b = (oid, did) if oid < did else (did, oid)
                        sa, sb = (oset, new_set) if oid < did else (new_set, oset)
                        out_a.append(a)
                        out_b.append(b)
                        out_c.append(common)
                        out_na.append(len(sa))
                        out_nb.append(len(sb))
                ids.append(did)
                sets.append(new_set)
                arrived += 1
        if arrived:
            state.update(([int(i) for i in ids], [sorted(s) for s in sets]))
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "_common": out_c, "_na": out_na, "_nb": out_nb}
            )

    return fn


_SET_JACCARD_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType()), True),
        StructField("sets", ArrayType(ArrayType(LongType())), True),
    ]
)


def streaming_minhash_neardup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Streaming twin of operators.dedup.minhash_lsh_pairs: near-duplicate
    pairs surface AS DOCUMENTS ARRIVE instead of in a batch sweep.

    Same candidate structure as the batch operator — identical MinHash
    signatures and band keys (the shared Column expressions), bucketed by
    (band, key) — but the bucket membership lives in keyed state: when a
    doc lands in a bucket, it verifies exact shingle-set Jaccard against
    every doc already there (state + earlier arrivals in the same batch)
    and emits the pairs that clear the threshold. Union of emissions over
    any arrival order == the batch operator's pairs (the twin test
    hash-splits arrivals across a checkpoint restart).

    Outputs may repeat across bands exactly like the batch candidate join
    before its distinct — deduplicate downstream on (id_a, id_b): jaccard
    is deterministic per pair, so distinct() is exact. The verification
    division is emitted as integer components and finished in a Spark
    projection, so rounding matches the batch operator bit-for-bit.

    State = bucket membership (ids + hashed shingle sets) — the same
    data the batch shuffle groups; a production continuous run would cap
    it with a timeout like streaming_dedup's TTL.
    """
    from neighborly_spark.operators.dedup import hashed_shingle_sets, minhash_sig_expr

    rows_per_band = num_perm // bands
    sh = hashed_shingle_sets(stream_df, id_col, text_col, k)
    sigs = sh.select("_id", "_sh", minhash_sig_expr(F.col("_sh"), num_perm).alias("sig"))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select("_id", "_sh", F.explode(band_arr).alias("bk")).select(
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "_id", "_sh"
    )

    raw = buckets.groupBy("band", "key").applyInPandasWithState(
        _set_jaccard_state_fn("_sh"),
        outputStructType="id_a long, id_b long, _common long, _na long, _nb long",
        stateStructType=_SET_JACCARD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return raw.withColumn(
        "jaccard",
        F.round(
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common")).cast("double"),
            round_to,
        ),
    ).filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def streaming_simhash_neardup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Streaming twin of operators.dedup.simhash_pairs — completes the
    streaming dedup family (exact fingerprint, MinHash, SimHash).

    Same pigeonhole candidate structure as the batch operator: the 32-bit
    SimHash splits into (max_hamming+1) chunks; any pair within
    max_hamming Hamming distance agrees on at least one chunk, so keying
    state by (chunk, chunk_key) and comparing each arrival against the
    bucket's stored codes finds every true pair incrementally. Emissions
    may repeat across chunks exactly like the batch candidate join before
    its distinct — hamming is deterministic per pair, so a downstream
    distinct() is exact (the twin test proves set equality with batch).

    State = (ids, codes) per bucket — the same rows the batch shuffle
    groups; a production continuous run would cap it with a timeout like
    streaming_dedup's TTL.
    """
    from neighborly_spark.operators.dedup import SIMHASH_BITS, simhash

    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    codes = stream_df.select(
        F.col(id_col).cast("long").alias("_id"), simhash(F.col(text_col)).alias("_code")
    )
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("_code"), c * chunk_bits)
                .bitwiseAND(F.lit((1 << chunk_bits) - 1).cast("long"))
                .alias("key"),
            )
            for c in range(n_chunks)
        ]
    )
    keyed = codes.select("_id", "_code", F.explode(chunks).alias("ck")).select(
        F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"), "_id", "_code"
    )

    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType()), True),
            StructField("codes", ArrayType(LongType()), True),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev = state.get
            ids = list(prev[0]) if prev[0] is not None else []
            stored = list(prev[1]) if prev[1] is not None else []
        else:
            ids, stored = [], []
        out_a, out_b, out_h = [], [], []
        arrived = 0
        for pdf in pdfs:
            pdf = pdf.sort_values("_id")
            for did, code in zip(pdf["_id"].values, pdf["_code"].values):
                did, code = int(did), int(code)
                if did in ids:
                    continue  # replay
                for oid, ocode in zip(ids, stored):
                    h = bin(code ^ ocode).count("1")
                    if h <= max_hamming:
                        a, b = (oid, did) if oid < did else (did, oid)
                        out_a.append(a)
                        out_b.append(b)
                        out_h.append(h)
                ids.append(did)
                stored.append(code)
                arrived += 1
        if arrived:
            state.update((ids, stored))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    return keyed.groupBy("chunk", "key").applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long, hamming int",
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_winnow_neardup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Streaming twin of operators.dedup.winnow_neardup_pairs — closes the
    streaming dedup family (exact, MinHash, SimHash, winnowing; round-3
    VERDICT item 6).

    Same candidate structure as the batch operator: documents explode into
    their winnowing fingerprint minima (functions/text.winnow_fingerprints,
    the MOSS selection — identical Column expression as batch, so the
    fingerprint values match bit-for-bit); a pair is a candidate iff it
    shares a fingerprint, and each candidate verifies exact Jaccard of the
    two docs' full fingerprint SETS. A pair sharing f fingerprints emits up
    to f times, exactly like the batch inverted-index join before its
    groupBy — winnow_jaccard is deterministic per pair, so a downstream
    distinct() is exact (the twin test proves set equality with batch
    across a checkpoint restart).

    State layout — SHARDED posting lists, not one state group per
    fingerprint: winnowing emits ~2/(w+1) of the k-gram positions as
    fingerprints (~100+ per short doc), so keying state by raw fingerprint
    value explodes into tens of thousands of state groups whose per-group
    Python invocation overhead dominates (measured: >20 min at 500 docs vs
    ~3 min for the minhash twin with its 4 bands). Instead the inverted
    index shards into ``n_buckets`` groups by pmod(fingerprint, n_buckets);
    each group's state holds its shard of the posting list and each arrival
    compares only against stored entries with the SAME fingerprint. Work
    and emissions are identical to the per-fingerprint keying — only the
    group granularity changes (the same trick a production system uses to
    cap state-store key count). State is NORMALIZED within a bucket: a
    per-bucket doc table (id -> fingerprint set, serialized ONCE) plus a
    (fingerprint -> id) posting list — storing the set inline per posting
    would amplify state ~f-fold for a doc with f fingerprints in the
    bucket (round-4 ADVICE). A production continuous run would cap state
    with a timeout like streaming_dedup's TTL.
    """
    from neighborly_spark.functions.text import winnow_fingerprints

    n_buckets = 256
    fps = stream_df.select(
        F.col(id_col).cast("long").alias("_id"),
        winnow_fingerprints(F.col(text_col), k, w).alias("_fp"),
    ).filter(F.size("_fp") > 0)
    inv = fps.select(
        "_id", "_fp", F.explode("_fp").alias("_f")
    ).withColumn("_bk", F.pmod(F.col("_f"), F.lit(n_buckets)))

    state_schema = StructType(
        [
            StructField("post_f", ArrayType(LongType()), True),
            StructField("post_i", ArrayType(LongType()), True),
            StructField("doc_ids", ArrayType(LongType()), True),
            StructField("doc_sets", ArrayType(ArrayType(LongType())), True),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        # postings[f] = ids already posted under f in this shard;
        # doc_sets[id] = the doc's full fingerprint set, stored ONCE per
        # bucket regardless of how many of its fingerprints land here
        postings: dict[int, list[int]] = {}
        doc_sets: dict[int, frozenset] = {}
        if state.exists:
            prev = state.get
            for f, i in zip(prev[0] or [], prev[1] or []):
                postings.setdefault(int(f), []).append(int(i))
            for i, s in zip(prev[2] or [], prev[3] or []):
                doc_sets[int(i)] = frozenset(int(x) for x in s)
        out_a, out_b, out_c, out_na, out_nb = [], [], [], [], []
        arrived = 0
        for pdf in pdfs:
            # deterministic intra-batch order so twin runs agree
            pdf = pdf.sort_values(["_f", "_id"])
            for f, did, fparr in zip(pdf["_f"].values, pdf["_id"].values, pdf["_fp"].values):
                f, did = int(f), int(did)
                plist = postings.setdefault(f, [])
                if did in plist:
                    continue  # replay of a posting already stored
                new_set = doc_sets.get(did)
                if new_set is None:
                    new_set = frozenset(int(x) for x in fparr)
                for oid in plist:
                    oset = doc_sets[oid]
                    common = len(new_set & oset)
                    union = len(new_set) + len(oset) - common
                    if union:  # threshold applied in the plan
                        a, b = (oid, did) if oid < did else (did, oid)
                        sa, sb = (oset, new_set) if oid < did else (new_set, oset)
                        out_a.append(a)
                        out_b.append(b)
                        out_c.append(common)
                        out_na.append(len(sa))
                        out_nb.append(len(sb))
                plist.append(did)
                doc_sets[did] = new_set
                arrived += 1
        if arrived:
            flat_f, flat_i = [], []
            for f in sorted(postings):
                for i in postings[f]:
                    flat_f.append(f)
                    flat_i.append(i)
            d_ids = sorted(doc_sets)
            state.update((flat_f, flat_i, d_ids, [sorted(doc_sets[i]) for i in d_ids]))
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "_common": out_c, "_na": out_na, "_nb": out_nb}
            )

    raw = inv.groupBy("_bk").applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long, _common long, _na long, _nb long",
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return raw.withColumn(
        "winnow_jaccard",
        F.round(
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common")).cast("double"),
            round_to,
        ),
    ).filter(F.col("winnow_jaccard") >= threshold).select("id_a", "id_b", "winnow_jaccard")


def streaming_semantic_neardup(
    stream_df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Streaming twin of operators.dedup.semantic_dedup_pairs (SemDeDup) —
    completes the streaming dedup family (exact, MinHash, SimHash,
    winnowing, semantic): near-dup pairs surface AS VECTORS ARRIVE.

    Same structure as the batch exact tier: nearest-centroid assignment is
    the identical broadcast argmin Column expression (ivf_assign over
    literal centroids — in-plan, so batch and stream assign identically),
    and the CLUSTER is the state key — the streaming analogue of the batch
    cluster-key shuffle, bounding comparisons at sum(c_i^2) exactly like
    the batch candidate join. Each arrival is compared against every
    member already in its cluster (state + earlier same-batch arrivals in
    ascending-id order so twin runs agree).

    Float discipline: the stateful fn emits only the PAIR and both stored
    float32 vectors; cosine + round + threshold run in the Spark plan
    downstream, so emitted values are bit-identical to the batch exact
    tier (the same sequential-fold expression) — the same trick the
    Jaccard twins use by emitting integer components. State per cluster =
    (ids, vectors), the rows the batch shuffle groups; a production
    continuous run would cap state with a timeout like streaming_dedup's
    TTL (here the cluster population is the index itself, so the real
    bound is nlist — raising it shrinks every cell).
    """
    from pyspark.sql.types import FloatType

    from neighborly_spark.functions.distance import cosine
    from neighborly_spark.operators.ivf import CLUSTER_COL, IVFModel, _ArrayCentroids, ivf_assign

    import numpy as np

    model = IVFModel(_ArrayCentroids(np.asarray(centroids, dtype=np.float64)), len(centroids))
    assigned = ivf_assign(
        stream_df.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(vec_col).cast("array<float>").alias("_v"),
        ),
        model,
        "_v",
    )

    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType()), True),
            StructField("vecs", ArrayType(ArrayType(FloatType())), True),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev = state.get
            ids = list(prev[0]) if prev[0] is not None else []
            vecs = [list(v) for v in prev[1]] if prev[1] is not None else []
        else:
            ids, vecs = [], []
        out_a, out_b, out_va, out_vb = [], [], [], []
        arrived = 0
        for pdf in pdfs:
            pdf = pdf.sort_values("_id")
            for did, varr in zip(pdf["_id"].values, pdf["_v"].values):
                did = int(did)
                if did in ids:
                    continue  # replay of a vector already in the cluster
                v = [float(x) for x in varr]
                for oid, ov in zip(ids, vecs):
                    a, b = (oid, did) if oid < did else (did, oid)
                    va, vb = (ov, v) if oid < did else (v, ov)
                    out_a.append(a)
                    out_b.append(b)
                    out_va.append(va)
                    out_vb.append(vb)
                ids.append(did)
                vecs.append(v)
                arrived += 1
        if arrived:
            state.update((ids, vecs))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "_va": out_va, "_vb": out_vb})

    raw = assigned.groupBy(CLUSTER_COL).applyInPandasWithState(
        fn,
        outputStructType=(
            "id_a long, id_b long, _va array<float>, _vb array<float>"
        ),
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        raw.withColumn("cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), round_to))
        # NaN guard: zero-magnitude vectors cosine to NaN and NaN-is-largest
        # would pass the threshold — same guard as the batch exact tier
        .filter(~F.isnan(F.col("cos_sim")) & (F.col("cos_sim") >= threshold))
        .select("id_a", "id_b", "cos_sim")
    )


def streaming_exact_substr_marks(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    min_count: int = 2,
    n_buckets: int = 256,
) -> DataFrame:
    """Streaming twin of operators.dedup.exact_substr_spans' MARKING stage
    (Lee et al. 2022 ExactSubstr) — emits each duplicated window occurrence
    (doc_id, pos) as soon as its window hash reaches ``min_count``
    occurrences across everything that has arrived, keeping the streaming
    dedup family symmetric (exact, MinHash, SimHash, winnowing, semantic,
    ExactSubstr).

    Documents explode into their L-token window hashes with the SAME
    Column expression as the batch operator (md5 values match
    bit-for-bit). State is bucket-sharded like streaming_winnow_neardup
    (pmod of a 64-bit hash of the window hash — window hashes are near
    unique, so per-hash state groups would explode); within a bucket each
    window hash tracks (count, pending occurrences): occurrences buffer
    while count < min_count (at most min_count-1 of them), then the
    buffered ones flush together with the arrival that crosses the
    threshold, and every later arrival emits immediately. The cumulative
    emission set therefore EQUALS the batch operator's marked-window set
    over the arrived documents (twin-tested across a checkpoint restart);
    span merging stays a per-doc batch step over the marks, exactly as in
    the batch plan.

    A production continuous run would bound state with a TTL timeout like
    streaming_dedup; the twin uses NoTimeout (availableNow termination).

    State-size note: the per-bucket replay guard (seen_docs) stores a doc
    id in EVERY bucket its windows touch — up to n_buckets copies per doc
    corpus-wide. At large scale, run the stream through a doc-keyed
    first-seen dedup (streaming_dedup on the doc id) BEFORE this operator
    and the guard never grows past the docs that actually replay; the
    guard here stays as defense-in-depth because chaining two stateful
    operators has output-mode restrictions some pipelines can't take.
    """
    from neighborly_spark.operators.dedup import _window_hashes

    id_type = stream_df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # the bucket state stores doc ids as longs; a silent cast of a
        # string/uuid id would become NULL and crash the state fn with an
        # opaque NaN-to-int error mid-stream — fail loudly at plan time
        raise ValueError(
            f"streaming_exact_substr_marks needs an integral {id_col!r} "
            f"column (got {id_type}); map string ids to stable longs first "
            "(functions.ids deterministic ids)"
        )
    wins = stream_df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.posexplode(_window_hashes(F.col(text_col), min_tokens)).alias("_pos", "_wh"),
    ).withColumn("_bk", F.pmod(F.xxhash64("_wh"), F.lit(n_buckets)))

    state_schema = StructType(
        [
            StructField("whs", ArrayType(StringType()), True),
            StructField("cnts", ArrayType(LongType()), True),
            StructField("pend_wh", ArrayType(StringType()), True),
            StructField("pend_doc", ArrayType(LongType()), True),
            StructField("pend_pos", ArrayType(LongType()), True),
            StructField("seen_docs", ArrayType(LongType()), True),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        pending: dict[str, list[tuple[int, int]]] = {}
        seen: set[int] = set()
        if state.exists:
            prev = state.get
            counts = {w: int(c) for w, c in zip(prev[0] or [], prev[1] or [])}
            for w, d, p in zip(prev[2] or [], prev[3] or [], prev[4] or []):
                pending.setdefault(w, []).append((int(d), int(p)))
            seen = {int(d) for d in (prev[5] or [])}
        # replay guard (at-least-once sources): a doc whose rows this bucket
        # already counted in a PRIOR batch is skipped wholesale — without it a
        # re-delivery double-counts every window hash and marks the whole doc
        # as one duplicated span (streaming_winnow_neardup's posting guard,
        # applied at doc granularity since the unit of delivery is a doc)
        prior_seen = frozenset(seen)
        # in-batch replay guard: prior_seen only covers EARLIER batches, so
        # an at-least-once duplicate landing inside ONE micro-batch would
        # double-count every window and falsely mark the whole doc as
        # duplicated; (doc, pos) identifies a window occurrence uniquely
        batch_seen: set = set()
        out_doc: list[int] = []
        out_pos: list[int] = []
        arrived = 0
        for pdf in pdfs:
            # deterministic intra-batch order so twin runs agree
            pdf = pdf.sort_values(["_wh", "_id", "_pos"])
            for wh, did, pos in zip(pdf["_wh"].values, pdf["_id"].values, pdf["_pos"].values):
                wh, did, pos = str(wh), int(did), int(pos)
                if did in prior_seen or (did, pos) in batch_seen:
                    continue
                batch_seen.add((did, pos))
                seen.add(did)
                c = counts.get(wh, 0) + 1
                counts[wh] = c
                if c < min_count:
                    pending.setdefault(wh, []).append((did, pos))
                elif c == min_count:
                    for pd_, pp in pending.pop(wh, []):
                        out_doc.append(pd_)
                        out_pos.append(pp)
                    out_doc.append(did)
                    out_pos.append(pos)
                else:
                    out_doc.append(did)
                    out_pos.append(pos)
                arrived += 1
        if arrived:
            whs = sorted(counts)
            p_wh, p_doc, p_pos = [], [], []
            for w in sorted(pending):
                for d, p in pending[w]:
                    p_wh.append(w)
                    p_doc.append(d)
                    p_pos.append(p)
            state.update(
                ([*whs], [counts[w] for w in whs], p_wh, p_doc, p_pos, sorted(seen))
            )
        if out_doc:
            yield pd.DataFrame({"doc_id": out_doc, "pos": out_pos})

    return wins.groupBy("_bk").applyInPandasWithState(
        fn,
        outputStructType="doc_id long, pos long",
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
