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
            if seen == 0 and first_rows is None and len(pdf) > 0:
                # deterministic representative: min id within the batch group
                first_rows = pdf.sort_values("id").head(1)
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
