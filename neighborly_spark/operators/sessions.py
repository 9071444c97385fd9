"""Gap-based event sessionization.

Extension beyond the reference (its event handling stops at ingest +
windowed counts; see SURVEY.md §2.8): a training-data / analytics pipeline
needs user sessions — maximal runs of events per key where consecutive
events are less than a gap apart. Two formulations, same semantics:

- ``session_stats``: the idiomatic batch/streaming path via Spark's native
  ``F.session_window`` — one shuffle on the key, map-side partial merge of
  overlapping windows, AQE-friendly, and reusable verbatim under
  Structured Streaming with a watermark.
- ``sessionize``: event-level session ids via lag + running sum window
  functions, when every event needs its session tag (the classic SQL
  formulation; this is also the DuckDB oracle's shape).

Boundary semantics (both paths, verified equivalent in tests): an event at
distance EXACTLY ``gap_sec`` from its predecessor CONTINUES the session —
Spark's session windows ``[ts, ts + gap)`` merge when adjacent, not only
when overlapping, so the break condition is ``diff > gap`` (strict).

Scale: both plans shuffle once on the session key. Skewed keys (one user
with millions of events) degrade the sort inside each partition, not the
exchange fan-out; AQE skew handling applies. Session stats are bounded by
the per-key event count, never materializing cross-key state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 28800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Tag every event with a per-key ``session_seq`` (1-based, in time
    order). Lag + running-sum window formulation; (ts, tiebreak) ordering
    makes equal-timestamp events deterministic."""
    gap_us = int(gap_sec) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_lag = Window.partitionBy(key_col).orderBy(*order)
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_us = F.lag(us).over(w_lag)
    brk = F.when(prev_us.isNull() | (us - prev_us > gap_us), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn("session_seq", F.sum(brk).over(w_run))


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 28800,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregate via native ``F.session_window``:
    (key, start_us, end_us, n_events, duration_sec[, total_value]).

    ``start_us``/``end_us`` are the first/last EVENT timestamps (micros),
    not the gap-padded window end; ``duration_sec`` is their integer-second
    difference (exact integer arithmetic, no float drift).
    """
    us = F.unix_micros(F.col(ts_col))
    aggs = [
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    out = (
        df.groupBy(F.col(key_col), F.session_window(ts_col, f"{int(gap_sec)} seconds"))
        .agg(*aggs)
        .drop("session_window")
    )
    return out.withColumn(
        "duration_sec", ((F.col("end_us") - F.col("start_us")) / F.lit(1_000_000)).cast("long")
    )


def session_stats_duckdb_sql(
    gap_sec: int = 28800,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    where: str = "TRUE",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of session_stats (lag + running-sum formulation).

    Break condition is strict ``> gap`` to match Spark's session-window
    merging (adjacent windows coalesce).
    """
    gap_us = int(gap_sec) * 1_000_000
    val_sel = f", round(sum({value_col}), 4) AS total_value" if value_col is not None else ""
    return f"""
WITH o AS (
  SELECT {key_col}, epoch_us({ts_col}) AS us, {value_col if value_col else '0'} AS _v,
         lag(epoch_us({ts_col})) OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col}) AS prev_us
  FROM {table} WHERE {where}
), s AS (
  SELECT {key_col}, us, _v,
         sum(CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us} THEN 1 ELSE 0 END)
           OVER (PARTITION BY {key_col} ORDER BY us ROWS UNBOUNDED PRECEDING) AS seq
  FROM o
)
SELECT {key_col}, min(us) AS start_us, max(us) AS end_us, count(*) AS n_events,
       (max(us) - min(us)) // 1000000 AS duration_sec{val_sel.replace(f'sum({value_col})', 'sum(_v)') if value_col else ''}
FROM s GROUP BY {key_col}, seq
""".strip()


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel analysis: per key, the earliest completion chain of
    ``steps`` — t1 = first step-1 event, t_{i+1} = first step-(i+1) event
    STRICTLY after t_i. Returns (key, t1_us..tK_us, steps_completed,
    converted); earliest-greedy matching is the standard funnel semantics
    and provably maximizes steps_completed for ordered chains.

    Implementation: ONE shuffle — events of the tracked types collect into
    a per-key time-sorted array ((us, tiebreak) order, so equal timestamps
    are deterministic), then each step is a first-match scan of that array
    with null propagation for missed steps. No per-step self-joins (a K-step
    funnel via joins costs K shuffles); state is bounded by the per-key
    tracked-event count. The DuckDB oracle computes the same chain via
    list_filter — lists are only READ here, never fold-mutated, so the
    DuckDB lambda-struct pitfall (NOTES.md) does not apply.
    """
    us = F.unix_micros(F.col(ts_col))
    ev = df.filter(F.col(type_col).isin(steps)).select(
        F.col(key_col),
        F.struct(us.alias("us"), F.col(tiebreak_col).alias("tb"), F.col(type_col).alias("t")).alias("_e"),
    )
    grouped = ev.groupBy(key_col).agg(F.array_sort(F.collect_list("_e")).alias("_l"))

    # each t_i references t_{i-1}, so the chain is built via successive
    # withColumn projections (a same-select alias would not resolve). The
    # lambda comes from a factory — default-arg closures would add params
    # and break PySpark's HOF arity inspection.
    def first_match(step: str, prev: Column | None) -> Column:
        if prev is None:
            m = F.filter(F.col("_l"), lambda x: x["t"] == step)
        else:
            m = F.filter(F.col("_l"), lambda x: (x["t"] == step) & (x["us"] > prev))
        return F.try_element_at(m, F.lit(1))["us"]

    out = grouped
    prev = None
    for i, step in enumerate(steps, start=1):
        name = f"t{i}_us"
        out = out.withColumn(name, first_match(step, prev))
        prev = F.col(name)
    out = out.drop("_l")
    completed = None
    for i in range(1, len(steps) + 1):
        c = F.when(F.col(f"t{i}_us").isNotNull(), 1).otherwise(0)
        completed = c if completed is None else completed + c
    return out.withColumn("steps_completed", completed).withColumn(
        "converted", F.col(f"t{len(steps)}_us").isNotNull()
    )


def funnel_steps_duckdb_sql(
    steps: list[str],
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    where: str = "TRUE",
) -> str:
    types = ", ".join(f"'{s}'" for s in steps)
    t_exprs, prev = [], None
    for i, step in enumerate(steps, start=1):
        cond = f"x.t = '{step}'" if prev is None else f"x.t = '{step}' AND x.us > {prev}"
        t_exprs.append(f"list_filter(_l, x -> {cond})[1].us AS t{i}_us")
        prev = f"t{i}_us"
    steps_done = " + ".join(
        f"CASE WHEN t{i}_us IS NOT NULL THEN 1 ELSE 0 END" for i in range(1, len(steps) + 1)
    )
    # each t_i references t_{i-1} via DuckDB's lateral column aliases
    acc = list(t_exprs)
    return f"""
WITH g AS (
  SELECT {key_col},
         list(struct_pack(us := epoch_us({ts_col}), tb := {tiebreak_col}, t := {type_col})
              ORDER BY epoch_us({ts_col}), {tiebreak_col}) AS _l
  FROM {table} WHERE {type_col} IN ({types}) AND ({where})
  GROUP BY {key_col}
), s AS (
  SELECT {key_col}, {", ".join(acc)} FROM g
)
SELECT {key_col}, {", ".join(f"t{i}_us" for i in range(1, len(steps) + 1))},
       {steps_done} AS steps_completed,
       t{len(steps)}_us IS NOT NULL AS converted
FROM s
""".strip()
