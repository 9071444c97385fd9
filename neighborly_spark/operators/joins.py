"""Temporal joins: as-of join and point-in-interval join.

Extension beyond the reference (it has no general join operator at all;
SURVEY.md §2.5 — the join-like capabilities it does have are id-equality
lookups and the k-NN join family). A training-data / event-analytics
pipeline needs the two temporal joins Spark lacks as built-ins:

- ``asof_join``: for every left row, the single most recent right row at or
  before it (per key) — the canonical enrichment join (event → last state,
  trade → latest quote). Implemented WITHOUT a join node: union both sides
  tagged, one window ``last(..., ignorenulls=True)`` over (key, time)
  carries the latest right payload forward into left rows. Cost: ONE
  exchange of both sides on the key + a per-partition sort — the same
  shuffle a sort-merge join would do, with no candidate-pair blowup and no
  inequality-join fallback to BroadcastNestedLoop. This is the classic
  Flink/KDB "last known value" formulation.
- ``interval_join``: points joined to the intervals containing them.
  Spark's naive form (equi-key + BETWEEN) is fine per-key but a bare range
  condition degrades to BroadcastNestedLoopJoin without an equality key.
  The scale path here bucketizes time: intervals explode to the fixed-width
  buckets they overlap, points hash to their bucket, and the join becomes
  an EQUI-join on (key, bucket) refined by the exact containment predicate.
  Each (point, interval) pair meets in exactly one bucket (the point's), so
  no dedup pass is needed.

Scale: both operators shuffle each input exactly once. As-of's per-key
ordered scan is the information-theoretic minimum for "latest before"; a
skewed key degrades one partition's sort, not the plan shape. Interval
bucket width trades explode factor (long intervals / narrow buckets) vs
candidate precision (short buckets filter more exactly); pick it near the
median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
    tolerance_sec: int | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach to each left row ONE right row per ``on`` key —
    ``direction='backward'`` (default) the greatest right ``ts_col`` <= the
    left row's (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``), ``'forward'``
    the smallest right ts >= the left row's. Equal timestamps match in both
    directions.

    Right payload columns (``right_cols``, default = everything but the key
    and timestamp) arrive prefixed; the matched right timestamp is
    ``{prefix}{ts_col}``. ``how='left'`` keeps unmatched left rows with
    null payload; ``tolerance_sec`` drops matches farther than the window.

    If several right rows share one (key, ts), the one nearest the left row
    in the union's deterministic sort order wins — pre-aggregate the right
    side if a specific tiebreak is required (the parity queries keep max
    event_id).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    back = direction == "backward"
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    left_cols = [c for c in left.columns if c not in (on, ts_col)]
    out_right = [prefix + ts_col] + [prefix + c for c in right_cols]

    # One tagged frame. Backward: right rows sort BEFORE left rows at equal
    # ts so an exactly-simultaneous right row is inside the preceding frame;
    # forward: right rows sort AFTER left rows so it is inside the following
    # frame.
    r_side, l_side = (0, 1) if back else (1, 0)
    # a null right timestamp can never satisfy l.ts >= r.ts (or <=) — but
    # Spark sorts nulls FIRST, so backward it would sit at the front of
    # every key's frame and its payload would carry into EVERY left row.
    # Drop such rows up front (DuckDB's ASOF comparison is never true on
    # null either, so the oracle agrees).
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(r_side).alias("_side"),
        F.col(ts_col).alias(prefix + ts_col),
        *[F.col(c).alias(prefix + c) for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias(prefix + ts_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(prefix + c) for c in right_cols],
        *left_cols,
    )
    w = Window.partitionBy(on).orderBy(F.col(ts_col).asc(), F.col("_side").asc())
    if back:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = r.unionByName(l).select(
        on,
        ts_col,
        "_side",
        *left_cols,
        *[carry(c).alias(c) for c in out_right],
    )
    out = carried.filter(F.col("_side") == l_side).drop("_side")
    # a null LEFT timestamp never matches either (forward it sorts first
    # and would otherwise see every right row in its following frame):
    # null the carried payload, so 'inner' drops it and 'left' keeps it
    # with null payload — the oracle's semantics
    out = out.select(
        on, ts_col,
        *left_cols,
        *[F.when(F.col(ts_col).isNotNull(), F.col(c)).alias(c) for c in out_right],
    )
    matched = F.col(prefix + ts_col).isNotNull()
    if tolerance_sec is not None:
        signed = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(prefix + ts_col))
        gap_us = signed if back else -signed
        in_tol = matched & (gap_us <= int(tolerance_sec) * 1_000_000)
        out = out.filter(in_tol) if how == "inner" else out.select(
            on, ts_col, *left_cols,
            *[F.when(in_tol, F.col(c)).alias(c) for c in out_right],
        )
    elif how == "inner":
        out = out.filter(matched)
    return out


def auto_bucket_us(
    intervals: DataFrame, start_us: str = "start_us", end_us: str = "end_us"
) -> int:
    """Pick an interval-join bucket width: the median interval length
    (percentile_approx over one tiny planner job), rounded to a power of
    two. Median-width buckets bound the explode factor at ~2 rows per
    typical interval while keeping candidate lists tight; the power-of-two
    snap makes the choice stable under small data drift. Driver-side
    ACTION at plan time — one aggregate over the (small) interval side.
    """
    import math

    med = intervals.select(
        F.percentile_approx(F.col(end_us) - F.col(start_us) + 1, 0.5).alias("m")
    ).first().m
    if not med or med <= 1:
        return 1
    return int(2 ** round(math.log2(med)))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "user_id",
    point_us: str = "us",
    start_us: str = "start_us",
    end_us: str = "end_us",
    bucket_us: int | None = 3_600_000_000,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them:
    ``points.{point_us}`` in CLOSED ``[start_us, end_us]`` with matching
    ``on`` key. Timestamps are epoch-microsecond longs.

    Bucketized equi-join (see module docstring): never a nested-loop plan,
    and overlapping intervals still yield one output row per containing
    interval with no dedup step. ``bucket_us=None`` sizes the bucket from
    the intervals' median length (auto_bucket_us).
    """
    b = int(bucket_us) if bucket_us is not None else auto_bucket_us(
        intervals, start_us, end_us
    )
    # integer `div`, never float division: epoch-micro offsets stay exact
    # past 2^53 and bucket boundaries can't drift
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.expr(f"{start_us} div {b}"), F.expr(f"{end_us} div {b}"))),
    )
    pt = points.withColumn("_bucket", F.expr(f"{point_us} div {b}"))
    return (
        pt.join(iv, [on, "_bucket"])
        .filter(F.col(point_us).between(F.col(start_us), F.col(end_us)))
        .drop("_bucket")
    )
