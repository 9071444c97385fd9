"""Streaming temporal joins.

The batch operators (operators/joins.py) have two streaming counterparts:

- as-of join -> streaming/stateful.streaming_asof_join (custom state, since
  Spark has no built-in temporal join);
- point-in-interval join -> THIS module: Spark's native stream-stream inner
  join already expresses containment as an equi-key + time-range condition,
  so the streaming form needs no custom state at all — just watermarks and
  a state-bounding range on the two event times.

Scale/state model: Spark buffers both sides' unexpired rows keyed by the
equi-key. The watermarks plus the ``max_interval`` bound in the join
condition let it evict interval state once no future point can land in it
(and point state once no future interval can contain it) — without the
bound, interval rows would be state forever. This is exactly the
bucketized batch join's trade re-expressed in time: bound the containment
window, get bounded work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "user_id",
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    watermark: str = "1 hour",
    max_interval: str = "24 hours",
) -> DataFrame:
    """Streaming inner join of point events to the interval rows containing
    them (CLOSED [start_ts, end_ts]), per key. Both inputs are streams with
    TIMESTAMP event-time columns.

    ``max_interval`` must be an upper bound on any interval's true length:
    it rides in the join condition (point_ts <= start_ts + max_interval) so
    the engine can expire interval state — correctness is unaffected for
    intervals within the bound; longer intervals are truncated (document
    the bound where you pick it, e.g. a session cap).
    """
    p = points.withWatermark(point_ts, watermark).alias("p")
    i = intervals.withWatermark(start_ts, watermark).alias("i")
    cond = (
        (F.col(f"p.{on}") == F.col(f"i.{on}"))
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"i.{end_ts}"))
        # state bound: no point can match an interval that started more
        # than max_interval before it
        & (
            F.col(f"p.{point_ts}")
            <= F.col(f"i.{start_ts}") + F.expr(f"INTERVAL {max_interval}")
        )
    )
    i_cols = [F.col(f"i.{c}") for c in intervals.columns if c != on]
    return p.join(i, cond, "inner").select("p.*", *i_cols)
