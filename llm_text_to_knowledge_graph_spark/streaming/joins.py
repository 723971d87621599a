"""Stream-stream event-time interval joins.

The missing piece between the file-source extraction stream and the
stateful/windowed operators: correlating TWO unbounded inputs — e.g.
freshly crawled pages with an out-of-band annotation/metadata feed that
arrives on its own schedule — without ever materializing either side.

Spark's stream-stream join buffers both sides in state; unbounded state
is the 100-TB killer, so the join is only well-posed when BOTH sides are
watermarked and the join condition carries an event-time bound. With
those two constraints the state manager can evict: a buffered left row
is dropped once the right-side watermark passes ``left_ts + max_delay``,
and vice versa — state is bounded by (delay + watermark) × arrival rate,
independent of stream length.

``interval_join_streams`` works unchanged on BATCH DataFrames
(``withWatermark`` is a no-op there), which is how the driver query and
the DuckDB oracle pin the join semantics the streaming path executes —
same one-code-path principle as foreachBatch reusing batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "url",
    left_ts: str = "warc_ts",
    right_ts: str = "ann_ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events landing within ``[left_ts, left_ts +
    max_delay]`` of each left row sharing ``key``.

    Both sides get the same ``watermark`` (the lateness tolerance — how
    far behind the fastest-seen event time a row may arrive and still
    join); ``max_delay`` is the SEMANTIC window (how long after the left
    event a right event still counts). The two are independent knobs and
    both bound the state.

    ``how``: ``inner`` or ``left_outer`` (unmatched left rows emit with
    null right columns once the watermark guarantees no match can still
    arrive — so outer results trail the watermark by construction).

    Output columns: all left columns, then right columns except ``key``
    (collisions with left names get a ``right_`` prefix).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l.join(r, cond, how)
    out_cols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    for c in right.columns:
        if c == key:
            continue
        alias = c if c not in left.columns else f"right_{c}"
        out_cols.append(F.col(f"r.{c}").alias(alias))
    return joined.select(*out_cols)
