"""Volume-spike detection: windowed counts vs a trailing z-score baseline.

The reference alerts on cardinality thresholds (static bars,
`internal/report/generator.go`); a production log pipeline also needs the
*time-domain* alarm — "this service's error volume just jumped 5 sigma
above its own recent history".  This operator is that alarm, fully
declarative:

1. event-time tumbling windows per group: one hash aggregation over
   ``(group, window)`` — map-side combinable, the only shuffle.
2. per-group trailing baseline: mean/stddev of the previous ``trailing``
   windows (a row-frame window function partitioned by the group — state
   bounded by ``trailing``, never by history length).
3. z-score + flag.  The z is defined only when the baseline frame is FULL
   (``trailing`` prior windows exist) and has positive variance — a
   half-filled baseline raising alarms is how on-call gets paged at 3am
   on day one.

Scale shape: the window aggregation shuffles once on the (bounded-domain)
group key x time bucket; the window function re-uses that partitioning.
Gaps (empty windows) produce no row and therefore do not enter the
baseline — matching the oracle exactly; densify upstream with a calendar
join if zero-filled baselines are wanted.

Streaming twin: stage 1 is exactly the watermarked windowed count the
streaming module already runs (`streaming/stream.py` windowed aggs); the
baseline stage then runs as a batch query over the window table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def volume_spikes(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    trailing: int = 6,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-(group, window) counts with trailing-baseline z-scores.

    Returns ``(group, window_start, count, baseline_n, baseline_mean,
    baseline_std, z, is_spike)`` — one row per non-empty window; z and
    is_spike are NULL until ``trailing`` prior windows exist."""
    if trailing < 2:
        raise ValueError(f"trailing must be >= 2, got {trailing}")
    counts = (
        df.groupBy(
            F.col(group_col).alias("group"),
            F.window(F.col(ts_col), window_duration).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select("group", F.col("w.start").alias("window_start"), "count")
    )
    frame = (
        Window.partitionBy("group")
        .orderBy("window_start")
        .rowsBetween(-trailing, -1)
    )
    with_base = counts.select(
        "group",
        "window_start",
        "count",
        F.count(F.lit(1)).over(frame).alias("baseline_n"),
        F.avg("count").over(frame).alias("_mean"),
        F.stddev_samp("count").over(frame).alias("_std"),
    )
    full = F.col("baseline_n") == trailing
    usable = full & (F.col("_std") > 0)
    z = (F.col("count") - F.col("_mean")) / F.col("_std")
    return with_base.select(
        "group",
        "window_start",
        "count",
        "baseline_n",
        F.when(full, F.round("_mean", 6)).alias("baseline_mean"),
        F.when(full, F.round("_std", 6)).alias("baseline_std"),
        F.when(usable, F.round(z, 6)).alias("z"),
        F.when(usable, (z >= z_threshold).cast("int")).alias("is_spike"),
    ).orderBy("group", "window_start")
