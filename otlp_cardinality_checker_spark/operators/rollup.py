"""Hierarchical time rollup (hypertable continuous-aggregate pattern).

The TimescaleDB/Druid idea, Spark-first: aggregate the raw stream ONCE
into fine-grained mergeable partials (15-min buckets here), then derive
every coarser resolution (1 h, 6 h, 1 d, ...) by MERGING partials —
count→sum, sum→sum, min→min, max→max — never rescanning the fact table.
At 10^12 events the raw scan happens once; each extra resolution costs an
aggregation over the (tiny) partial table. This is the same
mergeable-partial design as the pipeline's HLL key stats, applied to the
time axis; every aggregate here is algebraic, so partial-merge equals
direct aggregation EXACTLY (the oracle asserts it per resolution).

Correctness requirement: coarser bucket widths must be integer multiples
of the base width, so every base bucket nests inside exactly one coarse
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(ts_col: str, seconds: int):
    # floor, not cast: cast truncates toward zero, which would double the
    # width of the bucket straddling the 1970 epoch for pre-epoch data and
    # diverge from the oracle's floor(epoch/N)
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / seconds).cast("long")
        * seconds
    )


def time_partials(
    events: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    base_seconds: int = 900,
) -> DataFrame:
    """One raw-table scan -> base-resolution mergeable partials."""
    return events.groupBy(
        _bucket(ts_col, base_seconds).alias("bucket"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def rollup_to(
    partials: DataFrame,
    group_cols: list[str],
    resolution_seconds: int,
    base_seconds: int = 900,
) -> DataFrame:
    """Derive a coarser resolution purely by merging partials."""
    if resolution_seconds % base_seconds != 0:
        raise ValueError(
            f"resolution {resolution_seconds}s must be a multiple of the "
            f"base {base_seconds}s"
        )
    return partials.groupBy(
        _bucket("bucket", resolution_seconds).alias("bucket"), *group_cols
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def rollup_hierarchy(
    events: DataFrame,
    group_cols: list[str],
    resolutions: dict[str, int],
    ts_col: str = "ts",
    value_col: str = "value",
    base_seconds: int = 900,
) -> DataFrame:
    """All resolutions stacked into one frame, every one derived from the
    SAME single-scan partial table. The partials are materialized once
    (localCheckpoint — ReuseExchange does NOT fire across the union
    branches, verified by plan inspection), so the raw table is scanned
    exactly once no matter how many resolutions are requested."""
    partials = time_partials(
        events, group_cols, ts_col, value_col, base_seconds
    )
    if len(resolutions) > 1:
        partials = partials.localCheckpoint(eager=True)
    out = None
    for label, secs in sorted(resolutions.items(), key=lambda kv: kv[1]):
        r = rollup_to(partials, group_cols, secs, base_seconds).select(
            F.lit(label).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            *group_cols,
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
            F.round("min_value", 2).alias("min_value"),
            F.round("max_value", 2).alias("max_value"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def hopping_window_stats(
    events: DataFrame,
    size_seconds: int = 3600,
    slide_seconds: int = 900,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hopping (sliding) event-time window aggregate: every event lands in
    size/slide overlapping windows (4 here), the smoothing shape behind
    rate dashboards and trailing-hour SLO panels. Expressed as the native
    Structured-Streaming-compatible `F.window(ts, size, slide)` — the
    SAME expression runs under readStream with a watermark, so the batch
    oracle here certifies the streaming plan too (the repo's standard
    batch-twin pattern).

    Requires size % slide == 0 (Spark assigns exactly size/slide windows
    per event; ragged overlaps silently change semantics).

    Scale shape: the window expression expands each row to size/slide
    (window, row) pairs BEFORE the hash aggregation — a constant fan-out
    absorbed by map-side partial aggregation, so the exchange carries only
    (window, key) partial rows, never the expanded events. One shuffle.
    """
    if size_seconds % slide_seconds != 0:
        raise ValueError(
            f"size ({size_seconds}s) must be a multiple of slide "
            f"({slide_seconds}s)"
        )
    w = F.window(
        ts_col, f"{size_seconds} seconds", f"{slide_seconds} seconds"
    )
    return (
        events.groupBy(w.alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_events",
            "total_value",
        )
    )


def hopping_distinct_users(
    events: DataFrame,
    size_seconds: int = 21600,
    slide_seconds: int = 3600,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Trailing-window ACTIVE-USER counts: exact distinct users per
    hopping window — the DAU/WAU-style engagement panel at event-time
    grain. The count-distinct makes this the expensive sibling of
    `hopping_window_stats`: rows cannot pre-aggregate by (window, user)
    count alone, so the exchange carries (window, user) DISTINCT grain —
    still bounded by windows x active users, never raw events (the
    map-side distinct combine absorbs duplicates).

    Swap to `F.hll_sketch_agg` for the approximate/mergeable form at
    extreme user cardinality (then rows-only vs DuckDB, like
    `key_stats_hll`).

    Output grain: one row per window — ``(window_start, n_events,
    n_users)``.
    """
    if size_seconds % slide_seconds != 0:
        raise ValueError("size must be a multiple of slide")
    w = F.window(
        ts_col, f"{size_seconds} seconds", f"{slide_seconds} seconds"
    )
    return (
        events.select(w.alias("w"), F.col(user_col).alias("u"))
        .groupBy(F.col("w.start").alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("u").alias("n_users"),
        )
    )
