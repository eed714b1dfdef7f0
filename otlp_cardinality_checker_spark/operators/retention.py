"""Cohort retention — the workhorse usage-analytics query at event scale.

Cohort = the day a user was first seen; retention cell (cohort_day,
day_offset) = how many of that cohort's users were active day_offset days
later. Three relational steps, all shuffle-friendly:

1. first-seen per user: one hash aggregation over (user_id) — map-side
   combinable, the only state is one date per user;
2. events join first-seen on user_id: a plain shuffle equi-join,
   uniformly distributed by construction (user ids), AQE-skew-safe;
3. the retention matrix: hash aggregation over (cohort_day, day_offset)
   with an exact distinct-user count per cell (swap in
   approx_count_distinct at 10^9-user scale — same plan shape).

No window functions, no per-user sorting — a 10^12-event table flows
through as two aggs and one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """(cohort_day, day_offset) -> active distinct users + cohort size."""
    day = F.to_date(F.col(ts_col))
    first_seen = events.groupBy(user_col).agg(
        F.min(day).alias("cohort_day")
    )
    cohort_sizes = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = events.join(first_seen, user_col).select(
        user_col,
        "cohort_day",
        F.datediff(day, F.col("cohort_day")).alias("day_offset"),
    )
    if max_offset is not None:
        joined = joined.where(F.col("day_offset") <= max_offset)
    cells = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct(user_col).alias("n_active")
    )
    return (
        cells.join(cohort_sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


def sequence_funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order conversion funnel: a user reaches step i only via an
    event of type steps[i] occurring STRICTLY AFTER their step-i-1 time
    (min-first-completion semantics at every stage — the standard product
    funnel, not the loose 'did all steps in any order' approximation).

    Per stage: one filtered scan + shuffle equi-join on the user id + one
    hash aggregation — no windows, no per-user event sorting, state is one
    timestamp per surviving user. len(steps) is small and fixed, so the
    whole funnel is a short chain of uniform joins at any event volume.
    """
    # each stage frame is localCheckpoint'ed: it is referenced by its own
    # count branch AND by every later stage's join chain, and ReuseExchange
    # does not fire across union branches — without materialization the
    # raw events table would be rescanned O(steps^2) times. The frames are
    # user-level (one timestamp per surviving user), so this is cheap.
    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .localCheckpoint(eager=True)
    )
    stage_frames = [reached]
    for step in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == step)
            .join(reached.select(user_col, "_t"), user_col)
            .where(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
            .localCheckpoint(eager=True)
        )
        stage_frames.append(nxt)
        reached = nxt
    out = None
    for i, (step, frame) in enumerate(zip(steps, stage_frames), start=1):
        row = frame.agg(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    first = stage_frames[0].agg(F.count(F.lit(1)).alias("_n1"))
    return out.crossJoin(F.broadcast(first)).select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            # empty funnel head => conversion 0.0, not a divide-by-zero
            # (ANSI mode makes x/0 an error, not NULL)
            F.when(
                F.col("_n1") > 0, F.col("n_users") / F.col("_n1")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("conversion"),
    )
