"""Curriculum staging and length-bucket packing audits.

Training pipelines order data by difficulty (curriculum learning) and
group sequences by length (padding-efficient batching). Both reduce to
exact integer arithmetic over a difficulty/length score, which keeps
them DuckDB-oracle-checkable:

* ``curriculum_stages`` assigns every document to one of ``n_stages``
  difficulty stages by its exact cumulative rank share — ties (equal
  scores) always share a stage, so the assignment is a pure function of
  the score distribution, independent of partitioning or row order.
* ``length_buckets`` audits a fixed bucket-boundary scheme: how many
  documents land in each padding bucket, and how many pad tokens the
  scheme wastes.

Scale shapes (both): the only full-data exchange is a map-side-combined
hash aggregation to the SCORE grain (bounded by the number of distinct
integer scores — thousands, not rows); everything after operates on that
tiny frame via broadcast joins. No unpartitioned windows, no UDFs, no
driver-side loops over data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def whitespace_tokens(col: str = "text") -> Column:
    """Whitespace token count — the portable integer difficulty/length
    score the mixing/packing/budget operators already share."""
    t = F.trim(F.coalesce(F.col(col), F.lit("")))
    return (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )


def curriculum_stages(
    docs: DataFrame,
    n_stages: int = 4,
    id_col: str = "doc_id",
    score: Column | None = None,
) -> DataFrame:
    """Exact difficulty-stage assignment for curriculum training.

    Every document gets ``stage = ceil(c(s) * n_stages / n)`` where
    ``c(s)`` is the count of documents whose score is <= its score ``s``
    and ``n`` is the corpus size — i.e. the stage its cumulative rank
    share falls into, computed with integer arithmetic only (never a
    float quantile), so the result is bit-identical across engines and
    invariant under partitioning. Equal scores always share a stage;
    stage sizes are near-equal except where ties straddle a boundary
    (the honest behavior — a tie cannot be split deterministically
    without an arbitrary secondary key).

    Output grain: one row per document — ``(id_col, difficulty, stage,
    stage_size)``.

    Scale shape: ONE exchange (groupBy the integer score — distinct
    token counts, thousands at most); the cumulative counts come from a
    broadcast triangular self-join of that tiny frame (m^2 comparisons
    on m ~ thousands, all map-side); documents then broadcast-join the
    score->stage map — document rows are never shuffled.
    """
    if n_stages <= 0:
        raise ValueError(f"n_stages must be positive, got {n_stages}")
    s = (score if score is not None else whitespace_tokens()).alias(
        "difficulty"
    )
    scored = docs.select(F.col(id_col), s)
    # localCheckpoint: three plan branches consume the score-grain frame
    # (cum left, shifted right, total) and ReuseExchange does not bridge
    # them — without it each branch re-runs the FULL document scan (the
    # unigram_cross_entropy idiom; the checkpointed frame is score-grain,
    # thousands of rows)
    grain = (
        scored.groupBy("difficulty")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=True)
    )
    total = F.broadcast(grain.agg(F.sum("_cnt").alias("_n")))
    lower = grain.select(
        F.col("difficulty").alias("_d2"), F.col("_cnt").alias("_c2")
    )
    cum = (
        grain.join(
            F.broadcast(lower), F.col("_d2") <= F.col("difficulty")
        )
        .groupBy("difficulty", "_cnt")
        .agg(F.sum("_c2").alias("_cum"))
    )
    stages = cum.crossJoin(total).select(
        "difficulty",
        "_cnt",
        # ceil(cum * k / n) via pure integer arithmetic (div, not /: no
        # float anywhere near a stage boundary)
        F.expr(
            f"(_cum * {int(n_stages)} + _n - 1) div _n"
        ).alias("stage"),
    )
    sizes = stages.groupBy("stage").agg(
        F.sum("_cnt").alias("stage_size")
    )
    stage_map = F.broadcast(
        stages.join(F.broadcast(sizes), "stage").select(
            "difficulty", "stage", "stage_size"
        )
    )
    return scored.join(stage_map, "difficulty").select(
        id_col, "difficulty", "stage", "stage_size"
    )


def length_buckets(
    docs: DataFrame,
    boundaries: list[int] = (128, 256, 512, 1024),
    score: Column | None = None,
) -> DataFrame:
    """Padding-efficiency audit for length-grouped batching.

    Each document is charged to the smallest bucket boundary that holds
    its token count (documents longer than the largest boundary land in
    the top bucket as TRUNCATED — their billed length is the cap). Per
    bucket the audit reports document/token mass, the pad tokens the
    scheme wastes (``cap * n_docs - billed_tokens``), the waste share,
    and the truncation count — the numbers that pick bucket boundaries
    before a training run.

    Output grain: one row per bucket (at most ``len(boundaries)``).

    Scale shape: a pure scan projection (CASE over the score) into ONE
    map-side-combined aggregation keyed by the bucket cap — the single
    exchange carries ``len(boundaries)`` partial rows per task.
    """
    caps = sorted(set(int(b) for b in boundaries))
    if not caps or caps[0] <= 0:
        raise ValueError(f"boundaries must be positive ints, got {boundaries}")
    s = score if score is not None else whitespace_tokens()
    bucket = F.lit(caps[-1])
    for cap in reversed(caps):
        bucket = F.when(s <= cap, F.lit(cap)).otherwise(bucket)
    billed = F.least(s, F.lit(caps[-1]))
    truncated = (s > caps[-1]).cast("long")
    agg = (
        docs.select(
            bucket.alias("bucket_cap"),
            s.alias("_ntok"),
            billed.alias("_billed"),
            truncated.alias("_trunc"),
        )
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.sum("_billed").alias("billed_tokens"),
            F.sum("_trunc").alias("n_truncated"),
        )
    )
    padded = F.col("bucket_cap") * F.col("n_docs")
    return agg.select(
        "bucket_cap",
        "n_docs",
        "n_tokens",
        "n_truncated",
        (padded - F.col("billed_tokens")).alias("pad_tokens"),
        F.round(
            (padded - F.col("billed_tokens")) / padded, 6
        ).alias("waste_share"),
    )
