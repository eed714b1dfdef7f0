"""As-of (merge_asof-style) join — an operator Spark's DataFrame API lacks.

Semantics: each fact row is enriched with the single dim row sharing its
key whose effective timestamp is the LATEST one <= the fact's timestamp
(backward as-of) — the versioned-config / rate-table / SCD2 enrichment
every event pipeline needs. DuckDB ships this natively as ``ASOF JOIN``
(which the oracle uses); pandas as ``merge_asof``.

Spark-first construction, no UDF and no window:

1. broadcast range join: facts ⋈ dim on key equality + ``eff_ts <= ts``.
   Version-history dims (configs, rates, schema versions) are small by
   nature, so the dim broadcasts; each fact row fans out to its <=N
   candidate versions, bounded by the key's version count — never a
   cross join over the fact table.
2. winner per fact via ``max_by(payload_struct, eff_ts)`` in one hash
   aggregation — map-side combinable, no per-key window, no sort, so a
   hot key (all facts sharing one config key) costs nothing extra.

For a BIG dim (say per-user history at 10^9 users) the same two steps
hold with the broadcast dropped: the range join becomes a shuffle hash
join on the key and AQE handles skew — the aggregation shape is unchanged.

A fact with no version at or before its timestamp keeps its row with NULL
payload (left semantics), exactly like ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    key_cols: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: fact rows matched to every
    interval with ``start <= ts < end`` — the second classic join Spark's
    API lacks (maintenance windows, incident ranges, promo periods).

    A naive inequality join is a cross join with a filter — O(facts x
    intervals). The scalable construction buckets time instead:

    1. each interval EXPLODES to the time buckets it overlaps (an interval
       of length L produces ceil(L/bucket)+1 rows — bounded, tiny for
       window-like dims);
    2. each fact computes its single bucket;
    3. plain shuffle EQUI-join on (bucket [, keys]) — partitioned,
       AQE-skew-handled, prunable — then the exact containment predicate
       filters within the bucket match.

    A (fact, interval) pair meets in exactly ONE bucket (the fact's), so
    no post-join dedup is needed. Inner semantics: unmatched facts drop.
    """
    keys = key_cols or []
    ivl = intervals.alias("_ivl_d")
    f = facts.alias("_ivl_f")
    b = F.lit(bucket_seconds)
    start_b = (F.unix_timestamp(F.col(f"_ivl_d.{start_col}")) / b).cast("long")
    end_b = (F.unix_timestamp(F.col(f"_ivl_d.{end_col}")) / b).cast("long")
    ivl_b = ivl.withColumn("_bucket", F.explode(F.sequence(start_b, end_b)))
    f_b = f.withColumn(
        "_bucket",
        (F.unix_timestamp(F.col(f"_ivl_f.{fact_ts}")) / b).cast("long"),
    )
    cond = f_b["_bucket"] == ivl_b["_bucket"]
    for k in keys:
        cond = cond & (F.col(f"_ivl_f.{k}") == F.col(f"_ivl_d.{k}"))
    contained = (F.col(f"_ivl_d.{start_col}") <= F.col(f"_ivl_f.{fact_ts}")) & (
        F.col(f"_ivl_f.{fact_ts}") < F.col(f"_ivl_d.{end_col}")
    )
    ivl_payload = [
        c for c in intervals.columns if c not in set(keys)
    ]
    return (
        f_b.join(ivl_b, cond, "inner")
        .where(contained)
        .select(
            *[F.col(f"_ivl_f.{c}") for c in facts.columns],
            *[F.col(f"_ivl_d.{c}") for c in ivl_payload],
        )
    )


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    fact_id: str,
    fact_ts: str = "ts",
    dim_ts: str = "eff_ts",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Backward as-of join: latest dim row with dim_ts <= fact_ts per key.

    ``fact_id`` must uniquely identify fact rows (the aggregation key).
    Returns all fact columns plus the dim's payload columns (NULL when no
    version precedes the fact). (key, dim_ts) must be unique in ``dim`` —
    the standard version-history invariant — which makes the argmax
    deterministic without a tie-break.
    """
    payload_cols = [
        c for c in dim.columns if c not in set(key_cols) | {dim_ts}
    ]
    # alias both sides: a dim DERIVED from the fact table (e.g. a config
    # synthesized from the events' own time range) is a self-join lineage,
    # and unqualified column refs would be ambiguous
    f = facts.alias("_asof_f")
    d = dim.alias("_asof_d")
    if broadcast_dim:
        d = F.broadcast(d)
    fc = lambda c: F.col(f"_asof_f.{c}")  # noqa: E731
    dc = lambda c: F.col(f"_asof_d.{c}")  # noqa: E731
    cond = dc(dim_ts) <= fc(fact_ts)
    for k in key_cols:
        cond = cond & (fc(k) == dc(k))
    joined = f.join(d, cond, "left").select(
        *[fc(c) for c in facts.columns],
        F.struct(dc(dim_ts), *[dc(c) for c in payload_cols]).alias("_cand"),
        dc(dim_ts).alias("_eff"),
    )
    other_fact_cols = [c for c in facts.columns if c != fact_id]
    won = joined.groupBy(fact_id).agg(
        # fact columns are constant within a fact_id group (the fan-out
        # only multiplies dim candidates), so any_value is deterministic
        *[F.any_value(c).alias(c) for c in other_fact_cols],
        F.max_by("_cand", "_eff").alias("_win"),
    )
    return won.select(
        *facts.columns,
        *[F.col(f"_win.{c}").alias(c) for c in payload_cols],
    )
