"""Mergeable quantile sketch: integer octave-quarter histogram.

Completes the mergeable-sketch family (HLL in aggregate.py, count-min in
cms.py, Bloom in bloom.py, MinHash/SimHash in dedup.py) with the one
missing primitive: distributed quantiles.  The industry-standard answer
is t-digest/KLL; this module instead uses a DETERMINISTIC fixed-bucket
log histogram so the whole sketch is (a) expressible in pure Catalyst
(no UDF), (b) bit-reproducible across engines — the DuckDB oracle
replays the identical integer arithmetic and the driver hash-matches
the estimates — and (c) trivially mergeable: the partial is just
(group, bucket, count) rows, so union + sum IS the merge, exactly like
the reference's additive session-store merges
(internal/storage/memory/store.go:252-317).

Bucketing (engine-portable, integer-only — no float log2 ties):
for v >= 1 with bl = bit_length(v):  shift = max(bl - 3, 0),
sub = v >> shift, bucket upper bound = (sub + 1) << shift.  Every
octave splits into 4 sub-buckets, so a quantile estimate (the upper
bound of the bucket holding rank ceil(q*n)) overshoots the exact
quantile by < 25% and never undershoots — the error-bound property
test pins both sides.  Values < 1 clamp to 1 (counts, lengths,
latencies — the sketch's domain — are positive integers).

Scale shape: ONE exchange — groupBy(group, bucket) with map-side
partial aggregation collapses any input to at most
(#groups x ~4*64 buckets) rows; the quantile fold is a per-group
window over those few rows.  At 100 TB the sketch rows are the only
shuffle payload, and daily partials merge by re-aggregation without
touching raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_partials(df: DataFrame, value_col: str,
                      *group_cols: str) -> DataFrame:
    """The mergeable sketch: (group..., bucket_hi, cnt) rows.  Merging
    two sketches = union + re-aggregate (additive, order-free).
    bit_length via length(conv(v, 10, 2)) — exact in both engines
    (DuckDB twin: length(printf('%b', v)))."""
    v = F.greatest(F.col(value_col).cast("long"), F.lit(1))
    d = df.select(*group_cols, v.alias("__qv"))
    d = d.withColumn(
        "__qs",
        F.greatest(
            F.length(F.conv(F.col("__qv").cast("string"), 10, 2))
            .cast("int") - F.lit(3),
            F.lit(0),
        ),
    )
    d = d.withColumn(
        "bucket_hi",
        F.expr("shiftleft(shiftright(__qv, __qs) + 1L, __qs)"),
    )
    return (
        d.groupBy(*group_cols, "bucket_hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_partials(*sketches: DataFrame) -> DataFrame:
    """Union any number of sketches into one (the additive merge)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def quantile_estimates(partials: DataFrame, qs: tuple[float, ...],
                       *group_cols: str) -> DataFrame:
    """Per-group quantile estimates from the sketch: for each q, the
    upper bound of the bucket containing rank ceil(q * n) (1-based).
    Deterministic integer output — hash-oracle-safe."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket_hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = partials.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame(
                [(q,) for q in qs], "q double"
            )
        )
    )
    hit = qdf.where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    return (
        hit.groupBy(*group_cols, "q")
        .agg(
            F.min("bucket_hi").alias("estimate"),
            F.max("n").alias("n"),
        )
        .select(*group_cols, "q", "estimate", "n")
    )


def quantile_sketch(df: DataFrame, value_col: str,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    *group_cols: str) -> DataFrame:
    """One-shot convenience: partials -> estimates."""
    return quantile_estimates(
        quantile_partials(df, value_col, *group_cols), qs, *group_cols
    )
