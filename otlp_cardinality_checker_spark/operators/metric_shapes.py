"""Data-derived metric shape union (SURVEY §2 A10's histogram half).

The reference unions the *observed* histogram bucket bounds and
exponential-histogram scales across every data point of a metric
(`/root/reference/internal/analyzer/metrics.go:327-376`,
``extractUniqueBounds`` / ``extractUniqueScales``) and feeds the result
into ``EstimatePrometheusActiveSeries`` (`pkg/models/metric_types.go:
140-190`). Round 2 exercised the estimator only against a *synthesized*
shape dimension because the transcript domain has no nested metric data;
this module closes that gap: a deterministic nested-metric fixture is
derived from the events table (Catalyst-only, engine-portable — the
DuckDB oracle rebuilds the identical points), and the shape union is the
Spark-native aggregation the reference's per-datapoint Go loops become:

    array_sort(array_distinct(flatten(collect_list(explicit_bounds))))
    array_sort(collect_set(scale))

One hash-agg per metric — flatten+distinct runs map-side, the per-metric
state is bounded by the distinct bound/scale count (tiny by nature: bucket
layouts are configuration, not data), so the union holds at any row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOUNDS_V0 = (0.5, 1.0, 2.5, 5.0, 10.0)
BOUNDS_V1 = (1.0, 5.0, 10.0, 25.0, 50.0, 100.0)


def synthetic_metric_points(events: DataFrame) -> DataFrame:
    """Deterministic nested-metric data points from the events table.

    Every event row becomes one data point of metric ``event_type``; the
    metric's type and each point's shape derive from stable row fields
    (length / modulo — no engine-specific hash), so any engine rebuilds
    byte-identical points. Histogram points alternate between two bucket
    layouts (the union across points is then strictly larger than either
    single layout — exactly the case extractUniqueBounds exists for), and
    exponential-histogram points carry varying scales incl. non-positive.
    """
    mt = F.length("event_type") % 3
    metric_type = (
        F.when(mt == 0, F.lit("gauge"))
        .when(mt == 1, F.lit("histogram"))
        .otherwise(F.lit("exp_histogram"))
    )
    arr0 = F.array(*[F.lit(b) for b in BOUNDS_V0])
    arr1 = F.array(*[F.lit(b) for b in BOUNDS_V1])
    bounds = F.when(
        mt == 1,
        F.when(F.col("user_id") % 2 == 0, arr0).otherwise(arr1),
    ).otherwise(F.array().cast("array<double>"))
    scale = F.when(mt == 2, (F.col("event_id") % 6 - 2).cast("int"))
    return events.select(
        F.col("event_type").alias("metric"),
        metric_type.alias("metric_type"),
        bounds.alias("explicit_bounds"),
        scale.alias("scale"),
        "user_id",
    )


def observed_metric_shapes(
    points: DataFrame, max_exp_hist_buckets: int = 160
) -> DataFrame:
    """Per-metric union of observed bounds/scales + the Prometheus series
    multiplier that shape implies (`metrics.go:327-376` feeding
    `metric_types.go:140-190`).
    """
    agg = points.groupBy("metric").agg(
        F.any_value("metric_type").alias("metric_type"),
        F.count(F.lit(1)).alias("n_points"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("explicit_bounds")))
        ).alias("bounds"),
        # collect_set skips NULLs (gauge/histogram points have no scale)
        F.array_sort(F.collect_set("scale")).alias("scales"),
    )
    exp_buckets = (
        F.when(
            (F.size("scales") == 0) | (F.array_max("scales") <= 0), F.lit(1)
        )
        .otherwise(
            F.least(
                F.pow(F.lit(2.0), F.array_max("scales") + 1).cast("long"),
                F.lit(max_exp_hist_buckets).cast("long"),
            )
        )
        .cast("long")
    )
    mult = (
        F.when(
            F.col("metric_type") == "histogram", F.size("bounds") + 1 + 2
        )
        .when(F.col("metric_type") == "exp_histogram", exp_buckets + 2)
        .otherwise(F.lit(1))
        .cast("long")
    )
    return agg.select(
        "metric",
        "metric_type",
        "n_points",
        F.size("bounds").alias("n_bounds"),
        F.array_join("bounds", ",").alias("bounds_csv"),
        F.array_join("scales", ",").alias("scales_csv"),
        mult.alias("prom_multiplier"),
    )


def series_estimate_observed(events: DataFrame) -> DataFrame:
    """End-to-end A8-from-A10: active series per metric (distinct users)
    x the multiplier implied by the OBSERVED shape union — the estimator
    fed from data, not a synthesized dimension. The shape side is one row
    per metric (broadcast); the active-series side is an aggregate."""
    points = synthetic_metric_points(events)
    shapes = observed_metric_shapes(points)
    active = points.groupBy("metric").agg(
        F.count_distinct("user_id").alias("active_series"),
        F.count(F.lit(1)).alias("sample_count"),
    )
    return active.join(F.broadcast(shapes), "metric").select(
        "metric",
        "metric_type",
        "active_series",
        "sample_count",
        "n_bounds",
        "prom_multiplier",
        (F.col("active_series") * F.col("prom_multiplier")).alias(
            "prometheus_series"
        ),
    )
