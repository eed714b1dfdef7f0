"""Endpoint-shaped read queries: the reference's per-entity REST drill-downs
re-expressed as whole-table DataFrame queries.

* :func:`service_overview` — `/services/{name}/overview`
  (`/root/reference/internal/api/server.go:972-984`,
  `internal/storage/memory/store.go:588-618`): per service, the entity
  counts the UI's service page shows (the reference returns
  MetricCount/SpanCount/LogCount = distinct entities per signal; the
  transcript-domain analogue is distinct tools / templates / attribute
  keys plus per-sink turn volume). Parameterized-by-name in the reference;
  a single grouped pass over every service here — the endpoint for one
  service is a `WHERE service = X` over this result.
* :func:`attribute_services` — `/attributes/{key}/services`
  (`server.go:1250-1340`): which services carry attribute key K, per
  signal type, with occurrence counts, count-descending.
* :func:`pattern_detail` — `/logs/patterns/{severity}/{template}`
  (`server.go:877-954`): single-template drill-down — count for the
  (template, severity), that severity's total across ALL templates (the
  denominator the endpoint computes for its percentage), the example
  body, and the services carrying the pair.

All three are one scan + hash-agg shapes (broadcast-friendly, no windows
over raw rows) — they inherit the pipeline's partitioning and add no new
shuffle beyond their own groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attrs_with_service(routed: DataFrame) -> DataFrame:
    """Long-form attribute rows carrying the resolved service."""
    from .aggregate import exploded_attrs

    return exploded_attrs(
        routed, cols=("sink", "service", "conv_id", "turn_idx")
    )


def service_overview(routed: DataFrame) -> DataFrame:
    """Per-service rollup across sinks (`store.go:588-618`).

    One grouped pass over turns for the per-sink volumes and distinct
    entity counts, plus one over exploded attributes for the key count,
    joined on service (both sides are per-service aggregates — tiny — so
    the join broadcasts under AQE).
    """
    turn_side = routed.groupBy("service").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("sink") == "tool_call").cast("long")).alias(
            "n_tool_call_turns"
        ),
        F.sum((F.col("sink") == "error").cast("long")).alias("n_error_turns"),
        F.sum((F.col("sink") == "chat").cast("long")).alias("n_chat_turns"),
        F.count_distinct("tool").alias("n_tools"),
        F.count_distinct("template").alias("n_templates"),
        F.count_distinct("conv_id").alias("n_conversations"),
    )
    key_side = (
        attrs_with_service(routed)
        .groupBy("service")
        .agg(F.count_distinct("key").alias("n_attr_keys"))
    )
    return turn_side.join(key_side, "service", "left").withColumn(
        "n_attr_keys", F.coalesce("n_attr_keys", F.lit(0))
    )


def attribute_services(routed: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """key -> services carrying it, per signal type, with counts
    (`server.go:1250-1340`; its sort-by-count-desc is presentation —
    the result set is the correlation itself)."""
    attrs = attrs_with_service(routed)
    if keys is not None:
        attrs = attrs.where(F.col("key").isin(keys))
    return attrs.groupBy("key", "service", "sink").agg(
        F.count(F.lit(1)).alias("count"),
        F.count_distinct("value").alias("n_values"),
    )


def logs_by_service(routed: DataFrame, limit: int | None = None, offset: int = 0) -> DataFrame:
    """Service-based log navigation (`/logs/by-service`,
    `server.go:757-803`): (service, severity, sample_count) ordered
    service asc, severity asc, paginated — the endpoint's SQLite query
    shape. The row_number pagination runs over aggregated (service,
    severity) rows: #services x #severities, never raw turns."""
    from .aggregate import global_top_k

    agg = routed.groupBy("service", "severity").agg(
        F.count(F.lit(1)).alias("sample_count")
    )
    if limit is None:
        return agg
    # two-stage global rank (see aggregate.global_top_k): the final
    # window sorts <= 16*(offset+limit) salted survivors, not the whole
    # service x severity grain; (service, severity) is a total order
    return (
        global_top_k(
            agg, (F.asc("service"), F.asc("severity")),
            k=offset + limit, salt_col="service", rank_name="rn",
        )
        .where(F.col("rn") > offset)
        .drop("rn")
    )


def service_attributes(routed: DataFrame) -> DataFrame:
    """Per-service attribute-key set (`/services/{name}/attributes`,
    `server.go:987-1060`): which keys appear on any of the service's
    turns. Whole-table form — the endpoint for one service is a WHERE
    over this; keys come back sorted, as the endpoint returns them."""
    return (
        attrs_with_service(routed)
        .groupBy("service")
        .agg(
            F.count_distinct("key").alias("n_keys"),
            F.array_join(F.sort_array(F.collect_set("key")), "|").alias(
                "attribute_keys"
            ),
        )
    )


def pattern_detail(routed: DataFrame) -> DataFrame:
    """Per-(template, severity) drill-down (`server.go:877-954`).

    `severity_total` is the denominator the endpoint computes (total log
    count across all patterns for that severity); the window runs over
    already-aggregated (template, severity) rows — #templates, not raw
    turns — so it stays cheap at any scale.
    """
    from pyspark.sql import Window

    per = routed.groupBy("template", "severity").agg(
        F.count(F.lit(1)).alias("count"),
        F.min_by(
            "text",
            F.concat_ws(
                ":", "conv_id", F.lpad(F.col("turn_idx").cast("string"), 4, "0")
            ),
        ).alias("example"),
        F.array_join(F.sort_array(F.collect_set("service")), "|").alias(
            "services"
        ),
        F.count_distinct("service").alias("n_services"),
    )
    sev_w = Window.partitionBy("severity")
    return per.select(
        "template",
        "severity",
        "count",
        F.sum("count").over(sev_w).alias("severity_total"),
        F.round(F.col("count") * 100.0 / F.sum("count").over(sev_w), 4).alias(
            "pct_of_severity"
        ),
        "example",
        "n_services",
        "services",
    )
