"""Route stage: classify enriched turns by signal class and fan out to sinks.

Reference analogue: the receiver's dispatch-by-signal-type into per-signal
stores (`/root/reference/internal/receiver/http.go:171-173`,
`internal/storage/memory/store.go:17-33`). Signal classes follow the north
rule (chat / tool-call / error); predicates are exhaustive and disjoint so
per-sink routed-row counts must sum to the input row count (FIXTURES.md §4).

At scale the fan-out writes are bucketed on ``conv_id`` so downstream
per-conversation reads and joins are co-located without a shuffle.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINKS = ("tool_call", "error", "chat")

SINK_COLUMNS = {
    "chat": ("conv_id", "turn_idx", "role", "role_class", "severity", "template", "text", "ts"),
    "error": ("conv_id", "turn_idx", "role", "role_class", "severity", "template", "text", "ts"),
    "tool_call": (
        "conv_id", "turn_idx", "role", "role_class", "severity", "template",
        "text", "ts", "tool", "tool_family", "is_privileged",
    ),
}


def sink_expr():
    """Single Catalyst expression: which sink does a row belong to."""
    return (
        F.when(F.col("tool").isNotNull(), F.lit("tool_call"))
        .when(F.col("severity") == "ERROR", F.lit("error"))
        .otherwise(F.lit("chat"))
    )


def route_turns(enriched: DataFrame) -> DataFrame:
    """Append the `sink` column (one pass; no data movement)."""
    return enriched.withColumn("sink", sink_expr())


def split_sinks(routed: DataFrame) -> dict[str, DataFrame]:
    """One filtered projection per sink (Catalyst pushes the filter down)."""
    return {
        name: routed.where(F.col("sink") == name).select(*SINK_COLUMNS[name])
        for name in SINKS
    }


def write_sinks(
    routed: DataFrame,
    out_dir: str,
    n_buckets: int | None = 32,
    mode: str = "overwrite",
    table_format: str = "auto",
    iceberg_namespace: str = "sinks",
) -> dict[str, str]:
    """Fan out to per-sink tables, co-located by conv_id.

    ``table_format="auto"`` writes Iceberg tables when an Iceberg catalog
    is on the classpath (gated exactly like the loader,
    `sources/transcripts._iceberg_available`) — there the bucketing is the
    ``bucket(n, conv_id)`` partition transform and fan-out idempotence is
    snapshot-based. This container has no Iceberg runtime, so the fallback
    is parquet + an explicit ``repartition(n, conv_id)``, which models the
    same co-location property. Pass ``n_buckets=None`` when the input is
    already conv_id-clustered.

    Returns {sink_name: location}: parquet paths under ``out_dir`` in
    parquet mode, catalog-qualified table identifiers
    (``<namespace>.sink_<name>``) in Iceberg mode — callers must treat the
    values as read targets, not assume filesystem paths.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.transcripts import _iceberg_available

    use_iceberg = table_format == "iceberg" or (
        table_format == "auto" and _iceberg_available(routed.sparkSession)
    )
    sinks = split_sinks(routed)
    if use_iceberg:  # pragma: no cover - no Iceberg jar in container
        locations = {
            name: f"{iceberg_namespace}.sink_{name}" for name in sinks
        }
        routed.sparkSession.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {iceberg_namespace}"
        )
    else:
        locations = {name: str(Path(out_dir) / f"sink_{name}") for name in sinks}

    def _write(name: str) -> None:
        df = sinks[name]
        if use_iceberg:  # pragma: no cover - no Iceberg jar in container
            writer = df.writeTo(locations[name]).partitionedBy(
                F.bucket(n_buckets or 32, F.col("conv_id"))
            )
            exists = df.sparkSession.catalog.tableExists(locations[name])
            if mode == "append" and exists:
                writer.append()
            else:
                writer.createOrReplace()
            return
        if n_buckets is not None:
            df = df.repartition(n_buckets, "conv_id")
        df.write.mode(mode).parquet(locations[name])

    # the three writes are independent jobs; submit concurrently so the
    # scheduler keeps all cores busy across them
    with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
        for f in [pool.submit(_write, n) for n in sinks]:
            f.result()
    return locations


def export_sorted(
    df: DataFrame,
    path: str,
    range_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    n_files: int = 32,
    mode: str = "overwrite",
) -> str:
    """Layout-aware export: range-partitioned + sorted parquet.

    At 100 TB the difference between a prunable table and a full-scan
    table is the physical layout: `repartitionByRange` gives each output
    file a DISJOINT key range and `sortWithinPartitions` orders rows
    inside it, so parquet writes tight per-file/per-row-group min-max
    statistics and a downstream `WHERE conv_id = X` touches ONE file
    instead of all of them (zone-map pruning). This is the "cluster by"
    every warehouse offers, expressed with the public DataFrame API —
    on Iceberg this is the sort-order table property.

    Range partitioning samples the key distribution, so file sizes stay
    balanced even when the key space is skewed.
    """
    cols = [F.col(c) for c in range_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
    return path
