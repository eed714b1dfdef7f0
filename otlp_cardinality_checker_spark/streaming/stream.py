"""Structured Streaming pipeline: continuous ingest with resume + lineage.

The reference is a continuously-ingesting accumulator with monotone state and
snapshot/restore (`SURVEY.md §2.10`); the Spark-native equivalent is:

* ``readStream`` over the transcripts table (file source here; Iceberg
  streaming source on a real cluster),
* the SAME stage functions as the batch plan (parse/enrich/route are pure
  DataFrame transforms, so batch and streaming share one implementation),
* ``foreachBatch`` doing idempotent partitioned writes to the three sinks
  plus mergeable aggregate upserts, keyed by batch_id so a replayed batch
  overwrites itself (exactly-once effect on top of checkpoint replay),
* a **lineage table**: one row per (batch_id, sink) with routed-row counts
  and wall time — the per-partition/micro-stage metrics the north rule asks
  for.

Kill/resume equivalence is tested in tests/test_streaming.py: running the
stream to completion in one go, or killing it between micro-batches and
restarting from the checkpoint, must produce identical sink contents.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.enrich import enrich_turns
from ..operators.parse import parse_turns
from ..operators.route import SINK_COLUMNS, SINKS, route_turns
from ..sources.transcripts import load_dims, truth_paths

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _process_batch(
    batch_df: DataFrame,
    batch_id: int,
    role_dim: DataFrame,
    tool_dim: DataFrame,
    out_dir: str,
) -> None:
    from ..operators.sessions import snapshot_key_stats

    t0 = time.time()
    routed = route_turns(
        enrich_turns(parse_turns(batch_df, engine="sql"), role_dim, tool_dim)
    )
    routed.persist()
    lineage_rows = []
    try:
        for sink in SINKS:
            part = routed.where(F.col("sink") == sink).select(*SINK_COLUMNS[sink])
            n = part.count()
            # idempotent: partitioned by batch_id, replay overwrites itself
            (
                part.withColumn("_batch_id", F.lit(batch_id))
                .repartition(4, "conv_id")
                .write.mode("overwrite")
                .partitionBy("_batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(str(Path(out_dir) / f"sink_{sink}"))
            )
            lineage_rows.append(
                {
                    "batch_id": batch_id,
                    "sink": sink,
                    "n_rows": n,
                    "wall_sec": round(time.time() - t0, 3),
                }
            )
        # mergeable aggregate state: one PARTIAL snapshot (counts + HLL
        # sketch binaries + sample arrays) per micro-batch, keyed by
        # batch_id so a checkpoint replay overwrites itself — the Spark
        # analogue of the reference's store merge-on-insert
        # (internal/storage/memory/store.go:252-317). On a real cluster
        # this is a MERGE INTO an Iceberg state table.
        (
            snapshot_key_stats(routed)
            .withColumn("_batch_id", F.lit(batch_id))
            # deliberate single-file state write: the snapshot is O(#keys)
            # rows (tiny), and one file per batch keeps the resume path's
            # latest-batch read trivial; NOT a data-volume path
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(str(Path(out_dir) / "agg_state"))
        )
    finally:
        routed.unpersist()
    lineage_dir = Path(out_dir) / "lineage"
    lineage_dir.mkdir(parents=True, exist_ok=True)
    (lineage_dir / f"batch_{batch_id}.json").write_text(
        json.dumps(lineage_rows)
    )


def run_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    stop_after_batches: int | None = None,
) -> int:
    """Run the streaming pipeline until the source is drained (or until
    `stop_after_batches` micro-batches, to simulate a kill). Returns the
    number of micro-batches executed in this invocation."""
    src_dir = str(Path(truth_paths(sf_dir)["transcripts"]).parent / "stream_src")
    _ensure_stream_source(spark, sf_dir, src_dir)
    role_dim, tool_dim = load_dims(spark, sf_dir)
    role_dim = role_dim.cache()
    tool_dim = tool_dim.cache()

    executed = {"n": 0}

    def on_batch(df: DataFrame, batch_id: int) -> None:
        _process_batch(df, batch_id, role_dim, tool_dim, out_dir)
        executed["n"] += 1

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    query = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        while query.isActive:
            if (
                stop_after_batches is not None
                and executed["n"] >= stop_after_batches
            ):
                query.stop()
                break
            time.sleep(0.2)
        query.awaitTermination(300)
    finally:
        if query.isActive:
            query.stop()
    return executed["n"]


def _ensure_stream_source(spark: SparkSession, sf_dir: str, src_dir: str) -> None:
    """Split the transcripts fixture into multiple files => micro-batches."""
    p = Path(src_dir)
    if (p / "_SUCCESS").exists():
        return
    df = spark.read.parquet(truth_paths(sf_dir)["transcripts"])
    df.repartition(4, "conv_id").write.mode("overwrite").parquet(src_dir)


def _compaction_watermark(out_dir: str) -> int:
    mf = Path(out_dir) / "agg_state_compacted" / "_manifest.json"
    if mf.exists():
        return int(json.loads(mf.read_text())["max_batch_id"])
    return -1


def compact_state(spark: SparkSession, out_dir: str) -> int:
    """Fold all per-batch partial snapshots into ONE compacted snapshot.

    Without compaction the merge-on-read cost of :func:`current_key_stats`
    grows with the number of micro-batches ever run; compaction keeps it
    O(compacted + new batches). Replay safety: the manifest records the
    highest folded ``batch_id`` (the compaction watermark) and the read
    path ignores batch partitions at or below it, so a checkpoint replay
    that re-materializes an already-folded batch partition cannot
    double-count. Returns the new watermark. On a real cluster this is a
    MERGE INTO + snapshot-expire on the Iceberg state table.
    """
    from ..operators.sessions import merge_snapshots

    state_dir = Path(out_dir) / "agg_state"
    comp_dir = Path(out_dir) / "agg_state_compacted"
    watermark = _compaction_watermark(out_dir)
    batch_ids = sorted(
        int(p.name.split("=")[1])
        for p in state_dir.glob("_batch_id=*")
        if int(p.name.split("=")[1]) > watermark
    )
    if not batch_ids:
        return watermark
    fresh = spark.read.parquet(str(state_dir)).where(
        F.col("_batch_id") > watermark
    ).drop("_batch_id")
    parts = [fresh]
    if (comp_dir / "_manifest.json").exists():
        parts.append(spark.read.parquet(str(comp_dir / "data")))
    merged = merge_snapshots(*parts)
    tmp = comp_dir / "data_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    comp_dir.mkdir(parents=True, exist_ok=True)
    import shutil

    if (comp_dir / "data").exists():
        shutil.rmtree(comp_dir / "data")
    tmp.rename(comp_dir / "data")
    new_watermark = max(batch_ids)
    (comp_dir / "_manifest.json").write_text(
        json.dumps({"max_batch_id": new_watermark})
    )
    return new_watermark


def current_key_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """Final-merge the accumulated per-batch partial aggregate state.

    Counts sum exactly; sketches union via hll_union_agg; min-10 samples
    recombine exactly (min-10 of min-10s) — so the streaming state equals
    the batch-mode aggregate regardless of micro-batch boundaries or how
    often :func:`compact_state` ran in between. Batch partitions at or
    below the compaction watermark are excluded (replay safety).
    """
    from ..operators.sessions import estimate, merge_snapshots

    watermark = _compaction_watermark(out_dir)
    partials = (
        spark.read.parquet(str(Path(out_dir) / "agg_state"))
        .where(F.col("_batch_id") > watermark)
        .drop("_batch_id")
    )
    parts = [partials]
    comp_data = Path(out_dir) / "agg_state_compacted" / "data"
    if comp_data.exists():
        parts.append(spark.read.parquet(str(comp_data)))
    return estimate(merge_snapshots(*parts))


def read_lineage(out_dir: str):
    rows = []
    for f in sorted((Path(out_dir) / "lineage").glob("batch_*.json")):
        rows.extend(json.loads(f.read_text()))
    return rows


EVENT_SCHEMA = "event_id long, event_type string, user_id long, value double, ts timestamp"


def run_windowed_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
) -> None:
    """Event-time tumbling-window aggregate with a watermark (SURVEY §2.10
    / build-brief streaming semantics): append-mode output — a window row
    is emitted exactly once, when the watermark passes its end, and rows
    arriving later than the watermark are DROPPED from state instead of
    growing it forever. At 10^12 events this bound on state is what keeps
    the stream runnable; the trade (documented Spark semantics) is that
    too-late data is lost rather than restated."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(Path(out_dir) / "windowed"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
