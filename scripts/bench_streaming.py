"""Streaming-path throughput: the foreachBatch pipeline end to end.

Measures `streaming.stream.run_stream` (readStream -> per-batch parse +
enrich + route + per-sink appends + mergeable aggregate-state snapshot +
lineage) over the sf-dir transcripts split into micro-batches, then the
merge-on-read cost of `current_key_stats` and a `compact_state` fold.

This is deliberately heavier than the batch pipeline: every micro-batch
pays the full stage chain plus state persistence — the number here is the
incremental-ingest figure, not the batch figure (see BENCH.md).

Usage: python scripts/bench_streaming.py [--sf-dir ...] [--cores 32]
       [--files-per-trigger 1]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=1)
    args = ap.parse_args()

    from otlp_cardinality_checker_spark.datagen import n_turns_for_sf
    from otlp_cardinality_checker_spark.session import get_spark
    from otlp_cardinality_checker_spark.streaming.stream import (
        compact_state,
        current_key_stats,
        run_stream,
    )

    spark = get_spark(app_name="bench-streaming", cores=args.cores)
    n_turns = n_turns_for_sf(args.sf_dir)
    work = tempfile.mkdtemp(prefix="bench_stream_", dir="/dev/shm")
    try:
        t0 = time.time()
        n_batches = run_stream(
            spark,
            args.sf_dir,
            f"{work}/out",
            f"{work}/ckpt",
            max_files_per_trigger=args.files_per_trigger,
        )
        ingest_sec = time.time() - t0

        t0 = time.time()
        n_keys = current_key_stats(spark, f"{work}/out").count()
        merge_read_sec = time.time() - t0

        t0 = time.time()
        wm = compact_state(spark, f"{work}/out")
        compact_sec = time.time() - t0

        t0 = time.time()
        n_keys2 = current_key_stats(spark, f"{work}/out").count()
        merge_read_compacted_sec = time.time() - t0
        assert n_keys2 == n_keys

        print(
            json.dumps(
                {
                    "metric": "streaming_turns_per_sec",
                    "n_turns": n_turns,
                    "n_micro_batches": n_batches,
                    "cores": args.cores,
                    "ingest_sec": round(ingest_sec, 1),
                    "turns_per_sec": round(n_turns / ingest_sec, 1),
                    "state_merge_read_sec": round(merge_read_sec, 1),
                    "compact_sec": round(compact_sec, 1),
                    "state_merge_read_compacted_sec": round(
                        merge_read_compacted_sec, 1
                    ),
                    "compaction_watermark": wm,
                    "n_state_keys": n_keys,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
