"""100x-scale soak: the flagship pipeline at 50M turns on a FIXED heap.

The bounded-memory designs (dedup-first samples, salted HLL partials,
two-stage top-k) are plan-audited and tested at 8M turns; this script is
the empirical leg: one full pipeline_pass (parse -> enrich -> route ->
per-sink fan-out write -> all five aggregate families incl.
key_stats_and_catalog) over 50,000,000 turns with the default 24g driver
heap, recording wall time, throughput, JVM peak RSS, shuffle spill, and
task peak execution memory. No OOM + spill staying bounded is the
acceptance criterion (VERDICT r2 item 3).

Usage:  python scripts/soak.py [--n 50000000] [--cores 32]
Prints one JSON line; paste the result into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from soak_common import RssSampler, stage_metrics  # noqa: E402

CHUNK_PARTS = 64  # part files; each generated independently (bounded RAM)


def ensure_big_dataset(n: int) -> Path:
    """Chunked equivalent of datagen.ensure_dataset(with_truth=False).

    generate_transcripts builds the whole frame in one pandas allocation —
    fine at 8M, ~10 GB of Python strings at 50M. Every row is a pure
    function of its global index, so this writes the same rows part-by-part
    with only one part in memory at a time.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from otlp_cardinality_checker_spark import datagen as dg

    out = dg.DATA_ROOT / f"v{dg.GEN_VERSION}_n{n}"
    if (out / "_SUCCESS").exists() or (out / "_SUCCESS_TRUTH").exists():
        return out
    tdir = out / "transcripts.parquet"
    tdir.mkdir(parents=True, exist_ok=True)
    step = (n + CHUNK_PARTS - 1) // CHUNK_PARTS
    t0 = time.time()
    for f in range(CHUNK_PARTS):
        lo, hi = f * step, min((f + 1) * step, n)
        if lo >= hi:
            break
        idx = np.arange(lo, hi, dtype=np.int64)
        conv_id = [f"conv_{i // dg.TURNS_PER_CONV:06d}" for i in idx]
        roles = [dg._role_of(int(i)) for i in idx]
        tools = [
            dg._tool_of(int(i)) if r == "tool" else None
            for i, r in zip(idx, roles)
        ]
        texts = [
            dg._text_of(int(i), r, t) for i, r, t in zip(idx, roles, tools)
        ]
        ts = (
            pd.Timestamp("2026-01-01T00:00:00")
            + pd.to_timedelta(idx, unit="s")
        ).astype("datetime64[us]")
        pdf = pd.DataFrame(
            {
                "conv_id": pd.array(conv_id, dtype="string"),
                "turn_idx": (idx % dg.TURNS_PER_CONV).astype(np.int32),
                "role": pd.array(roles, dtype="string"),
                "text": pd.array(texts, dtype="string"),
                "tool": pd.array(tools, dtype="string"),
                "ts": ts,
            }
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            tdir / f"part-{f:04d}.parquet",
            row_group_size=65536,
            compression="zstd",
        )
        print(
            f"datagen part {f + 1}/{CHUNK_PARTS} rows={hi - lo} "
            f"elapsed={time.time() - t0:.0f}s",
            file=sys.stderr,
        )
    dg._write(dg.role_dim(), out / "role_dim.parquet")
    dg._write(dg.tool_dim(), out / "tool_dim.parquet")
    dg.write_metric_dim(out / "metric_dim.parquet")
    (out / "_SUCCESS").touch()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--skip-datagen", action="store_true")
    args = ap.parse_args()

    if not args.skip_datagen:
        ensure_big_dataset(args.n)

    from bench import pipeline_pass

    from otlp_cardinality_checker_spark.session import get_spark

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(
        app_name="soak-50m",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true"},  # status REST for metrics
    )
    sampler = RssSampler()
    sampler.start()
    # ABSOLUTE path: Spark resolves relative write paths against the
    # JVM's working directory (a temp dir under pyspark), not Python's cwd
    out_dir = str((Path(".data") / "soak_out").resolve())
    t0 = time.time()
    sec = pipeline_pass(spark, "/root/testdata/sf0.1", args.n, out_dir, 0)
    wall = time.time() - t0
    sampler.stop()
    try:
        metrics = stage_metrics()
    except Exception as e:  # UI scrape is best-effort
        metrics = {"error": str(e)}
    print(
        json.dumps(
            {
                "metric": "soak_turns_per_sec",
                "n_turns": args.n,
                "cores": args.cores,
                "driver_heap": heap,
                "pipeline_sec": round(sec, 1),
                "wall_sec": round(wall, 1),
                "turns_per_sec": round(args.n / sec, 1),
                "jvm_peak_rss_gb": round(sampler.peak_kb / 1024 / 1024, 2),
                **metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
