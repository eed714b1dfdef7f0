"""Optimization-round measurement harness (guide §1) — NOT the driver bench.

`bench.py` is frozen for measurement; this file holds the extra
instrumentation the optimization rounds need:

* per-query isolation timing: warm pass + min-of-N repeats, using the same
  collect() methodology as bench.py's run_query_timings so numbers are
  comparable, with jobs labelled via setJobDescription;
* .explain("formatted") capture to plans/r06/<name>_<tag>.txt;
* optional noop-sink mode (guide §1.4) for queries whose result sets are
  large enough that collect() would time the driver transfer, not the
  computation.

Usage:
    python bench_extra.py --queries route_counts key_stats_exact --repeats 3
    python bench_extra.py --headline --plans-tag before
    python bench_extra.py --pipeline          # stage-level pipeline timings
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
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


def _get_spark(cores: int):
    from otlp_cardinality_checker_spark.session import get_spark

    return get_spark(app_name="bench-extra", cores=cores)


def time_queries(
    names: list[str],
    sf_dir: str,
    cores: int,
    repeats: int = 3,
    plans_tag: str | None = None,
    noop: bool = False,
) -> dict:
    import __spark_entry__ as entry_mod

    spark = _get_spark(cores)
    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    os.makedirs("plans/r06", exist_ok=True)
    try:
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            samples = []
            for i in range(repeats + 1):  # pass 0 = warm (fresh plan incl.)
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                if noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                dt = round(time.time() - t0, 3)
                if i > 0:
                    samples.append(dt)
            if plans_tag:
                df = qs[name](spark, sf_dir)
                with open(f"plans/r06/{name}_{plans_tag}.txt", "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            out[name] = {"min": min(samples), "samples": samples}
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    return out


def time_pipeline_stages(sf_dir: str, cores: int, repeats: int = 2) -> dict:
    """Break pipeline_pass into its stages: parse+write, then each
    aggregate family with a noop sink over the materialized parquet."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from otlp_cardinality_checker_spark.operators import aggregate as agg
    from otlp_cardinality_checker_spark.plans.pipeline import routed_turns

    spark = _get_spark(cores)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="bench_extra_", dir=shm)
    stages: dict[str, list[float]] = {}

    def leg(name, fn):
        spark.sparkContext.setJobDescription(f"stage:{name}")
        ts = []
        for _ in range(repeats + 1):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        stages[name] = ts[1:]
        spark.sparkContext.setJobDescription(None)

    try:
        routed = routed_turns(spark, sf_dir, engine="sql", with_truth=False)
        leg("parse_noop", lambda: routed.write.format("noop")
            .mode("overwrite").save())
        routed_path = f"{out_dir}/routed"
        leg("parse_write_parquet", lambda: routed.write.mode("overwrite")
            .option("compression", "snappy").partitionBy("sink")
            .parquet(routed_path))
        mat = spark.read.parquet(routed_path)

        def fam(name, builder):
            leg(name, lambda: builder().write.format("noop")
                .mode("overwrite").save())

        fam("key_stats_and_catalog", lambda: (lambda t: t[0].select(
            F.to_json(F.struct(*t[0].columns)).alias("r")).unionByName(
            t[1].select(F.to_json(F.struct(*t[1].columns)).alias("r"))))(
            agg.key_stats_and_catalog(mat)))
        fam("service_stats", lambda: agg.service_stats(mat))
        fam("template_stats", lambda: agg.template_stats(mat))
        fam("active_series_hll", lambda: agg.active_series(mat, exact=False))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    return {k: {"min": min(v), "samples": v} for k, v in stages.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans-tag", default=None)
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.repeats < 1:
        ap.error("--repeats must be >= 1 (pass 0 is the untimed warm pass)")
    result = {}
    if args.pipeline:
        result["pipeline_stages"] = time_pipeline_stages(
            args.sf_dir, args.cores, repeats=args.repeats
        )
    names = args.queries or (HEADLINE if args.headline else [])
    if names:
        result["queries"] = time_queries(
            names, args.sf_dir, args.cores, repeats=args.repeats,
            plans_tag=args.plans_tag, noop=args.noop,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
