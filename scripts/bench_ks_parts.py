"""Microbench: key_stats_and_catalog sub-stages over a materialized routed
parquet (the bench.py shape). Evidence for OPTIMIZATION_r06.md."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from otlp_cardinality_checker_spark.operators import aggregate as agg
from otlp_cardinality_checker_spark.plans.pipeline import routed_turns
from otlp_cardinality_checker_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="ks-parts", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="ks_parts_", dir=shm)
    out = {}
    try:
        routed = routed_turns(spark, SF_DIR, engine="sql", with_truth=False)
        (routed.write.mode("overwrite").option("compression", "snappy")
         .partitionBy("sink").parquet(f"{out_dir}/routed"))
        mat = spark.read.parquet(f"{out_dir}/routed")

        attrs = agg.exploded_attrs(mat)
        marked = agg.value_grain(attrs, ["sink", "key"])
        partials = agg.attr_partials(mat)
        ks, cat = agg.key_stats_and_catalog(mat)
        union = ks.select(F.to_json(F.struct(*ks.columns)).alias("r")).unionByName(
            cat.select(F.to_json(F.struct(*cat.columns)).alias("r")))

        n = attrs.count()
        nv = attrs.select("sink", "key", "value").distinct().count()
        out["n_exploded_rows"] = n
        out["n_distinct_skv"] = nv

        legs = {
            "explode_noop": attrs,
            "value_grain_agg_only": attrs.groupBy(
                "sink", "key",
                F.pmod(F.hash("value"), F.lit(16)).alias("_salt"), "value"
            ).agg(F.count(F.lit(1)).alias("_vc"),
                  F.min("ts").alias("_tmin"), F.max("ts").alias("_tmax")),
            "value_grain_with_window": marked,
            "attr_partials": partials,
            "full_gs_union": union,
        }
        for name, d in legs.items():
            spark.sparkContext.setJobDescription(f"ks:{name}")
            times = []
            for _ in range(3):
                t0 = time.time()
                d.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            out[name] = {"min": min(times[1:]), "samples": times}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
