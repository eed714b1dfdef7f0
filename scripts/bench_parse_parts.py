"""Microbench: which part of the parse projection costs what (guide §1.4).

Times noop-sink materialization of each parse component separately over
the sf0.1 transcripts. Not a driver artifact — evidence for
OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from otlp_cardinality_checker_spark.functions.attributes import attrs_map_expr
from otlp_cardinality_checker_spark.functions.masking import (
    mask_expr,
    template_expr,
)
from otlp_cardinality_checker_spark.functions.severity import severity_expr
from otlp_cardinality_checker_spark.session import get_spark
from otlp_cardinality_checker_spark.sources.transcripts import load_transcripts

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="parse-parts", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    df = load_transcripts(spark, SF_DIR, with_truth=False)
    text = F.col("text")
    parts = {
        "scan_only": df.select("conv_id", "text"),
        "severity": df.select(severity_expr(text).alias("sev")),
        "attrs": df.select(attrs_map_expr(text).alias("attrs")),
        "mask_only": df.select(mask_expr(text).alias("masked")),
        "template": df.select(template_expr(text).alias("template")),
        "full_parse": df.select(
            severity_expr(text).alias("sev"),
            template_expr(text).alias("template"),
            attrs_map_expr(text).alias("attrs"),
        ),
    }
    out = {}
    try:
        for name, d in parts.items():
            spark.sparkContext.setJobDescription(f"part:{name}")
            times = []
            for i in range(3):
                t0 = time.time()
                d.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            out[name] = {"min": min(times[1:]), "samples": times}
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
