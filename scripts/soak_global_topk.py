"""global_top_k scale soak: exact global ranks over a DATA-SIZED grain.

The r6 two-stage global rank (aggregate.global_top_k) replaced the six
partitionless row_number windows; its scale claim is that the final
single-reducer window only ever sees <= n_salt * k salted survivors, so
ranking stays flat while the ranked grain grows with the corpus. This
soak is the evidence (repo convention: scale claim -> soak leg):

* a deterministic N-row frame (xxhash64-derived scores, unique string
  keys — a worst case: every row a distinct group, total order ties
  broken by key);
* global_top_k(k) vs the naive Window.orderBy row_number form;
* asserts the two result sets are IDENTICAL (rows and ranks), reports
  wall times for both.

Prints one JSON line. Usage: python scripts/soak_global_topk.py
    [--n 20000000] [--k 100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from otlp_cardinality_checker_spark.operators.aggregate import (
        global_top_k,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    spark = get_spark(app_name="soak-global-topk")
    try:
        df = (
            spark.range(args.n)
            .select(
                F.concat(F.lit("key_"), F.col("id")).alias("k"),
                F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("score"),
            )
        )
        # warm the scan
        df.write.format("noop").mode("overwrite").save()

        order = (F.desc("score"), F.asc("k"))
        gtk = global_top_k(df, order, k=args.k, salt_col="k")
        naive_df = (
            df.withColumn(
                "rank", F.row_number().over(Window.orderBy(*order))
            )
            .where(F.col("rank") <= args.k)
        )

        def timed(name, d):
            # pass 0 warms JIT/codegen; min-of-2 timed passes after
            spark.sparkContext.setJobDescription(f"soak: {name}")
            rows, times = None, []
            for i in range(3):
                t0 = time.time()
                rows = d.collect()
                if i > 0:
                    times.append(round(time.time() - t0, 2))
            return rows, min(times)

        two, t_two = timed("global_top_k", gtk)
        naive, t_naive = timed("naive single window", naive_df)

        a = sorted(map(tuple, two))
        b = sorted(map(tuple, naive))
        print(
            json.dumps(
                {
                    "n_rows": args.n,
                    "k": args.k,
                    "identical": a == b,
                    "global_top_k_sec": t_two,
                    "naive_single_window_sec": t_naive,
                    "ratio_vs_naive": round(t_two / t_naive, 2),
                }
            )
        )
        assert a == b, "two-stage ranks diverged from the naive window"
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
