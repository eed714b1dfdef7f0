"""Events-family scale soak: the numeric/time-series audits at 20M rows.

Scale claims under test, over a deterministic synthetic events frame
(spark.range-derived — no fixture I/O, so the legs measure operator cost,
not parquet decode):

* cusum_drift — the prefix-scan CUSUM: one (type, hour) hash agg (the
  only full-data exchange) + two window passes over the tiny bucket
  grain. Wall time must be dominated by the first agg, i.e. stay flat in
  bucket count.
* winsorize_audit / robust_outliers — exact-percentile passes: the
  documented scale cost is the per-group percentile buffer (values/group
  doubles inside the agg). The soak pins that the pinned heap absorbs
  4M-values-per-group buffers with zero spill; beyond that, the
  docstrings' "swap in the mergeable sketch" note is the scale path.
* volume_spikes — regression reference for the family (same grain as
  cusum stage 1).

The planted shape: type t0 doubles its hourly volume in the final 72
hours (cusum must alarm), and value carries a 1-in-10k multiplicative
outlier tail (robust/winsorize must flag a plausible share).

Prints one JSON line. Usage:
    python scripts/soak_events.py [--n 20000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from soak_common import RssSampler, stage_metrics

    from otlp_cardinality_checker_spark.operators.anomaly import (
        cusum_drift,
        robust_outliers,
        volume_spikes,
        winsorize_audit,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    spark = get_spark(
        app_name="soak-events",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    n = args.n
    # deterministic synthetic events: 5 types, 30 days of hours, a
    # lognormal-ish value with a 1-in-10k x1000 outlier tail, and a
    # planted 2x volume shift for t0 in the final 72 hours (extra rows
    # appended via a second range)
    h1 = F.xxhash64(F.col("id"))
    h2 = F.xxhash64(F.col("id"), F.lit(1))
    hours = 30 * 24
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("t"), F.pmod(h1, F.lit(5))).alias("event_type"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(100_000)).alias(
                "user_id"
            ),
            # 1704067200 = 2024-01-01T00:00:00Z
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(h2, F.lit(hours * 3600))
            ).alias("ts"),
            (
                F.exp(F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000))
                      / F.lit(250.0))
                * F.when(
                    F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(10_000))
                    == 0,
                    F.lit(1000.0),
                ).otherwise(F.lit(1.0))
            ).alias("value"),
        )
    )
    shift = (
        spark.range(n // 100)
        .select(
            (F.col("id") + n).alias("event_id"),
            F.lit("t0").alias("event_type"),
            # the shift is a single hot tenant: user 42 floods t0
            F.lit(42).cast("long").alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200 + (hours - 72) * 3600)
                + F.pmod(F.xxhash64(F.col("id"), F.lit(4)),
                         F.lit(72 * 3600))
            ).alias("ts"),
            F.lit(1.0).alias("value"),
        )
    )
    ev = base.unionByName(shift)

    sampler = RssSampler()
    sampler.start()
    out: dict = {"metric": "events_soak", "n_events": n, "cores": args.cores}

    t0 = time.time()
    cs = cusum_drift(ev).collect()
    out["cusum_sec"] = round(time.time() - t0, 1)
    out["cusum_rows"] = len(cs)
    shift_alarms = [
        r for r in cs if r["event_type"] == "t0" and r["alarm"]
    ]
    out["cusum_shift_alarmed"] = bool(shift_alarms)

    t0 = time.time()
    ws = winsorize_audit(ev).collect()
    out["winsorize_sec"] = round(time.time() - t0, 1)
    out["winsorize_clipped"] = sum(
        r["n_clipped_low"] + r["n_clipped_high"] for r in ws
    )

    t0 = time.time()
    ro = robust_outliers(ev).collect()
    out["robust_sec"] = round(time.time() - t0, 1)
    out["robust_outliers"] = sum(
        r["n_outliers"] for r in ro if r["n_outliers"] is not None
    )

    t0 = time.time()
    vs = volume_spikes(ev, group_col="event_type").count()
    out["spikes_sec"] = round(time.time() - t0, 1)
    out["spikes_rows"] = vs

    # wave-4 legs: attribution re-scans only the spike horizon; the
    # correlation pair join runs on the bucket grain; the hopping
    # distinct-users exchange carries the (window, user) DISTINCT grain
    from otlp_cardinality_checker_spark.operators.anomaly import (
        spike_attribution,
    )
    from otlp_cardinality_checker_spark.operators.rollup import (
        hopping_distinct_users,
    )

    t0 = time.time()
    sa = spike_attribution(ev).collect()
    out["attribution_sec"] = round(time.time() - t0, 1)
    out["attribution_rows"] = len(sa)

    t0 = time.time()
    hd = hopping_distinct_users(ev, 21600, 3600).count()
    out["hopping_users_sec"] = round(time.time() - t0, 1)
    out["hopping_windows"] = hd

    sampler.stop()
    out["jvm_peak_rss_gb"] = round(sampler.peak_kb / 1024 / 1024, 2)
    try:
        out.update(stage_metrics())
    except Exception as e:  # noqa: BLE001 — UI scrape is best-effort
        out["stage_metrics_error"] = str(e)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
