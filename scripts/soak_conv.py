"""Conversation-dedup scale soak: the session-3 transcript operators at
multi-million-turn scale.

Runs over the chunk-generated big transcript fixture (soak.ensure_big_dataset
— same deterministic rows as datagen at any n):

* conv_dedup        — order-sensitive digest-chain fingerprints; the claim
                      is ONE conv_id exchange of 32-char digests, wall time
                      linear in turns.
* conv_near_dups    — set-Jaccard over turn digests with the data-derived
                      boilerplate cap (max(20, 1% of convs)); the claim is
                      that the cap keeps the pair join bounded even though
                      the fixture's templated turns repeat across thousands
                      of conversations (the adversarial case).
* boilerplate_turns — one (role, digest) hash-agg over all turns.

Prints one JSON line. Usage: python scripts/soak_conv.py [--n 4000000]
[--cores 32]
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

from soak import ensure_big_dataset  # noqa: E402
from soak_common import RssSampler, stage_metrics  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument(
        "--near-cap",
        default="auto",
        help="conv_near_dups boilerplate cap: 'auto' (1%% of convs) or an "
        "int; template-heavy corpora need a tighter cap (see BENCH.md)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from otlp_cardinality_checker_spark.operators.conversation import (
        boilerplate_turns,
        conv_dedup,
        conv_near_dups,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    data = ensure_big_dataset(args.n)
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(
        app_name="soak-conv",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    turns = spark.read.parquet(str(data / "transcripts.parquet"))
    sampler = RssSampler()
    sampler.start()
    out: dict = {
        "metric": "conv_dedup_soak",
        "n_turns": args.n,
        "cores": args.cores,
        "driver_heap": heap,
    }

    t0 = time.time()
    fp = conv_dedup(turns)
    agg = fp.agg(
        F.count(F.lit(1)).alias("groups"),
        F.sum("n_convs").alias("convs"),
        F.max("n_convs").alias("max_copies"),
    ).collect()[0]
    out["conv_dedup_sec"] = round(time.time() - t0, 1)
    out["conv_groups"] = agg["groups"]
    out["n_convs"] = agg["convs"]
    out["max_conv_copies"] = agg["max_copies"]

    cap = "auto" if args.near_cap == "auto" else int(args.near_cap)
    t0 = time.time()
    nd = conv_near_dups(turns, min_jaccard=0.3, max_df=cap)
    out["near_dup_pairs"] = nd.count()
    out["conv_near_dups_sec"] = round(time.time() - t0, 1)
    out["near_cap"] = (
        min(max(20, agg["convs"] // 100), 50) if cap == "auto" else cap
    )

    t0 = time.time()
    bp = boilerplate_turns(turns, min_convs=10)
    row = bp.agg(
        F.count(F.lit(1)).alias("fps"), F.sum("n_turns").alias("t")
    ).collect()[0]
    out["boilerplate_sec"] = round(time.time() - t0, 1)
    out["boilerplate_fingerprints"] = row["fps"]
    out["boilerplate_turn_share"] = round((row["t"] or 0) / args.n, 4)

    # context_budget: the claim is ONE conv_id exchange (suffix window +
    # conv agg share the partitioning) and linear wall time in turns.
    from otlp_cardinality_checker_spark.operators.conversation import (
        context_budget,
    )

    t0 = time.time()
    cb = context_budget(turns, budget_tokens=128)
    row = cb.agg(
        F.count(F.lit(1)).alias("convs"),
        F.sum(F.col("truncated").cast("long")).alias("truncated"),
        F.sum("tokens_kept").alias("kept"),
    ).collect()[0]
    out["context_budget_sec"] = round(time.time() - t0, 1)
    out["context_truncated_share"] = round(
        row["truncated"] / row["convs"], 4
    )
    out["context_kept_tokens"] = row["kept"]

    # sft_pairs / loss_spans: the claim is ONE conv_id exchange each with
    # window state bounded by the context cap (pairs) / a running sum
    # (spans); output is aggregated engine-side, never collected.
    from otlp_cardinality_checker_spark.operators.conversation import (
        loss_mask_spans,
        sft_pairs,
    )

    t0 = time.time()
    sp = sft_pairs(turns, context_turns=8)
    row = sp.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum("prompt_chars").alias("pchars"),
        F.avg("n_context_turns").alias("avg_ctx"),
    ).collect()[0]
    out["sft_pairs_sec"] = round(time.time() - t0, 1)
    out["sft_pairs"] = row["pairs"]
    out["sft_prompt_gb"] = round((row["pchars"] or 0) / 1e9, 2)
    out["sft_avg_ctx_turns"] = round(row["avg_ctx"] or 0.0, 2)

    t0 = time.time()
    ls = loss_mask_spans(turns)
    row = ls.agg(
        F.count(F.lit(1)).alias("spans"),
        F.sum("span_len").alias("unmasked"),
        F.max("rendered_len").alias("max_rendered"),
    ).collect()[0]
    out["loss_spans_sec"] = round(time.time() - t0, 1)
    out["loss_spans"] = row["spans"]
    out["unmasked_chars"] = row["unmasked"]
    out["max_rendered_len"] = row["max_rendered"]

    # echo_rate / preference_pairs / response_markers: one conv_id
    # exchange each (+ the template agg for pairs); aggregated
    # engine-side.
    from otlp_cardinality_checker_spark.operators.conversation import (
        echo_rate,
        preference_pairs,
        response_markers,
    )

    t0 = time.time()
    er = echo_rate(turns, context_turns=8)
    row = er.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("echo_rate").alias("avg_echo"),
        F.sum((F.col("echo_rate") > 0.8).cast("long")).alias("high"),
    ).collect()[0]
    out["echo_rate_sec"] = round(time.time() - t0, 1)
    out["echo_avg"] = round(row["avg_echo"] or 0.0, 4)
    out["echo_high_share"] = round(row["high"] / max(row["n"], 1), 4)

    t0 = time.time()
    pp = preference_pairs(turns)
    row = pp.agg(
        F.count(F.lit(1)).alias("groups"),
        F.sum("n_candidates").alias("cands"),
        F.avg("score_gap").alias("gap"),
    ).collect()[0]
    out["preference_pairs_sec"] = round(time.time() - t0, 1)
    out["preference_groups"] = row["groups"]
    out["preference_candidates"] = row["cands"]
    out["preference_avg_gap"] = round(row["gap"] or 0.0, 2)

    t0 = time.time()
    rm = response_markers(turns)
    row = rm.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_matched").alias("matched"),
    ).collect()[0]
    out["response_markers_sec"] = round(time.time() - t0, 1)
    out["marker_matched_turns"] = row["matched"]

    # code_detect / norm_dedup_gain: pure single-scan aggs — wall time
    # is the scan, shuffle is #groups rows (scale-proof by construction)
    from otlp_cardinality_checker_spark.operators.dedup import (
        norm_dedup_gain,
    )
    from otlp_cardinality_checker_spark.operators.text_analysis import (
        code_detect,
    )

    t0 = time.time()
    cd = code_detect(turns, by="role").collect()
    out["code_detect_sec"] = round(time.time() - t0, 1)
    out["code_share_by_role"] = {
        r["role"]: round(r["code_share"], 3) for r in cd
    }

    t0 = time.time()
    ng = norm_dedup_gain(turns, by="role").collect()
    out["norm_gain_sec"] = round(time.time() - t0, 1)
    out["norm_reveal_gain_max"] = max(r["reveal_gain"] for r in ng)

    # pii_propagation: match-volume-bounded (kind, conv, value) agg —
    # the transcripts corpus carries a UUID per tool turn, the adversary
    from otlp_cardinality_checker_spark.operators.pii import (
        pii_propagation,
    )

    t0 = time.time()
    pp2 = pii_propagation(turns).collect()
    out["pii_propagation_sec"] = round(time.time() - t0, 1)
    out["pii_propagated_values"] = sum(r["n_propagated"] for r in pp2)

    # tool_latency / cost_report: one conv exchange / one scan agg;
    # tool co-occurrence lift: conv-grain distinct sets + pair join
    from otlp_cardinality_checker_spark.operators.conversation import (
        cost_report,
        tool_latency,
    )

    t0 = time.time()
    tl = tool_latency(turns).collect()
    out["tool_latency_sec"] = round(time.time() - t0, 1)
    out["tool_latency_rows"] = len(tl)

    t0 = time.time()
    cr = cost_report(turns, by="role").collect()
    out["cost_report_sec"] = round(time.time() - t0, 1)
    out["cost_total"] = round(sum(r["cost"] for r in cr), 1)

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
