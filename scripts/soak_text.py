"""Text-retrieval/LM scale soak: BM25 and the bigram LM on 500k docs.

Scale claims under test, over the same deterministic 500k-doc corpus the
dedup soak uses (soak_dedup.ensure_docs — ~30 tokens/doc, one boilerplate
sentence shared by EVERY document, i.e. the query-stopword adversary for
BM25's posting-list join):

* bm25_topk — posting lists for the broadcast query terms only; a query
  term appearing in every document (taken from the boilerplate) makes the
  candidate set the WHOLE corpus, and the per-query top-k window must
  still hold because candidates collapse into per-(query, doc) scores
  first (one hash-agg row per matching doc). Wall time is the evidence.
* bigram_cross_entropy — the (doc, w1, w2, c) frame is the scale risk
  (bigram types ~ corpus tokens); the LM/context/V derivation must stay
  vocabulary-sized and the scoring join must not spill at the pinned
  heap.

Prints one JSON line. Usage:
    python scripts/soak_text.py [--n 500000] [--cores 32]
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
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from soak_common import RssSampler, stage_metrics
    from soak_dedup import ensure_docs

    from otlp_cardinality_checker_spark.operators.search import bm25_topk
    from otlp_cardinality_checker_spark.operators.text_analysis import (
        bigram_cross_entropy,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    spark = get_spark(
        app_name="soak-text",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    path = str((Path(".data") / f"soak_docs_v2_n{args.n}").resolve())
    ensure_docs(spark, args.n, path)
    docs = spark.read.parquet(path)
    sampler = RssSampler()
    sampler.start()
    out: dict = {"metric": "text_soak", "n_docs": args.n, "cores": args.cores}

    # The soak corpus's content tokens are alphanumeric (w7919 ...), so
    # both BM25 legs use the alphanumeric tokenizer — under the default
    # letters-only pattern the digits are separators and every content
    # token collapses to "w" (the first soak run returned 0 rows for the
    # selective queries; this is the regression that found token_pattern)
    alnum = "[^a-z0-9]+"

    # BM25 leg 1: selective queries (group-core tokens hit ~10 docs each)
    selective = [
        # core tokens are w{(group*131 + (i+1)*7919) % 999983}
        (1, "w7919 w15838 w23757"),       # group 0, i=0..2
        (2, "w138919 w146838 w154757"),   # group 1000, i=0..2
    ]
    t0 = time.time()
    res = bm25_topk(docs, queries=selective, k=10, token_pattern=alnum).collect()
    out["bm25_selective_sec"] = round(time.time() - t0, 1)
    out["bm25_selective_rows"] = len(res)
    out["bm25_selective_ok"] = (
        len(res) == 20
        and all(r["score"] > 0 for r in res)
        # group-0 docs (ids 0..9) must dominate query 1's top ranks
        and {r["doc_id"] for r in res if r["query_id"] == 1 and r["rank"] <= 5}
        <= set(range(10))
    )

    # BM25 leg 2: the stopword adversary — every query term appears in
    # EVERY document (boilerplate), so the candidate grain is the whole
    # corpus; the per-(query, doc) agg must absorb it without a skewed
    # single-reducer sort
    t0 = time.time()
    res = bm25_topk(
        docs, queries=[(3, "terms of service apply")], k=10,
        token_pattern=alnum,
    ).collect()
    out["bm25_stopword_sec"] = round(time.time() - t0, 1)
    out["bm25_stopword_rows"] = len(res)

    # Bigram LM over the full corpus: count result rows + a checksum so
    # the whole scoring join actually executes
    t0 = time.time()
    row = (
        bigram_cross_entropy(docs)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("doc_id", "cross_entropy")).alias("h"),
        )
        .collect()[0]
    )
    out["bigram_ce_sec"] = round(time.time() - t0, 1)
    out["bigram_ce_docs"] = row["n"]

    # DSIR importance weights over the full corpus (target = src_0):
    # the (doc, bucket, c) frame is the scale risk — ~60 buckets/doc
    t0 = time.time()
    from otlp_cardinality_checker_spark.operators.importance import (
        dsir_log_weights,
    )

    row = (
        dsir_log_weights(docs, F.col("source") == "src_0")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("doc_id", "log_weight")).alias("h"),
        )
        .collect()[0]
    )
    out["dsir_sec"] = round(time.time() - t0, 1)
    out["dsir_docs"] = row["n"]

    # PSI drift: the claim is ONE map-side agg to the (source, bin) grain
    # with domain completion on broadcast dims — corpus-size-independent
    # state beyond the first agg.
    t0 = time.time()
    from otlp_cardinality_checker_spark.operators.text_analysis import (
        psi_drift,
    )

    psi_rows = psi_drift(docs, by="source").collect()
    out["psi_sec"] = round(time.time() - t0, 1)
    out["psi_sources"] = len(psi_rows)
    out["psi_max"] = max(r["psi"] for r in psi_rows)

    # data_budget: plan agg + one more scan with a broadcast plan join and
    # a pure scan-filter membership — document rows never shuffle.
    t0 = time.time()
    from otlp_cardinality_checker_spark.operators.sampling import (
        data_budget,
    )

    budget = int(
        docs.agg(
            F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        ).collect()[0][0]
        * 0.6
    )
    db = data_budget(docs, budget_tokens=budget, alpha=0.7).collect()
    out["data_budget_sec"] = round(time.time() - t0, 1)
    out["data_budget_kept"] = sum(r["n_kept"] for r in db)
    out["data_budget_kept_tokens"] = sum(r["kept_tokens"] for r in db)
    out["data_budget_target"] = budget

    # vocab_stats: the (group, token) hash-agg is the full-data exchange;
    # the boilerplate-heavy corpus is the low-TTR adversary it detects.
    from otlp_cardinality_checker_spark.operators.text_analysis import (
        readability_stats,
        vocab_stats,
    )

    t0 = time.time()
    vs = vocab_stats(docs, by="source").collect()
    out["vocab_sec"] = round(time.time() - t0, 1)
    out["vocab_types"] = sum(r["n_types"] for r in vs)
    out["vocab_min_ttr"] = min(r["type_token_ratio"] for r in vs)

    t0 = time.time()
    rd = readability_stats(docs, by="source").collect()
    out["readability_sec"] = round(time.time() - t0, 1)
    out["fk_grades"] = sorted(round(r["fk_grade"], 1) for r in rd)[:3]

    # curriculum_stages: one full-data exchange to the score grain (the
    # localCheckpointed frame), docs broadcast-join the stage map.
    from otlp_cardinality_checker_spark.operators.curriculum import (
        curriculum_stages,
        length_buckets,
    )

    t0 = time.time()
    cs = (
        curriculum_stages(docs, n_stages=4)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out["curriculum_sec"] = round(time.time() - t0, 1)
    out["curriculum_stage_sizes"] = {
        int(r["stage"]): r["n"] for r in cs
    }

    t0 = time.time()
    lb = length_buckets(docs, boundaries=(16, 32, 64, 128)).collect()
    out["length_buckets_sec"] = round(time.time() - t0, 1)
    out["pad_waste_total"] = sum(r["pad_tokens"] for r in lb)

    # zipf_fit: same (group, token) exchange as vocab_stats plus a
    # rank window on the VOCAB grain — wall time must stay in vocab_stats'
    # family, not the corpus's.
    from otlp_cardinality_checker_spark.operators.text_analysis import (
        zipf_fit,
    )

    t0 = time.time()
    zf = zipf_fit(docs, by="source", top_n=128).collect()
    out["zipf_sec"] = round(time.time() - t0, 1)
    out["zipf_slopes"] = sorted(
        round(r["zipf_slope"], 2) for r in zf if r["zipf_slope"] is not None
    )[:3]

    # shard_plan: the three-level hierarchical cumsum — the claim is NO
    # global sort (window partitions bounded by block_size / blocks-per-
    # source) while still equaling a flat corpus-wide cumsum.
    from otlp_cardinality_checker_spark.operators.packing import shard_plan

    t0 = time.time()
    sp = shard_plan(docs, budget=100_000, block_size=4096).collect()
    out["shard_plan_sec"] = round(time.time() - t0, 1)
    out["shard_plan_shards"] = len(sp)
    out["shard_plan_tokens"] = sum(r["shard_tokens"] for r in sp)
    out["shard_plan_max_skew"] = (
        round(
            max(r["shard_tokens"] for r in sp)
            / (sum(r["shard_tokens"] for r in sp) / len(sp)),
            3,
        )
        if sp
        else None
    )

    # pmi_bigrams: the bigram-vocab-grain agg + rank window over the
    # min_count-filtered grain; prefix_dups: digest-grain single scan
    from otlp_cardinality_checker_spark.operators.dedup import prefix_dups
    from otlp_cardinality_checker_spark.operators.text_analysis import (
        pmi_bigrams,
    )

    t0 = time.time()
    pm = pmi_bigrams(docs, by="source", k=10, min_count=5).collect()
    out["pmi_sec"] = round(time.time() - t0, 1)
    out["pmi_rows"] = len(pm)

    t0 = time.time()
    pd_rows = prefix_dups(docs, by="source", k=8).collect()
    out["prefix_dups_sec"] = round(time.time() - t0, 1)
    out["prefix_dup_share_max"] = max(
        r["prefix_dup_share"] for r in pd_rows
    )

    # weighted_sample: one scan + per-stratum rank; winnow: row-local
    # HOFs, zero shuffle — wall time must track the scan
    from otlp_cardinality_checker_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from otlp_cardinality_checker_spark.operators.sampling import (
        weighted_sample,
    )

    t0 = time.time()
    docs_w = docs.withColumn(
        "n_chars", F.length(F.coalesce(F.col("text"), F.lit("")))
    )
    ws2 = weighted_sample(docs_w, k=10, by="source",
                          weight_col="n_chars").collect()
    out["weighted_sample_sec"] = round(time.time() - t0, 1)
    out["weighted_sample_rows"] = len(ws2)

    t0 = time.time()
    wn = winnow_fingerprints(docs, n=3, window=4).agg(
        F.sum("n_fingerprints").alias("fp"),
        F.sum("n_positions").alias("pos"),
    ).collect()[0]
    out["winnow_sec"] = round(time.time() - t0, 1)
    out["winnow_compression"] = round(wn["fp"] / max(wn["pos"], 1), 4)

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
