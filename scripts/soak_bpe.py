"""BPE tokenizer scale soak: train at a realistic dictionary size.

The pytest parity suite pins the merge table against an independent
trainer on small corpora; this script is the scale evidence for the
driver-side merge loop's documented memory/time envelope:

* corpus — the 500k-doc deterministic soak corpus (see soak_dedup.py):
  ~10^6-token synthetic vocabulary, so the word histogram is large enough
  that the ``max_vocab`` cap actually bites (the driver documents table
  has only 31 distinct words — useless here).
* ``word_histogram`` — the distributed leg: one exchange over 500k docs.
* ``bpe_train`` — n_merges=2000 over a max_vocab=100k dict with the
  incremental pair-count trainer; wall time + PYTHON DRIVER peak RSS are
  the claims (the merge loop is the only driver-side stage).
* ``bpe_token_stats`` — the distributed Arrow-batched encode of the full
  corpus under the learned table.

Prints one JSON line.  Usage: python scripts/soak_bpe.py [--n 500000]
[--cores 32] [--merges 2000] [--max-vocab 100000]
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--merges", type=int, default=2000)
    ap.add_argument("--max-vocab", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from soak_common import RssSampler
    from soak_dedup import ensure_docs

    from otlp_cardinality_checker_spark.operators.bpe import (
        bpe_token_stats,
        bpe_train,
        word_histogram,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    spark = get_spark(app_name="soak-bpe", cores=args.cores)
    path = str((Path(".data") / f"soak_docs_v2_n{args.n}").resolve())
    ensure_docs(spark, args.n, path)
    docs = spark.read.parquet(path)
    sampler = RssSampler()
    sampler.start()
    out: dict = {
        "metric": "bpe_soak",
        "n_docs": args.n,
        "cores": args.cores,
        "n_merges": args.merges,
        "max_vocab": args.max_vocab,
    }

    t0 = time.time()
    hist = word_histogram(docs)
    out["distinct_words"] = hist.count()
    out["histogram_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    merges = bpe_train(hist, args.merges, max_vocab=args.max_vocab)
    out["train_sec"] = round(time.time() - t0, 1)
    out["n_merges_learned"] = len(merges)
    # peak RSS of THIS process — the merge loop runs here, and ru_maxrss
    # captures the capped-dict working set the module docstring promises
    out["py_driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024, 2
    )

    t0 = time.time()
    enc = bpe_token_stats(docs, merges).agg(
        F.sum("n_tokens").alias("toks"), F.sum("n_words").alias("words")
    ).collect()[0]
    out["encode_sec"] = round(time.time() - t0, 1)
    out["corpus_tokens"] = int(enc["toks"])
    out["tokens_per_word"] = round(enc["toks"] / enc["words"], 4)
    out["encode_docs_per_sec"] = int(args.n / max(time.time() - t0, 1e-9))

    sampler.stop()
    out["jvm_peak_rss_gb"] = round(sampler.peak_kb / 1024 / 1024, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
