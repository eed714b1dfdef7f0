"""FastSS fuzzy-join scale soak: a 1M-string vocabulary with planted typos.

The pytest suite proves completeness (bucketed result == brute-force spec)
on small adversarial vocabularies; this script is the scale evidence that
the deletion-neighborhood join actually has sub-quadratic cost structure:

* vocabulary — n deterministic base strings (~10 chars over a 26-letter
  alphabet, generated IN SPARK from the row id), plus one planted
  single-edit typo for every 10th base string. Distinct random strings of
  this length are essentially never within distance 1 of each other, so
  the expected pair count ~= the planted count — any blow-up is algorithm
  overhead, not signal.
* claims — wall time for the full fuzzy_pairs(d=1) run, the variant-table
  size (must be ~len+1 per string), the candidate-bucket join's output
  (must track planted pairs, NOT the ~5e11 all-pairs space), and the
  planted-pair recall (must be 1.0 — completeness at scale, not just in
  unit tests).

Prints one JSON line. Usage: python scripts/soak_fuzzy.py [--n 1000000]
[--cores 32]
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from soak_common import RssSampler

    from otlp_cardinality_checker_spark.operators.fuzzy import (
        deletion_variants,
        fuzzy_pairs,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    spark = get_spark(app_name="soak-fuzzy", cores=args.cores)
    n = args.n

    # base string for row id i: 10 chars, each an independent hash of
    # (i, position) — pure Catalyst, no driver materialization (a linear
    # (i*c+p) % 26 formula would collapse the vocab to 26 strings)
    def char(p):
        return F.chr(
            F.pmod(F.xxhash64(F.col("id"), F.lit(p)), F.lit(26)) + F.lit(97)
        )

    base = spark.range(n).select(
        F.concat(*[char(p) for p in range(10)]).alias("s")
    )
    # every 10th string also appears with ONE substituted char (position 3)
    typos = spark.range(0, n, 10).select(
        F.concat(
            *[char(p) if p != 3 else F.lit("Z") for p in range(10)]
        ).alias("s")
    )
    vocab = base.unionByName(typos)
    planted = typos.count()

    sampler = RssSampler()
    sampler.start()
    out: dict = {"metric": "fuzzy_soak", "n_strings": n + planted,
                 "cores": args.cores, "planted_pairs": planted}

    t0 = time.time()
    n_variants = deletion_variants(
        vocab.distinct().withColumnRenamed("s", "s2"), "s2", 1
    ).count()
    out["variant_rows"] = n_variants
    out["variants_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    pairs = fuzzy_pairs(vocab, "s", max_dist=1)
    found = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                (F.col("dist") == 1)
                & (F.substring("name_a", 4, 1) != F.substring("name_b", 4, 1))
            ).cast("long")
        ).alias("pos3_pairs"),
    ).collect()[0]
    out["fuzzy_sec"] = round(time.time() - t0, 1)
    out["pairs_found"] = int(found["n"])
    # recall on the planted family: every typo differs from its base at
    # position 4 (1-indexed) only
    out["planted_recall"] = round(
        int(found["pos3_pairs"]) / planted, 4
    )
    out["pairs_vs_allpairs"] = round(
        int(found["n"]) / ((n + planted) * (n + planted - 1) / 2), 12
    )

    sampler.stop()
    out["jvm_peak_rss_gb"] = round(sampler.peak_kb / 1024 / 1024, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
