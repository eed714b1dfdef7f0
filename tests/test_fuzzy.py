"""FastSS fuzzy-join tests: completeness vs a brute-force Python oracle
on adversarial random vocabularies, variant fan-out bounds, and the
no-cartesian plan pin. PPS sampling exactness tests live here too (both
are round-5 curation additions)."""

from __future__ import annotations

import hashlib
import itertools
import random

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# fuzzy_pairs
# ---------------------------------------------------------------------------


def test_fuzzy_pairs_complete_on_random_vocab(spark):
    """Bucketed result == brute-force all-pairs spec, on seeded small-
    alphabet vocabularies (max collision pressure: lots of true pairs at
    every distance, including length-changing edits and duplicates)."""
    from otlp_cardinality_checker_spark.operators.fuzzy import fuzzy_pairs

    for seed in range(4):
        rnd = random.Random(seed)
        words = [
            "".join(rnd.choice("ab") for _ in range(rnd.randint(1, 6)))
            for _ in range(60)
        ]
        df = spark.createDataFrame([(w,) for w in words], "s string")
        for d in (1, 2):
            got = {
                (r["name_a"], r["name_b"], r["dist"], r["freq_a"], r["freq_b"])
                for r in fuzzy_pairs(df, "s", d).collect()
            }
            freq: dict[str, int] = {}
            for w in words:
                freq[w] = freq.get(w, 0) + 1
            want = {
                (a, b, _lev(a, b), freq[a], freq[b])
                for a, b in itertools.combinations(sorted(freq), 2)
                if _lev(a, b) <= d
            }
            assert got == want, (seed, d)


def test_fuzzy_pairs_no_cartesian(spark):
    """The candidate join must be a shuffle/broadcast EQUI-join on the
    variant — a cartesian or nested-loop node means the blocking failed
    and the operator would be all-pairs at scale."""
    from otlp_cardinality_checker_spark.operators.fuzzy import fuzzy_pairs

    part = spark.read.parquet(f"{SF}/part.parquet")
    plan = (
        fuzzy_pairs(part, "p_name", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deletion_variants_binomial_bound(spark):
    """Fan-out per string stays at sum_{i<=d} C(len, i) — the early
    distinct collapses duplicate intermediates (aab -> ab two ways)."""
    from otlp_cardinality_checker_spark.operators.fuzzy import (
        deletion_variants,
    )

    df = spark.createDataFrame([("abcdefgh",), ("aaaa",)], "s string")
    v = deletion_variants(df, "s", 2)
    counts = {
        r["s"]: r["n"]
        for r in v.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert counts["abcdefgh"] == 1 + 8 + 28  # all distinct chars: exact bound
    assert counts["aaaa"] == 3  # aaaa, aaa, aa — duplicates collapsed


# ---------------------------------------------------------------------------
# pps_sample_stats
# ---------------------------------------------------------------------------


def _py_pps_keep(doc_id: int, w: int, k: int, w_total: int,
                 salt: str = "") -> bool:
    t = min(1 << 32, (k * w * (1 << 32)) // w_total)
    if t >= 1 << 32:
        return True
    u = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8]
    return u < format(t, "08x")


def test_pps_membership_matches_python_oracle(spark):
    """Exact sample membership (id-sum + count per stratum) equals an
    independent Python recomputation of the integer thresholds."""
    from otlp_cardinality_checker_spark.operators.sampling import (
        pps_sample_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    w_total = sum(r["n_chars"] for r in rows)
    want: dict[str, tuple[int, int]] = {}
    for r in rows:
        kept = _py_pps_keep(r["doc_id"], r["n_chars"], 25, w_total)
        n, s = want.get(r["lang"], (0, 0))
        want[r["lang"]] = (n + kept, s + kept * r["doc_id"])
    got = {
        r["lang"]: (r["n_sampled"], r["sampled_id_sum"])
        for r in pps_sample_stats(docs, 25).collect()
    }
    assert got == want
    # deterministic under arbitrary repartitioning
    got2 = {
        r["lang"]: (r["n_sampled"], r["sampled_id_sum"])
        for r in pps_sample_stats(docs.repartition(13), 25).collect()
    }
    assert got2 == want


def test_pps_cap_keeps_everything(spark):
    """k >= W/min(w) drives every threshold to the cap: the sample is the
    full table and expected_n == n_total exactly."""
    from otlp_cardinality_checker_spark.operators.sampling import (
        pps_sample_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pps_sample_stats(docs, 10**6).collect()
    assert all(r["n_sampled"] == r["n_total"] for r in out)
    assert all(float(r["expected_n"]) == r["n_total"] for r in out)


def test_pps_salt_redraws_weighting_holds(spark):
    """Different salts give different (independent) samples; heavier docs
    are kept at a higher realized rate than lighter ones under the same
    draw (the PPS property, on the pooled corpus)."""
    from otlp_cardinality_checker_spark.operators.sampling import (
        pps_keep_expr,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .crossJoin(
            F.broadcast(
                spark.read.parquet(f"{SF}/documents.parquet").agg(
                    F.sum(F.col("n_chars").cast("long")).alias("w_total")
                )
            )
        )
        .withColumn("med", F.expr("percentile_approx(n_chars, 0.5) over ()"))
    )
    k = 60
    a = {
        r["doc_id"]
        for r in docs.where(
            pps_keep_expr(k, "n_chars", "doc_id", salt="a")
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in docs.where(
            pps_keep_expr(k, "n_chars", "doc_id", salt="b")
        ).collect()
    }
    assert a and b and a != b
    heavy = docs.where(F.col("n_chars") >= F.col("med"))
    light = docs.where(F.col("n_chars") < F.col("med"))
    rate_heavy = (
        heavy.where(pps_keep_expr(k, "n_chars", "doc_id")).count()
        / heavy.count()
    )
    rate_light = (
        light.where(pps_keep_expr(k, "n_chars", "doc_id")).count()
        / light.count()
    )
    assert rate_heavy > rate_light
