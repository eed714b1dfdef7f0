"""Dataset card: the one-call curation summary of a documents table.

The first artifact a training-data pipeline publishes about a corpus
(volume, language mix, length quantiles, quality pass rate, exact-dup
rate, token budget) — composed entirely from this package's existing
primitives so every number on the card is the SAME number the dedicated
operators report, and the whole card stays expressible as one DuckDB SQL
oracle (hash-exact, no estimates).

Output: long-form (section, metric, value) rows, every value a double
rounded to 6 — one stable schema regardless of how many languages or
quantiles the corpus produces, so downstream diffing of two cards is a
plain anti-join.

Scale shape: five independent single-scan aggregates (three of them
one-row) unioned driver-free; the only per-group output is the language
share (bounded by #languages) and the only distinct is the md5 digest
count (dedup.exact_dedup_stats' grain). Nothing here is quadratic and
nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _token_count, passes_quality

QUANTILES = (0.5, 0.9, 0.99)


def dataset_card(docs: DataFrame) -> DataFrame:
    """(section, metric, value) summary rows for a documents table."""
    n = F.count(F.lit(1))

    def row(section: str, metric, value) -> list:
        return [F.lit(section).alias("section"),
                metric if not isinstance(metric, str)
                else F.lit(metric).alias("metric"),
                F.round(value, 6).cast("double").alias("value")]

    volume = docs.agg(
        n.alias("_n"),
        F.sum(F.col("n_chars").cast("long")).alias("_chars"),
        F.sum(_token_count(F.coalesce(F.col("text"), F.lit("")))).alias(
            "_toks"
        ),
        F.sum(passes_quality().cast("long")).alias("_kept"),
        F.count_distinct(F.md5("text")).alias("_digests"),
    )
    scalars = volume.select(
        F.explode(
            F.array(
                F.struct(*row("volume", "n_docs", F.col("_n"))),
                F.struct(*row("volume", "total_chars", F.col("_chars"))),
                F.struct(
                    *row("volume", "avg_chars", F.col("_chars") / F.col("_n"))
                ),
                F.struct(
                    *row("tokens", "avg_tokens", F.col("_toks") / F.col("_n"))
                ),
                F.struct(*row("tokens", "total_tokens", F.col("_toks"))),
                F.struct(
                    *row("quality", "pass_rate", F.col("_kept") / F.col("_n"))
                ),
                F.struct(
                    *row(
                        "dedup",
                        "exact_dup_rate",
                        1.0 - F.col("_digests") / F.col("_n"),
                    )
                ),
            )
        ).alias("r")
    ).select("r.section", "r.metric", "r.value")

    total = docs.agg(n.alias("_n"))
    lang = (
        docs.groupBy(F.col("lang").alias("metric"))
        .agg(n.alias("_l"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit("lang").alias("section"),
            "metric",
            F.round(F.col("_l") / F.col("_n"), 6).cast("double").alias(
                "value"
            ),
        )
    )

    # exact interpolating percentiles — the same percentile()/quantile_cont
    # pairing turn_gaps hash-matches
    pct = docs.agg(
        F.percentile(
            F.col("n_chars").cast("double"),
            F.array(*[F.lit(q) for q in QUANTILES]),
        ).alias("_p")
    )
    length = pct.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        *row(
                            "length",
                            f"p{int(q * 100)}",
                            F.element_at("_p", i + 1),
                        )
                    )
                    for i, q in enumerate(QUANTILES)
                ]
            )
        ).alias("r")
    ).select("r.section", "r.metric", "r.value")

    return scalars.unionByName(lang).unionByName(length)


def card_diff(docs_a: DataFrame, docs_b: DataFrame) -> DataFrame:
    """Full-outer diff of two corpus cards — the snapshot-regression check
    a curation pipeline runs between ingests (did the language mix shift?
    did dup rate spike? did p99 length move?).

    Columns: section, metric, value_a, value_b, delta (b - a; NULL when a
    metric exists on one side only, e.g. a language present in only one
    corpus — deliberately NOT coalesced to 0, absence and zero differ).
    Both sides are full dataset_card computations; the join key space is
    the card's bounded (section, metric) grain, so the diff itself is a
    broadcast-sized join no matter how large the corpora are."""
    a = dataset_card(docs_a).withColumnRenamed("value", "value_a")
    b = dataset_card(docs_b).withColumnRenamed("value", "value_b")
    return a.join(b, ["section", "metric"], "full_outer").select(
        "section",
        "metric",
        "value_a",
        "value_b",
        F.round(F.col("value_b") - F.col("value_a"), 6).alias("delta"),
    )
