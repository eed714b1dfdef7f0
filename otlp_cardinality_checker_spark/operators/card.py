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


def transcript_card(routed: DataFrame) -> DataFrame:
    """The transcripts-side twin of :func:`dataset_card`: one-call
    conversation-health summary of a routed turn frame, in the same
    long-form (section, metric, value) schema.

    Sections: volume (turns/convs/avg depth), depth (exact interpolating
    p50/p90/p99 of conversation depth), gap (global inter-turn latency
    percentiles, seconds), role / sink / severity (share tables, bounded
    domains), tool (call share + distinct tools), loop (template-repeat
    pair rate + flagged-conversation share, the stuck-agent headline).

    Scale shape: conversation grain is ONE groupBy(conv_id) (depth, conv
    count, turn totals all derive from it — no count_distinct over raw
    rows); gaps are the module-standard conv_id lag window; shares are
    bounded-domain hash-aggs with broadcast totals; the loop section
    reuses template_loops (single conv_id exchange). Every number equals
    the dedicated operator's output and the whole card is one DuckDB SQL
    oracle.
    """
    from .conversation import template_loops

    def row(section: str, metric, value) -> list:
        return [F.lit(section).alias("section"),
                metric if not isinstance(metric, str)
                else F.lit(metric).alias("metric"),
                F.round(value, 6).cast("double").alias("value")]

    n = F.count(F.lit(1))

    conv = routed.groupBy("conv_id").agg(n.alias("depth"))
    conv_agg = conv.agg(
        n.alias("_convs"),
        F.sum("depth").alias("_turns"),
        F.percentile(
            F.col("depth").cast("double"),
            F.array(*[F.lit(q) for q in QUANTILES]),
        ).alias("_p"),
    )
    volume = conv_agg.select(
        F.explode(
            F.array(
                F.struct(*row("volume", "n_turns", F.col("_turns"))),
                F.struct(*row("volume", "n_convs", F.col("_convs"))),
                F.struct(
                    *row(
                        "volume",
                        "avg_depth",
                        F.col("_turns") / F.col("_convs"),
                    )
                ),
                *[
                    F.struct(
                        *row(
                            "depth",
                            f"p{int(q * 100)}",
                            F.element_at("_p", i + 1),
                        )
                    )
                    for i, q in enumerate(QUANTILES)
                ],
            )
        ).alias("r")
    ).select("r.section", "r.metric", "r.value")

    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap_s = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
    ) / 1_000_000.0
    gaps = (
        routed.select(gap_s.alias("gap_s"))
        .where(F.col("gap_s").isNotNull())
        .agg(
            F.percentile(
                F.col("gap_s"), F.array(F.lit(0.5), F.lit(0.9))
            ).alias("_p")
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        *row("gap", "p50_s", F.element_at("_p", 1))
                    ),
                    F.struct(
                        *row("gap", "p90_s", F.element_at("_p", 2))
                    ),
                )
            ).alias("r")
        )
        .select("r.section", "r.metric", "r.value")
    )

    total = routed.agg(
        n.alias("_n"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("_calls"),
        F.count_distinct("tool").alias("_tools"),
    )
    tools = total.select(
        F.explode(
            F.array(
                F.struct(
                    *row(
                        "tool",
                        "call_share",
                        F.col("_calls") / F.col("_n"),
                    )
                ),
                F.struct(*row("tool", "n_tools", F.col("_tools"))),
            )
        ).alias("r")
    ).select("r.section", "r.metric", "r.value")

    # the three share tables fold into ONE grouping-sets scan (one
    # Expand + one exchange instead of three scans each with its own
    # broadcast total); grouping_id keys the section, rows identical to
    # the per-column groupBys (r6; before/after in OPTIMIZATION_r06.md)
    t = F.broadcast(routed.agg(n.alias("_n")))
    gid = F.grouping_id()
    shares = (
        routed.groupingSets(
            [["role"], ["sink"], ["severity"]], "role", "sink", "severity"
        )
        .agg(n.alias("_c"), gid.alias("_gid"))
        .crossJoin(t)
        .select(
            F.when(F.col("_gid") == 3, F.lit("role"))
            .when(F.col("_gid") == 5, F.lit("sink"))
            .otherwise(F.lit("severity"))
            .alias("section"),
            F.when(F.col("_gid") == 3, F.col("role"))
            .when(F.col("_gid") == 5, F.col("sink"))
            .otherwise(F.col("severity"))
            .alias("metric"),
            F.round(F.col("_c") / F.col("_n"), 6)
            .cast("double")
            .alias("value"),
        )
    )

    # the parse stage already computed `template` on routed frames —
    # reuse it instead of re-running the 19-pass mask chain over `text`
    # (identical for default-pattern pipelines, which is what the
    # declared query runs; for a patterns_yaml pipeline the card's loop
    # section now reflects the pipeline's OWN templates rather than
    # silently re-masking with the builtin table — deliberate, r6).
    # Frames without the column (tests, ad-hoc inputs) derive it with
    # the builtin table via the guarded fast path.
    if "template" in routed.columns:
        loop_in = routed.select("conv_id", "turn_idx", "template")
    else:
        from ..functions.masking import with_template

        loop_in = with_template(
            routed.select("conv_id", "turn_idx", "text")
        ).select("conv_id", "turn_idx", "template")
    loops = template_loops(loop_in).agg(
        F.sum("n_repeat_pairs").alias("_pairs"),
        F.sum("n_turns").alias("_turns"),
        F.sum(F.col("flagged").cast("long")).alias("_flagged"),
        F.count(F.lit(1)).alias("_convs"),
    ).select(
        F.explode(
            F.array(
                F.struct(
                    *row(
                        "loop",
                        "repeat_pair_rate",
                        F.col("_pairs") / F.col("_turns"),
                    )
                ),
                F.struct(
                    *row(
                        "loop",
                        "flagged_conv_share",
                        F.col("_flagged") / F.col("_convs"),
                    )
                ),
            )
        ).alias("r")
    ).select("r.section", "r.metric", "r.value")

    return (
        volume.unionByName(gaps)
        .unionByName(tools)
        .unionByName(shares)
        .unionByName(loops)
    )
