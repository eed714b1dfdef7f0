"""DSIR-style importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169, public): score every pool document by how much more
likely it is under a TARGET distribution (a curated sample you want more
of) than under the SOURCE pool distribution, using hashed bag-of-n-gram
language models — then resample the pool by those weights. This is the
modern replacement for hand-written quality heuristics when a trusted
target corpus exists.

log w(x) = sum over x's {1,2}-grams g of  c_g * [ ln p_target(b(g))
                                                 - ln p_source(b(g)) ]

with b(g) a hash bucket (here: the first 4 hex chars of md5(g) as an
integer, mod ``n_buckets`` — the md5 idiom every cross-engine operator in
this package uses, so the DuckDB oracle reproduces the weights exactly)
and both models add-one smoothed over the bucket space.

Scale shape: ONE tokenization builds unigrams + zip-shift bigrams
row-locally (split materialized first, per the HOF rule); ONE explode to
(doc, bucket, c) via a map-side-combinable hash-agg; both LMs are
``n_buckets``-row aggregates derived from that frame (never a second
corpus pass) and BROADCAST back; the per-doc weight is one more hash-agg.
No windows, no UDFs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1024


def _toks(text_col: Column, min_len: int = 1) -> Column:
    """Letters-only token array; the caller zips it against its own shift
    to append bigrams ('w1 w2')."""
    return F.filter(
        F.split(F.lower(text_col), "[^a-z]+"),
        lambda t: F.length(t) >= min_len,
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = N_BUCKETS,
    min_len: int = 1,
) -> DataFrame:
    """Per-pool-document DSIR log importance weight.

    ``is_target`` marks the curated target sample; every OTHER document
    is the pool and gets a weight. Returns (doc_id, lang, n_grams,
    log_weight) with log_weight rounded to 4 places — positive means
    "more target-like than the pool average", the resampling key.
    """
    with_t = docs.select(
        "doc_id",
        "lang",
        is_target.alias("_tgt"),
        _toks(F.col("text"), min_len).alias("_t"),
    )
    n_pairs = F.greatest(F.size("_t") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("_t", 1, n_pairs),
        F.slice(F.col("_t"), 2, n_pairs),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(F.col("_t"), bigrams)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("gram")), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(n_buckets),
    )
    doc_buckets = (
        with_t.select(
            "doc_id",
            "lang",
            "_tgt",
            F.explode_outer(grams).alias("gram"),
        )
        .where(F.col("gram").isNotNull())  # see dedup._capped_inverted_index
        .select("doc_id", "lang", "_tgt", bucket.alias("b"))
        .groupBy("doc_id", "lang", "_tgt", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tgt = (
        doc_buckets.where(F.col("_tgt"))
        .groupBy("b")
        .agg(F.sum("c").alias("tc"))
    )
    src = (
        doc_buckets.where(~F.col("_tgt"))
        .groupBy("b")
        .agg(F.sum("c").alias("sc"))
    )
    t_total = tgt.agg(F.sum("tc").alias("t_n"))
    s_total = src.agg(F.sum("sc").alias("s_n"))
    # full outer on the bucket space: a bucket unseen in one model still
    # contributes its smoothed ln(1/(N+B)) term
    ratio = (
        tgt.join(src, "b", "full_outer")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(s_total))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                    / (F.col("t_n") + n_buckets).cast("double")
                )
                - F.log(
                    (F.coalesce(F.col("sc"), F.lit(0)) + 1)
                    / (F.col("s_n") + n_buckets).cast("double")
                )
            ).alias("log_ratio"),
        )
    )
    return (
        doc_buckets.where(~F.col("_tgt"))
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("log_ratio")), 4).alias(
                "log_weight"
            ),
        )
    )
