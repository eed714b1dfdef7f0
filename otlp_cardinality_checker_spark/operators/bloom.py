"""Broadcast Bloom prefilter for exact membership at 100-TB scale.

The exact train/test contamination join (`dedup.py:cross_split_containment`
and the plain fingerprint equi-join) shuffles the *test* side against the
*train* side on the join key.  At production scale the train split is the
100-TB side; shuffling it to answer "which test fingerprints appear in
train?" is the classic anti-pattern.  The standard fix is a Bloom filter:

1. **Build** — hash every distinct train fingerprint to ``k`` bit
   positions (``pmod(xxhash64(v, seed_i), m)``) and keep the DISTINCT
   position set.  That relation is at most ``min(m, k * n_train)`` 64-bit
   ints — with ``m = 16 * n_train`` it is a few bytes per train item
   *regardless of fingerprint width*, small enough to broadcast.
2. **Prefilter** — explode each distinct test fingerprint into its ``k``
   positions, broadcast-join against the position set, and keep
   fingerprints with all ``k`` positions present.  False positives pass
   (Bloom property); false negatives cannot happen.
3. **Verify** — the surviving candidate set (tiny) is semi-joined back to
   the train fingerprints for exactness, then broadcast to filter the test
   rows.

Net effect: the full train side is scanned twice but **never shuffled**;
the only joins are broadcasts of bounded relations.  The result is EXACT —
the Bloom stage only ever widens the candidate set, and the verify join
removes every false positive (pinned by tests at absurdly small ``m``).

Everything is pure Catalyst (xxhash64/pmod/explode), no UDFs, and the
position set is mergeable (a union of per-partition distincts), so the
build is one map-side-combinable aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(df: DataFrame, value_col: str, m: int, k: int) -> DataFrame:
    pos = [
        F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(m))
        for i in range(k)
    ]
    return df.select(
        value_col, F.explode(F.array(*pos)).alias("pos")
    )


def build_bloom(train_vals: DataFrame, value_col: str, m: int,
                k: int) -> DataFrame:
    """Distinct bit-position relation of the train values (the filter)."""
    return _positions(train_vals, value_col, m, k).select("pos").distinct()


def bloom_candidates(test_vals: DataFrame, bloom: DataFrame, value_col: str,
                     m: int, k: int) -> DataFrame:
    """Test values whose k positions are ALL present in the filter —
    a superset of the true members (Bloom false positives included)."""
    return (
        _positions(test_vals, value_col, m, k)
        .join(F.broadcast(bloom), "pos")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .where(F.col("_hits") == k)
        .select(value_col)
    )


def exact_membership(
    train: DataFrame,
    test: DataFrame,
    value_col: str,
    m_per_item: int = 16,
    k: int = 4,
) -> DataFrame:
    """EXACT filter: test rows whose ``value_col`` appears in train.

    Bloom-prefiltered so the train side is never shuffled; the verify
    semi-join runs over candidates only.  Nulls never match (SQL IN
    semantics for the non-null domain)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    train_vals = (
        train.select(value_col).where(F.col(value_col).isNotNull()).distinct()
    )
    n = train_vals.count()
    m = max(64, m_per_item * max(n, 1))
    bloom = build_bloom(train_vals, value_col, m, k)
    test_vals = (
        test.select(value_col).where(F.col(value_col).isNotNull()).distinct()
    )
    cand = bloom_candidates(test_vals, bloom, value_col, m, k)
    # exactness: candidates (small) semi-join the train values; the train
    # scan stays shuffle-free because the candidate side is the broadcast
    verified = train_vals.join(F.broadcast(cand), value_col, "leftsemi")
    return test.join(F.broadcast(verified), value_col, "leftsemi")


def prefix_fingerprint(text_col: str | Column, n_words: int = 8) -> Column:
    """Leading-words fingerprint: lowercase, split on single spaces, first
    ``n_words`` tokens re-joined.  Deliberately simple and engine-portable
    (DuckDB: string_split + list slice) — the membership operator is
    fingerprint-agnostic; swap in md5(text) or a shingle hash as needed."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_join(F.slice(F.split(F.lower(col), " "), 1, n_words), " ")
