"""Exact distributed heavy hitters: Misra-Gries candidates + verify scan.

The reference's deep-watch operator keeps *exact* per-value frequencies for
a handful of watched keys, capped at 10k uniques with an overflow flag
(`pkg/models/attribute.go:265-334`) — it simply cannot answer "which values
are frequent?" over an unbounded domain.  This operator answers exactly
that, at any domain size, with bounded memory and an **exact** result:

Stage 1 — candidates.  Each partition runs a weighted Misra-Gries summary
with ``k`` counters over its rows (``mapInPandas``; per Arrow batch the
update is one vectorized ``value_counts`` merge + one decrement step, never
per-row Python).  MG's guarantee: any value with partition frequency
``> n_p/(k+1)`` survives the partition's summary.  By the averaging
argument, any value with GLOBAL frequency ``> n/k`` must exceed
``n_p/k > n_p/(k+1)`` in at least one partition, so the union of all
partition summaries is a **superset** of every global heavy hitter.  State
per partition: ``<= 2k`` counters during a merge step, ``<= k`` after.

Stage 2 — verify.  The candidate set (``<= partitions x k`` values, tiny)
is broadcast back and the true counts of candidates-only are computed
exactly in a second scan.  Values failing the ``count*k > n`` bar are
dropped, so false candidates cost nothing but the broadcast.

Result: exactly the values with ``count > n/k``, with exact counts — the
classic two-pass distributed frequent-items algorithm.  At 100 TB this is
two sequential scans, one broadcast of a bounded candidate list, and one
hash aggregation over candidate rows only; no full groupBy over the
unbounded value domain ever happens.

No reference counterpart to cite beyond the watch family; the algorithm is
Misra & Gries (1982) / the weighted batch variant of Berinde et al. (2010).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(column: str, k: int):
    """Per-partition weighted Misra-Gries: yields the summary's keys."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[column].dropna().value_counts()
            if vc.empty:
                continue
            # vectorized merge: existing counters + this batch's counts
            merged = (
                pd.Series(counters).add(vc, fill_value=0)
                if counters
                else vc.astype("float64")
            )
            if len(merged) > k:
                # subtract the (k+1)-th largest from everyone, drop <= 0:
                # the weighted MG decrement; total subtracted mass per
                # partition is <= n_p/(k+1), which bounds the error
                cut = merged.nlargest(k + 1).iloc[-1]
                merged = merged - cut
                merged = merged[merged > 0]
            counters = merged.to_dict()
        yield pd.DataFrame({column: pd.Series(list(counters.keys()))})

    return gen


def heavy_hitters(df: DataFrame, column: str, k: int) -> DataFrame:
    """All values of ``column`` with exact ``count > n/k`` (nulls ignored).

    Returns ``(value, count, share)`` with share rounded to 6 decimals,
    ordered by count desc then value — exact and deterministic regardless
    of partition layout (the MG stage only widens the candidate set).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    col_field = df.schema[column]
    candidates = (
        df.select(column)
        .mapInPandas(
            _mg_partition(column, k),
            schema=f"`{column}` {col_field.dataType.simpleString()}",
        )
        .distinct()
    )
    n = df.where(F.col(column).isNotNull()).count()
    counts = (
        df.join(F.broadcast(candidates), on=column, how="leftsemi")
        .where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("count"))
        # strict classic bar: global frequency strictly above n/k
        .where(F.col("count") * k > F.lit(n))
    )
    return (
        counts.select(
            F.col(column).alias("value"),
            F.col("count"),
            F.round(F.col("count") / F.lit(n), 6).alias("share"),
        )
        .orderBy(F.desc("count"), "value")
    )
