"""Count-min sketch — mergeable approximate frequencies, engine-portable.

HLL answers "how many distinct"; the count-min sketch answers "how often
does value X occur" in fixed memory (d x w counters), with the one-sided
guarantee est >= true (overestimates only, by at most eps*N w.h.p.). Like
every aggregate in this pipeline it is MERGEABLE — two sketches add
cell-wise — so partial sketches per partition / micro-batch / session
combine exactly (the same partial+final design as the HLL key stats and
the rollup partials).

Unlike library sketches, the hash family here is md5-based and therefore
bit-reproducible in ANY engine — the DuckDB oracle rebuilds the exact
same counter table and point estimates, making a *sketch* fully
hash-checkable (HLL can only be band-checked).

Scale shape: build = one projection (d hashed bucket ids per row, via
posexplode of a fixed-size array) + one (depth, bucket) hash aggregation
over at most d*w output rows — map-side combined, no per-value state.
Query = broadcast the (tiny, <= d*w rows) sketch and take min over d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checksum import NULL_SENTINEL  # shared canonical NULL marker

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(value: F.Column, depth: int, width: int) -> F.Column:
    """Engine-portable bucket id: low 32 bits of md5(value || '#' || depth),
    mod width. (Positive: the 8-hex slice is < 2^32.)"""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(value, F.lit("#"), F.lit(str(depth))).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def _cells(value_col: str, depth: int, width: int) -> F.Column:
    """The d (depth, bucket) cells of a value — ONE definition shared by
    build and estimate, so the two sides can never hash differently."""
    v = F.coalesce(F.col(value_col).cast("string"), F.lit(NULL_SENTINEL))
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"), _bucket(v, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(depth, bucket, count) counter table for the value column."""
    return (
        df.select(F.explode(_cells(value_col, depth, width)).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition — partial sketches combine exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(
        F.sum("count").alias("count")
    )


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str = "value",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates: min over rows of the value's counter (est >= true).

    The sketch is <= depth*width rows by construction, so it broadcasts;
    estimating N values costs one broadcast join + one hash-agg.
    """
    probes = values.select(
        F.col(value_col),
        F.explode(_cells(value_col, depth, width)).alias("p"),
    ).select(value_col, F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est_count"))
    )
