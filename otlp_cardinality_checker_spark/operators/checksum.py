"""Order-insensitive dataset fingerprints — migration/parity checking as a
first-class operator.

The north-rule acceptance check ("routed-row equality vs the reference")
needs to compare datasets ACROSS engines and partitionings without sorting
or collecting them. The fingerprint here is built from commutative
aggregates only, so it is independent of row order, partition count, and
engine:

* ``xor_digest`` — bit_xor of a 60-bit row digest (low 15 hex chars of
  md5 over the canonicalized row), catches any value change;
* ``sum_digest`` — exact integer sum of the same row digests (decimal, no
  overflow), catches what xor alone cannot: an even number of identical
  duplicate rows xors to zero, but shifts the sum;
* ``n_rows`` — the row count.

Two datasets agreeing on all three match as multisets with overwhelming
probability. md5 is bit-identical everywhere, the 60-bit slice fits a
signed 64-bit integer in every engine, and the DuckDB oracle reproduces
the digest exactly ('0x…'::BIGINT == Spark conv(hex, 16, 10)).

Scale shape: a scan + one projection + one hash aggregation (all
commutative partial aggregates — map-side combined); the grouped variant
adds only the group keys to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00<NULL>"
FIELD_SEP = "\x1f"


def _row_digest(cols: list[str]) -> F.Column:
    # each field is tagged ("N" for NULL, "V<len>:" for values) before
    # joining: without the length prefix, ('a\x1fb', 'c') and
    # ('a', 'b\x1fc') would canonicalize identically, and a literal value
    # equal to the NULL sentinel would collide with an actual NULL —
    # unacceptable ambiguity for an equality ACCEPTANCE check
    def field(c: str) -> F.Column:
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(s), F.lit(":"), s)
        )

    canon = F.concat_ws(FIELD_SEP, *[field(c) for c in cols])
    return F.conv(
        F.substring(F.md5(canon.cast("binary")), 18, 15), 16, 10
    ).cast("long")


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Multiset fingerprint of ``df`` (optionally per group).

    ``cols`` defaults to every non-group column, sorted by name so two
    frames with different column orders fingerprint identically.
    """
    groups = group_cols or []
    value_cols = sorted(cols or [c for c in df.columns if c not in groups])
    v = _row_digest(value_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(v).alias("xor_digest"),
        # decimal(38,0): a decimal(20) accumulator (-> decimal(30) sum)
        # would overflow around 10^12 rows of 60-bit digests under ANSI
        # mode; 38 digits carries ~10^19 rows
        F.sum(v.cast("decimal(38,0)")).cast("string").alias("sum_digest"),
    ]
    if groups:
        return df.groupBy(*groups).agg(*aggs)
    return df.agg(*aggs)
