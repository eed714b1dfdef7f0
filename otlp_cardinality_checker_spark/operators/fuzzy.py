"""Edit-distance fuzzy matching via FastSS deletion neighborhoods.

Record linkage / canonicalization for training-data curation: find every
pair of distinct strings within Levenshtein distance ``d`` WITHOUT the
all-pairs cross join. The published FastSS observation (Bocek et al. 2007;
the same neighborhood trick SymSpell popularized): if ``lev(s, t) <= d``
then deleting at most ``d`` characters from each string reaches a common
intermediate — every substitution deletes one char on each side, every
insert/delete deletes one char on one side. So

    candidates = equi-join on the <=d-deletion variant set
    result     = candidates where levenshtein(a, b) <= d

is COMPLETE (never misses a true pair); the verify filter removes the
false candidates the shared-variant condition admits.

Scale shape (the reason this survives a 100-TB vocabulary):

* The operator runs on the DISTINCT-string grain — ``fuzzy_pairs`` first
  collapses the input to (string, freq), so corpus size only affects one
  map-side-combined hash aggregation, never the pair join.
* Variant fan-out per string is sum_{i<=d} C(len, i) ~ len^d/d! rows of
  at most ``len`` chars — generated JVM-side with posexplode over a
  sequence, no Python in the loop.
* The candidate join is a plain equi-join on the variant string: Spark
  hash-partitions it like any shuffle join, and bucket sizes are bounded
  by how many strings share a variant (vocabulary-local, not corpus-
  sized). No cartesian product anywhere — pinned by a plan test.
* The verify filter is Catalyst's built-in ``levenshtein`` (JVM codegen).

The DuckDB oracle is deliberately NOT the same algorithm: it brute-forces
the distinct-string cross join with ``levenshtein(a,b) <= d``. Hash
equality therefore proves the bucketed algorithm equals the semantic
spec, not merely that two copies of one implementation agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(
    names: DataFrame, s_col: str, max_deletions: int
) -> DataFrame:
    """Distinct (s, variant) rows: every string reachable from ``s`` by
    deleting at most ``max_deletions`` characters (including ``s``).

    Built as ``max_deletions`` rounds of single-character deletion with a
    distinct between rounds (duplicate intermediates collapse early, so
    fan-out stays at the binomial bound instead of len!^d paths)."""
    level = names.select(F.col(s_col).alias("s"), F.col(s_col).alias("variant"))
    out = level
    for _ in range(max_deletions):
        # explode_outer + guard: keeps InferFiltersFromGenerate from
        # duplicating the variant-transform (dedup._capped_inverted_index)
        level = (
            level.where(F.length("variant") > 0)
            .select(
                "s",
                F.explode_outer(
                    F.expr(
                        "transform(sequence(1, length(variant)), p -> "
                        "concat(substring(variant, 1, p - 1), "
                        "substring(variant, p + 1, length(variant))))"
                    )
                ).alias("variant"),
            )
            .where(F.col("variant").isNotNull())
            .distinct()
        )
        out = out.unionByName(level)
    return out.distinct()


def fuzzy_pairs(
    df: DataFrame, s_col: str, max_dist: int = 2
) -> DataFrame:
    """All unordered pairs of distinct ``s_col`` values within Levenshtein
    distance ``max_dist``, with each side's corpus frequency.

    Columns: name_a, name_b (name_a < name_b), dist, freq_a, freq_b."""
    names = df.groupBy(F.col(s_col).alias("s")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    v = deletion_variants(names, "s", max_dist)
    cand = (
        v.alias("a")
        .join(v.alias("b"), on="variant")
        .where(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("name_a"), F.col("b.s").alias("name_b"))
        .distinct()
    )
    pairs = cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b")
    ).where(F.col("dist") <= max_dist)
    fa = names.select(
        F.col("s").alias("name_a"), F.col("freq").alias("freq_a")
    )
    fb = names.select(
        F.col("s").alias("name_b"), F.col("freq").alias("freq_b")
    )
    return pairs.join(fa, "name_a").join(fb, "name_b").select(
        "name_a", "name_b", "dist", "freq_a", "freq_b"
    )
