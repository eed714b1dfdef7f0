"""Enrich stage: broadcast dimension joins + identity resolution.

Reference semantics:

* Service/identity resolution by priority list with an `unknown` fallback —
  `getServiceName` (`/root/reference/internal/analyzer/common.go:21-38`).
  Here: ``service = coalesce(role_class, 'unknown_service')`` after the
  role-dim join, and the final severity falls back to the dim's default when
  the text yields UNSET (FIXTURES.md §2).
* Dimension lookups are *broadcast hash joins* — the dims are tiny, so no
  shuffle of the fact side ever happens (the 100 TB-scale requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNKNOWN_SERVICE = "unknown_service"


def enrich_turns(parsed: DataFrame, role_dim: DataFrame, tool_dim: DataFrame) -> DataFrame:
    """Left-join both dims (broadcast) and resolve severity/service."""
    out = (
        parsed.join(F.broadcast(role_dim), on="role", how="left")
        .join(F.broadcast(tool_dim), on="tool", how="left")
        .withColumn(
            "severity",
            F.when(
                F.col("severity_inferred") == "UNSET",
                F.coalesce(F.col("severity_default"), F.lit("UNSET")),
            ).otherwise(F.col("severity_inferred")),
        )
        .withColumn(
            "service", F.coalesce(F.col("role_class"), F.lit(UNKNOWN_SERVICE))
        )
        .drop("severity_default")
    )
    return out
