"""Template mining operators.

Primary mode (deterministic masked templates) lives in the parse stage /
``aggregate.template_stats``. This module adds the **Drain fidelity mode**
(SURVEY.md §2.9 option 2): one Drain miner per ``(role, severity)`` group
inside a grouped-map pandas UDF, mirroring the reference's per-group miner
instancing (`internal/analyzer/logs.go:28-40`). Input is sorted by
``(conv_id, turn_idx)`` inside each group because Drain's output depends on
arrival order — sorting makes the distributed result deterministic.

Skew note: groups are (role, severity) — few and potentially huge. At
10^12-turn scale the miner itself is the reason to keep this a *fidelity*
mode; the deterministic mask-template mode is the scale path (pure hash
agg, salted). Drain state is bounded (max_clusters LRU) exactly like the
reference, so per-group memory is O(1).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

DRAIN_SCHEMA = (
    "role string, severity string, template string, count long, example string"
)


def drain_templates(
    routed: DataFrame,
    sim_threshold: float = 0.5,
    max_clusters: int = 1000,
) -> DataFrame:
    """Per-(role, severity) Drain clusters: template, count, first example."""

    def mine(pdf):
        import pandas as pd

        from ..functions.drain import DrainConfig, DrainMiner
        from ..functions.masking import mask_series

        pdf = pdf.sort_values(["conv_id", "turn_idx"])
        role = pdf["role"].iloc[0]
        severity = pdf["severity"].iloc[0]
        miner = DrainMiner(
            DrainConfig(sim_threshold=sim_threshold, max_clusters=max_clusters)
        )
        for masked in mask_series(pdf["text"].astype(str)):
            if masked.strip():
                miner.add(masked)
        rows = [
            (role, severity, template, count, example)
            for template, count, example in miner.clusters()
        ]
        return pd.DataFrame(
            rows, columns=["role", "severity", "template", "count", "example"]
        )

    return (
        routed.select("role", "severity", "conv_id", "turn_idx", "text")
        .groupBy("role", "severity")
        .applyInPandas(mine, schema=DRAIN_SCHEMA)
    )
