"""Cardinality report sink (SURVEY.md §2.1 S5).

Reference: `internal/report/generator.go:24-59` + `model.go:73-121` — emit a
severity-graded text/JSON cardinality report and a CI exit code
(warn >= 1000, critical >= 10000 by default; exit 1 on critical when
`exit_on_threshold`).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARN_THRESHOLD = 1000
CRITICAL_THRESHOLD = 10000


@dataclass
class Report:
    entries: list[dict]
    n_warning: int
    n_critical: int

    @property
    def exit_code(self) -> int:
        return 1 if self.n_critical > 0 else 0

    def to_json(self) -> str:
        return json.dumps(
            {
                "entries": self.entries,
                "n_warning": self.n_warning,
                "n_critical": self.n_critical,
                "exit_code": self.exit_code,
            },
            indent=2,
        )

    def to_text(self) -> str:
        lines = ["CARDINALITY REPORT", "=================="]
        for e in self.entries:
            lines.append(
                f"[{e['level'].upper():8s}] {e['sink']}/{e['key']}: "
                f"cardinality={e['est_cardinality']} count={e['count']}"
            )
        lines.append(
            f"warnings={self.n_warning} critical={self.n_critical} "
            f"exit={self.exit_code}"
        )
        return "\n".join(lines)


def generate_report(
    key_stats_df: DataFrame,
    warn: int = WARN_THRESHOLD,
    critical: int = CRITICAL_THRESHOLD,
    limit: int = 100,
) -> Report:
    level = (
        F.when(F.col("est_cardinality") >= critical, F.lit("critical"))
        .when(F.col("est_cardinality") >= warn, F.lit("warning"))
        .otherwise(F.lit("ok"))
    )
    graded = key_stats_df.withColumn("level", level)
    rows = (
        graded.orderBy(F.desc("est_cardinality"), F.asc("sink"), F.asc("key"))
        .limit(limit)
        .select("sink", "key", "count", "est_cardinality", "level")
        .collect()
    )
    entries = [r.asDict() for r in rows]
    # severity counts over the FULL frame, not just the displayed page —
    # with > `limit` warning-level keys the page undercounts (criticals
    # sort first, so exit_code happened to stay right; the counts didn't)
    counts = {
        r["level"]: r["n"]
        for r in graded.groupBy("level")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return Report(
        entries=entries,
        n_warning=counts.get("warning", 0),
        n_critical=counts.get("critical", 0),
    )
