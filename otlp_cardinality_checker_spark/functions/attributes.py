"""Grok-style attribute extraction from transcript text.

The reference flattens OTLP attribute key/value lists into
``map[string]string`` (`/root/reference/internal/analyzer/metrics.go:379-405`).
Transcripts carry no structured attributes, so the parse stage *extracts*
them from ``text`` with a fixed grok-like spec: one named capture per
attribute key. Values are strings (the reference stringifies all attribute
values at the boundary — `metrics.go:388-405`).

Both engines share ATTRIBUTE_SPECS:

* Catalyst: ``map_filter(map(k1, regexp_extract(...), ...), v != '')`` —
  one pass, JVM-side.
* pandas: ``Series.str.extract`` per spec inside the Arrow batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AttributeSpec:
    key: str
    # Ordered alternatives; first non-empty capture wins.
    regexes: tuple[str, ...]


ATTRIBUTE_SPECS: tuple[AttributeSpec, ...] = (
    AttributeSpec("user_id", (r"\buser_(\d+)\b", r"[?&]q=(\d+)\b", r"/users/(\d+)\b")),
    AttributeSpec("src_ip", (r"\bfrom ((?:\d{1,3}\.){3}\d{1,3})\b",)),
    AttributeSpec("client_ip", (r"\bclient ((?:\d{1,3}\.){3}\d{1,3})\b",)),
    AttributeSpec("http_status", (r'HTTP/[0-9.]+" (\d{3})\b',)),
    AttributeSpec("db_server", (r"\bdb-prod-(\d{2})\b",)),
    AttributeSpec("retries", (r"\bafter (\d+) retries\b",)),
    AttributeSpec("cache_key", (r"\bkey user:session:([0-9a-f]{16})\b",)),
    AttributeSpec("txn_id", (r"\btxn_([0-9a-f]{12})\b",)),
    AttributeSpec("duration_ms", (r"\bafter (\d+)ms\b",)),
    AttributeSpec("endpoint", (r"\bendpoint (/[^\s?]+)",)),
    AttributeSpec(
        "trace_id",
        (r"\btrace_id=([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})\b",),
    ),
    AttributeSpec("tool_name", (r"\btool_call name=(\w+)\b",)),
    AttributeSpec("args_len", (r"\bargs_len=(\d+)\b",)),
)

ATTRIBUTE_KEYS: tuple[str, ...] = tuple(s.key for s in ATTRIBUTE_SPECS)

_COMPILED = tuple(
    (spec, tuple(re.compile(r) for r in spec.regexes)) for spec in ATTRIBUTE_SPECS
)


def extract_attrs(text: str) -> dict[str, str]:
    """Scalar reference implementation (used for truth generation)."""
    out: dict[str, str] = {}
    s = text or ""
    for spec, rxs in _COMPILED:
        for rx in rxs:
            m = rx.search(s)
            if m and m.group(1):
                out[spec.key] = m.group(1)
                break
    return out


def _spec_expr(text: Column, spec: AttributeSpec) -> Column:
    alts = [F.regexp_extract(text, r, 1) for r in spec.regexes]
    v = alts[0]
    for a in alts[1:]:
        v = F.when(v != "", v).otherwise(a)
    return v


def attrs_map_expr(text: Column) -> Column:
    """Catalyst column producing ``map<string,string>`` of present attrs."""
    t = F.coalesce(text, F.lit(""))
    pairs: list[Column] = []
    for spec in ATTRIBUTE_SPECS:
        pairs.append(F.lit(spec.key))
        pairs.append(_spec_expr(t, spec))
    return F.map_filter(F.create_map(*pairs), lambda _, v: v != F.lit(""))


def attrs_frame(texts):
    """pandas engine: DataFrame with one (nullable string) column per key."""
    import pandas as pd

    s = texts.fillna("")
    out = {}
    for spec in ATTRIBUTE_SPECS:
        v = s.str.extract(spec.regexes[0], expand=False)
        for r in spec.regexes[1:]:
            alt = s.str.extract(r, expand=False)
            v = v.where(v.notna() & (v != ""), alt)
        out[spec.key] = v.where(v != "", pd.NA)
    return pd.DataFrame(out, index=s.index)
