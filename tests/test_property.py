"""Property-based tests: the vectorized pandas implementations must equal
the scalar reference implementations on arbitrary inputs (hypothesis)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from otlp_cardinality_checker_spark.functions.attributes import (
    attrs_frame,
    extract_attrs,
)
from otlp_cardinality_checker_spark.functions.masking import (
    template_of,
    template_series,
)
from otlp_cardinality_checker_spark.functions.severity import (
    severity_of,
    severity_series,
)

# strings that stress the mask chain: quotes, urls, hex, digits, unicode
_CHARS = st.text(
    alphabet='abcdef0123456789 -:./?"=_<>*µ�é\uff11\u0662\u00a0漢',
    min_size=0,
    max_size=24,
)
_TOKENS = st.sampled_from(
    ["GET ", "http://", "user_", "error", "warn ", " retries", "txn_", "HTTP/1.1\" "]
)
TEXT = st.lists(st.one_of(_CHARS, _TOKENS), min_size=0, max_size=8).map("".join)


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_template_vectorized_equals_scalar(texts):
    s = pd.Series(texts, dtype="string")
    vec = template_series(s).tolist()
    scal = [template_of(t) for t in texts]
    assert vec == scal


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_severity_vectorized_equals_scalar(texts):
    s = pd.Series(texts, dtype="string")
    vec = list(severity_series(s))
    scal = [severity_of(t) for t in texts]
    assert vec == scal


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_attrs_vectorized_equals_scalar(texts):
    s = pd.Series(texts, dtype="string")
    frame = attrs_frame(s)
    for i, t in enumerate(texts):
        expected = extract_attrs(t)
        got = {
            k: v
            for k, v in frame.iloc[i].items()
            if v is not pd.NA and pd.notna(v)
        }
        assert got == expected
