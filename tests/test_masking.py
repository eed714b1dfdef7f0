"""Golden masking/template tests.

Inputs mirror the reference's own golden corpus
(`/root/reference/internal/patterns/patterns_test.go`,
`pkg/autotemplate/miner_test.go`), re-targeted at this engine's documented
semantics (whitespace tokenization, added ISO-timestamp + trailing-digit-id
masks — see functions/masking.py docstring).
"""

from __future__ import annotations

import pytest

from otlp_cardinality_checker_spark.functions.masking import (
    is_variable_token,
    mask_text,
    template_of,
)
from otlp_cardinality_checker_spark.functions.severity import severity_of

GOLDEN_TEMPLATES = [
    (
        'INFO [2026-01-01 00:05:09] user user_42 logged in from 10.0.3.77',
        "INFO [<TIMESTAMP>] user user_<*> logged in from <IP>",
    ),
    (
        "ERROR failed to connect to database server db-prod-07 after 3 retries",
        "ERROR failed to connect to database server db-prod-<*> after <*> retries",
    ),
    (
        '"GET /api/v1/users/99/orders HTTP/1.1" 200 5123',
        "GET <URI> <STATUSCODE> <*>",
    ),
    (
        "DEBUG cache hit for key user:session:deadbeefdeadbeef",
        "DEBUG cache hit for key user:session:<ID>",
    ),
    (
        "payment gateway timeout for transaction txn_0123456789ab after 250ms",
        "payment gateway timeout for transaction txn_<ID> after <DURATION>",
    ),
    (
        "WARN rate limit exceeded for client 192.168.4.20 endpoint /api/v1/search?q=77",
        "WARN rate limit exceeded for client <IP> endpoint /api/v<*>/search",
    ),
    (
        "tool_call name=tool_3 args_len=9 trace_id=9e3779b1-0003-4005-8007-000043f41c39",
        "tool_call name=tool_<*> args_len=<*> trace_id=<ID>",
    ),
    ("", ""),
    # reference patterns_test.go-style cases
    (
        "request finished in 123ms with 45.2MB",
        "request finished in <DURATION> with <SIZE>",
    ),
    (
        "user alice@example.com logged out",
        "user <EMAIL> logged out",
    ),
    (
        'referrer "https://shop.example.com/cart" ignored',
        "referrer <URL> ignored",
    ),
    (
        "GET /api/v1/users/123/orders completed",
        "GET /api/v<*>/<PATH> completed",
    ),
]


@pytest.mark.parametrize("raw,expected", GOLDEN_TEMPLATES)
def test_golden_template(raw, expected):
    assert template_of(raw) == expected


def test_mask_uuid_before_hex():
    out = mask_text("id 9e3779b1-0003-4005-8007-000043f41c39 raw deadbeefcafe")
    assert out == "id <ID> raw <ID>"


def test_query_string_stripped():
    assert "q=" not in mask_text("GET /s?q=abc&page=2 done")


@pytest.mark.parametrize(
    "tok,expected",
    [
        ("123", True),
        ("-42", True),
        ("3.14", True),
        ("2025-09-01T05", True),
        ("05:39:27.100Z", True),
        ("deadbeef", True),
        ("10.0.0.1", True),
        ("49436Z", True),  # >=60% digits
        ("45ms", True),
        ("200KB", True),
        ("hello", False),
        ("user", False),
        ("a" * 30, True),  # pure hex >= 8 chars (tokenize.go hex rule)
        ("z" * 31, True),  # long-token collapse (> 30 chars)
        ("z" * 30, False),
        ("", False),
        ("db-prod", False),
    ],
)
def test_variable_token_heuristics(tok, expected):
    # mirrors reference tokenize.go:31-152 rule table
    assert is_variable_token(tok) is expected


@pytest.mark.parametrize(
    "body,expected",
    [
        ("something ERROR happened", "ERROR"),
        ("Warning: disk low", "WARN"),
        ("info: started", "INFO"),
        ("debugging session", "DEBUG"),
        ("all quiet", "UNSET"),
        ("", "UNSET"),
        ("error and warn both", "ERROR"),  # priority order
    ],
)
def test_severity_inference(body, expected):
    # mirrors reference logs.go:51-65 + logs_enrichment_test.go
    assert severity_of(body) == expected


def test_collapse_consecutive_wildcards():
    assert template_of("took 1 2 3 done") == "took <*> done"
