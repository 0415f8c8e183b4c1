"""URL canonicalizer unit tests (llm/url.py) — RFC 3986 §6 edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.llm.url import canonical_url


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r[0] for r in df.select(canonical_url(F.col("url"))).collect()
    ]


CASES = [
    # scheme/host case, default https port, fragment
    (
        "HTTPS://WWW.Example.COM:443/Path/X#frag",
        "https://www.example.com/Path/X",
    ),
    # default http port
    ("http://example.com:80/a", "http://example.com/a"),
    # non-default port is KEPT
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # unreserved escapes decode; reserved (%2F) stays encoded
    (
        "https://e.com/%64ocs/%41%2Fb",
        "https://e.com/docs/A%2Fb",
    ),
    # lowercase hex digits in escapes
    ("https://e.com/%6aoe", "https://e.com/joe"),
    # invalid escape survives untouched
    ("https://e.com/a%zzb", "https://e.com/a%zzb"),
    # trailing slashes stripped on non-root, root kept
    ("https://e.com/a/b///", "https://e.com/a/b"),
    ("https://e.com/", "https://e.com/"),
    ("https://e.com", "https://e.com/"),
    # tracking params dropped, remainder sorted; all-tracking -> no query
    (
        "https://e.com/p?utm_source=x&b=2&a=1&gclid=zz",
        "https://e.com/p?a=1&b=2",
    ),
    ("https://e.com/p?utm_campaign=only", "https://e.com/p"),
    # query on a host with no path
    ("https://e.com?b=2&a=1", "https://e.com/?a=1&b=2"),
    # path case is preserved (only scheme+host lowercase)
    ("https://E.com/CaseSensitive", "https://e.com/CaseSensitive"),
    # a param NAMED like tracking only by substring is kept
    ("https://e.com/p?xutm_source=1", "https://e.com/p?xutm_source=1"),
]


@pytest.mark.parametrize("raw,expect", CASES, ids=[c[0][:40] for c in CASES])
def test_canonical_url_cases(spark, raw, expect):
    assert _canon(spark, [raw]) == [expect]


def test_variants_collapse(spark):
    variants = [
        "https://host3.example.com/docs/doc/43?page=1&ref=1",
        "HTTPS://Host3.EXAMPLE.com:443/docs/%64oc/43/?utm_source=feed&ref=1&page=1#frag",
        "https://HOST3.example.com/docs/doc/43?ref=1&page=1&gclid=abc123",
    ]
    got = set(_canon(spark, variants))
    assert got == {"https://host3.example.com/docs/doc/43?page=1&ref=1"}
