"""URL/domain operators vs a pure-Python twin."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sagan_spark.ops.urltools import (
    HOST_RE,
    TWO_LEVEL_TLDS,
    blocklist_filter,
    domain_rollup,
    with_domain,
)

URLS = [
    (1, "https://www.example.com/a/b?q=1", "hello world one two"),
    (2, "http://user:pw@sub.shop.example.co.uk:8080/x", "three four"),
    (3, "https://EXAMPLE.ORG/", "five"),
    (4, "ftp://mirror.kernel.org/pub", "six seven eight"),
    (5, "not a url at all", "nine"),
    (6, "https://example.co.uk/only", "ten eleven"),
    (7, "https://deep.a.b.example.com/", "twelve"),
]


def py_host(url: str) -> str:
    m = re.match(HOST_RE, url)
    return m.group(1).lower() if m else ""


def py_domain(host: str) -> str:
    if not host:
        return ""
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    last2 = ".".join(parts[-2:])
    if last2 in TWO_LEVEL_TLDS:
        return ".".join(parts[-3:])
    return last2


@pytest.fixture()
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string, text string")


def test_with_domain_vs_python(urls_df):
    got = {r.doc_id: (r.host, r.domain) for r in with_domain(urls_df).collect()}
    for doc_id, url, _ in URLS:
        h = py_host(url)
        assert got[doc_id] == (h, py_domain(h)), (doc_id, url)
    # spot-pin the interesting shapes
    assert got[2] == ("sub.shop.example.co.uk", "example.co.uk")  # userinfo+port stripped, 2-level TLD
    assert got[3] == ("example.org", "example.org")  # lower-cased, bare eTLD+1
    assert got[5] == ("", "")  # no authority
    assert got[7] == ("deep.a.b.example.com", "example.com")


def test_domain_rollup_vs_python(urls_df):
    got = {
        r.domain: (r.n_docs, r.n_tokens, r.n_hosts)
        for r in domain_rollup(urls_df).collect()
    }
    agg: dict = {}
    for _, url, text in URLS:
        h = py_host(url)
        d = py_domain(h)
        docs, toks, hosts = agg.get(d, (0, 0, set()))
        agg[d] = (docs + 1, toks + len(text.split()), hosts | {h})
    assert got == {d: (n, t, len(hs)) for d, (n, t, hs) in agg.items()}


def test_blocklist_filter_list_and_df(spark, urls_df):
    kept = {r.doc_id for r in blocklist_filter(urls_df, ["example.com"]).collect()}
    assert kept == {2, 3, 4, 5, 6}
    only = {
        r.doc_id
        for r in blocklist_filter(urls_df, ["example.com"], keep=True).collect()
    }
    assert only == {1, 7}
    bl = spark.createDataFrame([("example.co.uk",)], "domain string")
    kept_df = {r.doc_id for r in blocklist_filter(urls_df, bl).collect()}
    assert kept_df == {1, 3, 4, 5, 7}
    # original schema preserved (helper columns dropped)
    assert blocklist_filter(urls_df, bl).columns == urls_df.columns
