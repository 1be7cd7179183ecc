"""resolve_url twin tests: the Spark expression resolver must agree
with CPython ``urldefrag(urljoin(base, href))[0]`` — the de-facto
RFC 3986 reference implementation — on a curated edge-case grid AND a
seeded fuzz corpus of component-assembled references (VERDICT r4 next
-round task #1).

Corpus restriction, by design: base URLs carry lower-case schemes
(the pages-table ``url`` contract after url_canonicalize) because the
op always lower-cases the output scheme while ``urljoin``'s
return-base short-circuit does not; one upper-case-scheme base WITH a
fragment (where urldefrag's rebuild lower-cases too) keeps that path
covered.
"""

from __future__ import annotations

import random
import re
from itertools import product
from urllib.parse import urldefrag, urljoin

from pyspark.sql import functions as F

from sagan_spark.ops.urlresolve import remove_dot_segments, resolve_url

_SCHEME = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")


def _expected(base: str, href: str) -> str:
    """Reference result: urldefrag(urljoin(...)) with ONE carve-out.
    For a DIFFERENT-scheme href urljoin passes the href through
    verbatim, but urldefrag then REBUILDS it, and CPython's
    urlunsplit inserts a spurious '//' into degenerate
    'scheme:path#frag' forms ('https:.#f' -> 'https:///.').  The op
    pins the verbatim pass-through (href minus fragment), which is
    what urljoin alone produces — so expected there is the textual
    defrag."""
    b = re.sub(r"[\t\r\n]", "", base)
    h = re.sub(r"[\t\r\n]", "", href)
    hs, bs = _SCHEME.match(h), _SCHEME.match(b)
    if hs and bs and hs.group(1).lower() != bs.group(1).lower():
        return h.split("#", 1)[0]
    return urldefrag(urljoin(b, h))[0]

BASES = [
    "https://h.com/a/b/c?q=1",
    "https://h.com/a/b/c",
    "https://h.com/a/b/",
    "https://h.com/",
    "https://h.com",
    "https://h.com/a//b/c",
    "http://user:pw@h.com:8080/a/b;p=1/c?q=1",
    "HTTPS://UPPER.example/Dir/Page.html?Q=Z#frag",
    "https://h.com/%7Euser/a/b",
]

CURATED_HREFS = [
    "", "#frag", "#", "?x=2", "?", "?#", ".", "..", "./", "../", "d",
    "d/e", "d/e/", "./d", "../d", "../../d", "../../../../d", "d/../e",
    "d/..", "d/./e", "/", "/d", "/d/e", "/./d", "/../d", "/d/../e",
    "/d/..", "/..", "/.", "//x.com", "//x.com/p", "//x.com/p/../q",
    "//x.com?q", "///p", "//", "https://x.com/p", "https://x.com/p/../q",
    "http://x.com/p/../q", "HTTPS://x.com/P", "https:/p/q", "https:p",
    "mailto:a@b.c", "javascript:void(0)", "g:h", "d?q", "d?q=1&r=2",
    "d/e?q", ";x=1", "g;x=1/../y", "a//b", "a//../b", "..//d", ".//d",
    "d//..//e", "p%20q/r", "%2e%2e/d", "a/b/c/../../../../x", "...",
    "..a", ".a", "a.", "a..", "/a/.../b", "./../d", ".././d", "../..",
    "../../", "d#f", "d?q#f", "a b", "/a b/c", "a\tb", "a\nb\rc",
]


def _fuzz_hrefs(n: int = 600) -> list[str]:
    """Seeded component-assembled relative references: every
    combination class the grammar allows, deterministic across
    runs."""
    rng = random.Random(0xC0FFEE)
    segs = ["a", "b2", "..", ".", "", "x.y", "p%20q", "idx.html", "...",
            "a@b", ";p=1", "~u"]
    heads = ["", "/", "./", "../", "../../", "//x.org/", "//", "https://z.io/",
             "http://z.io/", "https:", "g:"]
    tails = ["", "/", "/.", "/..", "?q=1", "?a=1&b=2", "#f", "?q#f"]
    out = []
    for _ in range(n):
        body = "/".join(rng.choice(segs) for _ in range(rng.randrange(0, 5)))
        out.append(rng.choice(heads) + body + rng.choice(tails))
    return out


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "base string, href string")
    rows = df.select(
        "base", "href",
        resolve_url(F.col("base"), F.col("href")).alias("got"),
    ).collect()
    bad = [
        (r["base"], r["href"], _expected(r["base"], r["href"]), r["got"])
        for r in rows
        if r["got"] != _expected(r["base"], r["href"])
    ]
    assert not bad, f"{len(bad)} urljoin mismatches, first 5: {bad[:5]}"


def test_resolve_url_matches_urljoin_curated(spark):
    _check(spark, [(b, h) for b, h in product(BASES, CURATED_HREFS)])


def test_resolve_url_matches_urljoin_fuzz(spark):
    hrefs = _fuzz_hrefs()
    # rotate bases through the fuzz corpus instead of a full cross
    # product: 600 distinct hrefs x 3 bases each
    pairs = [
        (BASES[(i + j) % len(BASES)], h)
        for i, h in enumerate(hrefs)
        for j in (0, 3, 6)
    ]
    _check(spark, pairs)


def test_remove_dot_segments_direct(spark):
    cases = {
        "/a/b/../c": "/a/c",
        "/a/./b/.": "/a/b/",
        "/..": "/",
        "/a/b/c/../../../..": "/",
        "/a//b/../c": "/a//c",  # interior '' kept without the filter
    }
    df = spark.createDataFrame([(p,) for p in cases], "p string")
    got = {
        r["p"]: r["o"]
        for r in df.select(
            "p",
            remove_dot_segments(F.col("p"), interior_filter=False).alias("o"),
        ).collect()
    }
    assert got == cases


def test_resolve_url_null_href(spark):
    df = spark.createDataFrame(
        [("https://h.com/a", None)], "base string, href string"
    )
    assert (
        df.select(resolve_url(F.col("base"), F.col("href")).alias("o"))
        .collect()[0]["o"]
        is None
    )
