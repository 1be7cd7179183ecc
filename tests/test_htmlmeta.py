"""page_metadata spec: the Spark extraction equals a pure-Python re
twin of the declared spec on adversarial markup (attr forms, entity
order, absent fields, near-miss attribute names)."""

from __future__ import annotations

import re

from sagan_spark.ops.htmlmeta import (
    CANONICAL_TAG_RE,
    CONTENT_ATTR_RE,
    HREF_ATTR_RE,
    HTML_LANG_RE,
    META_DESC_TAG_RE,
    OG_TITLE_TAG_RE,
    TITLE_RE,
    page_metadata,
)
from sagan_spark.ops.htmltext import ENTITIES, WS_RE

CASES = [
    # all five fields, quoted forms
    '<html lang="en-GB"><head><title> A &amp;lt; B &nbsp; </title>'
    '<meta name="description" content="hello world">'
    '<meta property="og:title" content="OG title">'
    '<link rel="canonical" href="https://e.com/x"></head><body></body></html>',
    # single-quoted + bare attr forms, uppercase names
    "<HTML LANG=fr><head><TITLE>t</TITLE>"
    "<meta NAME='description' CONTENT='d one'>"
    "<LINK REL=canonical HREF=/rel/path></head>",
    # near-miss names must NOT match
    '<html><head><meta name="descriptionx" content="no">'
    '<meta name="xdescription" content="no">'
    '<link rel="canonicalx" href="no"></head>',
    # no fields at all
    "<html><body>text only</body></html>",
    # leftmost-wins on duplicates; title with nested-lookalike
    '<html lang=de lang=fr><head><title>first</title><title>second</title>'
    '<meta name=description content=bare-one>'
    '<meta name=description content=bare-two></head>',
    # lang attr requires preceding whitespace (xml:lang alone no match
    # for the html pattern's lang group start)
    "<html xml:lang='zz' lang='pt-BR'>",
    # empty html
    "",
    # attributes before the discriminating one
    '<meta content="early" name="description">'
    '<link href="/first" rel=canonical>',
]


def _clean(s: str) -> str:
    for ent, ch in ENTITIES:
        s = s.replace(ent, ch)
    return re.sub(WS_RE, " ", s).strip()


def _x(pat: str, grp: int, s: str) -> str:
    m = re.search(pat, s)
    return m.group(grp) or "" if m and m.group(grp) is not None else ""


def py_twin(html: str) -> dict:
    return {
        "title": _clean(_x(TITLE_RE, 1, html)),
        "meta_description": _clean(
            _x(CONTENT_ATTR_RE, 1, _x(META_DESC_TAG_RE, 0, html))
        ),
        "canonical_url": _x(HREF_ATTR_RE, 1, _x(CANONICAL_TAG_RE, 0, html)),
        "og_title": _clean(
            _x(CONTENT_ATTR_RE, 1, _x(OG_TITLE_TAG_RE, 0, html))
        ),
        "html_lang": _x(HTML_LANG_RE, 1, html).lower(),
    }


def test_page_metadata_matches_python_twin(spark):
    rows = [(i, c.encode("utf-8")) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {
        r["doc_id"]: r.asDict() for r in page_metadata(df).collect()
    }
    for i, case in enumerate(CASES):
        want = py_twin(case)
        have = {k: v for k, v in got[i].items() if k != "doc_id"}
        assert have == want, f"case {i}: {case!r}\n got {have}\nwant {want}"


def test_expected_values_spotcheck(spark):
    df = spark.createDataFrame(
        [(0, CASES[0].encode()), (1, CASES[1].encode()), (4, CASES[4].encode())],
        "doc_id long, html binary",
    )
    out = {r["doc_id"]: r for r in page_metadata(df).collect()}
    assert out[0]["title"] == "A &lt; B"
    assert out[0]["meta_description"] == "hello world"
    assert out[0]["og_title"] == "OG title"
    assert out[0]["canonical_url"] == "https://e.com/x"
    assert out[0]["html_lang"] == "en-gb"
    assert out[1]["meta_description"] == "d one"
    assert out[1]["canonical_url"] == "/rel/path"
    assert out[1]["html_lang"] == "fr"
    # leftmost wins
    assert out[4]["title"] == "first"
    assert out[4]["meta_description"] == "bare-one"


def test_null_html_propagates(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, html binary")
    row = page_metadata(df).collect()[0]
    assert row["title"] is None and row["html_lang"] is None
