"""HTML -> text extraction spec: the Spark expression chain equals a
pure-Python re.sub twin of the declared spec on adversarial markup,
and the binary (UTF-8 byte) input path round-trips."""

from __future__ import annotations

import re

from sagan_spark.ops.htmltext import (
    COMMENT_RE,
    ENTITIES,
    SCRIPT_RE,
    STYLE_RE,
    TAG_RE,
    WS_RE,
    extract_text,
)

CASES = [
    "<html><body><p>plain text</p></body></html>",
    # script with attributes, markup inside, sloppy close
    '<script type="text/javascript">if (a < b) { x("</p>"); }</script >after',
    # style across lines
    "<style>\np { color: red; }\n</style>kept",
    # comments hiding tags
    "a<!-- <script>evil()</script> -->b",
    # entities, &amp;lt; must yield literal &lt;
    "x &lt;tag&gt; &amp;lt; &quot;q&quot; &#39;s&#39; &nbsp; &amp; y",
    # tag soup: attribute values with angle-ish content, unclosed tags
    '<a href="u?q=1&amp;r=2" title=big>link</a><br><hr/>',
    # whitespace variety
    "line1\r\n\tline2\f  line3",
    # nested-looking script (non-greedy stops at first close)
    "<script>a</script>mid<script>b</script>end",
    # case-insensitivity
    "<SCRIPT>gone</SCRIPT><STYLE>gone</STYLE><B>bold</B>",
    # empty and markup-only
    "",
    "<div><span></span></div>",
]


def py_twin(html: str) -> str:
    out = re.sub(SCRIPT_RE, " ", html)
    out = re.sub(STYLE_RE, " ", out)
    out = re.sub(COMMENT_RE, " ", out)
    out = re.sub(TAG_RE, " ", out)
    for ent, ch in ENTITIES:
        out = out.replace(ent, ch)
    out = re.sub(WS_RE, " ", out)
    return out.strip(" ")


def test_extract_matches_python_twin_on_adversarial_markup(spark):
    rows = [(i, c.encode("utf-8")) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {
        r.doc_id: r.text_extracted
        for r in extract_text(df).select("doc_id", "text_extracted").collect()
    }
    want = {i: py_twin(c) for i, c in enumerate(CASES)}
    assert got == want


def test_twin_spot_values():
    # pin a few absolute outputs so the spec itself (not just
    # twin-equality) is under test
    assert py_twin("<p>plain</p>") == "plain"
    assert py_twin("x &amp;lt; y") == "x &lt; y"
    assert py_twin("<script>a</script>mid<script>b</script>end") == "mid end"
    assert py_twin("a<!-- <script>s</script> -->b") == "a b"


def test_frame_from_pages_html_fallback(spark):
    """Rows with empty/NULL text extract their message from the html
    byte column; rows with text keep it untouched."""
    import pandas as pd
    import pyarrow as pa

    from sagan_spark.pipeline.engine import SaganSparkEngine

    rows = [
        ("u://x/0", "2026-01-01 00:00:01", b"", "has text already"),
        ("u://x/1", "2026-01-01 00:00:02",
         b"<html><body><p>from &amp; markup</p></body></html>", ""),
        ("u://x/2", "2026-01-01 00:00:03",
         b"<script>x</script><b>markup only</b>", None),
    ]
    tbl = pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array(
                [pd.Timestamp(r[1]) for r in rows], type=pa.timestamp("us")
            ),
            "html": [r[2] for r in rows],
            "text": pa.array([r[3] for r in rows], type=pa.string()),
            "lang": ["en" for _ in rows],
        }
    )
    pages = spark.createDataFrame(tbl.to_pandas())
    frame = SaganSparkEngine.frame_from_pages(pages, extract_from_html=True)
    got = {r.event_key: r.message for r in frame.select("event_key", "message").collect()}
    assert got == {
        "u://x/0": "has text already",
        "u://x/1": "from & markup",
        "u://x/2": "markup only",
    }


def test_robots_directives_vs_python_twin(spark):
    import re

    from sagan_spark.ops.htmltext import (
        ROBOTS_CONTENT_RE,
        ROBOTS_TAG_RE,
        robots_directives,
    )

    samples = [
        (1, '<head><meta name="robots" content="noindex, nofollow"></head>'),
        (2, "<meta NAME=ROBOTS CONTENT='none'>"),
        (3, "<meta name=robots content=nofollow >"),
        (4, "<p>no tag at all</p>"),
        (5, '<meta name="robots" content="INDEX, FOLLOW">'),
        (6, '<meta charset="x"><META name = robots content = "noindex">'),
        (7, '<meta name="robotsy" content="noindex">'),  # name mismatch
        (8, '<meta name="robots">'),  # tag without content attr
    ]
    docs = spark.createDataFrame(samples, "doc_id long, page string")
    pages = docs.selectExpr("doc_id", "encode(page, 'UTF-8') AS html")
    got = {
        r.doc_id: (r.robots_content, r.robots_noindex, r.robots_nofollow, r.robots_keep)
        for r in robots_directives(pages).collect()
    }

    for doc_id, page in samples:
        m = re.search(ROBOTS_TAG_RE, page)
        tag = m.group(0) if m else ""
        mc = re.search(ROBOTS_CONTENT_RE, tag)
        content = mc.group(1) if mc else ""
        dirs = [d.strip().lower() for d in content.split(",")]
        noindex = "noindex" in dirs or "none" in dirs
        nofollow = "nofollow" in dirs or "none" in dirs
        assert got[doc_id] == (content, noindex, nofollow, not noindex), doc_id

    # spot semantics: 'none' implies both; robotsy is NOT robots
    assert got[1] == ("noindex, nofollow", True, True, False)
    assert got[2] == ("none", True, True, False)
    assert got[3][1:] == (False, True, True)
    assert got[4] == ("", False, False, True)
    assert got[5] == ("INDEX, FOLLOW", False, False, True)
    assert got[6][1] is True
    assert got[7] == ("", False, False, True)
    assert got[8] == ("", False, False, True)


def test_robots_directives_plan_is_codegen_only(spark):
    from sagan_spark.ops.htmltext import robots_directives

    pages = spark.createDataFrame(
        [(1, bytearray(b"<p>x</p>"))], "doc_id long, html binary"
    )
    plan = robots_directives(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan, (
        "robots screen must be a map-only codegen pass"
    )
