"""charset_sniff: BOM > header > meta precedence, UTF-16 bodies are
never decoded, both meta declaration forms and lax case/quoting are
caught, and the op stays scan-level."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.ops.htmlmeta import charset_sniff


def _pages(spark, rows):
    # rows: (url, bom_hex, body, headers)
    return spark.createDataFrame(
        rows, "url string, bh string, body string, headers string"
    ).select(
        "url",
        F.concat(F.unhex("bh"), F.encode("body", "UTF-8")).alias("html"),
        "headers",
    )


def test_charset_precedence_and_forms(spark):
    rows = [
        # BOM wins over both header and meta
        ("bom", "EFBBBF", '<meta charset="UTF-8">',
         "Content-Type: text/html; charset=ISO-8859-1"),
        # header wins over meta
        ("hdr", "", "<meta charset=utf-8>",
         'content-type: text/html; CHARSET="Shift_JIS"'),
        # legacy http-equiv form, single quotes, uppercase attrs
        ("leg", "",
         "<META HTTP-EQUIV='Content-Type'"
         " CONTENT='text/html; charset=windows-1252'>", None),
        # nothing declared
        ("non", "", "plain", "Content-Type: text/plain"),
        # 'content-type ... charset=' inside ANOTHER header's value
        # must NOT supply the header charset (line-start anchoring) —
        # the meta declaration wins instead
        ("dcy", "", "<meta charset=utf-8>",
         "X-Content-Type-Options: nosniff; see content-type charset=evil\r\n"
         "Via: proxy"),
    ]
    got = {r["url"]: r for r in charset_sniff(
        _pages(spark, rows), headers_col="headers").collect()}
    assert got["bom"]["charset"] == "utf-8" and got["bom"]["bom"] == "utf-8"
    assert got["bom"]["http_charset"] == "iso-8859-1"
    assert got["hdr"]["charset"] == "shift_jis"
    assert got["hdr"]["meta_charset"] == "utf-8"
    assert got["leg"]["charset"] == "windows-1252"
    assert got["non"]["charset"] == "unspecified"
    assert got["dcy"]["http_charset"] == ""
    assert got["dcy"]["charset"] == "utf-8"


def test_charset_utf16_not_decoded(spark):
    # UTF-16 BOM: the (nonsense-as-UTF-8) body must not be meta-sniffed
    rows = [
        ("le", "FFFE", '<meta charset="x-should-not-surface">', None),
        ("be", "FEFF", '<meta charset="x-should-not-surface">', None),
    ]
    got = {r["url"]: r for r in charset_sniff(
        _pages(spark, rows), headers_col="headers").collect()}
    assert got["le"]["charset"] == "utf-16le" and got["le"]["meta_charset"] == ""
    assert got["be"]["charset"] == "utf-16be" and got["be"]["meta_charset"] == ""


def test_charset_no_headers_col_and_null_html(spark):
    df = spark.createDataFrame(
        [("a", "<meta charset=KOI8-R>"), ("b", None)], "url string, body string"
    ).select("url", F.encode("body", "UTF-8").alias("html"))
    got = {r["url"]: r for r in charset_sniff(df).collect()}
    assert got["a"]["charset"] == "koi8-r" and got["a"]["http_charset"] == ""
    assert got["b"]["charset"] == "unspecified"


def test_charset_plan_scan_level(spark):
    df = spark.createDataFrame([("a", "x")], "url string, body string").select(
        "url", F.encode("body", "UTF-8").alias("html")
    )
    plan = charset_sniff(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
