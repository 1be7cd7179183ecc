"""parse_warc spec: typed fields from crafted records, including the
degenerate shapes a real crawl file contains (no blank line, missing
headers, bodies containing the record separator, NULL records)."""

from __future__ import annotations

from sagan_spark.ops.warc import parse_warc


def _rec(headers: str, payload: str) -> bytes:
    return (headers + "\r\n\r\n" + payload).encode("utf-8")


FULL = _rec(
    "WARC/1.0\r\nWARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:42>\r\n"
    "WARC-Date: 2026-08-19T12:00:00Z\r\n"
    "WARC-Target-URI: https://example.com/a\r\n"
    "Content-Type: application/http; msgtype=response\r\n"
    "Content-Length: 78",
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
    "Content-Length: 11\r\n\r\nhello world",
)

# body itself contains \r\n\r\n — must split on the FIRST blank line only
TRICKY_BODY = _rec(
    "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 10",
    "HTTP/1.1 404 Not Found\r\n\r\npart1\r\n\r\npart2",
)

NO_BLANK = "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 0".encode()

LOWERCASE_HDRS = _rec(
    "WARC/1.0\r\nwarc-type: request\r\nwarc-target-uri: http://x.y/",
    "GET / HTTP/1.1\r\nHost: x.y\r\n\r\n",
)


def _parse(spark, recs):
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(recs)], "doc_id long, warc binary"
    )
    return {r["doc_id"]: r for r in parse_warc(df).collect()}


def test_full_record(spark):
    r = _parse(spark, [FULL])[0]
    assert r["warc_type"] == "response"
    assert r["record_id"] == "<urn:uuid:42>"
    assert r["target_uri"] == "https://example.com/a"
    assert r["warc_date"] == "2026-08-19T12:00:00Z"
    assert r["content_length"] == 78
    assert r["http_status"] == 200
    assert r["mime"] == "text/html"
    assert r["body"] == "hello world"
    assert r["body_len"] == 11


def test_body_containing_separator_splits_on_first_blank_line(spark):
    r = _parse(spark, [TRICKY_BODY])[0]
    assert r["http_status"] == 404
    assert r["body"] == "part1\r\n\r\npart2"


def test_no_blank_line_yields_empty_payload(spark):
    r = _parse(spark, [NO_BLANK])[0]
    assert r["warc_type"] == "metadata"
    assert r["content_length"] == 0
    assert r["http_status"] is None
    assert r["body"] == "" and r["body_len"] == 0


def test_header_names_case_insensitive(spark):
    r = _parse(spark, [LOWERCASE_HDRS])[0]
    assert r["warc_type"] == "request"
    assert r["target_uri"] == "http://x.y/"
    # request payload has no HTTP status line
    assert r["http_status"] is None
    assert r["content_length"] is None  # header absent entirely


def test_null_record_propagates(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, warc binary")
    r = parse_warc(df).collect()[0]
    assert r["warc_type"] is None and r["body_len"] is None


def test_ingest_pipeline_reason_branches(spark):
    from sagan_spark.ops.webpipeline import ingest_pipeline

    def rec(status, mime, body):
        return (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://x.y/\r\n\r\n"
            f"{status}\r\nContent-Type: {mime}\r\n\r\n{body}"
        ).encode()

    long_html = (
        '<html lang="de"><head><title> Big &amp; Bold </title></head>'
        "<body><p>enough visible text to pass the minimum easily</p></body>"
        "</html>"
    )
    rows = [
        (0, rec("HTTP/1.1 200 OK", "text/html", long_html)),          # ok
        (1, rec("HTTP/1.0 404 Not Found", "text/html", long_html)),   # http
        (2, rec("HTTP/1.1 200 OK", "application/pdf", long_html)),    # mime
        (3, rec("HTTP/1.1 200 OK", "text/html",
                '<meta name="robots" content="noindex">' + long_html)),
        (4, rec("HTTP/1.1 200 OK", "text/html", "<p>tiny</p>")),      # short
        (5, None),                                                    # corrupt
    ]
    df = spark.createDataFrame(rows, "doc_id long, warc binary")
    got = {r["doc_id"]: r for r in ingest_pipeline(df).collect()}
    assert got[0]["keep"] and got[0]["reason"] == "ok"
    assert got[0]["title"] == "Big & Bold" and got[0]["html_lang"] == "de"
    assert got[1]["reason"] == "http_status"
    assert got[2]["reason"] == "mime"
    assert got[3]["reason"] == "robots"
    assert got[4]["reason"] == "too_short"
    assert got[5]["reason"] == "http_status" and not got[5]["keep"]


def test_ingest_mime_case_and_whitespace_insensitive(spark):
    """MIME types are case-insensitive and headers may carry trailing
    whitespace before CRLF — 'Text/HTML' and 'text/html ' are valid
    HTML responses and must not be dropped with reason='mime'."""
    from sagan_spark.ops.webpipeline import ingest_pipeline

    def rec(mime, body):
        return (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://x.y/\r\n\r\n"
            f"HTTP/1.1 200 OK\r\nContent-Type: {mime}\r\n\r\n{body}"
        ).encode()

    body = "<html><body><p>enough visible text to pass the minimum easily</p></body></html>"
    rows = [
        (0, rec("Text/HTML", body)),
        (1, rec("text/html ", body)),
        (2, rec("TEXT/HTML", body)),
        (3, rec("application/PDF", body)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, warc binary")
    got = {r["doc_id"]: r for r in ingest_pipeline(df).collect()}
    assert got[0]["keep"] and got[1]["keep"] and got[2]["keep"]
    assert got[3]["reason"] == "mime"
