"""WARC (Web ARChive, ISO 28500) record parsing — the native format of
Common-Crawl-style corpora, the upstream of the north-rule pages table.

A crawl snapshot arrives as WARC records: a CRLF-terminated header
block (``WARC/1.0`` version line + ``Name: value`` fields), a blank
line, then the payload — for ``response`` records an HTTP message that
itself has a status line, headers, a blank line, and the body
(the html bytes the rest of this engine consumes).  The reference
engine's equivalent stage is its transport-framing strip + field pull
(/root/reference/src/input-pipe.c, src/parsers/syslog.c): take a
framed raw record, emit typed columns.

This operator takes ONE RECORD PER ROW as a ``binary`` column (the
shape a splitting reader produces — at ingest scale the per-file split
on the ``\\r\\n\\r\\nWARC/1.0\\r\\n`` boundary is a cheap
``mapInPandas`` pass over whole .warc files; the per-record parse
below is where the real work and the engine contract live) and emits
the typed fields:

    warc_type, record_id, target_uri, warc_date, content_length,
    http_status, mime, body_len, body

Everything is built-in string expressions — split_part / substring /
regexp_extract in the RE2 ∩ Java-regex subset (``(?im)`` anchored
field names, explicit ``[ \\t]`` classes, no ``\\s``) — so the whole
parse is scan-level whole-stage codegen with zero Python, and the
DuckDB oracle (:func:`warc_sql`, same constants) computes
byte-identical output.  Declared spec: header lines are
CRLF-terminated (true of WARC by standard), the body begins after the
FIRST blank line of the HTTP section (bodies may themselves contain
``\\r\\n\\r\\n``), a record with no blank line yields empty
payload fields, and dates are kept as the ISO-8601 strings the format
carries (timestamp casting is a sink decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sagan_spark.ops.htmltext import _sql_quote

CRLF2 = "\r\n\r\n"
# chr() spelling so the SQL literal needs no escape-dialect agreement
CRLF2_SQL = "(chr(13)||chr(10)||chr(13)||chr(10))"

STATUS_RE = r"^HTTP/1\.[01][ \t]+([0-9]{3})"
MIME_RE = r"(?im)^Content-Type:[ \t]*([^\r\n;]*)"


def _hdr_re(name: str) -> str:
    """Leftmost ``Name: value`` header field (case-insensitive,
    line-anchored; value runs to end of line, excluding the CR)."""
    return rf"(?im)^{name}:[ \t]*([^\r\n]*)"


WARC_TYPE_RE = _hdr_re("WARC-Type")
RECORD_ID_RE = _hdr_re("WARC-Record-ID")
TARGET_URI_RE = _hdr_re("WARC-Target-URI")
WARC_DATE_RE = _hdr_re("WARC-Date")
CONTENT_LENGTH_RE = r"(?im)^Content-Length:[ \t]*([0-9]*)"


def parse_warc(records: DataFrame, warc_col: str = "warc",
               id_col: str = "doc_id") -> DataFrame:
    """Parse one WARC record per row from the ``warc_col`` BYTE column.

    Two split stages (WARC head / payload, then HTTP head / body) via
    split_part + substring — character positions, identical in both
    engines since the head sections are ASCII by standard — then
    anchored regexp_extract per field.  NULL records propagate to NULL
    outputs; absent fields come back as the empty string
    (regexp_extract's no-match value in both engines) and
    ``content_length`` / ``http_status`` as NULL via NULLIF + cast
    (the digits-only capture makes the ANSI cast total)."""
    s = F.decode(F.col(warc_col), "UTF-8")
    head = F.split_part(s, F.lit(CRLF2), F.lit(1))
    rest = F.substring(s, F.length(head) + F.lit(5), F.length(s))
    http_head = F.split_part(rest, F.lit(CRLF2), F.lit(1))
    body = F.substring(rest, F.length(http_head) + F.lit(5), F.length(rest))

    def hdr(pat: str):
        return F.regexp_extract(head, pat, 1)

    return records.select(
        F.col(id_col),
        hdr(WARC_TYPE_RE).alias("warc_type"),
        hdr(RECORD_ID_RE).alias("record_id"),
        hdr(TARGET_URI_RE).alias("target_uri"),
        hdr(WARC_DATE_RE).alias("warc_date"),
        F.nullif(hdr(CONTENT_LENGTH_RE), F.lit("")).cast("long").alias(
            "content_length"
        ),
        F.nullif(
            F.regexp_extract(http_head, STATUS_RE, 1), F.lit("")
        ).cast("long").alias("http_status"),
        F.regexp_extract(http_head, MIME_RE, 1).alias("mime"),
        F.length(body).cast("long").alias("body_len"),
        body.alias("body"),
    )


def warc_sql(expr: str) -> str:
    """The SAME parse as :func:`parse_warc` in ANSI SQL over a record
    STRING expression — one source of truth for the oracle.  Emits a
    SELECT-list fragment (without the id column)."""
    head = f"split_part({expr}, {CRLF2_SQL}, 1)"
    rest = f"substring({expr}, length({head}) + 5, length({expr}))"
    http_head = f"split_part({rest}, {CRLF2_SQL}, 1)"
    body = f"substring({rest}, length({http_head}) + 5, length({rest}))"

    def hdr(pat: str) -> str:
        return f"regexp_extract({head}, {_sql_quote(pat)}, 1)"

    clen = hdr(CONTENT_LENGTH_RE)
    status = f"regexp_extract({http_head}, {_sql_quote(STATUS_RE)}, 1)"
    mime = f"regexp_extract({http_head}, {_sql_quote(MIME_RE)}, 1)"
    return (
        f"{hdr(WARC_TYPE_RE)} AS warc_type,"
        f" {hdr(RECORD_ID_RE)} AS record_id,"
        f" {hdr(TARGET_URI_RE)} AS target_uri,"
        f" {hdr(WARC_DATE_RE)} AS warc_date,"
        f" CAST(NULLIF({clen}, '') AS BIGINT) AS content_length,"
        f" CAST(NULLIF({status}, '') AS BIGINT) AS http_status,"
        f" {mime} AS mime,"
        f" CAST(length({body}) AS BIGINT) AS body_len,"
        f" {body} AS body"
    )
