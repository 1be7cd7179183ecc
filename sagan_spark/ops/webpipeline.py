"""End-to-end web ingest: WARC record → routed, typed, screened page
row — the composition a Common-Crawl consumer actually runs, wired
from this repo's scan-level primitives so THE WHOLE CHAIN stays one
whole-stage-codegen projection (parse → enrich → route in a single
pass, the reference engine's pipeline shape over markup instead of
syslog).

Stages (all built-in expressions, zero Python, no shuffle):

1. :func:`~sagan_spark.ops.warc.parse_warc` — record framing, HTTP
   status, declared MIME, body;
2. route gate: ``http_ok`` (2xx) and ``is_html`` (declared text/html)
   — computed as FLAGS, not filters, so the sink split and the reject
   counts come from one pass (the k7 fan-out discipline);
3. :func:`~sagan_spark.ops.htmltext.html_text_expr` — visible text;
4. :func:`~sagan_spark.ops.htmlmeta.meta_exprs` — title / canonical /
   og / declared language;
5. robots meta screen (the htmltext constants) — ``robots_keep``;
6. verdict: ``keep`` = http_ok ∧ is_html ∧ robots_keep ∧
   ``n_chars >= min_chars``, with the FIRST failing reason recorded
   (the reference routes by first matching rule; same discipline).

At 10^12 records this is a map-only pass AQE folds into the scan; the
downstream dedup/quality operators take its output columns directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sagan_spark.ops.htmltext import (
    html_text_expr,
    html_text_sql,
    robots_noindex_expr,
    robots_noindex_sql,
)
from sagan_spark.ops.htmlmeta import meta_exprs, meta_field_sqls
from sagan_spark.ops.warc import parse_warc, warc_sql


def ingest_pipeline(records: DataFrame, warc_col: str = "warc",
                    id_col: str = "doc_id",
                    min_chars: int = 20) -> DataFrame:
    """(id, target_uri, http_status, http_ok, is_html, robots_keep,
    title, html_lang, text_extracted, n_chars, reason, keep) per
    record."""
    parsed = parse_warc(records, warc_col=warc_col, id_col=id_col)
    body = F.col("body")
    http_ok = (F.col("http_status") >= 200) & (F.col("http_status") < 300)
    # MIME types are case-insensitive and MIME_RE preserves trailing
    # whitespace before CRLF/';' — real crawls carry 'Text/HTML' and
    # 'text/html ' (trailing space), both valid HTML responses
    is_html = F.lower(F.trim(F.col("mime"))) == "text/html"
    meta = meta_exprs(body)
    # one source of truth for the directive-extraction spec
    # (htmltext.robots_noindex_expr, the Column twin of the
    # robots_noindex_sql oracle fragment used below)
    robots_keep = ~robots_noindex_expr(body)
    text = html_text_expr(body)
    staged = parsed.select(
        F.col(id_col),
        F.col("target_uri"),
        F.col("http_status"),
        F.coalesce(http_ok, F.lit(False)).alias("http_ok"),
        is_html.alias("is_html"),
        robots_keep.alias("robots_keep"),
        meta["title"].alias("title"),
        meta["html_lang"].alias("html_lang"),
        text.alias("text_extracted"),
        F.length(text).cast("long").alias("n_chars"),
    )
    reason = (
        F.when(~F.col("http_ok"), F.lit("http_status"))
        .when(~F.col("is_html"), F.lit("mime"))
        .when(~F.col("robots_keep"), F.lit("robots"))
        .when(
            F.coalesce(F.col("n_chars"), F.lit(0)) < min_chars,
            F.lit("too_short"),
        )
        .otherwise(F.lit("ok"))
    )
    return staged.select(
        "*",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def ingest_pipeline_sql(rec_expr: str, table: str = "documents",
                        min_chars: int = 20) -> str:
    """The SAME chain in ANSI SQL over a record STRING expression —
    composed from the per-stage oracle fragments (warc_sql,
    html_text_sql, page_meta_sql, robots_sql): one source of truth per
    stage."""
    fields = meta_field_sqls("body")
    text = html_text_sql("body")
    return (
        f"WITH parsed AS (SELECT doc_id, {warc_sql(rec_expr)}"
        f" FROM {table}),"
        " staged AS (SELECT doc_id, target_uri, http_status,"
        " coalesce(http_status >= 200 AND http_status < 300, false)"
        "  AS http_ok,"
        " lower(trim(mime)) = 'text/html' AS is_html,"
        f" NOT {robots_noindex_sql('body')} AS robots_keep,"
        f" {fields['title']} AS title,"
        f" {fields['html_lang']} AS html_lang,"
        f" {text} AS text_extracted,"
        f" CAST(length({text}) AS BIGINT) AS n_chars"
        " FROM parsed),"
        " verdict AS (SELECT *, CASE"
        " WHEN NOT http_ok THEN 'http_status'"
        " WHEN NOT is_html THEN 'mime'"
        " WHEN NOT robots_keep THEN 'robots'"
        f" WHEN coalesce(n_chars, 0) < {int(min_chars)} THEN 'too_short'"
        " ELSE 'ok' END AS reason FROM staged)"
        " SELECT *, reason = 'ok' AS keep FROM verdict"
    )
