"""HTML -> text extraction over the pages table's ``html`` byte column.

The north-star pipeline reads Common-Crawl-style pages whose raw markup
arrives as ``html: binary``; training-data prep needs the visible text
(the reference engine normalizes its inputs before matching —
src/parsers/syslog.c strips transport framing the same way this strips
markup framing).  The extractor is a DECLARED SPEC — an ordered chain
of regex/literal rewrites chosen so every step is a built-in JVM
expression (whole-stage codegen, zero Python) AND expressible verbatim
in ANSI SQL for the DuckDB oracle:

1. decode the byte column as UTF-8,
2. drop <script ...>...</script> and <style ...>...</style> blocks
   (case-insensitive, dot-matches-newline),
3. drop <!-- comments -->,
4. replace every remaining tag <...> with one space,
5. decode the common named entities, ``&amp;`` LAST so ``&amp;lt;``
   yields the literal ``&lt;`` and not ``<``,
6. collapse runs of [space tab CR LF FF] to one space and trim.

The patterns avoid constructs where Java regex and RE2 semantics
diverge (no \\b, no \\s — explicit classes instead), so the Spark
column expression and the generated SQL compute byte-identical output.
The same constants drive both sides (html_text_sql), the pure-Python
twin in tests/test_htmltext.py pins the spec with re.sub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered rewrite spec (applied top to bottom)
SCRIPT_RE = r"(?is)<script([ \t\r\n\f][^>]*)?>.*?</script[ \t\r\n\f]*>"
STYLE_RE = r"(?is)<style([ \t\r\n\f][^>]*)?>.*?</style[ \t\r\n\f]*>"
COMMENT_RE = r"(?s)<!--.*?-->"
TAG_RE = r"<[^>]*>"
WS_RE = r"[ \t\r\n\f]+"

# literal entity decodes; &amp; MUST come last
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_text_expr(col: F.Column) -> F.Column:
    """The extraction chain over a STRING html column (pure built-in
    expressions — stays inside whole-stage codegen)."""
    out = F.regexp_replace(col, SCRIPT_RE, " ")
    out = F.regexp_replace(out, STYLE_RE, " ")
    out = F.regexp_replace(out, COMMENT_RE, " ")
    out = F.regexp_replace(out, TAG_RE, " ")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, WS_RE, " ")
    return F.trim(out)


def extract_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "text_extracted",
) -> DataFrame:
    """Append ``out_col`` with the extracted visible text of the
    ``html_col`` BYTE column (UTF-8).  One narrow projection, no
    shuffle, no Python — the per-url byte-identity invariant is carried
    by the deterministic spec, not by an execution mode."""
    return pages.withColumn(
        out_col, html_text_expr(F.decode(F.col(html_col), "UTF-8"))
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_text_sql(expr: str) -> str:
    """The SAME chain as ``html_text_expr`` in ANSI SQL (DuckDB
    regexp_replace needs explicit 'g'/'gs' flags where Spark replaces
    globally by default) — one source of truth for the oracle."""
    out = f"regexp_replace({expr}, {_sql_quote(SCRIPT_RE)}, ' ', 'g')"
    out = f"regexp_replace({out}, {_sql_quote(STYLE_RE)}, ' ', 'g')"
    out = f"regexp_replace({out}, {_sql_quote(COMMENT_RE)}, ' ', 'g')"
    out = f"regexp_replace({out}, {_sql_quote(TAG_RE)}, ' ', 'g')"
    for ent, ch in ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    out = f"regexp_replace({out}, {_sql_quote(WS_RE)}, ' ', 'g')"
    return f"trim({out})"


# robots meta-tag spec: leftmost <meta ... name=robots ...> tag, then
# its content attribute (quoted or bare).  Same Java-regex == RE2
# discipline as the extraction chain: no \s, no \b, NO BACKREFERENCES
# and NO LOOKAHEAD (RE2 has neither) — the name value is instead an
# explicit alternation of the two quoted forms and the bare form
# (terminated by whitespace, '/', or the tag's own '>'), so
# name="robotsy" can never match.
ROBOTS_TAG_RE = (
    r"(?i)<meta[^>]*name[ \t\r\n\f]*=[ \t\r\n\f]*"
    r"(?:\"robots\"[^>]*|'robots'[^>]*|robots[ \t\r\n\f/][^>]*|robots)>"
)
ROBOTS_CONTENT_RE = (
    r"(?i)content[ \t\r\n\f]*=[ \t\r\n\f]*[\"']?([^\"'>]*)"
)


def robots_directives(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robots meta-directive screen — the crawl-compliance gate a
    training-data pipeline runs before a page may enter the corpus
    (C4/CCNet-class pipelines honor ``noindex``; the reference engine's
    analogous pre-filter is its drop-before-parse ignore list,
    src/sagan-config.c ignore_list): extract the leftmost
    ``<meta name=robots content=...>`` directive list from the
    ``html_col`` BYTE column and flag it.

    Directives are split on ',', space-trimmed and lowercased;
    ``none`` means ``noindex, nofollow`` per the robots spec.
    ``robots_keep`` = no noindex directive (a page without the tag is
    indexable by default).  Returns (id, robots_content,
    robots_noindex, robots_nofollow, robots_keep).

    Pure whole-stage codegen — two regexp_extract + per-row array ops,
    no shuffle, no Python; at 10^12 pages this is a map-only pass that
    AQE folds into the scan stage."""
    s = F.decode(F.col(html_col), "UTF-8")
    tag = F.regexp_extract(s, ROBOTS_TAG_RE, 0)
    content = F.regexp_extract(tag, ROBOTS_CONTENT_RE, 1)
    directives = F.transform(F.split(content, ","), lambda x: F.lower(F.trim(x)))
    none = F.array_contains(directives, "none")
    noindex = F.array_contains(directives, "noindex") | none
    nofollow = F.array_contains(directives, "nofollow") | none
    return pages.select(
        F.col(id_col),
        content.alias("robots_content"),
        noindex.alias("robots_noindex"),
        nofollow.alias("robots_nofollow"),
        (~noindex).alias("robots_keep"),
    )


def robots_noindex_expr(s: Column) -> Column:
    """The noindex predicate alone over an html STRING Column — the
    Column twin of :func:`robots_noindex_sql`, shared by
    :func:`robots_directives` and ``webpipeline.ingest_pipeline`` so
    the directive-extraction spec lives in exactly one place."""
    tag = F.regexp_extract(s, ROBOTS_TAG_RE, 0)
    content = F.regexp_extract(tag, ROBOTS_CONTENT_RE, 1)
    directives = F.transform(F.split(content, ","), lambda x: F.lower(F.trim(x)))
    return F.array_contains(directives, "noindex") | F.array_contains(
        directives, "none"
    )


def robots_noindex_sql(expr: str) -> str:
    """The noindex predicate alone over an html STRING expression —
    the composable piece the ingest-pipeline oracle needs."""
    tag = f"regexp_extract({expr}, {_sql_quote(ROBOTS_TAG_RE)}, 0)"
    content = f"regexp_extract({tag}, {_sql_quote(ROBOTS_CONTENT_RE)}, 1)"
    dirs = f"list_transform(str_split({content}, ','), x -> lower(trim(x)))"
    return (
        f"(list_contains({dirs}, 'noindex')"
        f" OR list_contains({dirs}, 'none'))"
    )


def robots_sql(expr: str) -> str:
    """The SAME robots extraction as ``robots_directives`` in ANSI SQL
    over an html STRING expression — one source of truth for the
    oracle.  Emits a SELECT-list fragment (without the id column)."""
    tag = f"regexp_extract({expr}, {_sql_quote(ROBOTS_TAG_RE)}, 0)"
    content = f"regexp_extract({tag}, {_sql_quote(ROBOTS_CONTENT_RE)}, 1)"
    dirs = f"list_transform(str_split({content}, ','), x -> lower(trim(x)))"
    none = f"list_contains({dirs}, 'none')"
    noindex = f"(list_contains({dirs}, 'noindex') OR {none})"
    nofollow = f"(list_contains({dirs}, 'nofollow') OR {none})"
    return (
        f"{content} AS robots_content, {noindex} AS robots_noindex,"
        f" {nofollow} AS robots_nofollow, NOT {noindex} AS robots_keep"
    )
