"""RFC 3986 relative-reference resolution as pure Spark Column
expressions — ``resolve_url(base, href)`` turns the raw ``href``
attribute values mined from crawl HTML into absolute URLs against the
page URL, so RELATIVE links (most links on the web) enter the link
graph instead of being silently dropped.

Semantics are pinned to CPython ``urllib.parse.urljoin`` (itself the
RFC 3986 §5.2 algorithm plus two documented CPython quirks), with
fragments stripped from the result — i.e. for every (base, href)
pair::

    resolve_url(base, href) == urldefrag(urljoin(base, href))[0]

(property-tested in tests/test_urlresolve.py over a fuzzed corpus).
The two CPython quirks faithfully reproduced, because downstream
users will diff this engine against urljoin:

1. an ABSOLUTE href (it has a scheme) and a SCHEME-RELATIVE href
   (``//host/…``) pass through WITHOUT dot-segment normalization —
   CPython only runs remove_dot_segments in the merge branches;
2. in the relative-merge branch (only), interior empty path segments
   of the merged path are removed before dot-segment processing
   (``urllib.parse.urljoin``'s ``filter(None, segments[1:-1])``).

Everything is built-in expression work — regex splits, one
``aggregate`` fold over the path segments (the RFC 5.2.4
remove_dot_segments stack), an index-aware ``filter`` — no Python, no
UDF, scan-level at 10^12 rows.  The reference engine has no URL
resolver (its inputs are syslog lines, not hyperlinked documents);
this exists because the corpus side of the pipeline mines link graphs
from Common-Crawl-style pages (BASELINE.json input_hint) where
``href="../x"`` is the COMMON case.

Preconditions: ``base`` must be an absolute hierarchical URL
(``scheme://authority…``, the pages-table ``url`` contract).  A NULL
or authority-less base yields the href unchanged-after-defrag (the
href may itself be absolute); callers filter non-http(s) results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: URI scheme prefix (RFC 3986 §3.1) — same char class CPython's
#: urlparse accepts
SCHEME_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"
#: fragment suffix; (?s) so a newline inside a (malformed) fragment
#: still strips
FRAGMENT_RE = r"(?s)#.*$"
#: scheme://authority head of an absolute hierarchical URL
_ROOT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def _strip_fragment(col: Column) -> Column:
    return F.regexp_replace(col, FRAGMENT_RE, "")


def _path_of(col: Column) -> Column:
    """Path part of a fragment-free path[?query] string."""
    return F.regexp_extract(col, r"^([^?]*)", 1)


def _query_suffix_of(col: Column) -> Column:
    """'?query' suffix ('' when there is none) of a fragment-free
    path[?query] string."""
    path = _path_of(col)
    return F.substring(col, F.length(path) + F.lit(1), F.length(col))


def remove_dot_segments(path: Column, *, interior_filter: bool) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments over a non-empty path
    string, CPython-urljoin flavored: split on '/', optionally drop
    interior empty segments (the merge-branch quirk), fold the
    '.'/'..' stack in ONE ``aggregate`` pass, re-append the trailing
    '' when the last raw segment was '.' or '..' (so '/a/b/..' keeps
    its directory slash), and re-root the join ('' -> '/', missing
    leading '/' restored — CPython's ``'/'.join(...) or '/'`` plus
    urlunsplit's netloc path fixup)."""
    segs = F.split(path, "/")
    if interior_filter:
        n = F.size(segs)
        segs = F.filter(
            segs, lambda s, i: (s != "") | (i == 0) | (i == n - F.lit(1))
        )
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            s == F.lit(".."),
            F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .when(s == F.lit("."), acc)
        .otherwise(F.concat(acc, F.array(s))),
    )
    folded = F.when(
        F.element_at(segs, -1).isin(".", ".."),
        F.concat(folded, F.array(F.lit(""))),
    ).otherwise(folded)
    joined = F.array_join(folded, "/")
    return (
        F.when(joined == "", F.lit("/"))
        .when(~joined.startswith("/"), F.concat(F.lit("/"), joined))
        .otherwise(joined)
    )


def href_value(raw: Column) -> Column:
    """Raw href ATTRIBUTE value -> resolvable reference: strip
    leading/trailing ASCII whitespace (the HTML attribute-value
    parsing rule browsers apply) and decode the character entities
    real markup escapes URLs with (``&amp;`` in query strings above
    all) — the htmltext ENTITIES table, one source of truth."""
    from sagan_spark.ops.htmltext import ENTITIES

    out = F.regexp_replace(raw, r"^[ \t\r\n\f]+|[ \t\r\n\f]+$", "")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def resolve_url(base: Column, href: Column) -> Column:
    """Absolute URL for ``href`` against page URL ``base`` —
    fragment-stripped urljoin (module docstring).  NULL-safe: NULL
    href resolves to NULL.  Two output normalizations beyond the raw
    join, both matching what CPython itself does whenever it rebuilds
    the URL: ASCII tab/newline bytes are removed anywhere in either
    input (urlsplit's WHATWG unsafe-byte removal), and the scheme is
    always lower-cased."""
    base = F.regexp_replace(base, r"[\t\r\n]", "")
    href = F.regexp_replace(href, r"[\t\r\n]", "")
    base0 = _strip_fragment(base)
    bscheme = F.lower(F.regexp_extract(base0, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    bnetloc = F.regexp_extract(base0, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    # scheme lower-cased in the reconstruction root, netloc kept
    # verbatim — urlunparse semantics
    broot = F.concat(bscheme, F.lit("://"), bnetloc)
    brest = F.substring(
        base0,
        F.length(F.regexp_extract(base0, _ROOT_RE, 0)) + F.lit(1),
        F.length(base0),
    )
    bpath = _path_of(brest)
    bqsuf = _query_suffix_of(brest)

    h0 = _strip_fragment(href)
    hscheme = F.lower(F.regexp_extract(h0, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    has_scheme = h0.rlike(SCHEME_PREFIX_RE)
    # same-scheme href: CPython strips the scheme and continues as a
    # scheme-less reference (so 'https:/p' from an https page is a
    # root-relative path, and 'https://x/a/../b' keeps its dot
    # segments via the netloc branch below)
    h1 = F.when(
        has_scheme & (hscheme == bscheme),
        F.regexp_replace(h0, SCHEME_PREFIX_RE, ""),
    ).otherwise(h0)

    # a '//' head whose netloc is EMPTY ('///p', '//', '//?q') is
    # consumed by urlparse as empty-authority: strip it and continue
    # with whatever remains as the path[?query] (the non-empty-netloc
    # case is branch 3 below, checked first)
    h2 = F.when(h1.rlike(r"^//"), F.regexp_replace(h1, r"^//", "")).otherwise(h1)
    hpath = _path_of(h2)
    hqsuf = _query_suffix_of(h2)
    hquery = F.substring(hqsuf, 2, F.length(hqsuf))  # content after '?'

    # relative-merge branch: base directory (path up to and including
    # the last '/'; '' stays '') + href path, interior-''-filtered
    base_dir = F.when(bpath == "", F.lit("")).otherwise(
        F.regexp_replace(bpath, r"[^/]*$", "")
    )
    merged = F.concat(base_dir, hpath)

    return (
        # 1. different-scheme absolute href: verbatim (minus fragment)
        F.when(has_scheme & (hscheme != bscheme), h0)
        # 2. empty reference: the base itself (minus fragment,
        #    scheme lower-cased)
        .when(h0 == "", F.concat(broot, brest))
        # 3. authority reference '//host…' with a NON-EMPTY netloc:
        #    base scheme + href, no path normalization (CPython
        #    netloc branch)
        .when(h1.rlike(r"^//[^/?#]"), F.concat(bscheme, F.lit(":"), h1))
        # 4. empty path: base path, href query if present else base's
        .when(
            hpath == "",
            F.concat(
                broot,
                bpath,
                F.when(hquery != "", hqsuf).otherwise(bqsuf),
            ),
        )
        # 5. root-relative path: normalize WITHOUT the interior filter
        .when(
            hpath.startswith("/"),
            F.concat(
                broot, remove_dot_segments(hpath, interior_filter=False), hqsuf
            ),
        )
        # 6. relative path: merge with base dir, interior-filter, normalize
        .otherwise(
            F.concat(
                broot, remove_dot_segments(merged, interior_filter=True), hqsuf
            )
        )
    )
