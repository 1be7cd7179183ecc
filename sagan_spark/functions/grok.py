"""Grok-style named-group extraction (P6 — the reference's liblognorm
normalize stage, reference src/liblognormalize.c:105-260; run at most
once per message, reference src/processors/engine.c:736-745).

The reference feeds liblognorm a *rulebase* of sample-driven patterns
that extract src-ip / dst-ip / username / hostnames / proto into the
event record.  Here a pattern is a grok expression — ``%{IPV4:src_ip}``
style — compiled once on the driver into a Python named-group regex and
evaluated vectorized over Arrow batches with ``pandas.Series.str.extract``
(C-level loop; no per-row Python).  First matching pattern wins, like
liblognorm's longest-prefix rule resolution.

Only public grok syntax is implemented; the pattern library below is a
minimal, self-contained subset of the well-known grok base patterns.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# minimal base library (public grok pattern names)
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"[0-9A-Fa-f:]+:[0-9A-Fa-f:]*",
    "IP": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[0-9A-Fa-f:]+:[0-9A-Fa-f:]*)",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)+\b",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "PORT": r"\d{1,5}",
    "MD5": r"[0-9a-fA-F]{32}",
    "SHA1": r"[0-9a-fA-F]{40}",
    "SHA256": r"[0-9a-fA-F]{64}",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str, library: dict[str, str] | None = None) -> str:
    """``... %{IPV4:src_ip} ...`` -> Python named-group regex."""
    lib = {**BASE_PATTERNS, **(library or {})}

    def sub(m: re.Match) -> str:
        name, group = m.group(1), m.group(2)
        body = lib[name]  # KeyError = unknown pattern, surfaced at compile
        return f"(?P<{group}>{body})" if group else f"(?:{body})"

    return _GROK_TOKEN.sub(sub, pattern)


def grok_fields(patterns: list[str], library: dict[str, str] | None = None) -> list[str]:
    """Union of the named groups across a rulebase, in first-seen order."""
    out: list[str] = []
    for p in patterns:
        for m in _GROK_TOKEN.finditer(p):
            if m.group(2) and m.group(2) not in out:
                out.append(m.group(2))
    return out


def make_grok_udf(patterns: list[str], library: dict[str, str] | None = None):
    """pandas UDF: text -> struct<field: string, ...> for the rulebase.

    First pattern that matches supplies the fields (liblognorm
    first-resolution); non-matching rows yield nulls.  Extraction runs
    per-pattern via ``str.extract`` on the not-yet-matched remainder —
    vectorized, one C pass per pattern.
    """
    compiled = [grok_to_regex(p, library) for p in patterns]
    fields = grok_fields(patterns, library)
    out_type = T.StructType([T.StructField(f, T.StringType()) for f in fields])

    @F.pandas_udf(out_type)
    def grok_udf(texts: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(
            {f: pd.Series([None] * len(texts), index=texts.index, dtype=object) for f in fields}
        )
        remaining = texts.notna()
        for rx in compiled:
            if not remaining.any():
                break
            ext = texts[remaining].str.extract(rx)
            hit = ext.notna().any(axis=1)
            hit_idx = ext.index[hit]
            for col in ext.columns:
                out.loc[hit_idx, col] = ext.loc[hit_idx, col]
            remaining.loc[hit_idx] = False
        return out

    return grok_udf


def grok_extract(df, text_col: str, patterns: list[str],
                 library: dict[str, str] | None = None, prefix: str = "grok_"):
    """Attach one column per grok field (null where no pattern matched)."""
    udf = make_grok_udf(patterns, library)
    tmp = df.withColumn("_grok", udf(F.col(text_col)))
    for f in grok_fields(patterns, library):
        df_col: Column = F.col(f"_grok.{f}")
        tmp = tmp.withColumn(f"{prefix}{f}", df_col)
    return tmp.drop("_grok")
