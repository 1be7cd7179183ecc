"""Arrow-batched pandas UDFs wrapping the extraction primitives.

These are the only Python-side operators in the engine's hot path, and
they are evaluated once per event (never per rule) and only on the
candidate subset that already passed the cheap JVM-side prefilters —
mirroring the reference's parse-once caching
(reference src/processors/engine.c:797-806).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sagan_spark.functions.extract import (
    DEFAULT_SAGAN_PORT,
    int_to_biased_hilo,
    json_flatten,
    parse_ip,
)

# array<struct> of positional IP hits; hi/lo are biased 64-bit halves of
# the 128-bit address for CIDR range predicates (see extract.int_to_biased_hilo)
IP_HIT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("ip", T.StringType()),
            T.StructField("port", T.IntegerType()),
            T.StructField("hi", T.LongType()),
            T.StructField("lo", T.LongType()),
        ]
    )
)

PARSE_IP_RESULT_TYPE = T.StructType(
    [
        T.StructField("ips", IP_HIT_TYPE),
        T.StructField("proto", T.IntegerType()),
    ]
)


def make_parse_ip_udf(sagan_port: int = DEFAULT_SAGAN_PORT, barrier: bool = True):
    """pandas UDF: text -> struct<ips: array<struct>, proto: int>.

    ``barrier=False`` for STREAMING plans: stateful streaming operators
    reject nondeterministic expressions, so the inlining barrier (see
    below) is batch-only; a micro-batch is small enough that the
    collapse-induced re-evaluation costs little there."""

    @F.pandas_udf(PARSE_IP_RESULT_TYPE)
    def parse_ip_udf(texts: pd.Series) -> pd.DataFrame:
        ips_out = []
        proto_out = []
        for msg in texts:
            hits, proto = parse_ip(msg if msg is not None else "", sagan_port)
            row = []
            for h in hits:
                hi, lo = int_to_biased_hilo(h.ip_int)
                row.append({"ip": h.ip, "port": h.port, "hi": hi, "lo": lo})
            ips_out.append(row)
            proto_out.append(proto)
        return pd.DataFrame({"ips": ips_out, "proto": proto_out})

    # The function IS deterministic; the flag is an optimizer barrier.
    # Without it CollapseProject inlines the UDF column through the
    # candidate filter and the plan evaluates Parse_IP TWICE — once
    # over ALL rows below the filter, once over candidates above it
    # (seen in the physical plan as two ArrowEvalPython nodes).
    return parse_ip_udf.asNondeterministic() if barrier else parse_ip_udf


def make_json_flatten_udf(barrier: bool = True):
    """pandas UDF factory: text -> map<string,string> of dotted keys
    (reference src/parsers/json.c:40-134).

    The '{ in first 3 chars' detection gate
    (reference src/processors/engine.c:250-263) runs vectorized so
    non-JSON rows (the vast majority of any log corpus) never enter
    per-row Python.

    A FACTORY, not two module aliases: ``asNondeterministic()`` mutates
    the underlying UserDefinedFunction in place, so flagging a shared
    object would silently make the 'deterministic streaming variant'
    nondeterministic too.  Each call builds a fresh UDF."""

    # the def name surfaces in the ArrowEvalPython plan node — keep the
    # json_flatten prefix the plan-shape regression tests key on
    @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def json_flatten_map(texts: pd.Series) -> pd.Series:
        out = pd.Series([{}] * len(texts), index=texts.index, dtype=object)
        mask = texts.str.slice(0, 3).str.contains("{", regex=False).fillna(False)
        if mask.any():
            out[mask] = texts[mask].map(json_flatten)
        return out

    # deterministic in fact; the flag is an optimizer barrier so the
    # flatten column is computed once and carried, not inlined and
    # re-evaluated above the candidate filter (see make_parse_ip_udf).
    # Streaming plans take barrier=False (stateful ops reject
    # nondeterminism).
    return json_flatten_map.asNondeterministic() if barrier else json_flatten_map


json_flatten_udf = make_json_flatten_udf(barrier=True)
json_flatten_udf_stream = make_json_flatten_udf(barrier=False)


def make_python_regex_udf(pattern: str, flags_str: str):
    """Fallback matcher for PCRE patterns Java regex can't express:
    batch-compiled Python re over Arrow batches
    (engine analog of reference src/pcre-s.c:39-68)."""
    import re as _re

    fl = 0
    for ch in flags_str:
        fl |= {"i": _re.I, "s": _re.S, "m": _re.M, "x": _re.X}.get(ch, 0)
    compiled = _re.compile(pattern, fl)

    @F.pandas_udf(T.BooleanType())
    def regex_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: bool(compiled.search(s)) if s is not None else False)

    return regex_udf
