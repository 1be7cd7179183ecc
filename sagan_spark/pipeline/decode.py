"""Raw-line decoders: S5 pipe format and S6 JSON input -> the canonical
event frame, so a reference user can point the engine at the same raw
syslog feed the reference consumes.

S5 (reference SyslogInput_Pipe, src/input-pipe.c:41-347): the line is
``host|facility|priority|level|tag|date|time|program|message`` where the
message keeps any further '|' (the reference strseps the remainder).
Per-field malformed handling replicated exactly:

- host must be a literal IPv4/IPv6 address, else it is REPLACED with the
  configured sagan_host and malformed_host counts
  (src/input-pipe.c:67-82; DNS mode is off by default and out of scope,
  etc/sagan.yaml:131);
- any missing later field becomes the literal ``SAGAN: <FIELD> ERROR``
  string and counts malformed_<field> (src/input-pipe.c:160-330);
- a missing message also counts sagan_log_drop (src/input-pipe.c:318);
- the message truncates at the first newline (src/input-pipe.c:342-346).

S6 (reference SyslogInput_JSON, src/input-json.c:47-240): the whole
line is JSON; configured key lists map onto the standard fields,
first-match-wins per field; the special map value ``%JSON%`` makes the
whole document the message (src/input-json.c:97-101).

Everything is pure Catalyst (split/coalesce/regex) — decode cost is one
codegen'd projection, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# THE shared dotted-quad accept regex (see enrich.V4_RE docstring)
from sagan_spark.pipeline.enrich import V4_RE as _V4_RE
# pragmatic IPv6 shape check (hex groups + optional '::' + v4 tail);
# inet_pton is stricter on degenerate forms — the corpus pins v4
_V6_RE = r"^(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|::([0-9a-fA-F]{1,4}:){0,6}[0-9a-fA-F]{1,4}|::)$"

PIPE_FIELDS = ["facility", "priority", "level", "tag", "date", "time", "program"]

MALFORMED_FLAGS = (
    ["malformed_host"]
    + [f"malformed_{f}" for f in PIPE_FIELDS]
    + ["malformed_message", "log_drop"]
)


def _is_ip(col: Column) -> Column:
    return col.rlike(_V4_RE) | col.rlike(_V6_RE)


def decode_pipe_frame(
    lines: DataFrame,
    line_col: str = "line",
    sagan_host: str = "0.0.0.0",
    key_col: str | None = None,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
    with_flags: bool = False,
) -> DataFrame:
    """'|'-framed lines -> canonical event frame.

    ``key_col``: column to use as the unique event_key (a file offset or
    ingest id); defaults to md5(line) + a per-row monotonic id so
    byte-identical duplicate lines (routine in syslog feeds) stay
    DISTINCT events — two lines collapsing to one key would fan out the
    alert-assembly join and conflate correlation state.  Pass a real
    stable offset when retries must reproduce identical keys.
    ``ts_format``: how to read the date+time fields into the event-time
    ``ts`` (the reference keeps them as strings; the canonical frame
    carries real event time per SURVEY §1.1) — unparseable date/time
    yields null ts.
    ``with_flags``: also emit the per-field malformed booleans (the
    reference's counters, aggregated by :func:`pipe_malformed_counters`).
    """
    line = F.col(line_col)
    # limit=9: the 9th element keeps any '|' inside the message
    parts = F.split(line, r"\|", 9)

    host_raw = F.try_element_at(parts, F.lit(1))
    host_ok = host_raw.isNotNull() & _is_ip(host_raw)
    host = F.when(host_ok, host_raw).otherwise(F.lit(sagan_host))

    cols: dict[str, Column] = {"host": host}
    flags: dict[str, Column] = {"malformed_host": ~F.coalesce(host_ok, F.lit(False))}

    for i, name in enumerate(PIPE_FIELDS, start=2):
        v = F.try_element_at(parts, F.lit(i))
        flags[f"malformed_{name}"] = v.isNull()
        cols[name] = F.coalesce(v, F.lit(f"SAGAN: {name.upper()} ERROR"))

    msg_raw = F.try_element_at(parts, F.lit(9))
    flags["malformed_message"] = msg_raw.isNull()
    flags["log_drop"] = msg_raw.isNull()
    # truncate at first newline (src/input-pipe.c:342-346)
    message = F.coalesce(
        F.substring_index(msg_raw, "\n", 1), F.lit("SAGAN: MESSAGE ERROR")
    )

    ts = F.try_to_timestamp(
        F.concat_ws(" ", cols["date"], cols["time"]), F.lit(ts_format)
    )
    event_key = (
        F.col(key_col)
        if key_col
        else F.concat_ws("#", F.md5(line), F.monotonically_increasing_id())
    )

    out = lines.select(
        event_key.cast("string").alias("event_key"),
        ts.alias("ts"),
        cols["host"].alias("host"),
        cols["program"].alias("program"),
        cols["facility"].alias("facility"),
        cols["level"].alias("level"),
        cols["tag"].alias("tag"),
        cols["priority"].alias("priority"),
        message.alias("message"),
        *(
            [flags[n].alias(n) for n in MALFORMED_FLAGS]
            if with_flags
            else []
        ),
    )
    return out


def pipe_malformed_counters(decoded: DataFrame) -> DataFrame:
    """Aggregate the malformed flags into the reference's counter names
    (reference _SaganCounters malformed_* src/sagan.h:205-214,
    sagan_log_drop).  Requires decode_pipe_frame(with_flags=True)."""
    aggs = [
        F.sum(F.col(n).cast("long")).cast("long").alias(n) for n in MALFORMED_FLAGS
    ]
    return decoded.agg(*aggs)


def decode_json_frame(
    lines: DataFrame,
    mapping: dict[str, list[str]],
    line_col: str = "line",
    sagan_host: str = "0.0.0.0",
    key_col: str | None = None,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """S6: whole-line JSON -> canonical frame via configured key lists.

    ``mapping``: canonical field -> ordered JSON paths (without leading
    '$.'), first non-null wins (reference src/input-json.c:103-240).
    Recognized fields: host, program, facility, priority, level, tag,
    message, date, time.  A message mapping of ``["%JSON%"]`` uses the
    whole document (src/input-json.c:97-101)."""
    line = F.col(line_col)

    def mapped(field: str, default: Column) -> Column:
        keys = mapping.get(field, [])
        exprs = []
        for k in keys:
            if field == "message" and k == "%JSON%":
                exprs.append(line)
            else:
                exprs.append(F.get_json_object(line, f"$.{k}"))
        return F.coalesce(*exprs, default) if exprs else default

    host_raw = mapped("host", F.lit(None))
    host = F.when(
        host_raw.isNotNull() & _is_ip(host_raw), host_raw
    ).otherwise(F.lit(sagan_host))

    date = mapped("date", F.lit(""))
    time = mapped("time", F.lit(""))
    ts = F.try_to_timestamp(F.concat_ws(" ", date, time), F.lit(ts_format))
    event_key = (
        F.col(key_col)
        if key_col
        else F.concat_ws("#", F.md5(line), F.monotonically_increasing_id())
    )

    return lines.select(
        event_key.cast("string").alias("event_key"),
        ts.alias("ts"),
        host.alias("host"),
        mapped("program", F.lit("")).alias("program"),
        mapped("facility", F.lit("")).alias("facility"),
        mapped("level", F.lit("")).alias("level"),
        mapped("tag", F.lit("")).alias("tag"),
        mapped("priority", F.lit("")).alias("priority"),
        mapped("message", line).alias("message"),
    )
