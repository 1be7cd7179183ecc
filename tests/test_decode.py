"""S5/S6 raw-line decoders vs the reference's exact malformed handling
(reference src/input-pipe.c:41-347, src/input-json.c:47-240)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.decode import (
    decode_json_frame,
    decode_pipe_frame,
    pipe_malformed_counters,
)
from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.parser import parse_rules

GOOD = "10.0.0.9|daemon|info|info|2d|2026-01-01|08:30:00|sshd|Failed password for root from 10.1.2.3 port 22 ssh2"


def _decode(spark, lines, **kw):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    return decode_pipe_frame(df, **kw)


def test_pipe_decode_good_line(spark):
    r = _decode(spark, [GOOD]).collect()[0]
    assert r.host == "10.0.0.9"
    assert r.facility == "daemon"
    assert r.priority == "info"
    assert r.level == "info"
    assert r.tag == "2d"
    assert r.program == "sshd"
    assert r.message.startswith("Failed password")
    assert str(r.ts) == "2026-01-01 08:30:00"


def test_pipe_decode_message_keeps_pipes_and_strips_newline(spark):
    line = "10.0.0.9|f|p|l|t|2026-01-01|08:30:00|prog|msg with | pipe\nsecond line"
    r = _decode(spark, [line]).collect()[0]
    assert r.message == "msg with | pipe"  # remainder kept, \n truncated


def test_pipe_decode_malformed_host_replaced(spark):
    # non-IP host -> sagan_host, counted (src/input-pipe.c:67-82)
    line = "not-an-ip|f|p|l|t|2026-01-01|08:30:00|prog|hello"
    r = _decode(spark, [line], sagan_host="192.0.2.1", with_flags=True).collect()[0]
    assert r.host == "192.0.2.1"
    assert r.malformed_host is True


def test_pipe_decode_short_line_field_errors(spark):
    # only 3 fields: later fields become 'SAGAN: X ERROR', message drops
    line = "10.0.0.9|daemon|alert"
    r = _decode(spark, [line], with_flags=True).collect()[0]
    assert r.facility == "daemon" and r.priority == "alert"
    assert r.level == "SAGAN: LEVEL ERROR"
    assert r.tag == "SAGAN: TAG ERROR"
    assert r.program == "SAGAN: PROGRAM ERROR"
    assert r.message == "SAGAN: MESSAGE ERROR"
    assert r.malformed_message is True and r.log_drop is True
    assert r.ts is None


def test_pipe_malformed_counters(spark):
    lines = [
        GOOD,
        "bad-host|f|p|l|t|2026-01-01|08:30:00|prog|m",
        "10.0.0.9|f|p",
    ]
    got = pipe_malformed_counters(
        _decode(spark, lines, with_flags=True)
    ).collect()[0]
    assert got.malformed_host == 1
    assert got.malformed_level == 1
    assert got.malformed_message == 1
    assert got.log_drop == 1
    assert got.malformed_facility == 0


def test_pipe_decode_feeds_engine(spark):
    """A raw pipe feed drives the full engine: prefilters see the decoded
    program/priority fields."""
    lines = [
        GOOD,
        "10.0.0.9|daemon|crit|crit|2d|2026-01-01|08:31:00|nginx|GET /index.html 200",
    ]
    frame = _decode(spark, lines)
    rules = parse_rules(
        'alert any any any -> any any (msg:"ssh"; program: sshd; '
        'content:"Failed password"; syslog_priority: info; sid:9700001;)'
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts().collect()
    assert len(alerts) == 1


def test_json_decode_first_match_wins(spark):
    lines = [
        '{"h": "10.0.0.5", "prog": "sshd", "msg": "Failed password", "d": "2026-01-01", "t": "08:00:00"}',
        '{"hostname": "10.0.0.6", "prog": "cron", "msg": "job ran", "d": "2026-01-01", "t": "09:00:00"}',
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    out = decode_json_frame(
        df,
        mapping={
            "host": ["h", "hostname"],
            "program": ["prog"],
            "message": ["msg"],
            "date": ["d"],
            "time": ["t"],
        },
    ).collect()
    by_prog = {r.program: r for r in out}
    assert by_prog["sshd"].host == "10.0.0.5"  # first key won
    assert by_prog["cron"].host == "10.0.0.6"  # fell through to second
    assert by_prog["cron"].message == "job ran"


def test_json_decode_whole_doc_message(spark):
    line = '{"prog": "x", "k": 1}'
    df = spark.createDataFrame([(line,)], "line string")
    out = decode_json_frame(
        df, mapping={"program": ["prog"], "message": ["%JSON%"]}
    ).collect()[0]
    assert out.message == line


def test_gzip_input_transparent(spark, tmp_path):
    """S3: gzip feeds decode transparently (reference src/input-plugins/
    gzip.c — Spark's text source decompresses .gz on read)."""
    import gzip

    p = tmp_path / "feed.txt.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(GOOD + "\n")
        fh.write("10.0.0.8|f|p|l|t|2026-01-01|09:00:00|cron|job done\n")
    df = spark.read.text(str(tmp_path))
    out = decode_pipe_frame(df, line_col="value").collect()
    assert {r.program for r in out} == {"sshd", "cron"}
    assert all(r.host.startswith("10.0.0.") for r in out)


def test_duplicate_raw_lines_get_distinct_event_keys(spark):
    """Byte-identical lines are distinct EVENTS (the reference counts
    each arriving line); a shared event_key would fan out the
    alert-assembly join and conflate correlation state."""
    from sagan_spark.pipeline.decode import decode_pipe_frame

    raw = "h1|auth|daemon|5|info|t|2026-01-01|00:00:01|same message"
    lines = spark.createDataFrame([(raw,), (raw,), (raw,)], "line string")
    out = decode_pipe_frame(lines).select("event_key").collect()
    keys = {r.event_key for r in out}
    assert len(keys) == 3
