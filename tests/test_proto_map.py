"""P5/J5: parse_proto / parse_proto_program protocol-map probes
(reference src/parsers/proto.c:51-107, engine order engine.c:893-921)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.compiler import EngineConfig
from sagan_spark.rules.parser import parse_rules


@pytest.fixture()
def frame(spark):
    rows = [
        ("e1", "2026-01-01 00:00:01", "session opened proto tcp for user", "sshd"),
        ("e2", "2026-01-01 00:00:02", "datagram received via udp socket", "dhcpd"),
        ("e3", "2026-01-01 00:00:03", "plain message with no proto words", "cron"),
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string, program string")
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), "program",
        F.lit("").alias("facility"), F.lit("").alias("level"), F.lit("").alias("tag"),
        "message",
    )


def _protos(spark, rules_text, frame, cfg=None):
    rules = parse_rules(rules_text)
    eng = SaganSparkEngine(rules, cfg)
    return {
        r.event_key: r.proto
        for r in eng.run(frame).alerts().select("event_key", "proto").collect()
    }


def test_parse_proto_message(spark, frame):
    txt = 'alert any any any -> any any (msg:"p"; content:!"zzz"; parse_proto; sid:1;)'
    got = _protos(spark, txt, frame)
    assert got == {"e1": 6, "e2": 17, "e3": 0}


def test_parse_proto_program_overrides(spark, frame):
    cfg = EngineConfig(protocol_map_program={"sshd": 6, "dhcpd": 17})
    txt = 'alert any any any -> any any (msg:"p"; content:!"zzz"; parse_proto; parse_proto_program; sid:2;)'
    got = _protos(spark, txt, frame, cfg)
    # program probe overwrites the message probe, 0 on miss (cron)
    assert got == {"e1": 6, "e2": 17, "e3": 0}


def test_default_proto_wins(spark, frame):
    txt = 'alert any any any -> any any (msg:"p"; content:!"zzz"; parse_proto; default_proto: icmp; sid:3;)'
    got = _protos(spark, txt, frame)
    assert got == {"e1": 1, "e2": 1, "e3": 1}
