"""K6 external sink + A12 dynamic rules (batch analogs)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.pipeline.route import assemble_alerts, external_sink, rule_metadata_df
from sagan_spark.rules.parser import parse_rules


@pytest.fixture()
def frame(spark):
    rows = [
        ("e1", "2026-01-01 00:00:01", "Failed password for admin from 10.1.1.1", "en"),
        ("e2", "2026-01-01 00:00:02", "all quiet on this host today", "en"),
        ("e3", "2026-01-01 00:00:03", "Failed password for root from 10.2.2.2", "en"),
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string, program string")
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), "program",
        F.lit("").alias("facility"), F.lit("").alias("level"), F.lit("").alias("tag"),
        "message",
    )


def test_external_sink_receives_json_lines(spark, frame, tmp_path):
    rules = parse_rules(
        'alert any any any -> any any (msg:"fp"; content:"Failed password"; classtype: misc-activity; sid:9000001;)'
    )
    eng = SaganSparkEngine(rules)
    alerts = eng.run(frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    out_dir = tmp_path / "ext"
    out_dir.mkdir()
    # reference feeds alert JSON on the program's stdin (external.c:58-110)
    external_sink(assembled, ["/bin/sh", "-c", f"cat >> {out_dir}/$$.jsonl"])
    lines = []
    for p in glob.glob(f"{out_dir}/*.jsonl"):
        lines += [l for l in open(p).read().splitlines() if l.strip()]
    assert len(lines) == 2
    assert all('"sid":9000001' in l or '"sid": 9000001' in l for l in lines)


def test_dynamic_rules_two_pass(spark, frame, tmp_path):
    extra = tmp_path / "extra.rules"
    extra.write_text(
        'alert any any any -> any any (msg:"loaded"; content:"quiet"; classtype: misc-activity; sid:9000101;)\n'
    )
    base = parse_rules(
        f'alert any any any -> any any (msg:"trigger"; content:"Failed password"; dynamic_load: {extra}; classtype: misc-activity; sid:9000002;)'
    )
    eng = SaganSparkEngine(base)
    result, effective = eng.run_with_dynamic_rules(frame)
    sids = {r.sid for r in result.alerts().select("sid").collect()}
    assert sids == {9000002, 9000101}  # loaded rule caught e2
    assert [r.sid for r in effective] == [9000002, 9000101]


def test_dynamic_rules_not_fired_not_loaded(spark, frame, tmp_path):
    extra = tmp_path / "extra2.rules"
    extra.write_text(
        'alert any any any -> any any (msg:"loaded"; content:"quiet"; sid:9000102;)\n'
    )
    base = parse_rules(
        f'alert any any any -> any any (msg:"no match"; content:"zz-never"; dynamic_load: {extra}; sid:9000003;)'
    )
    eng = SaganSparkEngine(base)
    result, effective = eng.run_with_dynamic_rules(frame)
    assert result.alerts().count() == 0
    assert len(effective) == 1


def test_eve_correlation_json_for_xbit_condition_alerts(spark, tmp_path):
    """Alerts gated by an xbit condition carry the reference's
    correlation JSON — a snapshot of the matching event (reference
    src/xbit-mmap.c:272-398); other alerts carry null."""
    import json

    from sagan_spark.pipeline.route import eve_view

    rows = [
        ("e1", "2026-01-01 00:00:01", "reboot seen from 10.0.0.1 now", "en"),
        ("e2", "2026-01-01 00:00:10", "av-off alert from 10.0.0.1 bad", "en"),
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string, program string")
    frame = df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), "program",
        F.lit("").alias("facility"), F.lit("").alias("level"), F.lit("").alias("tag"),
        F.lit("warn").alias("priority"), "message",
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"set rb"; content:"reboot"; parse_src_ip: 1; xbits: set, name rb, track ip_src, expire 1h; sid:9000010;)\n'
        'alert any any any -> any any (msg:"avoff after rb"; content:"av-off"; parse_src_ip: 1; xbits: isset, name rb, track ip_src; sid:9000011;)\n'
    )
    eng = SaganSparkEngine(rules)
    alerts = eng.run(frame).alerts()
    assembled = assemble_alerts(
        alerts, rule_metadata_df(spark, rules), events=frame,
        xbit_condition_sids=[9000011],
    )
    eve = {r.alert_signature_id: r for r in eve_view(assembled).collect()}
    assert eve[9000010].correlation is None
    corr = json.loads(eve[9000011].correlation)
    assert corr["type"] == "xbit"
    assert corr["src_ip"] == "10.0.0.1"
    assert corr["payload"].startswith("av-off")
    assert corr["signature"] == "avoff after rb"
    assert corr["priority"] == "warn"
    assert corr["rule"].startswith("alert any any any")


def test_xbit_noalert_suppresses_only_alert_sink(spark, tmp_path):
    """`xbits: noalert` drops the rule from the alert-file sink ONLY;
    EVE/fast/syslog still carry it (reference output.c:88-99).  `noeve`
    drops it from EVE only."""
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import assemble_alerts, rule_metadata_df, write_sinks
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(
        'alert any any any -> any any (msg:"qa"; program: error; content:"{"; '
        "xbits: noalert; sid:9900001;)\n"
        'alert any any any -> any any (msg:"qe"; program: purchase; content:"{"; '
        "xbits: noeve; sid:9900002;)\n"
        'alert any any any -> any any (msg:"qn"; program: signup; content:"{"; '
        "sid:9900003;)"
    )
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F

    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("u-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"), F.lit("").alias("level"),
        F.lit("").alias("tag"), F.col("props").alias("message"),
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    out = str(tmp_path / "sup_sinks")
    write_sinks(assembled, out, rules=rules)

    alert_sids = {r.sid for r in spark.read.parquet(f"{out}/alerts_alert").select("sid").distinct().collect()}
    eve_sids = {r.alert_signature_id for r in spark.read.parquet(f"{out}/alerts_eve").select("alert_signature_id").distinct().collect()}
    fast_sids = {r.sid for r in spark.read.parquet(f"{out}/alerts_fast").select("sid").distinct().collect()}
    assert alert_sids == {9900002, 9900003}   # noalert dropped from alert file
    assert eve_sids == {9900001, 9900003}     # noeve dropped from EVE
    assert fast_sids == {9900001, 9900002, 9900003}  # fast always writes
