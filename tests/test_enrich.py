"""Enrichment gates (J1/J2/J4): blacklist CIDR, intel sets, country_code
wired through rule options, plus the broadcast-join scale path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.compiler import EngineConfig
from sagan_spark.rules.parser import parse_rule, parse_rules


@pytest.fixture()
def events_frame(spark):
    rows = [
        ("e1", "2026-01-01 00:00:01", "conn from 10.1.2.3 port 22", "en"),
        ("e2", "2026-01-01 00:00:02", "conn from 10.9.9.9 port 22", "en"),
        ("e3", "2026-01-01 00:00:03", "conn from 192.168.1.5 port 80", "en"),
        ("e4", "2026-01-01 00:00:04", "hash abcdef0123456789abcdef0123456789 seen", "en"),
        ("e5", "2026-01-01 00:00:05", "visit evil.example/malware now", "en"),
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string, program string")
    return df.select(
        "event_key",
        F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"),
        "program",
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        "message",
    )


CFG = EngineConfig(
    blacklist_cidrs=["10.1.0.0/16", "172.16.0.0/12"],
    geoip_ranges=[("10.0.0.0/8", "RU"), ("192.168.0.0/16", "DE")],
    intel_sets={
        "src_ipaddr": ["10.9.9.9"],
        "file_hash": ["ABCDEF0123456789abcdef0123456789"],
        "domain": ["evil.example"],
    },
)


def _alert_keys(spark, rules_text, frame, cfg=CFG):
    rules = parse_rules(rules_text)
    eng = SaganSparkEngine(rules, cfg)
    return {
        (r.event_key, r.sid)
        for r in eng.run(frame).alerts().select("event_key", "sid").collect()
    }


def test_blacklist_by_src(spark, events_frame):
    txt = 'alert any any any -> any any (msg:"bl"; content:"conn from"; parse_src_ip: 1; blacklist: by_src; sid:7000001;)'
    assert _alert_keys(spark, txt, events_frame) == {("e1", 7000001)}


def test_zeek_intel_src_and_hash_and_domain(spark, events_frame):
    txt = (
        'alert any any any -> any any (msg:"intel ip"; content:"conn from"; parse_src_ip: 1; zeek_intel: src_ipaddr; sid:7000002;)\n'
        'alert any any any -> any any (msg:"intel hash"; content:"hash"; parse_hash: md5; zeek_intel: file_hash; sid:7000003;)\n'
        'alert any any any -> any any (msg:"intel dom"; content:"visit"; zeek_intel: domain; sid:7000004;)'
    )
    assert _alert_keys(spark, txt, events_frame) == {
        ("e2", 7000002),
        ("e4", 7000003),
        ("e5", 7000004),
    }


def test_country_code_isnot(spark, events_frame):
    txt = 'alert any any any -> any any (msg:"geo"; content:"conn from"; parse_src_ip: 1; country_code: track by_src, isnot [RU]; sid:7000005;)'
    # 10.x src ips are RU -> excluded; 192.168.1.5 is DE -> passes
    assert _alert_keys(spark, txt, events_frame) == {("e3", 7000005)}


def test_country_code_is(spark, events_frame):
    txt = 'alert any any any -> any any (msg:"geo2"; content:"conn from"; parse_src_ip: 1; country_code: track by_src, is [DE]; sid:7000006;)'
    assert _alert_keys(spark, txt, events_frame) == {("e3", 7000006)}


def test_parse_options():
    r = parse_rule(
        'alert any any any -> any any (msg:"x"; blacklist: both; '
        "zeek_intel: src_ipaddr,file_hash; country_code: track by_dst, isnot [RU,CN]; sid:1;)"
    )
    assert r.blacklist == ["by_src", "by_dst"]
    assert r.zeek_intel == ["src_ipaddr", "file_hash"]
    assert r.country_code.track == "by_dst"
    assert r.country_code.negated is True
    assert r.country_code.codes == ["RU", "CN"]


def test_range_join_scale_path(spark):
    from sagan_spark.pipeline.enrich import compile_cidrs, ranges_df, tag_by_range_join
    from sagan_spark.functions.extract import int_to_biased_hilo, ip_to_int

    ips = ["10.1.2.3", "10.9.9.9", "8.8.8.8"]
    rows = []
    for ip in ips:
        hi, lo = int_to_biased_hilo(ip_to_int(ip))
        rows.append((ip, hi, lo))
    ev = spark.createDataFrame(rows, "ip string, hi long, lo long")
    rdf = ranges_df(spark, compile_cidrs(["10.0.0.0/8"], ["rfc1918-10"]))
    got = tag_by_range_join(ev, "hi", "lo", rdf).select("ip", "label").collect()
    assert {(r.ip, r.label) for r in got} == {
        ("10.1.2.3", "rfc1918-10"),
        ("10.9.9.9", "rfc1918-10"),
    }


BLUEDOT_CFG = EngineConfig(
    bluedot_intel={
        "ip_reputation": {"10.1.2.3": "Malicious", "10.9.9.9": "Tor"},
        "file_hash": {"abcdef0123456789abcdef0123456789": "Malicious"},
        "url": {"evil.example/malware": "Malicious"},
    },
)


def test_bluedot_ip_reputation_by_src(spark, events_frame):
    # J3: category filter on the driver -> literal set probe (reference
    # probe src/processors/engine.c:1176-1289)
    txt = ('alert any any any -> any any (msg:"bd"; content:"conn from";'
           ' parse_src_ip: 1; bluedot: type ip_reputation, track by_src,'
           ' none, Malicious; sid:7100001;)')
    assert _alert_keys(spark, txt, events_frame, BLUEDOT_CFG) == {("e1", 7100001)}


def test_bluedot_category_mismatch_no_alert(spark, events_frame):
    txt = ('alert any any any -> any any (msg:"bd"; content:"conn from";'
           ' parse_src_ip: 1; bluedot: type ip_reputation, track by_src,'
           ' none, Proxy; sid:7100002;)')
    assert _alert_keys(spark, txt, events_frame, BLUEDOT_CFG) == set()


def test_bluedot_file_hash(spark, events_frame):
    txt = ('alert any any any -> any any (msg:"bd"; content:"hash";'
           ' parse_hash: md5; bluedot: type file_hash, Malicious; sid:7100003;)')
    assert _alert_keys(spark, txt, events_frame, BLUEDOT_CFG) == {("e4", 7100003)}


def test_bluedot_url_substring(spark, events_frame):
    txt = ('alert any any any -> any any (msg:"bd"; content:"visit";'
           ' bluedot: type url, Malicious; sid:7100004;)')
    assert _alert_keys(spark, txt, events_frame, BLUEDOT_CFG) == {("e5", 7100004)}


def test_syslog_priority_prefilter(spark):
    # F2 completion: syslog_priority now compiles against the canonical
    # frame's priority column (reference engine.c:565-581)
    rows = [
        ("e1", "2026-01-01 00:00:01", "m1", "alert"),
        ("e2", "2026-01-01 00:00:02", "m2", "info"),
        ("e3", "2026-01-01 00:00:03", "m3", "crit"),
    ]
    df = spark.createDataFrame(
        rows, "event_key string, ts string, message string, priority string"
    )
    frame = df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), F.lit("p").alias("program"),
        F.lit("").alias("facility"), F.lit("").alias("level"),
        F.lit("").alias("tag"), "priority", "message",
    )
    txt = ('alert any any any -> any any (msg:"pri"; syslog_priority: alert|crit;'
           ' content:"m"; sid:7100005;)')
    assert _alert_keys(spark, txt, frame) == {("e1", 7100005), ("e3", 7100005)}


def test_external_rule_routing(spark, events_frame):
    # K6: the 'external' rule option routes only that rule's alerts
    from sagan_spark.pipeline.route import assemble_alerts, route_external, rule_metadata_df

    txt = (
        'alert any any any -> any any (msg:"x1"; content:"conn from"; external: /bin/true; sid:7200001;)\n'
        'alert any any any -> any any (msg:"x2"; content:"hash"; sid:7200002;)\n'
    )
    rules = parse_rules(txt)
    eng = SaganSparkEngine(rules)
    alerts = eng.run(events_frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=events_frame)

    captured = {}

    def fake_runner(df, command):
        captured[command[0]] = {r.sid for r in df.select("sid").collect()}

    progs = route_external(assembled, rules, runner=fake_runner)
    assert progs == {"/bin/true": [7200001]}
    assert captured["/bin/true"] == {7200001}
