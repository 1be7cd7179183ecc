"""A6 flexbits: positional grammar, direction shapes, noalert flag
(reference src/flexbit-mmap.c:106-258, doc/source/rule-keywords.rst:297-336)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.parser import parse_rule, parse_rules


@pytest.fixture()
def frame(spark):
    # set events: "reboot from A to B"; check events: "av-off from X to Y"
    rows = [
        ("e1", "2026-01-01 00:00:01", "reboot started from 10.0.0.1 to 10.0.0.9 now"),
        ("e2", "2026-01-01 00:00:10", "av-off alert from 10.0.0.1 to 10.0.0.9 bad"),   # same src, same pair
        ("e3", "2026-01-01 00:00:11", "av-off alert from 10.0.0.9 to 10.0.0.1 bad"),   # reverse pair
        ("e4", "2026-01-01 00:00:12", "av-off alert from 10.0.0.7 to 10.0.0.9 bad"),   # different src
        ("e5", "2026-01-01 00:02:00", "av-off alert from 10.0.0.1 to 10.0.0.9 late"),  # after expire
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string")
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), F.lit("p").alias("program"),
        F.lit("").alias("facility"), F.lit("").alias("level"), F.lit("").alias("tag"),
        "message",
    )


SET_RULE = ('alert any any any -> any any (msg:"reboot"; content:"reboot"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: set, win_reboot, 60; sid:9100001;)")


def _alerts_for(spark, cond_rule, frame):
    rules = parse_rules(SET_RULE + "\n" + cond_rule)
    eng = SaganSparkEngine(rules)
    return {
        r.event_key
        for r in eng.run(frame).alerts().filter(F.col("sid") == 9100002).select("event_key").collect()
    }


def test_flexbit_isset_by_src(spark, frame):
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, by_src, win_reboot; sid:9100002;)")
    # e2 shares src 10.0.0.1 within 60s; e3/e4 different src; e5 expired
    assert _alerts_for(spark, cond, frame) == {"e2"}


def test_flexbit_isset_reverse(spark, frame):
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, reverse, win_reboot; sid:9100002;)")
    # stored pair (1->9); reverse matches a check with (9->1) = e3
    assert _alerts_for(spark, cond, frame) == {"e3"}


def test_flexbit_isnotset_both(spark, frame):
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isnotset, both, win_reboot; sid:9100002;)")
    # pair (1->9) is set: e2 suppressed; e3 (9->1), e4 (7->9) alert; e5 expired -> alert
    assert _alerts_for(spark, cond, frame) == {"e3", "e4", "e5"}


def test_flexbit_parse_and_noalert():
    r = parse_rule(
        'alert any any any -> any any (msg:"x"; flexbits: set, b1, 2h; '
        "flexbits: noalert; sid:1;)"
    )
    assert r.xbits[0].action == "set"
    assert r.xbits[0].name == "b1"
    assert r.xbits[0].track == "flex_auto"
    assert r.xbits[0].expire == 7200
    assert "noalert" in r.flags


def test_flexbit_noalert_suppresses_setter(spark, frame):
    rules = parse_rules(
        SET_RULE.replace("sid:9100001;", "flexbits: noalert; sid:9100001;")
        + "\n"
        + 'alert any any any -> any any (msg:"avoff"; content:"av-off"; '
        "parse_src_ip: 1; flexbits: isset, by_src, win_reboot; sid:9100002;)"
    )
    eng = SaganSparkEngine(rules)
    sids = {r.sid for r in eng.run(frame).alerts().select("sid").collect()}
    # setter still sets the bit (condition fires) but emits no alert itself
    assert sids == {9100002}


# ---------------------------------------------------------------------------
# flexbit UNSET semantics (reference src/flexbit-mmap.c:973-1100): an unset
# scans the whole tuple store and clears entries matching its direction —
# including entries another condition shape would probe (funnel path)
# ---------------------------------------------------------------------------


@pytest.fixture()
def unset_frame(spark):
    rows = [
        ("e1", "2026-01-01 00:00:01", "reboot started from 10.0.0.1 to 10.0.0.9 now"),
        # unset event with REVERSED pair (9 -> 1)
        ("e2", "2026-01-01 00:00:05", "allclear done from 10.0.0.9 to 10.0.0.1 ok"),
        # check with the original pair (1 -> 9)
        ("e3", "2026-01-01 00:00:10", "av-off alert from 10.0.0.1 to 10.0.0.9 bad"),
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string")
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), F.lit("p").alias("program"),
        F.lit("").alias("facility"), F.lit("").alias("level"), F.lit("").alias("tag"),
        "message",
    )


def _alerts_3rules(spark, unset_rule, cond_rule, frame, sid=9100003):
    rules = parse_rules(SET_RULE + "\n" + unset_rule + "\n" + cond_rule)
    eng = SaganSparkEngine(rules)
    return {
        r.event_key
        for r in eng.run(frame).alerts().filter(F.col("sid") == sid).select("event_key").collect()
    }


def test_flexbit_unset_reverse_clears_stored_pair(spark, unset_frame):
    # unset 'reverse' clears stored (src,dst) == event's (dst,src)
    # (reference src/flexbit-mmap.c:1071-1090): the allclear at (9->1)
    # clears the stored (1->9) bit, so the check at (1->9) fails
    unset = ('alert any any any -> any any (msg:"clear"; content:"allclear"; '
             "parse_src_ip: 1; parse_dst_ip: 2; flexbits: unset, reverse, win_reboot; sid:9100002;)")
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, both, win_reboot; sid:9100003;)")
    assert _alerts_3rules(spark, unset, cond, unset_frame) == set()


def test_flexbit_unset_none_clears_all_keys(spark, unset_frame):
    # unset 'none' clears ALL entries of the bit regardless of key
    # (reference src/flexbit-mmap.c:983-1000)
    unset = ('alert any any any -> any any (msg:"clear"; content:"allclear"; '
             "flexbits: unset, none, win_reboot; sid:9100002;)")
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, by_src, win_reboot; sid:9100003;)")
    assert _alerts_3rules(spark, unset, cond, unset_frame) == set()


def test_flexbit_unset_cross_shape_clears_probed_copy(spark, unset_frame):
    # an unset whose shape differs from the condition's shape still
    # clears the tuples the condition probes (the reference store is one
    # flat array) — unset by_dst (dst=10.0.0.1 matches nothing stored,
    # stored tuple is (1 -> 9)) leaves the bit set; unset by_src with
    # src=10.0.0.9 also leaves it; but unset by_dst on dst=9 clears it
    unset_miss = ('alert any any any -> any any (msg:"clear"; content:"allclear"; '
                  "parse_src_ip: 1; parse_dst_ip: 2; flexbits: unset, by_src, win_reboot; sid:9100002;)")
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, both, win_reboot; sid:9100003;)")
    # unset event src is 10.0.0.9 — no stored tuple has src 10.0.0.9
    assert _alerts_3rules(spark, unset_miss, cond, unset_frame) == {"e3"}

    # by_dst: unset event dst is 10.0.0.1 — stored tuple dst is 10.0.0.9,
    # no match either, bit stays set
    unset_dst = unset_miss.replace("by_src", "by_dst")
    assert _alerts_3rules(spark, unset_dst, cond, unset_frame) == {"e3"}
