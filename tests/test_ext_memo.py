"""Extraction-tree sharing (RuleCompiler._ext_signature memo) must be
behavior-invariant: rules that share an extraction signature reuse ONE
Column tree, and the engine output is bit-identical to the unmemoized
build.  The memo is a driver-side plan-construction optimization only
(tools/bench_rulecount.py measures the win)."""

from __future__ import annotations

import pytest

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.compiler import RuleCompiler
from sagan_spark.rules.parser import parse_rules

# shapes chosen so SOME pairs share a signature (1&4: bare; 2&5:
# parse_src_ip+default port; nothing shares with 3 or 6) while contents
# differ — the memo must key on extraction fields ONLY, never the match
RULES = """
alert any any any -> any any (msg:"m1"; content:"Failed password"; classtype: misc-activity; sid:9100001; rev:1;)
alert any any any -> any any (msg:"m2"; content:"Failed password"; parse_src_ip: 1; default_dst_port: 22; classtype: misc-activity; sid:9100002; rev:1;)
alert any any any -> any any (msg:"m3"; content:"connection from"; parse_src_ip: 2; default_proto: udp; classtype: misc-activity; sid:9100003; rev:1;)
alert any any any -> any any (msg:"m4"; content:"session opened"; classtype: misc-activity; sid:9100004; rev:1;)
alert any any any -> any any (msg:"m5"; content:"Accepted"; nocase; parse_src_ip: 1; default_dst_port: 22; classtype: misc-activity; sid:9100005; rev:1;)
alert any any any -> any any (msg:"m6"; json_map: "src_ip","sip"; json_map: "username","user"; classtype: misc-activity; sid:9100006; rev:1;)
"""


@pytest.fixture(scope="module")
def memo_rules():
    from fixtures.vars import VARIABLES

    return parse_rules(RULES, VARIABLES)


def test_signature_groups_extraction_shapes(memo_rules):
    sigs = [RuleCompiler._ext_signature(r) for r in memo_rules]
    assert sigs[0] == sigs[3]  # bare rules share
    assert sigs[1] == sigs[4]  # parse_src_ip+default_dst_port share
    assert len({sigs[0], sigs[1], sigs[2], sigs[5]}) == 4  # distinct shapes


def test_memo_reuses_column_trees(memo_rules, spark):
    """Same signature -> the SAME dict object comes back from the memo."""
    from pyspark.sql import functions as F

    from sagan_spark.rules.compiler import EngineConfig

    comp = RuleCompiler(memo_rules, EngineConfig())
    df = spark.createDataFrame(
        [("k", None, "h", "p", "", "", "", "", "Failed password from 1.2.3.4")],
        "event_key string, ts timestamp, host string, program string, "
        "facility string, level string, tag string, priority string, "
        "message string",
    )
    engine = SaganSparkEngine(memo_rules)
    cols = engine._event_cols(df, with_extraction=False)
    memo: dict = {}
    e1 = comp.extraction_exprs(memo_rules[0], cols, memo=memo)
    e4 = comp.extraction_exprs(memo_rules[3], cols, memo=memo)
    e2 = comp.extraction_exprs(memo_rules[1], cols, memo=memo)
    assert e1 is e4  # shared signature -> shared tree
    assert e1 is not e2
    assert len(memo) == 2


def test_engine_output_identical_with_and_without_memo(
    memo_rules, spark, pages_path
):
    """Routed output of the memoized engine == per-rule rebuild with the
    memo disabled (ext_memo=None path through alert_element)."""
    pages = spark.read.parquet(pages_path)
    engine = SaganSparkEngine(memo_rules)
    frame = engine.frame_from_pages(pages.limit(2000))

    got = (
        engine.run(frame)
        .alerts()
        .select("event_key", "sid", "src_ip", "dst_ip", "dst_port", "proto")
    )
    rows = {tuple(r) for r in got.collect()}

    # unmemoized reference: alert_element called WITHOUT ext_memo builds
    # a fresh tree per rule (the pre-memo construction path)
    import sagan_spark.pipeline.engine as eng_mod

    orig = eng_mod.RuleCompiler.alert_element
    calls = []

    def no_memo(self, r, cols, cheap, ext_memo=None):
        calls.append(r.sid)
        return orig(self, r, cols, cheap, ext_memo=None)

    eng_mod.RuleCompiler.alert_element = no_memo
    try:
        engine2 = SaganSparkEngine(memo_rules)
        got2 = (
            engine2.run(engine2.frame_from_pages(pages.limit(2000)))
            .alerts()
            .select("event_key", "sid", "src_ip", "dst_ip", "dst_port", "proto")
        )
        rows2 = {tuple(r) for r in got2.collect()}
    finally:
        eng_mod.RuleCompiler.alert_element = orig

    assert calls, "patched path never ran"
    assert rows == rows2
    assert len(rows) > 0
