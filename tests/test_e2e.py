"""End-to-end equality: Spark engine vs pure-Python oracle (SURVEY §5.3).

Asserts (a) routed-row set equality (url, sid keyed, both directions),
(b) per-sid aggregate count equality, (c) byte-identical extracted
fields per (url, sid).
"""

from __future__ import annotations

from urllib.parse import urlparse

import pytest

from sagan_spark.pipeline.engine import SaganSparkEngine
from tests.oracle import Oracle


@pytest.fixture(scope="module")
def engine_and_oracle(spark, fixture_rules, pages_path):
    pages = spark.read.parquet(pages_path)

    engine = SaganSparkEngine(fixture_rules)
    frame = engine.frame_from_pages(pages)
    result = engine.run(frame)
    alerts_pdf = result.alerts().toPandas()

    rows = pages.select("url", "warc_ts", "text", "lang").collect()
    events = [
        {
            "event_key": r.url,
            "ts": r.warc_ts,
            "host": urlparse(r.url).hostname,
            "program": r.lang,
            "facility": "",
            "level": "",
            "tag": "",
            "message": r.text,
        }
        for r in rows
    ]
    oracle_alerts, counters = Oracle(fixture_rules).run(events)
    return alerts_pdf, oracle_alerts, counters


FIELDS = ["src_ip", "src_port", "dst_ip", "dst_port", "proto", "username", "event_id", "md5"]


def test_routed_row_set_equality(engine_and_oracle):
    alerts_pdf, oracle_alerts, _ = engine_and_oracle
    got = {(r.event_key, r.sid) for r in alerts_pdf.itertuples()}
    want = {(a["url"], a["sid"]) for a in oracle_alerts}
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing={sorted(missing)[:10]} extra={sorted(extra)[:10]} "
        f"(want={len(want)}, got={len(got)})"
    )


def test_per_sid_counts(engine_and_oracle):
    alerts_pdf, oracle_alerts, counters = engine_and_oracle
    got = alerts_pdf.groupby("sid").size().to_dict()
    assert got == counters.per_sid


def test_extracted_fields_byte_identical(engine_and_oracle):
    alerts_pdf, oracle_alerts, _ = engine_and_oracle
    want = {(a["url"], a["sid"]): tuple(a[f] for f in FIELDS) for a in oracle_alerts}
    for r in alerts_pdf.itertuples():
        key = (r.event_key, r.sid)
        got = (r.src_ip, r.src_port, r.dst_ip, r.dst_port, r.proto,
               r.username, r.event_id, r.md5)
        assert got == want[key], f"{key}: got={got} want={want[key]}"


def test_alert_volume_nonzero(engine_and_oracle):
    _, oracle_alerts, counters = engine_and_oracle
    # sanity: the fixture corpus must actually exercise the ruleset
    assert counters.alerts > 100
    assert counters.suppressed_after > 0
    assert counters.suppressed_threshold > 0
    assert len({a["sid"] for a in oracle_alerts}) >= 15
