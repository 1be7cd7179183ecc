"""Streaming mode: stateful counters + checkpoint resume (SURVEY §2.9).

Verifies that the Structured Streaming pipeline (applyInPandasWithState
keyed (sid, track-key)) produces the SAME routed-row set as the batch
engine over the same corpus, including when the corpus arrives in two
chunks with a query restart in between — state and sink offsets resume
from the checkpoint (the reference's mmap-survives-restart property,
reference src/sagan-defs.h:185-208)."""

from __future__ import annotations

import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sagan_spark.data.pages import generate_pages
from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.streaming import StreamingSaganEngine, pages_stream_frame


@pytest.fixture(scope="module")
def stream_rules(fixture_rules):
    # xbit conditions are batch-only in v1
    return [
        r
        for r in fixture_rules
        if not any(x.action in ("isset", "isnotset") for x in r.xbits)
    ]


@pytest.fixture(scope="module")
def chunked_corpus(tmp_path_factory):
    """Pages split into two ts-ordered chunks (chunk1 strictly earlier)."""
    root = tmp_path_factory.mktemp("stream")
    table = generate_pages(n_rows=2_000).sort_by("warc_ts")
    half = table.num_rows // 2
    input_dir = root / "input"
    input_dir.mkdir()
    chunk1, chunk2 = table.slice(0, half), table.slice(half)
    return root, input_dir, chunk1, chunk2


def _routed_set(df: pd.DataFrame) -> set:
    return {(r.url, r.sid) for r in df.itertuples()}


def test_streaming_equals_batch_with_restart(spark, stream_rules, chunked_corpus):
    root, input_dir, chunk1, chunk2 = chunked_corpus
    out = str(root / "sinks")
    ckpt = str(root / "ckpt")

    # batch truth over the full corpus
    full = pa.concat_tables([chunk1, chunk2])
    full_path = str(root / "full.parquet")
    pq.write_table(full, full_path)
    batch_engine = SaganSparkEngine(stream_rules)
    pages = spark.read.parquet(full_path)
    batch_alerts = batch_engine.run(batch_engine.frame_from_pages(pages)).alerts()
    want = {(r.event_key, r.sid) for r in batch_alerts.select("event_key", "sid").collect()}

    seng = StreamingSaganEngine(stream_rules, watermark="0 seconds")

    # ---- chunk 1 -> run to completion ----
    pq.write_table(chunk1, str(input_dir / "chunk1.parquet"))
    frame = SaganSparkEngine.frame_from_pages(pages_stream_frame(spark, str(input_dir)))
    q = seng.start_sink_query(frame, out, ckpt, sinks=["alerts_eve"])
    q.awaitTermination(120)

    # ---- restart with chunk 2 present; state resumes from checkpoint ----
    pq.write_table(chunk2, str(input_dir / "chunk2.parquet"))
    frame = SaganSparkEngine.frame_from_pages(pages_stream_frame(spark, str(input_dir)))
    q = seng.start_sink_query(frame, out, ckpt, sinks=["alerts_eve"])
    q.awaitTermination(120)

    got_df = spark.read.parquet(f"{out}/alerts_eve").select("url", "alert_signature_id").toPandas()
    got = {(r.url, r.alert_signature_id) for r in got_df.itertuples()}
    missing, extra = want - got, got - want
    assert not missing and not extra, (
        f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
        f"want={len(want)} got={len(got)}"
    )


def test_restart_is_exactly_once(spark, stream_rules, chunked_corpus):
    """Re-running the finished query must not duplicate sink rows."""
    root, input_dir, chunk1, chunk2 = chunked_corpus
    out = str(root / "sinks")
    ckpt = str(root / "ckpt")
    before = spark.read.parquet(f"{out}/alerts_eve").count()

    seng = StreamingSaganEngine(stream_rules, watermark="0 seconds")
    frame = SaganSparkEngine.frame_from_pages(pages_stream_frame(spark, str(input_dir)))
    q = seng.start_sink_query(frame, out, ckpt, sinks=["alerts_eve"])
    q.awaitTermination(120)
    after = spark.read.parquet(f"{out}/alerts_eve").count()
    assert after == before


def test_xbit_condition_rules_rejected(fixture_rules):
    has_cond = [
        r for r in fixture_rules if any(x.action in ("isset", "isnotset") for x in r.xbits)
    ]
    assert has_cond, "fixture ruleset should carry an xbit condition rule"
    with pytest.raises(NotImplementedError):
        StreamingSaganEngine(fixture_rules)


def test_chained_xbit_pipeline_equals_batch(spark, fixture_rules, tmp_path):
    """Full ruleset (incl. xbit set/isset) through the two-query chained
    pipeline with a restart between chunks == batch engine."""
    table = generate_pages(n_rows=2_000).sort_by("warc_ts")
    half = table.num_rows // 2
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")

    full_path = str(tmp_path / "full.parquet")
    pq.write_table(table, full_path)
    batch_engine = SaganSparkEngine(fixture_rules)
    pages = spark.read.parquet(full_path)
    batch_alerts = batch_engine.run(batch_engine.frame_from_pages(pages)).alerts()
    want = {(r.event_key, r.sid) for r in batch_alerts.select("event_key", "sid").collect()}

    seng = StreamingSaganEngine(fixture_rules, watermark="0 seconds", enable_xbits=True)

    def frame_factory():
        return SaganSparkEngine.frame_from_pages(pages_stream_frame(spark, str(input_dir)))

    pq.write_table(table.slice(0, half), str(input_dir / "c1.parquet"))
    seng.run_pipeline_with_xbits(frame_factory, out, ckpt, sinks=["alerts_eve"])
    pq.write_table(table.slice(half), str(input_dir / "c2.parquet"))
    seng.run_pipeline_with_xbits(frame_factory, out, ckpt, sinks=["alerts_eve"])

    got_df = spark.read.parquet(f"{out}/alerts_eve").select("url", "alert_signature_id").toPandas()
    got = {(r.url, r.alert_signature_id) for r in got_df.itertuples()}
    missing, extra = want - got, got - want
    assert not missing and not extra, (
        f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
        f"want={len(want)} got={len(got)}"
    )
