"""Sequence-packing and vocab-stats oracles: the Spark ops must equal
their pure-Python twins (md5 shard/order keys, BPE-ish regex token
counts, greedy running-sum chunk math) and be invariant to input
partitioning."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from pyspark.sql import functions as F

from sagan_spark.ops.packing import pack_chunk_stats, pack_sequences
from sagan_spark.ops.textstats import vocab_stats

TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a b c " * 40),
    (2, ""),  # zero tokens
    (3, "word " * 500),  # straddles a 256-token chunk boundary
    (4, "punct! punct? punct."),
    (5, "1234 5678 mixed99alpha"),
    (6, "x"),
] + [(10 + i, f"filler doc {i} " * (i + 1)) for i in range(20)]


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _twin_pack(docs, max_tokens: int, n_shards: int):
    rows = []
    for doc_id, text in docs:
        rows.append(
            {
                "doc_id": doc_id,
                "shard": _md5_long(f"shard||{doc_id}") % n_shards,
                "okey": _md5_long(f"order||{doc_id}"),
                "n_tokens": len(TOKEN_RE.findall(text)),
            }
        )
    out = {}
    for shard in {r["shard"] for r in rows}:
        cum = 0
        for r in sorted(
            (r for r in rows if r["shard"] == shard),
            key=lambda r: (r["okey"], r["doc_id"]),
        ):
            start, end = cum, cum + r["n_tokens"]
            cum = end
            out[r["doc_id"]] = {
                "shard": shard,
                "n_tokens": r["n_tokens"],
                "tok_start": start,
                "tok_end": end,
                "chunk_first": start // max_tokens,
                "chunk_last": max(end - 1, start) // max_tokens,
            }
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pack_sequences_matches_twin(spark):
    got = {
        r.doc_id: r.asDict()
        for r in pack_sequences(_df(spark), max_tokens=256, n_shards=4).collect()
    }
    want = _twin_pack(DOCS, 256, 4)
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, w in want.items():
        g = got[doc_id]
        for k, v in w.items():
            assert g[k] == v, f"doc {doc_id} field {k}: got {g[k]} want {v}"


def test_pack_sequences_partitioning_invariant(spark):
    base = pack_sequences(_df(spark), max_tokens=256, n_shards=4).collect()
    shuffled = pack_sequences(
        _df(spark).repartition(7, "text"), max_tokens=256, n_shards=4
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_pack_intervals_tile_each_shard(spark):
    """Per shard, doc intervals are disjoint and cover [0, total)."""
    rows = pack_sequences(_df(spark), max_tokens=256, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        ivs = sorted((r.tok_start, r.tok_end) for r in rs)
        pos = 0
        for s, e in ivs:
            assert s == pos, f"shard {shard}: gap/overlap at {s} (expected {pos})"
            pos = e
        assert pos == sum(r.n_tokens for r in rs)


def test_chunk_stats_conservation(spark):
    """Chunk coverage sums to the shard's token total; every chunk is
    at most max_tokens; straddling docs count in every chunk crossed."""
    max_tokens = 256
    packed = pack_sequences(_df(spark), max_tokens, n_shards=4).collect()
    chunks = pack_chunk_stats(_df(spark), max_tokens, n_shards=4).collect()
    tok_by_shard = Counter()
    for r in packed:
        tok_by_shard[r.shard] += r.n_tokens
    cov_by_shard = Counter()
    for c in chunks:
        assert 0 < c.n_tokens <= max_tokens
        cov_by_shard[c.shard] += c.n_tokens
    assert cov_by_shard == {s: n for s, n in tok_by_shard.items() if n}
    # the 500-word doc straddles chunk boundaries: it appears in >= 2 chunks
    straddler = next(r for r in packed if r.doc_id == 3)
    assert straddler.chunk_last > straddler.chunk_first


def test_pack_null_text_counts_zero(spark):
    """A NULL document must pack as zero tokens, not NULL-poison the
    shard's running offsets."""
    docs = DOCS + [(99, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in pack_sequences(df, max_tokens=256, n_shards=4).collect()}
    nul = rows[99]
    assert nul.n_tokens == 0 and nul.tok_start == nul.tok_end
    assert nul.tok_start is not None
    # every other doc keeps twin-exact offsets despite the NULL neighbor
    want = _twin_pack(docs[:-1] + [(99, "")], 256, 4)
    for doc_id, w in want.items():
        g = rows[doc_id]
        assert (g.tok_start, g.tok_end) == (w["tok_start"], w["tok_end"]), doc_id


def test_vocab_stats_matches_counter(spark):
    tf = Counter()
    df_ = Counter()
    for _, text in DOCS:
        toks = TOKEN_RE.findall(text)
        tf.update(toks)
        df_.update(set(toks))
    want = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.token, r.term_freq, r.doc_freq)
        for r in vocab_stats(_df(spark), top_n=10).collect()
    ]
    assert [(t, c) for t, c, _ in got] == want
    for t, _, d in got:
        assert d == df_[t], f"doc_freq for {t!r}"


def test_vocab_stats_plan_shape(spark):
    """Top-n must be a TakeOrdered (no global sort exchange)."""
    plan = vocab_stats(_df(spark), top_n=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
