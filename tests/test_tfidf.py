"""TF-IDF top-k: a pure-Python twin recomputes the full chain
(tokenize with TOKEN_RE, per-doc counts, vocab cap, linear idf,
rank with token-ascending ties) on a hand-sized corpus and the Spark
result must match value-for-value.  Also pins the vocab cap
(max_vocab drops the rarest-by-term-freq tokens) and the broadcast
join on the vocab side (no shuffle join on the hot token column)."""

from __future__ import annotations

import re

from sagan_spark.ops.textstats import TOKEN_RE
from sagan_spark.ops.tfidf import tfidf_topk

DOCS = [
    (0, "the cat sat on the mat the cat"),
    (1, "the dog ate the bone"),
    (2, "cats and dogs and cats"),
    (3, "quantum flux capacitor the"),
    (4, ""),
]


def _twin(docs, k, max_vocab):
    tok_re = re.compile(TOKEN_RE)
    per_doc: dict[tuple[int, str], int] = {}
    for doc_id, text in docs:
        for t in tok_re.findall(text):
            per_doc[(doc_id, t)] = per_doc.get((doc_id, t), 0) + 1
    term_freq: dict[str, int] = {}
    doc_freq: dict[str, int] = {}
    for (_, t), c in per_doc.items():
        term_freq[t] = term_freq.get(t, 0) + c
        doc_freq[t] = doc_freq.get(t, 0) + 1
    vocab = set(
        sorted(term_freq, key=lambda t: (-term_freq[t], t))[:max_vocab]
    )
    n_docs = len({d for (d, _) in per_doc})
    doc_len: dict[int, int] = {}
    for (d, t), c in per_doc.items():
        if t in vocab:
            doc_len[d] = doc_len.get(d, 0) + c
    rows = []
    for (d, t), c in per_doc.items():
        if t not in vocab:
            continue
        score = (float(c) * 1000.0) * n_docs / doc_freq[t] / doc_len[d]
        rows.append((d, t, c, doc_freq[t], score))
    out = []
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: (-r[4], r[1]))
        for rank, r in enumerate(rs[:k], 1):
            out.append((d, r[1], r[2], r[3], r[4], rank))
    return sorted(out)


def _run(spark, k=3, max_vocab=65536):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted(
        (r.doc_id, r.token, r.tf, r.df, r.tfidf_milli, r.rank)
        for r in tfidf_topk(df, k=k, max_vocab=max_vocab).collect()
    )
    return got


def test_tfidf_matches_twin(spark):
    assert _run(spark, k=3) == _twin(DOCS, 3, 65536)


def test_tfidf_vocab_cap_drops_rare_terms(spark):
    # cap=4 keeps only the 4 highest-term-freq tokens; the twin applies
    # the identical (-term_freq, token) order so both drop the same set
    assert _run(spark, k=5, max_vocab=4) == _twin(DOCS, 5, 4)


def test_tfidf_empty_doc_absent(spark):
    got = _run(spark, k=3)
    assert all(r[0] != 4 for r in got)


def test_tfidf_vocab_join_is_broadcast(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = tfidf_topk(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- BM25 ----

from sagan_spark.ops.tfidf import bm25_topk  # noqa: E402

BM25_DOCS = [
    (0, "fast join fast join fast"),
    (1, "the slow table scan over the big table"),
    (2, "hash join on the hash table"),
    (3, "fast hash"),
    (4, "unrelated words only here"),
    (5, ""),
]
BM25_QUERIES = [(1, "fast hash join"), (2, "missing token"), (3, "table")]


def _bm25_twin(docs, queries, k, k1=1.2, b=0.75):
    import math

    tok_re = re.compile(TOKEN_RE)
    per_doc: dict[tuple[int, str], int] = {}
    for d, text in docs:
        for t in tok_re.findall(text):
            per_doc[(d, t)] = per_doc.get((d, t), 0) + 1
    dl: dict[int, int] = {}
    for (d, t), c in per_doc.items():
        dl[d] = dl.get(d, 0) + c
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / n_docs
    qtoks = {}
    for qid, qtext in queries:
        qtoks[qid] = list(dict.fromkeys(tok_re.findall(qtext)))
    all_q = {t for ts in qtoks.values() for t in ts}
    df = {t: sum(1 for (d, u) in per_doc if u == t) for t in all_q}
    scores: dict[tuple[int, int], int] = {}
    for qid, ts in qtoks.items():
        for t in ts:
            if df.get(t, 0) == 0:
                continue
            for (d, u), c in per_doc.items():
                if u != t:
                    continue
                sat = (float(c) * (k1 + 1.0)) / (
                    float(c) + k1 * ((1.0 - b) + b * float(dl[d]) / avgdl)
                )
                tm = math.floor(1000.0 * (float(n_docs) / df[t]) * sat)
                scores[(qid, d)] = scores.get((qid, d), 0) + tm
    out = []
    by_q: dict[int, list] = {}
    for (qid, d), s in scores.items():
        by_q.setdefault(qid, []).append((s, d))
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rank, (s, d) in enumerate(rows[:k], 1):
            out.append((qid, d, s, rank))
    return sorted(out)


def _bm25_run(spark, k=3, salt_buckets=64):
    df = spark.createDataFrame(BM25_DOCS, "doc_id int, text string")
    return sorted(
        (r.query_id, r.doc_id, r.score_milli, r.rank)
        for r in bm25_topk(
            df, BM25_QUERIES, k=k, salt_buckets=salt_buckets
        ).collect()
    )


def test_bm25_matches_twin(spark):
    assert _bm25_run(spark) == _bm25_twin(BM25_DOCS, BM25_QUERIES, 3)


def test_bm25_two_stage_equals_single_bucket(spark):
    # salt_buckets=1 degenerates stage 1 into the global window; any
    # other bucket count must produce the identical top-k
    assert _bm25_run(spark, salt_buckets=1) == _bm25_run(spark, salt_buckets=7)


def test_bm25_no_match_query_absent(spark):
    got = _bm25_run(spark)
    assert all(q != 2 for (q, _, _, _) in got)  # no doc has those tokens
    assert {q for (q, _, _, _) in got} == {1, 3}
