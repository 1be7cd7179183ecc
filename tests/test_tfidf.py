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
