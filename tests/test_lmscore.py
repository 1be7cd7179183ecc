"""Hashed bigram LM scoring vs a hashlib pure-Python twin (exact —
integer milli-probabilities), unscorable-doc handling, and the ranking
property the filter exists for (in-distribution text outscores
gibberish)."""

from __future__ import annotations

import hashlib
import re

from sagan_spark.ops.lmscore import lm_likelihood, lm_train_bigrams

TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)
B = 1 << 10  # small bucket count: forces some collisions on purpose

REF = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran to the house"),
    (2, "a dog sat on the mat"),
]
CAND = [
    (10, "the cat sat on the mat"),       # pure in-distribution
    (11, "zx qv jk wp zx qv"),            # gibberish: every bigram unseen
    (12, "one"),                          # 1 token -> unscorable
    (13, ""),                             # 0 tokens -> unscorable
    (14, None),                           # NULL -> unscorable
]


def _b(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B


def _twin():
    pairs: dict = {}
    prefixes: dict = {}
    for _i, text in REF:
        toks = TOKEN_RE.findall(text)
        for p, t in zip(toks, toks[1:]):
            pairs[_b(f"{p}|{t}")] = pairs.get(_b(f"{p}|{t}"), 0) + 1
            prefixes[_b(p)] = prefixes.get(_b(p), 0) + 1
    out = {}
    for doc_id, text in CAND:
        toks = TOKEN_RE.findall(text) if text else []
        if len(toks) < 2:
            out[doc_id] = (0, None)
            continue
        millis = []
        for p, t in zip(toks, toks[1:]):
            pc = pairs.get(_b(f"{p}|{t}"))
            fc = prefixes.get(_b(p))
            millis.append((1000 * pc) // fc if pc is not None and fc else 0)
        out[doc_id] = (
            len(millis),
            (1000 * sum(millis)) // len(millis),
        )
    return out


def test_lm_likelihood_vs_python(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    cand = spark.createDataFrame(CAND, "doc_id long, text string")
    lm = lm_train_bigrams(ref, n_buckets=B)
    got = {r.doc_id: (r.n_pairs, r.lm_score_ppm)
           for r in lm_likelihood(cand, lm).collect()}
    assert got == _twin()


def test_lm_ranks_in_distribution_above_gibberish(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    cand = spark.createDataFrame(CAND, "doc_id long, text string")
    lm = lm_train_bigrams(ref, n_buckets=B)
    got = {r.doc_id: r.lm_score_ppm for r in lm_likelihood(cand, lm).collect()}
    assert got[10] > got[11]
    assert got[10] > 300_000      # frequent reference bigrams (ppm)
    assert got[12] is None and got[13] is None and got[14] is None


def _tercile_twin(rows):
    """Pure-Python lm_buckets twin: rows = (doc_id, lang, score)."""
    from collections import defaultdict

    hist: dict = defaultdict(lambda: defaultdict(int))
    for _d, lang, s in rows:
        if s is not None and lang is not None:
            hist[lang][s] += 1
    th = {}
    for lang, h in hist.items():
        n = sum(h.values())
        cum, t1, t2 = 0, None, None
        for s in sorted(h):
            cum += h[s]
            if t1 is None and 3 * cum >= n:
                t1 = s
            if t2 is None and 3 * cum >= 2 * n:
                t2 = s
        th[lang] = (t1, t2)
    out = {}
    for d, lang, s in rows:
        if s is None or lang not in th:
            out[d] = None
        else:
            t1, t2 = th[lang]
            out[d] = "tail" if s <= t1 else ("middle" if s <= t2 else "head")
    return out


def test_lm_buckets_vs_python(spark):
    from sagan_spark.ops.lmscore import lm_buckets

    # 9 distinct English scores (clean 3/3/3 split), a tie straddling
    # both cuts in 'fr' (ties share a bucket, resolving DOWN), a 1-doc
    # lang (all 'tail'), a 2-doc lang, NULL scores, and a NULL lang
    rows = [
        *[(i, "en", 100 * (i + 1)) for i in range(9)],
        (20, "fr", 10), (21, "fr", 50), (22, "fr", 50),
        (23, "fr", 50), (24, "fr", 90),
        (30, "de", 777),
        (40, "es", 1), (41, "es", 2),
        (50, "en", None),
        (60, None, 123),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, lm_score_ppm long")
    got = {r.doc_id: r.lm_bucket for r in lm_buckets(df).collect()}
    assert got == _tercile_twin(rows)
    # spot-pin the interesting cases so the twin can't mask a shared bug
    assert [got[i] for i in range(9)] == ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
    assert got[21] == got[22] == got[23] == "tail"  # tie resolves down
    assert got[30] == "tail"                    # 1-doc lang
    assert got[50] is None and got[60] is None  # NULL score / NULL lang


def test_lm_buckets_partition_invariance(spark):
    """Bucket assignment must not depend on physical partitioning."""
    from sagan_spark.ops.lmscore import lm_buckets

    rows = [(i, "en" if i % 3 else "fr", (i * 37) % 11) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, lm_score_ppm long")
    a = {r.doc_id: r.lm_bucket for r in lm_buckets(df.repartition(1)).collect()}
    b = {r.doc_id: r.lm_bucket for r in lm_buckets(df.repartition(13)).collect()}
    assert a == b


def test_lm_model_tables_are_bounded(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    lm = lm_train_bigrams(ref, n_buckets=B)
    assert lm.pairs.count() <= B and lm.prefixes.count() <= B
    cols = dict(lm.pairs.dtypes)
    assert cols == {"pair_bucket": "bigint", "pair_count": "bigint"}
