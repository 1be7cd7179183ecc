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


def test_lm_model_tables_are_bounded(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    lm = lm_train_bigrams(ref, n_buckets=B)
    assert lm.pairs.count() <= B and lm.prefixes.count() <= B
    cols = dict(lm.pairs.dtypes)
    assert cols == {"pair_bucket": "bigint", "pair_count": "bigint"}
