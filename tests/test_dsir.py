"""DSIR importance resampling (ops/dsir.py) vs a pure-Python twin,
plus the plan-shape pins for the 100 TB posture."""

import hashlib
import re

import pytest

from sagan_spark.ops.dsir import dsir_topk, dsir_train, dsir_weights
from sagan_spark.ops.sampling import frac_to_hex8
from sagan_spark.ops.textstats import TOKEN_RE

NB = 1 << 12  # small bucket space: forces a few collisions on purpose


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str):
    toks = re.findall(TOKEN_RE, text or "")
    return toks + [f"{a}|{b}" for a, b in zip(toks, toks[1:])]


def _twin(docs, target_frac, salt="dsir_target", nb=NB):
    """(doc_id -> (n_grams, score)) for the 'target = md5 slice of the
    corpus, raw = whole corpus' shape the gate query uses."""
    def in_target(doc_id):
        h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:8]
        return h < frac_to_hex8(target_frac)

    tc, qc = {}, {}
    for doc_id, text in docs:
        for g in _grams(text):
            b = _md5_long(g) % nb
            qc[b] = qc.get(b, 0) + 1
            if in_target(doc_id):
                tc[b] = tc.get(b, 0) + 1
    tn, qn = sum(tc.values()), sum(qc.values())
    out = {}
    for doc_id, text in docs:
        gs = _grams(text)
        if not gs:
            out[doc_id] = (0, None)
            continue
        score = sum(
            (1000000 * tc.get(_md5_long(g) % nb, 0)) // tn
            - (1000000 * qc.get(_md5_long(g) % nb, 0)) // qn
            for g in gs
        )
        out[doc_id] = (len(gs), score)
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog."),
    (1, "the the the the repeated token pileup."),
    (2, "quantum chromodynamics lattice regularization scheme"),
    (3, "fox"),            # single token: unigram only, no bigram
    (4, ""),               # token-less: unscorable
    (5, None),             # NULL text: unscorable
    (6, "the quick brown fox again, with overlap to doc zero."),
    (7, "zebra xylophone quagga vortex nimbus"),
    (8, "the quick brown fox jumps over the lazy dog."),  # dup of 0
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    from sagan_spark.ops.sampling import deterministic_sample

    target = deterministic_sample(df, 0.5, salt="dsir_target")
    model = dsir_train(target, df, n_buckets=NB)
    return dsir_weights(df, model)


def test_dsir_weights_vs_python(spark, scored):
    got = {r.doc_id: (r.n_grams, r.dsir_score) for r in scored.collect()}
    want = _twin(DOCS, 0.5)
    assert got == want
    # structural pins the twin shares by construction can't mask:
    assert got[4] == (0, None) and got[5] == (0, None)
    assert got[3][0] == 1                      # 1 unigram, 0 bigrams
    assert got[0] == got[8]                    # identical text, same score
    # at least one doc is in the md5 target slice, else the contrast
    # degenerates and the test pins nothing
    in_tgt = [
        d for d, _ in DOCS
        if hashlib.md5(f"dsir_target|{d}".encode()).hexdigest()[:8]
        < frac_to_hex8(0.5)
    ]
    assert in_tgt, "rechoose the salt/frac so the target slice is non-empty"
    # target-slice docs must outscore the out-of-target doc with the
    # most alien vocabulary (its grams got no target mass)
    alien = 7 if 7 not in in_tgt else 2
    assert all(got[d][1] > got[alien][1] for d in in_tgt if got[d][1] is not None)


def test_dsir_topk_deterministic_ties(spark, scored):
    picked = [r.doc_id for r in dsir_topk(scored, 4).collect()]
    want = _twin(DOCS, 0.5)
    scorable = [(d, s) for d, (_, s) in want.items() if s is not None]
    ranked = sorted(
        scorable,
        key=lambda p: (
            -p[1],
            hashlib.md5(f"dsir|{p[0]}".encode()).hexdigest()[:8],
            p[0],
        ),
    )
    assert sorted(picked) == sorted(d for d, _ in ranked[:4])
    # docs 0 and 8 tie exactly: whichever of them is picked must match
    # the md5 tiebreak, not partition luck
    assert len(picked) == 4 and len(set(picked)) == 4


def test_dsir_plan_shape(spark, scored):
    """Scoring pins: the model joins back by BROADCAST (it is
    <= n_buckets rows — a shuffle join would re-exchange the exploded
    gram stream), no Python node anywhere, and selection is
    TakeOrdered (per-partition heap), never a global Sort+Exchange."""
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan, "model join must broadcast"
    top = dsir_topk(scored, 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in top, top[:400]


def test_domain_lm_prior_twin(spark):
    """Per-domain prior equals a Counter twin over a hand corpus
    (NULL-skipping mean, unscorable docs counted in n_docs only,
    no-scorable-docs domain reports NULL)."""
    from pyspark.sql import functions as F

    from sagan_spark.ops.lmscore import domain_lm_prior, lm_train_bigrams

    rows = [
        (1, "the cat sat on the mat", "https://a.com/1"),
        (2, "the cat sat", "https://a.com/2"),
        (3, "x", "https://b.org/1"),          # unscorable (<2 tokens)
        (4, "the dog sat here", "https://b.org/2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    lm = lm_train_bigrams(docs, n_buckets=1 << 12)
    from sagan_spark.ops.lmscore import lm_likelihood

    per_doc = {
        r.doc_id: r.lm_score_ppm for r in lm_likelihood(docs, lm).collect()
    }
    got = {
        r.domain: (r.n_docs, r.n_scored, r.prior_ppm)
        for r in domain_lm_prior(docs, lm).collect()
    }
    a_scores = [per_doc[1], per_doc[2]]
    b_scores = [per_doc[4]]
    assert got["a.com"] == (2, 2, sum(a_scores) // 2)
    assert got["b.org"] == (2, 1, b_scores[0])
    assert per_doc[3] is None
