"""novelty_scores: per-doc corpus-unique-shingle census.  A pure-
Python twin recomputes df==1 ownership from the same k-gram spec;
edge cases pin short docs (NULL ppm), exact duplicates (novelty 0),
and fully-unique docs (novelty 1e6).  A plan pin rejects windows and
any join of the shingle fact frame against itself."""

from __future__ import annotations

from collections import Counter

from sagan_spark.ops.textstats import novelty_scores

DOCS = [
    (1, "abcdefghij"),          # shares nothing -> fully novel
    (2, "the same text here"),  # dup of 3 -> zero novel
    (3, "the same text here"),
    (4, "short"),               # < k=8 chars -> no shingles
    (5, "the same tax here!!"), # overlaps 2/3 partially
]


def _py_novelty(rows, k=8):
    sh = {i: {t[j:j + k] for j in range(max(len(t) - k + 1, 1))
              if len(t[j:j + k]) == k}
          for i, t in rows}
    df = Counter(s for ss in sh.values() for s in ss)
    out = {}
    for i, _ in rows:
        tot = len(sh[i])
        novel = sum(1 for s in sh[i] if df[s] == 1)
        ppm = (1_000_000 * novel) // tot if tot else None
        out[i] = (tot, novel if tot else None, ppm)
    return out


def test_novelty_matches_python_twin(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
           for r in novelty_scores(docs, k=8).collect()}
    want = _py_novelty(DOCS)
    # short doc: zero shingles, NULL novel/ppm
    assert got[4] == (0, None, None)
    # exact duplicates: nothing unique
    assert got[2][2] == 0 and got[3][2] == 0
    # fully unique doc
    assert got[1][2] == 1_000_000
    assert got == want


def test_novelty_plan_no_window_no_fact_fact_join(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = novelty_scores(docs, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # the only joins are doc-keyed: never a join keyed on the shingle
    assert all(
        "shingle" not in line for line in plan.splitlines() if "Join" in line
    )
