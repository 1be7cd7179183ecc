"""Decontamination / duplicated-span operators vs pure-Python twins
(Brown et al. arXiv:2005.14165 Appendix C; Lee et al. arXiv:2107.06499).
The twins recompute tokenization, shingling, the short-item rule, and
the >=2-distinct-docs span test from scratch in plain Python."""

from __future__ import annotations

import re

from sagan_spark.ops.decontam import (
    contamination_hits,
    decontaminate,
    duplicated_spans,
)

SHARED = "the quick brown fox jumps over the lazy dog near the old riverbank today"
DOCS = [
    (0, f"intro text. {SHARED} And some trailing words here."),
    (1, f"Completely different opening -- {SHARED} -- different close."),
    (2, "no overlap with anything else; unique content about databases."),
    (3, "short doc"),
    (4, ""),
    (5, "punct!!! only??? ... ---"),
]
BENCH = [
    (100, SHARED),                      # 14 tokens -> real 13-gram overlap
    (101, "tiny bench item"),           # shorter than n: whole-item rule
    (102, "another unmatched benchmark entry nobody copied"),
]


def _toks(t: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _shingles(toks: list[str], n: int) -> set[str]:
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_hits(docs, bench, n):
    bs = {}
    for bid, t in bench:
        for s in _shingles(_toks(t), n):
            bs.setdefault(s, set()).add(bid)
    out = {}
    for did, t in docs:
        hit_sh = {s for s in _shingles(_toks(t), n) if s in bs}
        if hit_sh:
            out[did] = (
                len(hit_sh),
                len({b for s in hit_sh for b in bs[s]}),
            )
    return out


def _py_dup_spans(docs, n):
    from collections import Counter, defaultdict

    owners = defaultdict(set)
    wins = {}
    for did, t in docs:
        toks = _toks(t)
        w = (
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if len(toks) >= n
            else []
        )
        wins[did] = w
        for s in set(w):
            owners[s].add(did)
    out = {}
    for did, w in wins.items():
        dup = sum(1 for s in w if len(owners[s]) >= 2)
        out[did] = (len(w), dup, round(dup / len(w), 6) if w else 0.0)
    return out


def test_contamination_hits_matches_twin(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    bench = spark.createDataFrame(BENCH, "bench_id int, text string")
    for n in (13, 3):
        got = {
            r.doc_id: (r.n_hit_shingles, r.n_bench_docs)
            for r in contamination_hits(docs, bench, n=n).collect()
        }
        assert got == _py_hits(DOCS, BENCH, n), f"n={n}"


def test_contamination_short_item_rule(spark):
    # a doc containing the SHORT benchmark item verbatim must hit via
    # the whole-item shingle even though the item has < n tokens
    docs = spark.createDataFrame(
        [(7, "prefix tiny bench item suffix")], "doc_id int, text string"
    )
    bench = spark.createDataFrame([(101, "tiny bench item")], "bench_id int, text string")
    got = contamination_hits(docs, bench, n=13).collect()
    # doc has 5 tokens < 13 -> its only shingle is the whole doc, which
    # differs from the bench item -> NO hit (both sides shingle at the
    # same n; the rule is per-side, exactly as in the twin)
    assert got == []
    # at n=3 the 3-gram 'tiny bench item' exists on both sides
    got3 = contamination_hits(docs, bench, n=3).collect()
    assert len(got3) == 1 and got3[0].doc_id == 7


def test_decontaminate_flags(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    bench = spark.createDataFrame(BENCH, "bench_id int, text string")
    flags = {
        r.doc_id: r.contaminated
        for r in decontaminate(docs, bench, n=13).collect()
    }
    assert set(flags) == {d for d, _ in DOCS}  # full projection
    want = set(_py_hits(DOCS, BENCH, 13))
    assert {d for d, c in flags.items() if c} == want == {0, 1}


def test_duplicated_spans_matches_twin(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    for n in (13, 4):
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
            for r in duplicated_spans(docs, n=n).collect()
        }
        assert got == _py_dup_spans(DOCS, n), f"n={n}"


def test_duplicated_spans_within_doc_repeat_not_counted(spark):
    # the same span twice in ONE doc is repetition, not duplication
    t = "alpha beta gamma delta " * 3
    docs = spark.createDataFrame([(0, t)], "doc_id int, text string")
    row = duplicated_spans(docs, n=4).collect()[0]
    assert row.n_windows == 9 and row.n_dup_windows == 0


def _py_remove_spans(docs, n):
    from collections import defaultdict

    owners = defaultdict(set)
    wins = {}
    for did, t in docs:
        # NULL text: Spark's size()/filter() propagate NULL and
        # concat_ws yields '' — the op returns (NULL, NULL, '')
        if t is None:
            wins[did] = (None, [])
            continue
        toks = _toks(t)
        w = (
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if len(toks) >= n
            else []
        )
        wins[did] = (toks, w)
        for s in set(w):
            owners[s].add(did)
    out = {}
    for did, (toks, w) in wins.items():
        if toks is None:
            out[did] = (None, None, "")
            continue
        covered = set()
        for i, s in enumerate(w):
            if len(owners[s]) >= 2:
                covered.update(range(i, i + n))
        kept = [tok for j, tok in enumerate(toks) if j not in covered]
        out[did] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


def test_remove_duplicated_spans_matches_twin(spark):
    from sagan_spark.ops.decontam import remove_duplicated_spans

    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    for n in (13, 4):
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
            for r in remove_duplicated_spans(docs, n=n).collect()
        }
        assert got == _py_remove_spans(DOCS, n), f"n={n}"


def test_remove_duplicated_spans_edges(spark):
    """Every row survives: short docs untouched, a fully-duplicated doc
    ends empty, overlap of covered windows removes the union."""
    from sagan_spark.ops.decontam import remove_duplicated_spans

    rows = [
        (0, "a b c d e f"),        # fully duplicated vs doc 1
        (1, "a b c d e f"),
        (2, "x a b c d e f y z"),  # interior copy: ends survive
        (3, "too short"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in remove_duplicated_spans(docs, n=6).collect()
    }
    assert got == _py_remove_spans(rows, 6)
    assert got[0] == (6, 6, "")
    assert got[2] == (9, 6, "x y z")
    assert got[3] == (2, 0, "too short")


def test_remove_spans_keep_first_protects_first_occurrence(spark):
    """keep_first=True: the min-(doc_id, position) occurrence of each
    duplicated window keeps its tokens; later copies are removed.
    remove-all (default) removes BOTH."""
    from sagan_spark.ops.decontam import remove_duplicated_spans

    span = "a b c d"  # 4-token duplicated span with n=4
    rows = [
        (1, span + " tail1 x y z"),
        (2, "lead2 q r s " + span),
        (3, "unrelated text with no duplicate window here ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    keep = {r.doc_id: r for r in
            remove_duplicated_spans(docs, n=4, keep_first=True).collect()}
    # doc 1 holds the first occurrence -> untouched
    assert keep[1].n_removed == 0
    assert keep[1].cleaned_text == "a b c d tail1 x y z"
    # doc 2's copy is removed
    assert keep[2].n_removed == 4
    assert keep[2].cleaned_text == "lead2 q r s"
    assert keep[3].n_removed == 0

    rm = {r.doc_id: r for r in
          remove_duplicated_spans(docs, n=4).collect()}
    assert rm[1].n_removed == 4 and rm[2].n_removed == 4


def test_remove_spans_keep_first_overlap_caveat(spark):
    """Documented caveat: a kept occurrence can still lose tokens to a
    DIFFERENT duplicated window whose keeper lives elsewhere."""
    from sagan_spark.ops.decontam import remove_duplicated_spans

    # doc 1: "a b c" (keeper of window abc)
    # doc 2: "x a b c" -> windows "x a b" is unique... craft overlap:
    # window1 = "a b c" dup in docs 1,2 (keeper doc 1)
    # window2 = "b c d" dup in docs 2,3 (keeper doc 2) overlapping
    rows = [
        (1, "a b c"),
        (2, "a b c d"),
        (3, "z b c d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           remove_duplicated_spans(docs, n=3, keep_first=True).collect()}
    assert got[1].n_removed == 0                       # keeper of abc
    # doc 2: abc occurrence (pos 1) removed (keeper is doc 1); bcd
    # occurrence (pos 2) is doc 2's OWN keeper, but positions 1-3 are
    # already covered by the non-keeper abc window -> only 'd' survives
    assert got[2].cleaned_text == "d"
    # doc 3 windows: "z b c" (unique), "b c d" (dup, keeper = doc 2
    # pos 2) -> doc 3 loses positions 2-4, only "z" survives
    assert got[3].cleaned_text == "z" and got[3].n_removed == 3
