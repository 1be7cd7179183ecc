"""bpe_train spec: the engine's merge list equals a pure-Python
Sennrich reference implementation (greedy left-to-right pairing,
(count DESC, left, right) tie-break) on crafted corpora, including the
overlap cases plain string replace gets wrong."""

from __future__ import annotations

import re
from collections import Counter

from sagan_spark.ops.bpetrain import bpe_train
from sagan_spark.ops.textstats import TOKEN_RE


def py_bpe(texts: list[str], rounds: int) -> list[tuple]:
    """Reference Sennrich trainer over word types."""
    tok = re.compile(TOKEN_RE)
    words = Counter(w for t in texts if t for w in tok.findall(t))
    seqs = {w: tuple(list(w) + ["</w>"]) for w in words}
    merges = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for w, cnt in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, c))
        for w in words:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def _train(spark, texts, rounds):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bpe_train(docs, rounds=rounds).collect()
    return sorted(
        (r["merge_round"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in rows
    )


def test_matches_reference_trainer(spark):
    texts = [
        "low lower lowest",
        "new newer newest newest",
        "wider wide wide",
        None,
    ]
    assert _train(spark, texts, 6) == sorted(py_bpe(texts, 6))


def test_overlapping_identical_pairs_greedy(spark):
    # 'aaaa' -> pairs (a,a) x3, greedy merges positions 0-1 and 2-3
    texts = ["aaaa aaaa baaa"]
    assert _train(spark, texts, 3) == sorted(py_bpe(texts, 3))


def test_back_to_back_alternating_pairs(spark):
    # 'abab': (a,b) occurrences at 0 and 2 share no symbol but share a
    # gap — the double-space rendering must merge BOTH
    texts = ["abab abab ab"]
    got = _train(spark, texts, 1)
    want = sorted(py_bpe(texts, 1))
    assert got == want
    # (a,b) count = 2+2+1 = 5
    assert got[0][1:] == ("a", "b", 5)


def test_tie_breaks_lexicographic(spark):
    # 'xy' and 'ab' both occur twice; tie -> ('a','b') wins
    texts = ["xy xy ab ab"]
    got = _train(spark, texts, 1)
    assert got[0][1:3] == ("a", "b")


def test_encode_piece_counts_match_reference(spark):
    from sagan_spark.ops.bpetrain import bpe_encode

    texts = ["low lower lowest", "new newer newest newest", "low new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_encode(docs, rounds=4).collect()
    }

    # reference: train with py_bpe, segment each word, count pieces
    tok = re.compile(TOKEN_RE)
    merges = py_bpe(texts, 4)
    def seg(word):
        s = list(word) + ["</w>"]
        for _, a, b, _c in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(s[i]); i += 1
            s = out
        return len(s)
    want = {}
    for i, t in enumerate(texts):
        ws = tok.findall(t)
        want[i] = (len(ws), sum(seg(w) for w in ws))
    assert got == want
