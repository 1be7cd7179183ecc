"""Oracles for the web-text cleaning ops and near-dup cluster
canonicalization: each Spark operator is compared against a small
pure-Python twin computed row-by-row (webclean metrics) or against a
hand-built union-find (connected components)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sagan_spark.ops.dedup import (
    connected_components,
    near_dup_clusters,
    near_dup_drop_list,
    ngram_jaccard_pairs,
)
from sagan_spark.ops.webclean import (
    EMAIL_RE,
    IPV4_RE,
    corpus_prep,
    corpus_prep_yield,
    filter_verdict,
    pii_scrub,
    repetition_metrics,
    gopher_quality_filters,
    top_ngram_char_frac,
)

DOCS = [
    (0, "one single line of perfectly ordinary text", "en"),
    (1, "duplicate line x\nduplicate line x\nduplicate line x\nother", "en"),
    (2, "a b\nc d\na b", "en"),
    (3, "", "en"),
    (4, "contact me at bob@example.com or 10.1.2.3 ok", "en"),
    (5, "spam spam spam spam spam spam", "en"),
    (6, "short", "de"),
    (7, "a@b.co c@d.io 1.2.3.4 255.255.255.255 999.1.1.1", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, l) for i, t, l in DOCS], "doc_id long, text string, lang string"
    )


def _py_repetition(text):
    lines = text.split("\n")
    n = len(lines)
    dlines = list(dict.fromkeys(lines))
    tc = sum(len(x) for x in lines)
    dc = sum(len(x) for x in dlines)
    return (
        n,
        round((n - len(dlines)) / n, 6),
        round((tc - dc) / max(tc, 1), 6),
    )


def test_repetition_metrics_vs_python(docs_df):
    got = {r.doc_id: r for r in repetition_metrics(docs_df).collect()}
    for i, t, _ in DOCS:
        n, dlf, dlcf = _py_repetition(t)
        r = got[i]
        assert r.n_lines == n, (i, t)
        assert r.dup_line_frac == pytest.approx(dlf, abs=1e-9)
        assert r.dup_line_char_frac == pytest.approx(dlcf, abs=1e-9)


def _py_top_ngram(text, n=2):
    toks = [w for w in re.split(r"\s+", text) if w != ""]
    if len(toks) < n:
        return None, 0, None
    c = Counter(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    gram, cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    wchars = sum(len(w) for w in toks)
    frac = round(cnt * (len(gram) - (n - 1)) / max(wchars, 1), 6)
    return gram, cnt, frac


def test_top_ngram_vs_python(docs_df):
    got = {r.doc_id: r for r in top_ngram_char_frac(docs_df, n=2).collect()}
    for i, t, _ in DOCS:
        gram, cnt, frac = _py_top_ngram(t)
        r = got[i]
        assert r.top_gram == gram, (i, t)
        assert r.top_gram_count == cnt
        if frac is None:
            assert r.top_gram_char_frac is None
        else:
            assert r.top_gram_char_frac == pytest.approx(frac, abs=1e-9)


def test_pii_scrub_vs_python(docs_df):
    got = {r.doc_id: r for r in pii_scrub(docs_df).collect()}
    for i, t, _ in DOCS:
        clean = re.sub(EMAIL_RE, "<EMAIL>", t)
        n_ips = len(re.findall(IPV4_RE, clean))
        clean = re.sub(IPV4_RE, "<IP>", clean)
        r = got[i]
        assert r.n_emails == len(re.findall(EMAIL_RE, t)), (i, t)
        assert r.n_ips == n_ips
        assert r.clean_text == clean
        assert r.clean_len == len(clean)


def test_pii_email_host_not_double_counted(spark):
    # the email's dotted-quad host must be swallowed by the email pass,
    # not re-counted as an IP
    df = spark.createDataFrame(
        [(0, "x admin@10.1.2.3.example.com y", "en")],
        "doc_id long, text string, lang string",
    )
    r = pii_scrub(df).collect()[0]
    assert r.n_emails == 1 and r.n_ips == 0


def test_filter_verdict_order_and_reasons(docs_df):
    got = {r.doc_id: (r.reason, r.keep) for r in filter_verdict(docs_df).collect()}
    assert got[3] == ("too_short", False)      # empty -> length first
    assert got[6] == ("too_short", False)      # short AND de: length wins
    assert got[1][0] in ("repetition",)        # 2/4 lines dup > 0.30
    assert got[0] == ("ok", True)


# ---------------------------------------------------------------------------
# connected components / canonicalization
# ---------------------------------------------------------------------------


def _py_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    comp = {}
    for n in parent:
        root = find(n)
        comp.setdefault(root, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11)],                    # chain + pair
        [(5, 6), (6, 7), (7, 5), (1, 9), (2, 9)],      # cycle + star
        [(1, 2), (3, 4), (5, 6), (2, 3), (4, 5)],      # long chain via joins
    ],
)
def test_connected_components_vs_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.comp for r in connected_components(pairs, "doc_a", "doc_b").collect()}
    assert got == _py_components(edges)


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11)],                    # chain + pair
        [(5, 6), (6, 7), (7, 5), (1, 9), (2, 9)],      # cycle + star
        [(1, 2), (3, 4), (5, 6), (2, 3), (4, 5)],      # long chain via joins
        [(i, i + 1) for i in range(1, 33)],            # diameter-32 path:
        # the deep-graph case the star rounds exist for (propagation
        # would need ~32 rounds; star converges in O(log))
        [(7, 7), (1, 2), (2, 1)],                      # self-loop + dup edge
    ],
)
def test_connected_components_star_vs_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.comp
        for r in connected_components(
            pairs, "doc_a", "doc_b", method="star"
        ).collect()
    }
    want = _py_components([(a, b) for a, b in edges if a != b])
    # a self-loop-only node is its own component
    for a, b in edges:
        if a == b:
            want.setdefault(a, a)
    assert got == want


def test_connected_components_star_random_graph(spark):
    import random

    rng = random.Random(0xC0FFEE)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    star = {
        r.node: r.comp
        for r in connected_components(pairs, "doc_a", "doc_b", method="star").collect()
    }
    prop = {
        r.node: r.comp
        for r in connected_components(pairs, "doc_a", "doc_b").collect()
    }
    assert star == prop == _py_components(edges)


def test_connected_components_rejects_unknown_method(spark):
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="unknown method"):
        connected_components(pairs, method="frontier")


def test_near_dup_cluster_contract(spark):
    # three exact-duplicate families + singletons; Jaccard(identical)=1
    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 3,
        1: "the quick brown fox jumps over the lazy dog " * 3,
        2: "the quick brown fox jumps over the lazy dog " * 3,
        3: "completely different content about database systems " * 3,
        4: "completely different content about database systems " * 3,
        5: "a lone unique document with its own words here " * 3,
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    clusters = {
        r.canonical_id: r.cluster_size
        for r in near_dup_clusters(docs, threshold=0.9).collect()
    }
    assert clusters == {0: 3, 3: 2}
    drop = {r.doc_id for r in near_dup_drop_list(docs, threshold=0.9).collect()}
    assert drop == {1, 2, 4}
    # pair/cluster consistency: drops = sum(cluster_size - 1)
    assert len(drop) == sum(s - 1 for s in clusters.values())


def test_cluster_ops_on_pairless_corpus(spark):
    # no near-dups at all: empty clusters / empty drop list, no crash
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    assert near_dup_clusters(docs, threshold=0.9).count() == 0
    assert near_dup_drop_list(docs, threshold=0.9).count() == 0


def test_cluster_pairs_are_verified_not_raw_lsh(spark):
    # two docs sharing a band but with low true Jaccard must NOT cluster
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta " * 2,
        1: "alpha beta gamma delta epsilon zeta eta theta " * 2,
        2: "unrelated words entirely distinct vocabulary tokens " * 2,
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    verified = ngram_jaccard_pairs(docs, threshold=0.9)
    got = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert got == {(0, 1)}
    clusters = {
        r.canonical_id for r in near_dup_clusters(docs, threshold=0.9).collect()
    }
    assert clusters == {0}


def test_corpus_prep_composition(spark):
    """Quality reasons take precedence; near-dup clustering runs only
    over quality-kept docs; the canonical (min-id) dup survives."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest to hide from every hunter there"
    )
    docs = spark.createDataFrame(
        [
            (0, "tiny", "en"),  # too_short
            (1, base + " unique tail one", "de"),  # lang
            (2, base + " alpha", "en"),  # near-dup pair canonical
            (3, base + " alphb", "en"),  # near-dup pair member -> drop
            (4, "completely different words entirely unrelated to anything else written here today", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: (r.reason, r.keep) for r in corpus_prep(docs, jaccard_threshold=0.5).collect()}
    assert got[0] == ("too_short", False)
    assert got[1] == ("lang", False)
    assert got[2] == ("ok", True)  # canonical member keeps
    assert got[3] == ("near_dup", False)
    assert got[4] == ("ok", True)

    y = {r.reason: (r.n_docs, r.n_tokens) for r in corpus_prep_yield(docs, jaccard_threshold=0.5).collect()}
    assert y["too_short"][0] == 1 and y["lang"][0] == 1
    assert y["near_dup"][0] == 1 and y["ok"][0] == 2
    assert y["ok"][1] > y["near_dup"][1] > 0


def test_corpus_prep_dup_pair_hidden_by_quality_gate(spark):
    """A near-dup whose twin fails a quality gate must NOT be dropped
    as a dup — clustering only sees quality-kept docs."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest to hide from every hunter there"
    )
    docs = spark.createDataFrame(
        [
            (10, base + " ending", "de"),  # lang-dropped twin
            (11, base + " endinh", "en"),  # its near-dup: must stay ok
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r.reason for r in corpus_prep(docs, jaccard_threshold=0.5).collect()}
    assert got[10] == "lang"
    assert got[11] == "ok"


def test_filter_verdict_null_text_and_lang_dropped(spark):
    """NULL text routes too_short and NULL lang routes lang — a NULL
    WHEN-condition must not fall through every gate to 'ok'/keep
    (routine rows in a scraped corpus)."""
    df = spark.createDataFrame(
        [
            (1, None, "en"),
            (2, "plenty of perfectly good english text here", None),
            (3, "plenty of perfectly good english text here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: (r.reason, r.keep) for r in filter_verdict(df).collect()}
    assert got[1] == ("too_short", False)
    assert got[2] == ("lang", False)
    assert got[3] == ("ok", True)


def _py_gopher(text):
    import re as _re

    if text is None:
        words, lines = [], [""]
    else:
        words = [w for w in _re.split(r"\s+", text) if w != ""]
        lines = text.split("\n")
    n_words, n_lines = len(words), len(lines)
    wchars = sum(len(w) for w in words)
    mean_wlen = wchars / max(n_words, 1)
    n_hash = (text or "").count("#")
    n_ell = (text or "").count("...") + (text or "").count("…")
    hash_ratio = n_hash / max(n_words, 1)
    ell_ratio = n_ell / max(n_words, 1)
    bullet = sum(bool(_re.match(r"^[-*•]", l)) for l in lines) / max(n_lines, 1)
    ell = sum(bool(_re.search(r"(\.\.\.|…)$", l)) for l in lines) / max(n_lines, 1)
    alpha = sum(bool(_re.search("[A-Za-z]", w)) for w in words) / max(n_words, 1)
    toks = {
        _re.sub(r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$", "", w).lower() for w in words
    }
    stops = sum(s in toks for s in
                ("the", "be", "to", "of", "and", "that", "have", "with"))
    checks = [
        ("word_count", 50 <= n_words <= 100_000),
        ("mean_word_length", 3.0 <= mean_wlen <= 10.0),
        ("symbol_ratio", hash_ratio <= 0.1 and ell_ratio <= 0.1),
        ("bullet_lines", bullet < 0.9),
        ("ellipsis_lines", ell < 0.3),
        ("alpha_words", alpha >= 0.8),
        ("stopwords", stops >= 2),
    ]
    reason = next((name for name, ok in checks if not ok), "ok")
    return reason, reason == "ok"


GOPHER_DOCS = [
    (0, " ".join(f"word{i} of the and" for i in range(20)), "en"),  # 80 ok words
    (1, "too few words here", "en"),
    (2, " ".join("hashtag# with the" for _ in range(60)), "en"),  # symbol spam
    (3, "\n".join("- bullet line" for _ in range(20)), "en"),
    (4, "\n".join(f"trailing {i}..." for i in range(3)) + "\n"
        + " ".join(f"the of word{i}" for i in range(20)), "en"),
    (5, " ".join("12345 67890" for _ in range(40)), "en"),  # no alpha
    (6, " ".join(f"word{i}" for i in range(60)), "en"),  # no stopwords
    (7, None, "en"),
    (8, " ".join("supercalifragilistic" for _ in range(60)), "en"),  # long words
]


def test_gopher_filters_vs_python(spark):
    df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.gopher_reason, r.gopher_keep)
        for r in gopher_quality_filters(df).collect()
    }
    for doc_id, text, _ in GOPHER_DOCS:
        assert got[doc_id] == _py_gopher(text), (doc_id, text, got[doc_id])
    # every rule individually exercised
    assert {got[i][0] for i in range(9)} >= {
        "ok", "word_count", "symbol_ratio", "bullet_lines",
        "ellipsis_lines", "alpha_words", "stopwords", "mean_word_length",
    }


def test_hashed_linear_score_vs_python(spark):
    """Synthetic-weights classifier inference == hashlib/math twin."""
    import hashlib
    import math
    import re as _re

    from sagan_spark.ops.webclean import hashed_linear_score

    docs = [
        (0, "the quick brown fox"),
        (1, "spam spam spam buy now!!!"),
        (2, ""),          # zero tokens -> neutral 0.5
        (3, None),        # NULL text -> neutral 0.5
        (4, "a solitary sentence with ordinary words."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.score)
           for r in hashed_linear_score(df, n_buckets=1 << 18).collect()}

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    tok_re = _re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", _re.ASCII)
    for doc_id, text in docs:
        toks = tok_re.findall(text) if text else []
        if not toks:
            assert got[doc_id] == (0, 0.5), doc_id
            continue
        ws = [
            (md5_long(f"w|{md5_long(t) % (1 << 18)}") % 2001) - 1000
            for t in toks
        ]
        want = round(1.0 / (1.0 + math.exp(-(sum(ws) / (len(ws) * 1000.0)))), 6)
        assert got[doc_id] == (len(toks), want), doc_id


def test_hashed_linear_score_trained_weights(spark):
    """Trained-weights mode: broadcast join, missing buckets weigh 0,
    bias shifts the sigmoid."""
    import math

    from sagan_spark.ops.webclean import hashed_linear_score

    df = spark.createDataFrame([(0, "good good bad")], "doc_id long, text string")
    import hashlib

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 64

    w = spark.createDataFrame(
        [(bucket("good"), 1000)], "bucket long, weight_milli long"
    )
    r = hashed_linear_score(df, weights=w, n_buckets=64, bias=0.25).collect()[0]
    # mean = (1000 + 1000 + 0) / (3 * 1000) = 2/3; score = sigmoid(2/3 + .25)
    assert r.n_tokens == 3
    assert r.score == round(1.0 / (1.0 + math.exp(-(2.0 / 3.0 + 0.25))), 6)


def test_train_quality_classifier_vs_python(spark):
    """Trainer == hashlib/arithmetic twin on a hand corpus; the learned
    weights separate reference markers from crawl markers."""
    import hashlib
    import re as _re

    from sagan_spark.ops.webclean import train_quality_classifier

    docs = [
        (0, "wiki wiki prose", True),
        (1, "wiki prose", True),
        (2, "spam spam spam", False),
        (3, "prose spam", False),
        (4, None, True),   # NULL text contributes nothing
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, is_ref boolean")
    got = {
        r.bucket: (r.weight_milli, r.pos_count, r.neg_count)
        for r in train_quality_classifier(df, "is_ref", n_buckets=1 << 18).collect()
    }

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % (1 << 18)

    tok_re = _re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", _re.ASCII)
    counts: dict[int, list[int]] = {}
    for _, text, is_ref in docs:
        for t in tok_re.findall(text or ""):
            c = counts.setdefault(bucket(t), [0, 0])
            c[0 if is_ref else 1] += 1
    want = {
        b: ((2000 * (p + 1)) // (p + n + 2) - 1000, p, n)
        for b, (p, n) in counts.items()
    }
    assert got == want
    # separability: a reference-only token weighs positive, a crawl-only
    # token negative, and wiki (3 pos / 0 neg) > prose (2 pos / 1 neg)
    assert got[bucket("wiki")][0] > 0 > got[bucket("spam")][0]
    assert got[bucket("wiki")][0] > got[bucket("prose")][0]


def test_train_then_score_roundtrip(spark):
    """End-to-end train -> hashed_linear_score: reference-looking docs
    outscore crawl-looking docs under the learned weights."""
    from sagan_spark.ops.webclean import hashed_linear_score, train_quality_classifier

    rows = [(i, "wiki prose citation needed", True) for i in range(6)]
    rows += [(10 + i, "buy spam pills now", False) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_ref boolean")
    model = train_quality_classifier(df, "is_ref")
    scored = {
        r.doc_id: r.score
        for r in hashed_linear_score(
            df, weights=model.select("bucket", "weight_milli")
        ).collect()
    }
    assert scored[0] > 0.5 > scored[10]
    assert all(scored[i] == scored[0] for i in range(6))
    assert all(scored[10 + i] == scored[10] for i in range(6))


def test_calibrate_keep_threshold(spark):
    """Threshold rule on a hand corpus: largest score keeping >= target,
    ties share a fate, NULL scores excluded, target floors at 1."""
    from sagan_spark.ops.webclean import calibrate_keep_threshold

    scores = [0.9, 0.8, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]
    df = spark.createDataFrame(
        [(float(s),) for s in scores] + [(None,)], "score double"
    )
    # keep 40% of 10 scored docs -> target 4; cum at 0.7 is 4 -> t=0.7
    r = calibrate_keep_threshold(df, keep_ppm=400_000).collect()[0]
    assert (r.threshold, r.n_kept, r.n_total, r.target) == (0.7, 4, 10, 4)
    # keep 25% -> target 2, but the tie at 0.8 means cum jumps 1 -> 3:
    # the largest score with cum >= 2 is 0.8, keeping 3 (ties together)
    r = calibrate_keep_threshold(df, keep_ppm=250_000).collect()[0]
    assert (r.threshold, r.n_kept, r.target) == (0.8, 3, 2)
    # tiny rate floors the target at 1 -> threshold = max score
    r = calibrate_keep_threshold(df, keep_ppm=1).collect()[0]
    assert (r.threshold, r.n_kept, r.target) == (0.9, 1, 1)


def test_encoding_quality_vs_python(spark):
    """Counts and verdict == a pure-Python re twin over defect cases."""
    import re as _re

    from sagan_spark.ops.webclean import (
        REPLACEMENT_CHAR,
        encoding_quality,
    )

    docs = [
        (0, "perfectly clean ascii text"),
        (1, "caf\u00e9 with real accents is fine"),  # real e-acute: NOT mojibake
        (2, "double-decoded: \u00c3\u00a9t\u00c3\u00a9 and \u00e2\u20ac\u2122quotes"),
        (3, "decoder gave up \ufffd\ufffd here"),
        (4, "bell \x07 and \x1b escape"),
        (5, ""),
        (6, None),
        (7, "\u00c3"),  # bare A-tilde: no mojibake follower
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_replacement, r.n_control, r.n_mojibake, r.enc_ok)
           for r in encoding_quality(df).collect()}

    def count_ctrl(s):
        return sum(
            1 for ch in s
            if (0 <= ord(ch) <= 8) or ord(ch) in (0x0B, 0x0C)
            or (0x0E <= ord(ch) <= 0x1F) or (0x7F <= ord(ch) <= 0x9F)
        )

    moji = _re.compile("\u00c3[\u0080-\u00ff]|\u00e2\u20ac")

    for doc_id, text in docs:
        t = text or ""
        want = (
            t.count(REPLACEMENT_CHAR),
            count_ctrl(t),
            len(moji.findall(t)),
            t.count(REPLACEMENT_CHAR) == 0 and count_ctrl(t) == 0
            and len(moji.findall(t)) <= 0.001 * len(t),
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    assert got[2][3] is False and got[1][3] is True and got[7][3] is True
    assert got[6] == (0, 0, 0, True)  # NULL text: nothing broken


def test_c4_filters_vs_python(spark):
    """c4_filters vs a pure-Python twin over hand cases exercising
    every rule: terminal-punct line keep, <3-word line drop,
    javascript line drop, bad word / lorem ipsum / curly brace page
    flags, sentence-count threshold, NULL text."""
    import re as _re

    from sagan_spark.ops.webclean import (
        C4_BADWORDS_DEFAULT,
        C4_TERMINAL_RE,
        c4_filters,
    )

    docs = [
        # 5 good sentences, one unterminated line, one short line
        (0, "alpha beta gamma one.\nbeta gamma two!\nno terminal punct"
            "\ntiny.\nthree words here?\nfour more words now.\n"
            "and a fifth sentence stands."),
        (1, "good line stays right here.\nwatch porn now please."),
        (2, "lorem ipsum dolor sit amet."),
        (3, "a code block { lives } here."),
        (4, "please enable javascript to continue.\nreal text stays here."),
        (5, None),
        (6, 'quoted line ends well."\nspaced   words   count fine.'),
    ]
    got = {
        r.doc_id: r
        for r in c4_filters(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }

    term = _re.compile(C4_TERMINAL_RE)
    bad = _re.compile(
        "\\b(?:" + "|".join(_re.escape(w) for w in C4_BADWORDS_DEFAULT) + ")\\b"
    )

    def twin(text):
        if text is None:
            return (None, 0, 0, False, True, True, True, False)
        kept = [
            ln for ln in text.split("\n")
            if term.search(ln.rstrip(" "))
            and len([w for w in _re.split(r"\s+", ln) if w]) >= 3
            and "javascript" not in ln.lower()
        ]
        clean = "\n".join(kept)
        n_sent = len(_re.findall(r"[.!?]", clean))
        enough = n_sent >= 5
        no_bad = not bad.search(text.lower())
        no_lorem = "lorem ipsum" not in text.lower()
        no_brace = "{" not in text
        return (clean, len(kept), n_sent, enough, no_bad, no_lorem,
                no_brace, enough and no_bad and no_lorem and no_brace)

    for doc_id, text in docs:
        r = got[doc_id]
        have = (r.clean_text, r.n_lines_kept, r.n_sentences,
                r.enough_sentences, r.no_bad_words, r.no_lorem_ipsum,
                r.no_curly_brace, r.c4_keep)
        assert have == twin(text), (doc_id, have, twin(text))
    # spot-pins: the twin can't mask a shared misreading of the paper
    assert got[0].n_lines_kept == 5 and got[0].c4_keep is True
    assert got[1].no_bad_words is False and got[1].c4_keep is False
    assert got[2].no_lorem_ipsum is False
    assert got[3].no_curly_brace is False
    assert got[4].n_lines_kept == 1      # javascript line dropped
    assert got[5].clean_text is None and got[5].c4_keep is False
    assert got[6].n_lines_kept == 2      # end-quote terminal + \s+ tokens

    # empty badwords tuple = screen nothing (the naive joined regex
    # would be \b(?:)\b and match every word boundary)
    none_screened = {
        r.doc_id: r.no_bad_words
        for r in c4_filters(
            spark.createDataFrame(docs, "doc_id long, text string"),
            badwords=(),
        ).collect()
    }
    assert all(v is True for v in none_screened.values())


def test_load_badwords_and_c4_integration(spark, tmp_path):
    from pyspark.sql import functions as F

    from sagan_spark.ops.webclean import c4_filters, load_badwords

    en = load_badwords("en")
    assert "porn" in en and en == tuple(sorted(set(en)))
    de = load_badwords("de")
    assert "porno" in de and de != en
    # custom file + comment/blank/dup handling
    f = tmp_path / "xx"
    f.write_text("Alpha\n\n# comment\nbeta phrase\nalpha\n")
    assert load_badwords("xx", path=str(tmp_path)) == ("alpha", "beta phrase")
    assert load_badwords(path=str(f)) == ("alpha", "beta phrase")
    with pytest.raises(FileNotFoundError, match="'zz'"):
        load_badwords("zz")

    docs = spark.createDataFrame(
        [(1, 'This page mentions Porn somewhere. It has five. Yes five. '
             'Sentences in total. Really it does.'),
         (2, 'A perfectly clean page indeed. It has five. Yes five. '
             'Sentences in total. Really it does.')],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.no_bad_words, r.c4_keep)
           for r in c4_filters(docs, badwords=load_badwords("en")).collect()}
    assert got[1] == (False, False)
    assert got[2] == (True, True)


def test_remove_boilerplate_lines_vs_python(spark):
    from sagan_spark.ops.webclean import remove_boilerplate_lines

    rows = [
        (1, "unique one\nCOMMON FOOTER\n  \nalso unique"),
        (2, "COMMON FOOTER\nsecond doc line"),
        (3, "third doc\n COMMON FOOTER \nx"),  # trimmed-form match
        (4, None),
        (5, "only\n\nblank lines\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def twin(min_docs):
        import re

        df = {}
        for doc_id, text in rows:
            if text is None:
                continue
            for line in text.split("\n"):
                if re.match(r"^[ \t\r\f]*$", line):
                    continue
                df.setdefault(line.strip(), set()).add(doc_id)
        hot = {k for k, v in df.items() if len(v) >= min_docs}
        out = {}
        for doc_id, text in rows:
            if text is None:
                out[doc_id] = (None, 0, 0)
                continue
            lines = text.split("\n")
            kept = [
                ln
                for ln in lines
                if re.match(r"^[ \t\r\f]*$", ln) or ln.strip() not in hot
            ]
            out[doc_id] = ("\n".join(kept), len(lines), len(lines) - len(kept))
        return out

    for min_docs in (2, 3, 4):
        got = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_dropped)
            for r in remove_boilerplate_lines(docs, min_docs=min_docs).collect()
        }
        assert got == twin(min_docs), f"min_docs={min_docs}"
    # min_docs=2 specifics: footer gone everywhere (incl. the padded
    # variant), blanks and unique lines intact, NULL doc restored
    got = {
        r.doc_id: r.clean_text
        for r in remove_boilerplate_lines(docs, min_docs=2).collect()
    }
    assert got[1] == "unique one\n  \nalso unique"
    assert got[2] == "second doc line"
    assert got[3] == "third doc\nx"
    assert got[4] is None
    assert got[5] == "only\n\nblank lines\n"


def test_remove_boilerplate_lines_plan_shape(spark):
    """Document-frequency must be the two-phase count_distinct
    AGGREGATION (map-side partial on (line, doc)) — no Window, no
    row_number; blanks carry the 'b:'-prefixed unique synthetic join
    key so '' never becomes the hottest probe key."""
    from sagan_spark.ops.webclean import remove_boilerplate_lines

    docs = spark.createDataFrame([(1, "a\n \nb")], "doc_id long, text string")
    qe = remove_boilerplate_lines(docs)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "Window" not in plan and "row_number" not in plan
    assert "partial_count(distinct" in plan.lower() or "partial_count" in plan, (
        "two-phase distinct-count aggregation missing"
    )
    opt = qe.optimizedPlan().toString()
    assert "b:" in opt, "blank-conditional unique join key missing"


def test_train_quality_classifier_null_label_raises(spark):
    """A NULL label (e.g. from a left join against a reference table)
    must fail loud, not silently count as a negative."""
    import pytest
    from sagan_spark.ops.webclean import train_quality_classifier

    df = spark.createDataFrame(
        [("a", "some text", True), ("b", "more text", None)],
        "doc_id string, text string, is_ref boolean",
    )
    with pytest.raises(Exception, match="NULL is_ref"):
        train_quality_classifier(df, "is_ref").collect()
