"""Language-ID: obvious snippets per language classify correctly
(marker-word argmax for Latin scripts, unicode-range counting for
non-Latin scripts), empty/markerless text returns 'und', ties break
first-wins in LANG_MARKERS order, kana presence outranks the CJK
ideograph count so Japanese beats Chinese.  The oracle SQL mirrors
every property — it is generated from the same dicts
(__spark_entry__._langid_sql).  A pure-Python twin re-implements the
full cascade from the same LANG_MARKERS/LANG_SCRIPTS constants."""

from __future__ import annotations

from sagan_spark.ops.textstats import LANG_MARKERS, LANG_SCRIPTS, lang_id

SNIPPETS = {
    # Latin-script (marker argmax)
    "en": "the cat sat on the mat and most of it was in the sun",
    "de": "der hund und die katze sind nicht mit dem vogel auf der wiese",
    "fr": "le chien et les chats sont dans la maison pour la nuit",
    "es": "el perro y los gatos que viven en una casa por la noche",
    "it": "il cane che corre per la strada non sono una cosa rara",
    "pt": "os gatos que vivem com uma familia para sempre mais felizes",
    "nl": "de hond en het paard zijn niet voor een dag met ons mee",
    "pl": "to nie jest tak proste ale jak się okazuje czy jego plan jest dobry",
    "sv": "det är en fin dag och jag har inte tid att gå till staden",
    "tr": "bu bir deneme metni ve bu metin çok daha iyi ancak kadar uzun",
    "id": "ini adalah teks sederhana yang ditulis dalam bahasa untuk pengujian dan tidak sulit",
    "ro": "acesta este un text simplu în limba care este scris pentru testare și mai mult din nou",
    # non-Latin scripts (range counting)
    "ru": "Это очень простой текст на русском языке для проверки",
    "zh": "这是一个简单的中文测试文本用于验证语言识别",
    "ja": "これは日本語のテストです。言語識別の検証に使います。",
    "ko": "이것은 한국어 테스트 문장입니다",
    "ar": "هذا نص بسيط باللغة العربية للاختبار",
    "he": "זהו טקסט פשוט בעברית לבדיקה",
    "el": "αυτό είναι ένα απλό κείμενο στα ελληνικά για δοκιμή",
    "hi": "यह हिंदी में एक सरल परीक्षण पाठ है",
    "th": "นี่คือข้อความทดสอบภาษาไทยสำหรับการตรวจสอบ",
}


def _twin(text: str) -> str:
    """Pure-Python re-implementation of the lang_id cascade."""
    if text is None:
        return "und"
    n = len(text)
    for lang, (ranges, frac) in LANG_SCRIPTS.items():
        # python re has no \x{..}: expand ranges manually instead
        cnt = sum(
            1 for ch in text
            if any(lo <= ord(ch) <= hi for lo, hi in ranges)
        )
        if n > 0 and cnt >= frac * n:
            return lang
    toks = text.split(" ")
    scores = {
        lang: sum(1 for tok in toks if tok in set(markers))
        for lang, markers in LANG_MARKERS.items()
    }
    best = max(scores.values())
    if best <= 0:
        return "und"
    return next(lang for lang in LANG_MARKERS if scores[lang] == best)


def test_langid_classifies_obvious_snippets(spark):
    rows = [(lang, text) for lang, text in SNIPPETS.items()]
    rows.append(("und", "zzz qqq xxx"))
    rows.append(("und", ""))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.pred_lang for r in lang_id(docs).collect()}
    assert got == {lang: lang for lang in SNIPPETS} | {"und": "und"}
    # the python twin agrees on every snippet
    for lang, text in SNIPPETS.items():
        assert _twin(text) == lang, (lang, text)


def test_langid_tie_breaks_first_wins(spark):
    # 'le' (fr) and 'el' (es) each appear once -> equal scores
    # (same marker length); fr precedes es in LANG_MARKERS
    langs = list(LANG_MARKERS)
    assert langs.index("fr") < langs.index("es")
    docs = spark.createDataFrame([("t", "qq le qq el qq")], ["doc_id", "text"])
    got = lang_id(docs).collect()[0]
    assert got.pred_lang == "fr"


def test_langid_kana_beats_cjk(spark):
    # Japanese prose is mostly CJK ideographs with interspersed kana:
    # the 5% kana bar must fire before the 25% CJK bar
    text = "日本語の文章は漢字が多いですが、かなも含まれています。"
    docs = spark.createDataFrame([("j", text)], ["doc_id", "text"])
    got = lang_id(docs).collect()[0]
    assert got.pred_lang == "ja"
    assert _twin(text) == "ja"


def test_langid_script_beats_latin_loanwords(spark):
    # mostly-Cyrillic text with embedded Latin stopwords is still ru
    text = "Это statement и the вот так текст на русском языке про it"
    docs = spark.createDataFrame([("r", text)], ["doc_id", "text"])
    got = lang_id(docs).collect()[0]
    assert got.pred_lang == "ru"
    assert _twin(text) == "ru"


def test_langid_null_text_is_und(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    got = lang_id(docs).collect()[0]
    assert got.pred_lang == "und"
    assert got.best_score == 0.0
    assert _twin(None) == "und"


def _trained_twin(text, weights):
    """Pure-Python twin of the trained path: per-lang milli sums,
    argmax with lang-asc tie-break, 'und' when nothing matches."""
    if text is None:
        return ("und", 0.0)
    sums: dict[str, int] = {}
    for tok in text.split(" "):
        for (wtok, lang, w) in weights:
            if wtok == tok:
                sums[lang] = sums.get(lang, 0) + w
    if not sums:
        return ("und", 0.0)
    best = max(sums.values())
    lang = min(l for l, s in sums.items() if s == best)
    return (lang, round(best / 1000.0, 6))


def test_langid_trained_weights_injection(spark):
    """Trained mode: the model table IS the classifier — weights can
    overrule the marker cascade, ties break lang-ascending, no-match
    is 'und', scores are exact milli sums."""
    weights = [
        ("the", "en", 1000),
        ("the", "xx", 2000),   # an injected model can outvote markers
        ("und?", "de", 500),
        ("oo", "aa", 700), ("oo", "ab", 700),  # tie -> 'aa' (lang asc)
    ]
    w = spark.createDataFrame(weights, "token string, lang string, weight_milli long")
    docs = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "zzz qqq"), (3, "oo"), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.pred_lang, r.best_score)
           for r in lang_id(docs, marker_weights=w).collect()}
    assert got[1] == ("xx", 4.0)      # 2×2000 beats 2×1000
    assert got[2] == ("und", 0.0)
    assert got[3] == ("aa", 0.7)
    assert got[4] == ("und", 0.0)
    for doc_id, text in [(1, "the cat and the dog"), (2, "zzz qqq"),
                         (3, "oo"), (4, None)]:
        assert got[doc_id] == _trained_twin(text, weights), doc_id


def test_langid_trained_plan_shape(spark):
    """Trained path pins: broadcast model join, min(struct) argmax
    with map-side partials, no window, no Python node."""
    from sagan_spark.contracts.queries_corpus import _langid_trained_weights

    w = spark.createDataFrame(
        _langid_trained_weights(), "token string, lang string, weight_milli long"
    )
    docs = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    plan = lang_id(docs, marker_weights=w)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Window" not in plan and "row_number" not in plan
    assert "BroadcastHashJoin" in plan, "model join must broadcast"
    assert "partial_min" in plan, "argmax must partial-aggregate map-side"


def test_readability_features(spark):
    """Flesch + TTR twin on hand-countable docs; NULL text yields NULL
    features; fragment with no sentence punctuation floors at 1."""
    import re as _re

    from sagan_spark.ops.textstats import TOKEN_RE, readability

    docs = [
        (1, "The cat sat. The dog ran!"),
        (2, "no punctuation here"),
        (3, None),
        (4, "123 456"),  # no letter-words: flesch NULL, ttr present
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch, r.ttr)
        for r in readability(df).collect()
    }
    for did, text in docs:
        if text is None:
            assert got[did] == (None, None, None, None, None)
            continue
        w = len(_re.findall(r"[A-Za-z]+", text))
        s = max(len(_re.findall(r"[.!?]+", text)), 1)
        syl = len(_re.findall(r"[aeiouy]+", text, _re.I))
        fl = (
            round(206.835 - 1.015 * (w / s) - 84.6 * (syl / w), 6)
            if w
            else None
        )
        toks = _re.findall(TOKEN_RE, text)
        ttr = round(len(set(toks)) / len(toks), 6) if toks else None
        assert got[did] == (w, s, syl, fl, ttr), did


def test_bpe_pair_stats_vs_python(spark):
    import re
    from collections import Counter

    from sagan_spark.ops.textstats import TOKEN_RE, bpe_pair_stats

    rows = [
        (1, "the cat sat on the mat, the cat!"),
        (2, "the cat sat"),
        (3, "x"),  # single token: no pairs
        (4, ""),  # no tokens
        (5, None),  # NULL text
        (6, "a1b2 c3"),  # letter/digit run splits
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    c = Counter()
    for _, text in rows:
        toks = re.findall(TOKEN_RE, text or "")
        c.update(zip(toks, toks[1:]))
    want = sorted(
        ((l, r, n) for (l, r), n in c.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:5]
    got = [
        (r.tok_left, r.tok_right, r.pair_count)
        for r in bpe_pair_stats(docs, top_n=5).collect()
    ]
    assert got == want
    assert got[0] == ("the", "cat", 3)


def test_bpe_pair_stats_plan_shape(spark):
    """Pair formation is per-row array math + ONE explode; the count
    partial-aggregates map-side and top-n is a TakeOrdered — no global
    Sort, no Window, no Python."""
    from sagan_spark.ops.textstats import bpe_pair_stats

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = bpe_pair_stats(docs, top_n=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "top-n must be TakeOrdered"
    assert "Window" not in plan and "EvalPython" not in plan
    assert "partial_count" in plan, "map-side partial count missing"


def test_vocab_spectrum_counter_twin(spark):
    """Frequency-of-frequencies equals the Counter-of-Counter twin; the
    plan carries two map-side-combining aggregations, no window."""
    import re
    from collections import Counter

    from sagan_spark.ops.textstats import TOKEN_RE, vocab_spectrum

    rows = [(1, "a a a bb bb c!"), (2, "a dd dd"), (3, ""), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tf = Counter()
    for _, text in rows:
        tf.update(re.findall(TOKEN_RE, text or ""))
    want = sorted(Counter(tf.values()).items())
    got = [
        (r.term_freq, r.n_types) for r in vocab_spectrum(docs).collect()
    ]
    assert sorted(got) == want

    plan = vocab_spectrum(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "EvalPython" not in plan
    assert "partial_count" in plan


def test_doc_features_twin_and_determinism(spark):
    """Feature strings equal a Counter twin (same md5 buckets) and are
    invariant under repartitioning."""
    import hashlib
    import re
    from collections import Counter

    from sagan_spark.ops.textstats import TOKEN_RE, doc_features

    rows = [(1, "a b a c! c! c!"), (2, "zz"), (3, ""), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    got = {
        r.doc_id: (r.n_tokens, r.n_buckets_used, r.features)
        for r in doc_features(docs, n_buckets=64).collect()
    }
    for i, t in rows:
        toks = re.findall(TOKEN_RE, t or "")
        if not toks:
            assert i not in got
            continue
        c = Counter(bucket(x) for x in toks)
        feats = " ".join(f"{b}:{n}" for b, n in sorted(c.items()))
        assert got[i] == (len(toks), len(c), feats), i
    again = {
        r.doc_id: r.features
        for r in doc_features(docs.repartition(7), n_buckets=64).collect()
    }
    assert again == {i: f for i, (_, _, f) in got.items()}
