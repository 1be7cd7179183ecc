"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Everything here is pure built-in expressions (whole-stage codegen) so
the same formulas are expressible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# high-frequency function-word marker sets per language (heuristic
# lang-id; the classic stopword-profile approach — Cavnar & Trenkle
# 1994 n-gram ranking, collapsed to whole-word markers so the score
# stays pure whole-stage codegen AND ANSI-SQL-mirrorable).  Word lists
# are the usual public stopword sets (Snowball-family).  Tie-break is
# first-wins in this insertion order.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was",
           "for", "with", "as", "on", "at", "by"],
    "de": ["der", "und", "die", "das", "ist", "nicht", "von", "mit",
           "den", "auf", "dem", "ein", "eine", "zu", "sich"],
    "fr": ["le", "et", "les", "des", "est", "dans", "que", "qui",
           "une", "pour", "pas", "sur", "par", "avec", "plus"],
    "es": ["el", "y", "los", "las", "que", "en", "un", "una", "por",
           "con", "para", "es", "del", "se", "no"],
    "it": ["il", "di", "che", "la", "per", "con", "non", "una",
           "sono", "della", "anche", "come"],
    "pt": ["de", "que", "uma", "os", "das", "dos", "com", "para",
           "por", "mais", "como", "foi"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "voor",
           "met", "zijn", "ook", "maar"],
    "pl": ["nie", "się", "jest", "ale", "jak", "czy", "tak", "jego",
           "oraz", "tym", "dla", "przez"],
    "sv": ["och", "det", "att", "som", "är", "på", "av", "för",
           "till", "inte", "har", "den"],
    "tr": ["bir", "ve", "bu", "için", "ile", "çok", "daha", "gibi",
           "ancak", "kadar", "sonra", "olarak"],
    "id": ["yang", "dan", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada", "adalah"],
    "ro": ["și", "în", "care", "este", "pentru", "mai", "din",
           "sunt", "cu", "dar", "după", "fost"],
}

# Non-Latin scripts: detected by code-point-range counting, checked
# BEFORE the marker argmax (a mostly-Cyrillic document is Russian no
# matter how many Latin loanwords it carries).  Each entry is
# (unicode ranges, min fraction of total characters).  Kana is checked
# first with a LOW threshold: Japanese text mixes kana with CJK
# ideographs, so any meaningful kana presence outranks the 'zh' CJK
# count; Chinese text contains no kana.  The same `[\x{lo}-\x{hi}]`
# class syntax parses identically in Java regex (Spark) and RE2
# (DuckDB), so the oracle replays the counts exactly
# (pinned by __spark_entry__._langid_sql).
LANG_SCRIPTS = {
    "ja": ([(0x3040, 0x30FF)], 0.05),                       # hiragana+katakana
    "ko": ([(0xAC00, 0xD7AF), (0x1100, 0x11FF)], 0.25),     # hangul
    "zh": ([(0x4E00, 0x9FFF), (0x3400, 0x4DBF)], 0.25),     # CJK ideographs
    "ru": ([(0x0400, 0x04FF)], 0.25),                       # cyrillic
    "ar": ([(0x0600, 0x06FF), (0x0750, 0x077F)], 0.25),     # arabic
    "he": ([(0x0590, 0x05FF)], 0.25),                       # hebrew
    "el": ([(0x0370, 0x03FF)], 0.25),                       # greek
    "hi": ([(0x0900, 0x097F)], 0.25),                       # devanagari
    "th": ([(0x0E00, 0x0E7F)], 0.25),                       # thai
}


def script_pattern(ranges: list[tuple[int, int]]) -> str:
    """One char-class regex over the ranges — same string is valid in
    Java regex and RE2."""
    return "[" + "".join(f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}" for lo, hi in ranges) + "]"


#: the script-scan gate (same string in Java regex and RE2)
NON_ASCII_RE = r"[^\x{0000}-\x{007F}]"


def _count_occurrences(col, needle: str):
    """# occurrences of a literal via length arithmetic (JVM-side)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def word_count(col):
    """Whitespace token count: words = spaces_removed delta + 1."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id",
            marker_weights: DataFrame | None = None) -> DataFrame:
    """Two-stage language-ID, all whole-stage codegen:

    1. **Script cascade** (LANG_SCRIPTS, in dict order): count code
       points in each script's unicode ranges; the first script whose
       count clears its minimum fraction of total characters wins —
       kana first at a low bar so Japanese (kana + CJK ideographs)
       outranks the Chinese ideograph count.
    2. **Marker argmax** (LANG_MARKERS): split the text on single
       spaces ONCE, then per Latin-script language count tokens in its
       stopword-marker set (an InSet hash probe inside one array
       filter — not a per-marker substring scan, which costs a string
       allocation per marker per row); argmax with first-wins
       tie-break, 'und' when all scores are 0 (Cavnar & Trenkle 1994
       profiles collapsed to whole-word markers).

    best_score = the winning script's character count on path 1, the
    winning marker count on path 2.  NULL text falls through both
    paths to 'und'.

    **Accuracy envelope of the default (no ``marker_weights``):** the
    zero-dep cascade distinguishes only the 12 marker languages plus
    the 9 script families above; anything else — and short / mixed /
    marker-poor text within those — lands on 'und' or the nearest
    marker profile.  It is an engine-shaped heuristic, NOT a trained
    classifier; treat per-doc labels as weak signals.  For real
    corpus-pipeline accuracy, pass ``marker_weights``.

    **Trained mode** (``marker_weights`` given): a fastText-style
    linear model table ``(token: string, lang: string, weight_milli:
    long)`` — e.g. lid.176's per-token weights exported per language,
    scaled by 1000 to integer milli-units (exact, order-independent
    sums; the :func:`sagan_spark.ops.webclean.hashed_linear_score`
    trained-weights discipline).  The model then IS the classifier:
    tokens broadcast-join the weight table, per-(doc, lang) integer
    sums argmax with lang-ascending tie-break ('und' when no token
    matches; best_score = winning sum / 1000).  A real lid model's
    vocabulary covers non-Latin scripts as tokens, so the script
    cascade is bypassed.  Scale shape: one broadcast join (model
    tables are ~MBs), map-side-combining integer sums, min(struct)
    argmax — no window, no corpus-side sort."""
    if marker_weights is not None:
        return _lang_id_trained(docs, marker_weights, text_col, id_col)
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(t, " ")
    # cheap gate: one ASCII-only scan replaces all nine script scans
    # for the (dominant, in a web corpus) pure-ASCII rows — WHEN
    # short-circuits per-row in codegen, so gated counts cost nothing
    # when the gate is false.  Mirrored in the oracle.
    nonascii = F.regexp_count(t, F.lit(NON_ASCII_RE))
    cols = {
        f"scr_{lang}": F.when(
            nonascii > 0, F.regexp_count(t, F.lit(script_pattern(ranges)))
        ).otherwise(F.lit(0))
        for lang, (ranges, _frac) in LANG_SCRIPTS.items()
    }
    cols |= {
        f"score_{lang}": F.size(
            F.filter(toks, lambda x: x.isin(*markers))
        ).cast("double")
        for lang, markers in LANG_MARKERS.items()
    }
    df = docs.select(F.col(id_col), n_chars.alias("_n_chars"),
                     *[c.alias(n) for n, c in cols.items()])
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred, score = None, None
    for lang, (_ranges, frac) in LANG_SCRIPTS.items():
        hit = F.col(f"scr_{lang}") >= F.lit(frac) * F.col("_n_chars")
        hit = hit & (F.col("_n_chars") > 0)
        pred = F.when(hit, F.lit(lang)) if pred is None else pred.when(hit, F.lit(lang))
        scr = F.col(f"scr_{lang}").cast("double")
        score = F.when(hit, scr) if score is None else score.when(hit, scr)
    pred = pred.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # first-wins on ties, fixed lang order
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return df.select(
        id_col,
        pred.otherwise(F.lit("und")).alias("pred_lang"),
        score.otherwise(F.coalesce(best, F.lit(0.0))).alias("best_score"),
    )


def _lang_id_trained(docs: DataFrame, weights: DataFrame,
                     text_col: str, id_col: str) -> DataFrame:
    """Trained-weights lang-id path (see :func:`lang_id`): broadcast
    model join + integer milli-unit sums + min(struct) argmax."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    per = (
        toks.join(F.broadcast(weights), "token")
        .groupBy(id_col, "lang")
        .agg(F.sum("weight_milli").alias("_s"))
    )
    # argmax with lang-ASC tie-break: min(struct(-score, lang)) —
    # integer negation is exact, and min(struct) partial-aggregates
    # map-side (no window, no per-doc sort)
    winner = per.groupBy(id_col).agg(
        F.min(F.struct((-F.col("_s")).alias("ns"), F.col("lang").alias("lang"))).alias("_w")
    )
    return docs.select(id_col).join(winner, id_col, "left").select(
        id_col,
        F.coalesce(F.col("_w.lang"), F.lit("und")).alias("pred_lang"),
        F.coalesce(
            F.round((-F.col("_w.ns")).cast("double") / 1000.0, 6), F.lit(0.0)
        ).alias("best_score"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features and
    a composite [0,1] score (heuristics in the C4/Gopher-rules family)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = word_count(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_stop = sum(
        (_count_occurrences(padded, f" {m} ") for m in ["the", "a", "and", "of", "to"]),
        F.lit(0.0),
    )
    avg_word_len = F.when(n_words > 0, (n_chars - n_words + 1) / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    word_ok = F.when((avg_word_len >= 2) & (avg_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    score = (len_ok + word_ok + punct_ok + F.least(stop_ratio * 5, F.lit(1.0))) / 4
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


# BPE-ish token stream: letter runs | digit runs | single other
# non-space char.  Shared by token_counts, vocab_stats and
# ops/packing.py; identical in RE2 (DuckDB) and Java regex for
# ASCII classes.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def readability(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Readability / lexical-diversity features per doc — the
    grade-level screen corpus recipes run next to the Gopher rules:

    - ``n_words``: letter-run words (``[A-Za-z]+``),
    - ``n_sentences``: ``[.!?]+`` runs (floored at 1 when the doc has
      words, so fragments still score),
    - ``n_syllables``: vowel-run groups (``(?i)[aeiouy]+``) — the
      standard zero-dependency syllable heuristic; vowel-less tokens
      contribute 0 (documented deviation from per-word-min-1),
    - ``flesch``: 206.835 − 1.015·(words/sentences) −
      84.6·(syllables/words)  (Flesch 1948 reading ease),
    - ``ttr``: type/token ratio over the BPE-ish stream (TOKEN_RE),
      the plain lexical-diversity statistic.

    Pure codegen (regexp counts + array_distinct); every expression
    has a byte-identical RE2/DuckDB twin, NULL text yields NULL
    features on both sides."""
    t = F.col(text_col)
    n_words = F.regexp_count(t, F.lit(r"[A-Za-z]+")).cast("long")
    n_sent_raw = F.regexp_count(t, F.lit(r"[.!?]+")).cast("long")
    n_sent = F.greatest(n_sent_raw, F.lit(1))
    n_syl = F.regexp_count(t, F.lit(r"(?i)[aeiouy]+")).cast("long")
    flesch = F.when(
        n_words > 0,
        F.lit(206.835) - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syl / n_words),
    )
    toks = F.regexp_extract_all(t, F.lit(TOKEN_RE), F.lit(0))
    ttr = F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.when(t.isNotNull(), n_sent).cast("long").alias("n_sentences"),
        n_syl.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
        F.round(ttr, 6).alias("ttr"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens
    (letter runs | digit runs | single non-alnum)."""
    t = F.col(text_col)
    ws = word_count(t).cast("long")
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), F.lit(0))).cast("long")
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


def vocab_stats(docs: DataFrame, top_n: int = 100, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary statistics over the BPE-ish token stream:
    (token, term_freq, doc_freq) for the ``top_n`` tokens by total
    count (ties broken by token).  The classic two-level word-count:
    explode -> per-(token, doc) partial count (map-side combinable,
    absorbs within-doc repetition before the wide exchange) -> per-
    token rollup.  doc_freq = #docs containing the token, the df side
    of tf-idf vocabulary building.  Top-n is a TakeOrdered, not a
    global sort."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    per_doc = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("tf").alias("term_freq"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("token"))
        .limit(top_n)
    )


def vocab_spectrum(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Frequency-of-frequencies census over the BPE-ish token stream:
    for every observed term frequency f, how many distinct token types
    occur exactly f times.  The Zipf/Heaps spectrum a corpus QA pass
    reads before tokenizer training — a healthy web corpus shows a
    heavy hapax tail (n_types at f=1 dominates) and a smooth power-law
    decay; boilerplate floods and template explosions bend the curve
    (Baayen 2001, word frequency distributions).  The reference
    engine's analog is its per-rule hit-count rollup
    (src/processors/stats-json.c) — a census over counters, not rows.

    Plan (100 TB posture): explode -> ONE map-side-combining
    groupBy(token) count (hot tokens — "the" at 10^10 — partial-
    aggregate before the exchange), then a second aggregation over the
    (token, f) frame grouped by f.  The output is bounded by the number
    of DISTINCT frequencies (O(sqrt(total tokens)) by a counting
    argument), so the final frame always fits anywhere.  No window, no
    join, no Python."""
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token")
    )
    per_tok = toks.groupBy("token").agg(F.count(F.lit(1)).alias("term_freq"))
    return (
        per_tok.groupBy("term_freq")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .orderBy("term_freq")
    )


def fingerprint(docs: DataFrame, k: int = 16, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: lexicographic min of md5 over character
    k-grams (winnowing-style rolling-window digest).  Identical
    fingerprints => near-identical prefixes/content blocks."""
    seq = F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1)))
    grams = F.transform(seq, lambda i: F.md5(F.col(text_col).substr(i, F.lit(k))))
    return docs.select(
        F.col(id_col),
        F.array_min(grams).alias("fingerprint"),
    )


def bpe_pair_stats(docs: DataFrame, top_n: int = 100, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Adjacent-token-pair frequencies over the BPE-ish token stream —
    the merge-step statistic of byte-pair-encoding tokenizer training
    (Sennrich et al. arXiv:1508.07909 §3.2: each BPE round merges the
    most frequent adjacent pair; this op computes that table corpus-
    wide).  Returns the ``top_n`` pairs as (tok_left, tok_right,
    pair_count), count-desc then (tok_left, tok_right)-asc — a total
    order, so top_n is deterministic.

    Plan (100 TB posture): pairs are built PER ROW with array ops
    (zip_with over two slices — whole-stage codegen, no shuffle to
    form pairs), then one explode + groupBy(pair) count whose map-side
    partial absorbs hot pairs ("t h", "th e" at 10^10 occurrences)
    before the exchange; top-n plans as TakeOrdered, never a global
    sort.  Pair counting is embarrassingly parallel — BPE training
    iterates [count -> pick max -> re-tokenize]; the count step is the
    distributed-scale bottleneck and the one this engine owns."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda l, r: F.struct(l.alias("tok_left"), r.alias("tok_right")),
        ),
    ).otherwise(F.array().cast("array<struct<tok_left:string,tok_right:string>>"))
    exploded = docs.select(F.explode(pairs).alias("p")).select(
        F.col("p.tok_left"), F.col("p.tok_right")
    )
    return (
        exploded.groupBy("tok_left", "tok_right")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("tok_left"), F.asc("tok_right"))
        .limit(top_n)
    )


def novelty_scores(docs: DataFrame, k: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document shingle novelty: what fraction of a document's
    distinct character k-grams appear in NO other document.  The
    corpus-diversity / memorization-risk signal a training-data
    pipeline reads next to the dedup verdicts — a doc full of
    corpus-unique shingles is fresh material; one whose every shingle
    recurs elsewhere adds nothing the dedup passes did not already
    flag (Lee et al. arXiv:2107.06499 measure the inverse — duplicated
    n-gram mass — to motivate dedup; this is the per-doc census of the
    complement).  The reference engine's analog is its "how often has
    this exact pattern been seen" xbit/flexbit counters
    (src/xbit-mmap.c) — here applied to content shingles instead of
    rule hits.

    Returns (doc_id, n_shingles, n_novel, novelty_ppm): distinct
    k-gram count, corpus-unique k-gram count, and their integer ppm
    ratio (NULL for docs shorter than k — no shingles to judge).

    Scale shape (100 TB posture): NO fact-fact join, NO corpus-wide
    distinct.  Per-doc shingle dedup happens in the row
    (``array_distinct`` over the shingle array — scan-level), so the
    per-doc totals never shuffle at all and the (doc, shingle) stream
    feeding the df count is distinct-by-construction.  A shingle with
    corpus document-frequency 1 has exactly one owner, so
    ``groupBy(shingle).agg(count, min(doc_id))`` — both algebraic,
    hot boilerplate shingles absorbed map-side — yields the novel
    count per doc directly from the df==1 slice; that doc-keyed frame
    joins back to the scan on the id.  A 10^12-row corpus pays ONE
    aggregation exchange and one id-keyed join; no window touches
    anything."""
    seq = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    )
    sh_arr = F.array_distinct(
        F.filter(
            F.transform(seq, lambda i: F.col(text_col).substr(i, F.lit(k))),
            lambda s: F.length(s) == k,
        )
    )
    base = docs.select(
        F.col(id_col), F.coalesce(F.size(sh_arr), F.lit(0)).alias("_sg_total"),
        sh_arr.alias("_sg_arr"),
    )
    per_shingle = (
        base.select(F.col(id_col), F.explode("_sg_arr").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_sg_df"), F.min(id_col).alias("_sg_owner"))
    )
    novel = (
        per_shingle.filter(F.col("_sg_df") == 1)
        .groupBy(F.col("_sg_owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("_sg_novel"))
    )
    return (
        base.drop("_sg_arr")
        .join(novel, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_sg_total").cast("long").alias("n_shingles"),
            F.when(F.col("_sg_total") > 0, F.coalesce("_sg_novel", F.lit(0)))
            .cast("long").alias("n_novel"),
            F.when(
                F.col("_sg_total") > 0,
                F.expr("(1000000 * coalesce(_sg_novel, 0L)) div _sg_total"),
            ).cast("long").alias("novelty_ppm"),
        )
    )


def doc_features(docs: DataFrame, n_buckets: int = 1 << 18,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hashed bag-of-words feature export: each document's sparse
    vector over ``n_buckets`` md5 buckets, serialized as the
    DETERMINISTIC string ``"bucket:count bucket:count ..."`` (buckets
    ascending) — the training-export counterpart of
    ``webclean.hashed_linear_score`` (same 60-bit md5 bucket idiom),
    ready for a downstream trainer that consumes sparse rows without
    re-tokenizing.

    Shape: explode -> per-(doc, bucket) map-side-combining count ->
    per-doc assembly via ``sort_array(collect_list(struct))`` (bucket
    is unique within a doc, so the sort is a total order and the
    string is engine- and partition-independent).  Per-doc state is
    bounded by the doc's distinct-bucket count (<= tokens), never
    corpus-wide.  Documents with zero tokens are absent (no feature
    mass to export).  Returns (id, n_tokens, n_buckets_used,
    features)."""
    from sagan_spark.ops.packing import _md5_long

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    per = toks.select(
        id_col,
        F.pmod(_md5_long(F.col("token")), F.lit(n_buckets)).alias("bucket"),
    ).groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("_sg_c"))
    pair = F.struct(F.col("bucket"), F.col("_sg_c").alias("c"))
    return per.groupBy(id_col).agg(
        F.sum("_sg_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(pair)),
                lambda s: F.concat(
                    s["bucket"].cast("string"), F.lit(":"), s["c"].cast("string")
                ),
            ),
            " ",
        ).alias("features"),
    )
