"""Web-text cleaning operators for training-data pipelines over the
`documents` table: Gopher-style repetition metrics, PII scrubbing, and
a composite keep/drop routing verdict.

All metrics are pure `pyspark.sql.functions` expressions (JVM-side,
whole-stage codegen, no shuffle — every metric is per-row array math),
so the operators scan-and-project at parquet speed; the only Python is
the top-n-gram mode computation, which Spark lacks a builtin for and
runs as one Arrow-batched pandas UDF.

Metric definitions follow the published Gopher data-quality filters
(Rae et al., "Scaling Language Models: Methods, Analysis & Insights
from Training Gopher", arXiv:2112.11446, Appendix A):
duplicate-line fraction, duplicate-line character fraction, and the
fraction of characters inside the most frequent word 2-gram.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(text_col):
    return F.split(text_col, "\n")


def _words(text_col):
    # whitespace tokenization; filter() drops the empty leading token a
    # leading separator produces (DuckDB's regexp_split_to_array does
    # the same after list_filter — the oracle mirrors this exactly)
    return F.filter(F.split(text_col, r"\s+"), lambda w: w != "")


def repetition_metrics(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition metrics (Gopher App. A repetition filters):

    - ``n_lines``, ``dup_line_frac``: 1 - distinct/total lines
    - ``dup_line_char_frac``: chars in repeat occurrences of a line /
      total line chars (first occurrence doesn't count as duplicate)

    Everything is per-row array arithmetic — array_distinct and
    aggregate() run inside codegen; the operator adds no shuffle to the
    scan."""
    lines = _lines(F.col(text_col))
    dlines = F.array_distinct(lines)
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    distinct_chars = F.aggregate(
        dlines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_lines = F.size(lines)
    return docs.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(
            (n_lines - F.size(dlines)) / n_lines.cast("double"), 6
        ).alias("dup_line_frac"),
        F.round(
            (total_chars - distinct_chars)
            / F.greatest(total_chars, F.lit(1)).cast("double"),
            6,
        ).alias("dup_line_char_frac"),
    )


def top_ngram_char_frac(docs: DataFrame, n: int = 2, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Fraction of characters covered by occurrences of the most
    frequent word n-gram (Gopher's top-n-gram filter).  Tie-break: the
    lexicographically smallest n-gram among the most frequent (so the
    result is deterministic and SQL-mirrorable).

    Spark has no builtin array-mode, so the mode runs in one
    Arrow-batched pandas UDF over the word array; the tokenization and
    char accounting stay JVM-side."""
    words = _words(F.col(text_col))

    from collections import Counter

    @F.pandas_udf("struct<gram string, cnt long>")
    def _top(ws: pd.Series) -> pd.DataFrame:
        grams, cnts = [], []
        for w in ws:
            toks = list(w) if w is not None else []
            if len(toks) < n:
                grams.append(None)
                cnts.append(0)
                continue
            c = Counter(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
            top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            grams.append(top[0])
            cnts.append(top[1])
        return pd.DataFrame({"gram": grams, "cnt": pd.array(cnts, dtype="int64")})

    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    t = docs.select(
        F.col(id_col),
        total_chars.alias("wchars"),
        _top(words).alias("t"),
    )
    return t.select(
        F.col(id_col),
        F.col("t.gram").alias("top_gram"),
        F.col("t.cnt").cast("long").alias("top_gram_count"),
        F.round(
            # chars covered = count * chars-in-gram-words (separators
            # excluded on both sides of the contract)
            (F.col("t.cnt") * (F.length("t.gram") - (n - 1)))
            / F.greatest(F.col("wchars"), F.lit(1)).cast("double"),
            6,
        ).alias("top_gram_char_frac"),
    )


# Gopher Appendix-A quality rules (Rae et al., arXiv:2112.11446): the
# published thresholds, verbatim.  Stopword set is the paper's 8.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filters(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """The full published Gopher quality-filter rule set, one boolean
    per rule plus the FIRST failing reason (evaluation in the paper's
    listing order) — per-row array arithmetic only, no shuffle, no
    Python; every formula is mirrorable in the DuckDB oracle:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio <= 0.1 for '#' AND for '...'/ellipsis
      (the paper drops when EITHER symbol's own ratio exceeds 0.1 —
      the two are separate rules, not a combined count)
    - < 90% of lines start with a bullet ('-', '*', or U+2022)
    - < 30% of lines end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct stopwords of the paper's 8 present, matched on the
      SAME \\s+ tokens as every other rule (punctuation stripped from
      token edges), not on space-delimited substrings

    NULL text evaluates as the empty string (all-zero metrics, fails
    word_count) so the contract oracle and this op agree row-for-row.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(t)
    lines = _lines(t)
    n_words = F.size(words)
    n_lines = F.size(lines)
    wchars = F.aggregate(words, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    mean_wlen = wchars / F.greatest(n_words, F.lit(1)).cast("double")
    n_hash = F.size(F.split(t, "#", -1)) - 1
    n_ellipsis = (F.size(F.split(t, r"\.\.\.", -1)) - 1) + (
        F.size(F.split(t, "\u2026", -1)) - 1
    )
    hash_ratio = n_hash / F.greatest(n_words, F.lit(1)).cast("double")
    ellipsis_ratio = n_ellipsis / F.greatest(n_words, F.lit(1)).cast("double")
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.rlike("^[-*\u2022]"))
    ) / F.greatest(n_lines, F.lit(1)).cast("double")
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|\u2026)$"))
    ) / F.greatest(n_lines, F.lit(1)).cast("double")
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ) / F.greatest(n_words, F.lit(1)).cast("double")
    # token-based: lowercase each \\s+ token and strip edge
    # punctuation, so "of\nthe matter," still counts of/the —
    # space-substring probing misses every stopword at a line
    # boundary or before punctuation
    toks = F.transform(
        words,
        lambda w: F.lower(
            F.regexp_replace(w, "^[^A-Za-z0-9]+|[^A-Za-z0-9]+$", "")
        ),
    )
    n_stop = sum(
        (
            F.when(F.array_contains(toks, s), F.lit(1)).otherwise(F.lit(0))
            for s in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    checks = [
        ("word_count", (n_words >= 50) & (n_words <= 100_000)),
        ("mean_word_length", (mean_wlen >= 3.0) & (mean_wlen <= 10.0)),
        ("symbol_ratio", (hash_ratio <= 0.1) & (ellipsis_ratio <= 0.1)),
        ("bullet_lines", bullet_frac < 0.9),
        ("ellipsis_lines", ellipsis_frac < 0.3),
        ("alpha_words", alpha_frac >= 0.8),
        ("stopwords", n_stop >= 2),
    ]
    reason = F.lit("ok")
    for name, ok in reversed(checks):
        reason = F.when(~F.coalesce(ok, F.lit(False)), F.lit(name)).otherwise(reason)
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(hash_ratio, 6).alias("hash_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stopwords"),
        reason.alias("gopher_reason"),
        (reason == "ok").alias("gopher_keep"),
    )


# PII patterns: RE2-compatible (no lookaround/backrefs) so the SAME
# pattern string runs in Spark's Java regex and DuckDB's RE2 oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails and IPv4 literals; per-doc counts + clean text.

    Pure regexp_count/regexp_replace — codegen, no shuffle, no Python.
    Order matters: emails first (an email's host part can contain a
    dotted quad; the IP pass must not see it)."""
    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        IPV4_RE,
        "<IP>",
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"), F.lit(IPV4_RE)
        ).cast("long").alias("n_ips"),
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("clean_len"),
    )


def filter_verdict(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_chars: int = 20,
                   max_dup_line_frac: float = 0.30,
                   langs: tuple = ("en",)) -> DataFrame:
    """Composite keep/drop routing verdict per doc — the `route` stage
    of a training-data pipeline: every doc gets a verdict and the FIRST
    failing reason (evaluation order: length, language, repetition),
    mirroring how the reference routes events to sinks by first
    matching rule.  Returns (doc_id, keep, reason)."""
    lines = _lines(F.col(text_col))
    dup_frac = (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(
        lines
    ).cast("double")
    # NULL text counts as length 0 and NULL lang as not-in-langs: in a
    # scraped corpus both are routine, and a NULL WHEN-condition would
    # otherwise fall through every gate straight to 'ok'/keep
    reason = (
        F.when(
            F.col(text_col).isNull() | (F.length(text_col) < min_chars),
            F.lit("too_short"),
        )
        .when(~F.coalesce(F.col("lang").isin(*langs), F.lit(False)), F.lit("lang"))
        .when(dup_frac > max_dup_line_frac, F.lit("repetition"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        F.col(id_col),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def corpus_prep(docs: DataFrame, k: int = 8, n_bands: int = 4,
                jaccard_threshold: float = 0.3, text_col: str = "text",
                id_col: str = "doc_id", **verdict_kw) -> DataFrame:
    """End-to-end training-data prep verdict: quality gates, then
    near-dup canonicalization, one (doc_id, reason, keep) row per doc.

    Staging mirrors the engine's cheap-gate-then-extract ordering
    (SURVEY §4): the scan-level quality verdict (:func:`filter_verdict`
    — pure codegen, no shuffle) runs first, and the expensive LSH /
    Jaccard-verify / connected-components path
    (:func:`sagan_spark.ops.dedup.near_dup_drop_list`) sees ONLY
    quality-kept docs — at 100 TB the shingle explode never touches the
    rows the cheap gates already dropped.  Reason precedence: the first
    failing quality reason, else ``near_dup`` for non-canonical cluster
    members, else ``ok``.  Canonical cluster members keep their docs
    (min doc_id per component — deterministic)."""
    from sagan_spark.ops.dedup import near_dup_drop_list

    v = filter_verdict(docs, text_col=text_col, id_col=id_col, **verdict_kw)
    kept_docs = docs.join(
        v.filter(F.col("keep")).select(id_col), id_col
    )
    drops = near_dup_drop_list(
        kept_docs, k=k, n_bands=n_bands, threshold=jaccard_threshold,
        text_col=text_col, id_col=id_col,
    ).withColumn("_dup", F.lit(True))
    reason = (
        F.when(F.col("reason") != "ok", F.col("reason"))
        .when(F.col("_dup").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("ok"))
    )
    return (
        v.join(drops, id_col, "left")
        .select(F.col(id_col), reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "ok")
    )


def corpus_prep_yield(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", **prep_kw) -> DataFrame:
    """Corpus yield accounting: (reason, n_docs, n_tokens) — how many
    documents and whitespace tokens each prep stage keeps or drops
    (the A11-counters analog for the training-data pipeline: the same
    per-reason rollup the engine's run_counters gives per rule)."""
    prep = corpus_prep(docs, text_col=text_col, id_col=id_col, **prep_kw)
    toks = docs.select(
        F.col(id_col),
        F.size(_words(F.col(text_col))).cast("long").alias("_toks"),
    )
    return (
        prep.join(toks, id_col)
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_toks").cast("long").alias("n_tokens"),
        )
    )


def hashed_linear_score(docs: DataFrame, weights: DataFrame | None = None,
                        n_buckets: int = 1 << 18, bias: float = 0.0,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """fastText-style linear text-classifier INFERENCE: tokenize
    (textstats.TOKEN_RE), hash each token into ``n_buckets`` via the
    60-bit md5 prefix, average the bucket weights, squash with a
    sigmoid — the hashed bag-of-words quality scorer the CCNet /
    GPT-3 / LLaMA corpus pipelines run to rank web text against a
    reference corpus (Wenzek et al. arXiv:1911.00359; Brown et al.
    arXiv:2005.14165 Appendix A).  Training is out of scope; this is
    the distributed scoring pass, pluggable weights.

    ``weights``: (bucket: long, weight_milli: long) DataFrame —
    trained weights scaled by 1000 (broadcast-joined; missing buckets
    weigh 0).  ``None`` selects deterministic synthetic weights
    derived expression-side from md5(bucket) — the documented stand-in
    (no model ships with the repo) that keeps the whole op
    whole-stage codegen with NO join and lets the DuckDB oracle
    replay it exactly.

    Numeric determinism: per-token weights are INTEGER milli-units,
    so the per-doc sum is exact in any aggregation order (no float
    accumulation drift across engines/partitions); the single
    float op is the final sigmoid, rounded to 6 decimals.
    Returns (doc_id, n_tokens, score).
    """
    from sagan_spark.ops.packing import _md5_long
    from sagan_spark.ops.textstats import TOKEN_RE

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    bucket = F.pmod(_md5_long(F.col("token")), F.lit(n_buckets))
    if weights is None:
        w = (F.pmod(_md5_long(F.concat(F.lit("w|"), bucket.cast("string"))),
                    F.lit(2001)) - 1000).alias("w_milli")
        scored = toks.select(F.col(id_col), w)
    else:
        from pyspark.sql.functions import broadcast

        scored = (
            toks.select(F.col(id_col), bucket.alias("bucket"))
            .join(broadcast(weights), "bucket", "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("weight_milli"), F.lit(0)).alias("w_milli"),
            )
        )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w_milli").alias("w_sum"),
    )
    mean = F.col("w_sum") / (F.col("n_tokens") * 1000.0) + F.lit(bias)
    out = agg.select(
        id_col,
        "n_tokens",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6).alias("score"),
    )
    # zero-token docs never appear in the explode: emit them with the
    # neutral sigmoid(bias) so scoring is total over the corpus.  The
    # zero-token set is recomputed as a scan-level regexp_count filter
    # (same TOKEN_RE ⇒ provably the same set as "absent from the
    # explode") — an anti-join against the per-doc agg would carry a
    # doc-cardinality build side, broadcast-unsafe at 10^11 docs.
    neutral = docs.where(
        F.coalesce(
            F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)), F.lit(0)
        ) == 0
    ).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_tokens"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-bias))), 6).alias("score"),
    )
    return out.unionByName(neutral)


def train_quality_classifier(docs: DataFrame, label_col: str,
                             n_buckets: int = 1 << 18,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Distributed TRAINING for the hashed quality classifier — the
    counterpart to ``hashed_linear_score`` inference.  The GPT-3 /
    LLaMA corpus pipelines train exactly this shape of model: label a
    reference corpus (WebText/Wikipedia/books) positive and raw crawl
    negative, fit a linear bag-of-hashed-words classifier, then score
    every crawl document (Brown et al. arXiv:2005.14165 Appendix A;
    Touvron et al. arXiv:2302.13971 "classify pages used as
    references in Wikipedia").

    Estimator: per-bucket event-count Naive Bayes with add-one
    smoothing, expressed in INTEGER milli-units so training is exact
    in any partitioning / aggregation order (the repo's determinism
    discipline — same reason ``hashed_linear_score`` sums integer
    milli-weights):

        weight_milli(b) = (2000 * (pos_b + 1)) div (pos_b + neg_b + 2) - 1000

    i.e. 2000 x the Beta(1,1)-posterior mean of P(positive | token in
    bucket b), centered at 0 — a monotone, bounded [-1000, 1000]
    stand-in for the per-bucket NB log-odds (log((pos+1)/(neg+1))
    has the same sign and ordering; the log would put a float with
    cross-engine last-ulp risk in every row).  It assumes roughly
    balanced classes; with skewed labels pass the imbalance into
    ``hashed_linear_score(bias=...)`` rather than re-scaling counts.

    Scale shape (100 TB posture): ONE map-side-combining groupBy over
    the exploded token stream — output bounded by ``n_buckets`` rows
    (2^18 default), never by corpus size; no join, no window.  The
    result broadcasts straight into ``hashed_linear_score(weights=)``.

    ``label_col``: boolean column on ``docs`` (true = positive /
    reference).  Returns (bucket, weight_milli, pos_count, neg_count)
    — only buckets that occur in the training corpus appear; absent
    buckets weigh 0 at inference, consistent with the smoothed prior's
    center.
    """
    from sagan_spark.ops.packing import _md5_long
    from sagan_spark.ops.textstats import TOKEN_RE

    # fail-loud on NULL labels (the budget_select discipline,
    # sampling.py): a label column built by a left join against a
    # reference-membership table leaves unmatched docs NULL, and
    # silently counting those as negatives would skew the model with
    # rows the caller never labeled
    y = F.col(label_col).cast("boolean")
    checked = F.coalesce(
        y,
        F.raise_error(
            F.concat(
                F.lit(f"train_quality_classifier: NULL {label_col} at "
                      f"{id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("boolean"),
    )
    toks = docs.select(
        checked.alias("_sg_y"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    bucket = F.pmod(_md5_long(F.col("token")), F.lit(n_buckets))
    counts = (
        toks.select(bucket.alias("bucket"), F.col("_sg_y"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_sg_y"), 1).otherwise(0)).alias("pos_count"),
            F.sum(F.when(F.col("_sg_y"), 0).otherwise(1)).alias("neg_count"),
        )
    )
    return counts.select(
        "bucket",
        F.expr(
            "(2000 * (pos_count + 1)) div (pos_count + neg_count + 2) - 1000"
        ).alias("weight_milli"),
        F.col("pos_count").cast("long").alias("pos_count"),
        F.col("neg_count").cast("long").alias("neg_count"),
    )


def calibrate_keep_threshold(scored: DataFrame, keep_ppm: int,
                             score_col: str = "score") -> DataFrame:
    """Pick the classifier score threshold that keeps (at least) a
    target fraction of the corpus — the calibration step between
    training a quality classifier and applying it (CCNet keeps the
    best-scoring fraction per bucket, Wenzek et al. arXiv:1911.00359;
    GPT-3 re-weights by classifier score, Brown et al. App. A).

    Rule, integer-exact and partition-independent:
    ``target = max(1, (n * keep_ppm) div 10^6)`` over the ``n``
    non-NULL-scored documents; the threshold is the LARGEST score
    ``t`` with ``|{score >= t}| >= target`` — i.e. keeping everything
    at-or-above ``t`` meets the quota with minimal overshoot, and
    equal scores always share a fate (no arbitrary tie split).

    100 TB shape: the quantile comes from a per-score HISTOGRAM (one
    map-side-combining groupBy — scores are already rounded to 6
    decimals upstream, so the histogram is bounded at ~10^6 rows
    regardless of corpus size); the single-partition cumulative
    window runs over that histogram, NEVER over the corpus — the same
    skew-safe idiom as ``lmscore.lm_buckets``.  Returns ONE row
    (threshold, n_total, n_kept, target).
    """
    score = F.col(score_col)
    hist = (
        scored.where(score.isNotNull())
        .groupBy(score_col)
        .agg(F.count(F.lit(1)).alias("_sg_c"))
    )
    w_cum = (
        Window.orderBy(F.desc(score_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        score_col,
        F.sum("_sg_c").over(w_cum).alias("_sg_cum"),
        F.sum("_sg_c").over(w_all).alias("_sg_n"),
    )
    target = F.expr(f"greatest(1, (_sg_n * {int(keep_ppm)}) div 1000000)")
    return (
        cum.withColumn("_sg_target", target)
        .where(F.col("_sg_cum") >= F.col("_sg_target"))
        .agg(
            F.max(score_col).alias("threshold"),
            F.min("_sg_cum").cast("long").alias("n_kept"),
            F.max("_sg_n").cast("long").alias("n_total"),
            F.max("_sg_target").cast("long").alias("target"),
        )
    )


# mojibake signatures (ftfy's README catalogue; OSCAR/CCNet run the
# same class of checks before quality filters).  'Ã' + a Latin-1
# supplement char is UTF-8 read as Latin-1/Windows-1252 ('Ã©' for é);
# 'â€' starts the mojibake of every smart-quote/dash (â€™ â€œ â€“).
# Same pattern strings parse in Java regex and RE2.
MOJIBAKE_RE = r"Ã[\x{0080}-\x{00FF}]|â€"
#: C0/C1 controls except tab/newline/CR
CONTROL_RE = r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]"
REPLACEMENT_CHAR = "�"


def encoding_quality(docs: DataFrame, max_mojibake_ratio: float = 0.001,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Encoding-health screen: count U+FFFD replacement characters
    (a decoder already gave up), stray C0/C1 control characters, and
    double-decode mojibake signatures ('Ã©', 'â€™'-family), then flag
    the document.  ``enc_ok`` = no replacement chars, no stray
    controls, and mojibake under ``max_mojibake_ratio`` of characters.
    Pure whole-stage codegen (three regex passes + one literal count),
    SQL-mirrorable; zero-length/NULL text is ok (nothing broken in
    nothing).  Returns (doc_id, n_replacement, n_control, n_mojibake,
    enc_ok)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_repl = (
        n_chars - F.length(F.replace(t, F.lit(REPLACEMENT_CHAR), F.lit("")))
    ).cast("long")
    n_ctrl = F.regexp_count(t, F.lit(CONTROL_RE)).cast("long")
    n_moji = F.regexp_count(t, F.lit(MOJIBAKE_RE)).cast("long")
    ok = F.coalesce(
        (n_repl == 0)
        & (n_ctrl == 0)
        & (n_moji <= F.lit(max_mojibake_ratio) * n_chars),
        F.lit(True),
    )
    return docs.select(
        F.col(id_col),
        F.coalesce(n_repl, F.lit(0)).alias("n_replacement"),
        F.coalesce(n_ctrl, F.lit(0)).alias("n_control"),
        F.coalesce(n_moji, F.lit(0)).alias("n_mojibake"),
        ok.alias("enc_ok"),
    )


#: illustrative stand-in for the public "List of Dirty, Naughty,
#: Obscene or Otherwise Bad Words" C4 filters against — the real list
#: (github LDNOOBW, public data) is a drop-in for the `badwords` arg;
#: we ship only a tiny tame subset so the repo stays readable.
C4_BADWORDS_DEFAULT = ("porn", "xxx", "sex cam")


def load_badwords(lang: str = "en", path: str | None = None) -> tuple[str, ...]:
    """Load a C4 badword list in the LDNOOBW file format (the public
    "List of Dirty, Naughty, Obscene, and Otherwise Bad Words" GitHub
    dataset C4/Raffel et al. §2.2 screens against: one lowercase
    word/phrase per line, per-language files named by ISO code).

    ``path``: a directory of per-language files, a single list file,
    or None for the repo's vendored subset
    (``sagan_spark/data/badwords/`` — a TAME excerpt; drop the full
    published files into a directory and point ``path`` at it for
    production parity — data, not code).  Lines are stripped,
    lowercased, deduped and sorted (deterministic plan text); blanks
    and ``#`` comments are skipped.  The loader runs driver-side only
    — the words compile into the scan-level regex, nothing is read on
    executors.

    Usage: ``c4_filters(docs, badwords=load_badwords("en"))``.
    """
    if path is not None:
        from pathlib import Path

        p = Path(path)
        f = p / lang if p.is_dir() else p
        if not f.is_file():
            have = sorted(x.name for x in p.iterdir()) if p.is_dir() else []
            raise FileNotFoundError(
                f"no badword list for lang {lang!r} at {f} (vendored: {have})"
            )
        text = f.read_text(encoding="utf-8")
    else:
        # importlib.resources, not Path(__file__): the vendored files
        # must also resolve when the package ships as a
        # spark-submit --py-files ZIP
        from importlib.resources import files

        d = files("sagan_spark.data") / "badwords"
        f = d / lang
        if not f.is_file():
            have = sorted(x.name for x in d.iterdir())
            raise FileNotFoundError(
                f"no vendored badword list for lang {lang!r} (have: {have})"
            )
        text = f.read_text(encoding="utf-8")
    words = {
        ln.strip().lower()
        for ln in text.splitlines()
        if ln.strip() and not ln.lstrip().startswith("#")
    }
    return tuple(sorted(words))

#: a retained line must end in terminal punctuation: period,
#: exclamation or question mark, or end-quote (C4 §2.2 wording)
C4_TERMINAL_RE = '[.!?"]$'


def c4_filters(docs: DataFrame, badwords: tuple[str, ...] = C4_BADWORDS_DEFAULT,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. arXiv:1910.10683 §2.2,
    the "Colossal Clean Crawled Corpus" heuristics), line stage + page
    stage, all whole-stage codegen — per-row array/regex math, no
    shuffle, no Python:

    line stage (builds ``clean_text`` from the retained lines):
    - keep only lines ending in a terminal punctuation mark
      (``[.!?"]`` after rtrim — the paper names period / exclamation /
      question / end-quote),
    - keep only lines with >= 3 words (same whitespace tokens as every
      other op in this module),
    - drop any line containing the word "javascript"
      (case-insensitive substring, the paper's boilerplate tell);

    page stage (booleans on the ORIGINAL text, per the paper's "any
    page that contained" wording; ``enough_sentences`` on the RETAINED
    text since dropped lines aren't sentences):
    - ``enough_sentences``: >= 5 sentences, counted as terminal-punct
      occurrences ``[.!?]`` in clean_text (the documented heuristic —
      C4 used langdetect-adjacent splitting it never fully specified),
    - ``no_bad_words``: no word/phrase from ``badwords`` matches
      case-insensitively on word boundaries,
    - ``no_lorem_ipsum``: the placeholder phrase is absent,
    - ``no_curly_brace``: no ``{`` anywhere (the code tell).

    ``c4_keep`` ANDs the page booleans.  The paper's remaining two
    steps live elsewhere: three-sentence-span dedup is
    :func:`sagan_spark.ops.decontam.remove_duplicated_spans`, language
    filtering is :func:`sagan_spark.ops.textstats.lang_id`.  NULL text
    -> NULL clean_text, zero counts, ``c4_keep`` false (a page with no
    text has no 5 sentences).  Returns (doc_id, clean_text,
    n_lines_kept, n_sentences, enough_sentences, no_bad_words,
    no_lorem_ipsum, no_curly_brace, c4_keep)."""
    import re as _re

    t = F.col(text_col)
    line_ok = lambda ln: (  # noqa: E731 — inline per-line predicate
        F.rtrim(ln).rlike(C4_TERMINAL_RE)
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != "")) >= 3)
        & ~F.contains(F.lower(ln), F.lit("javascript"))
    )
    kept = F.filter(_lines(t), line_ok)
    clean = F.array_join(kept, "\n")
    n_kept = F.coalesce(F.size(kept), F.lit(0))
    n_sent = F.coalesce(F.regexp_count(clean, F.lit(r"[.!?]")), F.lit(0))
    bad_re = "\\b(?:" + "|".join(_re.escape(w) for w in badwords) + ")\\b"
    enough = n_sent >= 5
    # NULL text contains nothing: the no_* checks pass vacuously and
    # enough_sentences (0 >= 5) alone drives c4_keep to false.  An
    # EMPTY badwords tuple means "screen nothing": guard it explicitly,
    # because the joined regex would degenerate to \b(?:)\b, which
    # matches at any word boundary and would flag every page.
    no_bad = (
        F.coalesce(~F.lower(t).rlike(bad_re), F.lit(True))
        if badwords else F.lit(True)
    )
    no_lorem = F.coalesce(
        ~F.contains(F.lower(t), F.lit("lorem ipsum")), F.lit(True)
    )
    no_brace = F.coalesce(~F.contains(t, F.lit("{")), F.lit(True))
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_kept.cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        enough.alias("enough_sentences"),
        no_bad.alias("no_bad_words"),
        no_lorem.alias("no_lorem_ipsum"),
        no_brace.alias("no_curly_brace"),
        (enough & no_bad & no_lorem & no_brace).alias("c4_keep"),
    )


def remove_boilerplate_lines(docs: DataFrame, min_docs: int = 2,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Corpus-frequency boilerplate removal (the line-level dedup step
    of CCNet-style pipelines, Wenzek et al. arXiv:1911.00359 §3.1:
    navigation bars, cookie banners, copyright footers repeat across a
    crawl far more often than prose): a line whose space-trimmed form
    appears in at least ``min_docs`` DISTINCT documents is boilerplate;
    every occurrence is removed from every document.  Whitespace-only
    lines are always kept (they are layout, not content — and dropping
    them would reflow unrelated text).  Returns one row per input doc
    — (doc_id, clean_text, n_lines, n_dropped); NULL-text docs come
    back with NULL clean_text and zero counts.

    Plan (100 TB posture): the document-frequency pass is a two-phase
    AGGREGATION, never a window — ``groupBy(line).agg(count_distinct
    (doc_id))`` plans as partial aggregation on (line, doc_id) before
    the shuffle, so a cookie banner repeated 10^9 times across the
    corpus reduces to one row per mapper per doc batch; the hot-line
    table that survives ``>= min_docs`` is tiny relative to the corpus
    (it IS the boilerplate vocabulary) and AQE is free to broadcast it
    for the join back.  Whitespace-only lines never enter the join:
    each carries a UNIQUE per-row synthetic key ('b:'-prefixed,
    disjoint from the 'l:'-prefixed trimmed-text keys) — "" would
    otherwise be the hottest probe key in the corpus.  Reassembly is
    the dedup_paragraphs idiom: per-doc sort_array(collect_list) over
    (idx, line) structs, a per-DOC array sort, never a corpus window.
    """
    blank_re = r"^[ \t\r\f]*$"  # explicit class: Java regex == RE2 here
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    blank = F.col("line").rlike(blank_re)
    jkey = F.when(
        blank,
        F.concat(F.lit("b:"), F.col(id_col).cast("string"), F.lit(":"), F.col("idx")),
    ).otherwise(F.concat(F.lit("l:"), F.trim(F.col("line"))))
    keyed = lines.withColumn("_jkey", jkey)
    hot = (
        keyed.filter(~blank)
        .groupBy("_jkey")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= F.lit(min_docs))
        .select("_jkey", F.lit(True).alias("_hot"))
    )
    marked = keyed.join(hot, "_jkey", "left").withColumn(
        "_keep", F.col("_hot").isNull()
    )
    rebuilt = marked.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct(F.col("idx"), F.col("line")),
                        )
                    )
                ),
                lambda s: s.getField("line"),
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).cast("long").alias("n_dropped"),
    )
    # NULL-text docs explode to zero rows — restore them
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .withColumn("n_lines", F.coalesce("n_lines", F.lit(0)))
        .withColumn("n_dropped", F.coalesce("n_dropped", F.lit(0)))
    )
