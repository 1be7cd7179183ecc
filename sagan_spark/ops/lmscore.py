"""Hashed bigram language-model scoring — the LM-likelihood filter of
CCNet-class pipelines (Wenzek et al. arXiv:1911.00359 filter web text
by LM perplexity against a reference corpus; GPT-3/LLaMA pipelines do
the same).  Training counts hashed bigrams over a REFERENCE corpus;
scoring ranks candidate documents by average next-token probability
under those counts.

Design choices for engine-exact determinism (the repo's contract
discipline):

- **Hashed buckets** (Weinberger et al. 2009 hashing trick): tokens
  and bigrams map to ``md5 % n_buckets`` — no vocabulary build, fixed
  model size, collisions documented as the standard tradeoff.
- **Integer probabilities**: per-bigram milli-probability is
  ``(1000 * pair_count) div prefix_count`` — 64-bit integer division,
  exact in any aggregation order; the per-doc score is the exact
  integer sum divided by the pair count, rounded once at the end.  A
  float log-perplexity would drift across engines/partitionings; the
  average milli-probability is the same monotone ranking signal
  without the drift (document it as a likelihood score, not a true
  perplexity).
- **No smoothing**: unseen bigrams score 0.  A rank filter only needs
  the ordering; add-k smoothing would put a float in every term.

Scale shape (100 TB posture): training is two map-side-combining
groupBys over the exploded bigram stream (bounded output:
≤ n_buckets rows each).  Scoring is scan-level tokenize + explode +
TWO BROADCAST joins (the model tables are ≤ n_buckets rows — 2^20
by default; raise past ~10^8 and the joins should become shuffle
joins instead) + one groupBy(doc_id) partial-aggregating sum.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class BigramLM(NamedTuple):
    """Trained model: hashed bigram + prefix count tables."""

    pairs: DataFrame      # (pair_bucket long, pair_count long)
    prefixes: DataFrame   # (prefix_bucket long, prefix_count long)
    n_buckets: int


def _pair_stream(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, prev, tok) adjacent-token pairs per document; docs
    with < 2 tokens contribute nothing."""
    from sagan_spark.ops.textstats import TOKEN_RE

    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("tok")),
    )
    return (
        docs.where(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
    )


def _pair_bucket(prev, tok, n_buckets: int):
    from sagan_spark.ops.packing import _md5_long

    return F.pmod(_md5_long(F.concat(prev, F.lit("|"), tok)), F.lit(n_buckets))


def _prefix_bucket(prev, n_buckets: int):
    from sagan_spark.ops.packing import _md5_long

    return F.pmod(_md5_long(prev), F.lit(n_buckets))


def lm_train_bigrams(ref_docs: DataFrame, n_buckets: int = 1 << 20,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> BigramLM:
    """Count hashed bigrams over the reference corpus.  The prefix
    count is the number of bigrams whose first token hashes to the
    bucket (i.e. occurrences of the token in non-final position), so
    pair/prefix is a proper conditional-probability estimate."""
    s = _pair_stream(ref_docs, text_col, id_col)
    prev, tok = F.col("prev"), F.col("tok")
    pairs = (
        s.groupBy(_pair_bucket(prev, tok, n_buckets).alias("pair_bucket"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    prefixes = (
        s.groupBy(_prefix_bucket(prev, n_buckets).alias("prefix_bucket"))
        .agg(F.count(F.lit(1)).alias("prefix_count"))
    )
    return BigramLM(pairs=pairs, prefixes=prefixes, n_buckets=n_buckets)


def lm_likelihood(docs: DataFrame, lm: BigramLM, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Score documents under the trained counts: per adjacent pair the
    milli-probability ``(1000 * pair_count) div prefix_count`` (0 when
    unseen), per doc the exact integer sum and
    ``lm_score_ppm = (1000 * sum) div n_pairs`` — the average
    next-token probability in parts-per-million, as a BIGINT.  Integer
    end to end: a rounded float score hit cross-engine half-tie
    divergence (2613/80000 rounds differently in Spark HALF_UP vs
    DuckDB) — divide by 1e6 downstream when a float is wanted.  Docs
    with < 2 tokens return ``n_pairs = 0`` and NULL score (unscorable,
    not "bad").  Returns (doc_id, n_pairs, lm_score_ppm)."""
    s = _pair_stream(docs, text_col, id_col)
    prev, tok = F.col("prev"), F.col("tok")
    scored = (
        s.select(
            F.col(id_col),
            _pair_bucket(prev, tok, lm.n_buckets).alias("pair_bucket"),
            _prefix_bucket(prev, lm.n_buckets).alias("prefix_bucket"),
        )
        .join(F.broadcast(lm.pairs), "pair_bucket", "left")
        .join(F.broadcast(lm.prefixes), "prefix_bucket", "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.expr("(1000 * pair_count) div prefix_count"), F.lit(0)
            ).alias("milli"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("milli").alias("_sg_sum"),
    )
    out = agg.select(
        id_col,
        "n_pairs",
        F.expr("(1000 * _sg_sum) div n_pairs").alias("lm_score_ppm"),
    )
    # < 2-token docs never enter the pair stream: same scan-level
    # recount trick as webclean.hashed_linear_score (no anti-join)
    from sagan_spark.ops.textstats import TOKEN_RE

    unscorable = docs.where(
        F.coalesce(
            F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)), F.lit(0)
        ) < 2
    ).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_pairs"),
        F.lit(None).cast("long").alias("lm_score_ppm"),
    )
    return out.unionByName(unscorable)


def lm_buckets(scored: DataFrame, lang_col: str = "lang",
               score_col: str = "lm_score_ppm",
               id_col: str = "doc_id") -> DataFrame:
    """CCNet's perplexity-bucket assignment (Wenzek et al.
    arXiv:1911.00359 §4.4): per language, split documents into
    **head / middle / tail** terciles of the LM score — downstream
    pipelines train on head+middle or re-weight the buckets.  Our
    score is a likelihood (higher = better), so ``head`` is the TOP
    tercile, ``tail`` the bottom; CCNet's perplexity convention
    (lower = better) maps onto the same buckets.

    Exact terciles without a corpus-wide sort: scores are bounded
    integers (ppm), so the cut points come from a per-``(lang,
    score)`` HISTOGRAM — one map-side-combining groupBy whose output
    is at most |langs| x 10^6 rows — and the windows/aggregations run
    over that histogram, never over the corpus.  A hot language
    (English ~ half a web corpus) therefore never funnels its
    documents into one window partition — the skew class the
    dedup_paragraphs row_number fix removed stays removed here.
    Thresholds broadcast back onto the corpus as a scan-level CASE.

    Cut rule, integer-exact and partition-independent: ``t1`` = the
    1/3-quantile = the smallest score whose ascending cumulative
    count reaches ``ceil(n/3)`` (integer form ``3*cum >= n``), ``t2``
    likewise for ``2n/3``; bucket = ``tail`` if ``score <= t1``,
    ``middle`` if ``score <= t2``, else ``head``.  Equal scores
    always share a bucket (no arbitrary ntile tie split — ties
    resolve DOWN into the worse bucket, the conservative direction
    for a keep-head/middle filter), so with distinct scores and
    ``3 | n`` the split is exactly ``n/3`` each.  A NULL score (the
    unscorable ``n_pairs = 0`` docs upstream) keeps its row with a
    NULL bucket; a 1-doc language is all 'tail' (its only score IS
    the 1/3-quantile).

    Returns the input columns + ``lm_bucket``."""
    lang, score = F.col(lang_col), F.col(score_col)
    hist = (
        scored.where(score.isNotNull())
        .groupBy(lang_col, score_col)
        .agg(F.count(F.lit(1)).alias("_sg_c"))
    )
    w_cum = (
        Window.partitionBy(lang_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(lang_col)
    cum = hist.select(
        lang_col,
        score_col,
        F.sum("_sg_c").over(w_cum).alias("_sg_cum"),
        F.sum("_sg_c").over(w_all).alias("_sg_n"),
    )
    c3, n = F.lit(3) * F.col("_sg_cum"), F.col("_sg_n")
    th = cum.groupBy(lang_col).agg(
        F.min(F.when(c3 >= n, score)).alias("_sg_t1"),
        F.min(F.when(c3 >= F.lit(2) * n, score)).alias("_sg_t2"),
    )
    # _sg_t1 is NULL iff the language never reached the histogram (the
    # doc's lang is NULL, or every score in it is NULL) — NULL bucket,
    # not a spurious 'head' via the NULL-comparison fallthrough
    bucket = (
        F.when(score.isNull() | F.col("_sg_t1").isNull(),
               F.lit(None).cast("string"))
        .when(score <= F.col("_sg_t1"), F.lit("tail"))
        .when(score <= F.col("_sg_t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return (
        scored.join(F.broadcast(th), lang_col, "left")
        .withColumn("lm_bucket", bucket)
        .drop("_sg_t1", "_sg_t2")
    )


def domain_lm_prior(docs: DataFrame, lm: BigramLM, url_col: str = "url",
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-registered-domain LM prior: the average
    :func:`lm_likelihood` score of a domain's documents — CCNet's
    famous per-domain perplexity table (Wenzek arXiv:1911.00359 §4.2:
    domain-level quality priors built from LM scores drive
    blocklists/allowlists before any per-document work).  Exact
    integer ppm: ``prior_ppm = Σ lm_score_ppm div n_scored``
    (NULL-skipping — unscorable <2-token docs count in ``n_docs`` but
    not the prior; a domain with no scorable docs reports NULL).

    One scoring pass + one map-side-combining per-domain aggregation;
    the PSL ladder runs once per row.  Returns (domain, n_docs,
    n_scored, prior_ppm)."""
    from sagan_spark.ops.urltools import registered_domain, url_host

    scored = lm_likelihood(docs, lm, text_col=text_col, id_col=id_col)
    dom = docs.select(
        F.col(id_col),
        registered_domain(url_host(F.col(url_col))).alias("domain"),
    )
    agg = (
        scored.join(dom, id_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("lm_score_ppm").alias("n_scored"),
            F.sum("lm_score_ppm").alias("_sg_sum"),
        )
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_scored",
        F.when(
            F.col("n_scored") > 0, F.expr("_sg_sum div n_scored")
        ).alias("prior_ppm"),
    )
