"""DSIR-style importance resampling for training-data selection
(Xie et al., "Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169): score every raw document by how much
more likely its hashed n-gram bag is under a TARGET corpus (the
high-quality distribution you want more of) than under the RAW corpus
it came from, then keep the top-k.

Faithful-to-the-paper parts: hashed unigram+bigram bag-of-ngrams
features (their §3 "hashed n-gram features", the Weinberger hashing
trick — fixed model size, no vocabulary build), importance weight =
per-occurrence target-vs-raw contrast summed over the document, then
a deterministic greedy top-k (the paper's Gumbel top-k reduces to
greedy top-k at temperature 0; greedy is the reproducible variant an
engine contract can pin).

Deliberate departure, same rationale as :mod:`~sagan_spark.ops.lmscore`
(this repo's integer-contract discipline): the paper's weight is
``sum log(p[b]/q[b])`` with add-k smoothing — floats whose libm last
ulps differ across engines.  We rank by the integer surrogate
``sum (ppm_t[b] - ppm_q[b])`` where ``ppm_x[b] = (10^6 * count_x[b])
div total_x`` — the same "push toward target, away from raw" contrast,
exact in 64-bit integers in any aggregation order, oracle-mirrorable
byte-for-byte.  Unseen-in-both buckets contribute 0 (no smoothing
needed: a difference has no division by zero to dodge).  Document the
consequence honestly: rankings agree with the log-ratio form on the
dominant mass but can reorder docs whose evidence is concentrated in
rare buckets.

Scale shape (100 TB posture):
- training = two map-side-combining groupBys over the exploded gram
  streams (output ≤ n_buckets rows each) + a full outer join of two
  ≤ n_buckets-row tables and two 1-row total frames — nothing
  corpus-sized crosses a shuffle except the partial-aggregated counts;
- scoring = scan-level tokenize/explode + ONE broadcast join against
  the ≤ n_buckets-row model + one partial-aggregating groupBy(doc_id);
- selection = global top-k via orderBy().limit(k) — Spark plans
  TakeOrdered (per-partition heap + driver merge of k·#partitions
  rows), no total sort.  NULL-score (token-less) docs are excluded
  explicitly because Spark's DESC sorts NULL last while DuckDB's
  sorts NULL first — the one cross-engine ordering trap here.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DSIRModel(NamedTuple):
    """Trained contrast table: one row per hashed feature bucket."""

    buckets: DataFrame  # (bucket long, ppm_target long, ppm_raw long)
    n_buckets: int


def _gram_stream(docs: DataFrame, text_col: str, id_col: str,
                 n_buckets: int) -> DataFrame:
    """(doc_id, bucket) — one row per unigram and per adjacent bigram
    occurrence, hashed into ``n_buckets`` (60-bit md5, the repo-wide
    bucket idiom).  Bigrams key as ``prev|tok``; sharing one hash
    space with unigrams adds nothing beyond the collisions the
    hashing trick already accepts.  Token-less docs contribute no
    rows."""
    from sagan_spark.ops.packing import _md5_long
    from sagan_spark.ops.textstats import TOKEN_RE

    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit("|"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return (
        docs.where(n >= 1)
        .select(F.col(id_col), F.explode(grams).alias("_sg_gram"))
        .select(
            id_col,
            F.pmod(_md5_long(F.col("_sg_gram")), F.lit(n_buckets)).alias(
                "bucket"
            ),
        )
    )


def dsir_train(target_docs: DataFrame, raw_docs: DataFrame,
               n_buckets: int = 1 << 16, text_col: str = "text",
               id_col: str = "doc_id") -> DSIRModel:
    """Count hashed grams over the target and raw corpora and turn
    each bucket into an integer parts-per-million probability under
    each corpus: ``ppm_x = (10^6 * count_x) div total_x``.  Buckets
    absent from one side get ppm 0 there (count 0 — exact, not
    smoothed).  Everything stays lazy: totals are 1-row frames
    cross-joined in, so the model composes into a single job with
    whatever runs downstream."""
    t = (
        _gram_stream(target_docs, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_sg_tc"))
    )
    q = (
        _gram_stream(raw_docs, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_sg_qc"))
    )
    tn = t.agg(F.sum("_sg_tc").alias("_sg_tn"))
    qn = q.agg(F.sum("_sg_qc").alias("_sg_qn"))
    buckets = (
        t.join(q, "bucket", "full")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(qn))
        .select(
            "bucket",
            F.coalesce(
                F.expr("(1000000 * coalesce(_sg_tc, 0)) div _sg_tn"),
                F.lit(0),  # empty target corpus: _sg_tn NULL
            ).alias("ppm_target"),
            F.coalesce(
                F.expr("(1000000 * coalesce(_sg_qc, 0)) div _sg_qn"),
                F.lit(0),
            ).alias("ppm_raw"),
        )
    )
    return DSIRModel(buckets=buckets, n_buckets=n_buckets)


def dsir_weights(docs: DataFrame, model: DSIRModel, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document importance score: the exact integer sum of
    ``ppm_target - ppm_raw`` over every gram occurrence (positive =
    looks more like the target corpus).  Buckets outside the model
    (possible when scoring a different corpus than ``dsir_train``
    saw) contribute 0.  Token-less docs return ``n_grams = 0`` and a
    NULL score — unscorable, not "maximally raw".  Returns
    (doc_id, n_grams, dsir_score)."""
    g = _gram_stream(docs, text_col, id_col, model.n_buckets)
    agg = (
        g.join(F.broadcast(model.buckets), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.coalesce(F.col("ppm_target"), F.lit(0))
                - F.coalesce(F.col("ppm_raw"), F.lit(0))
            ).alias("dsir_score"),
        )
    )
    # token-less docs never enter the gram stream: scan-level recount,
    # same no-anti-join trick as lm_likelihood
    from sagan_spark.ops.textstats import TOKEN_RE

    unscorable = docs.where(
        F.coalesce(
            F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)), F.lit(0)
        ) < 1
    ).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_grams"),
        F.lit(None).cast("long").alias("dsir_score"),
    )
    return agg.unionByName(unscorable)


def dsir_topk(scored: DataFrame, k: int, id_col: str = "doc_id",
              score_col: str = "dsir_score") -> DataFrame:
    """Greedy top-k selection over :func:`dsir_weights` output —
    deterministic across runs, partitionings, and engines: ties break
    on the md5 of the id (the repo's sampling-key idiom), NULL-score
    docs are excluded outright (Spark and DuckDB disagree on where
    DESC puts NULLs, and an unscorable doc has no business being
    "selected by score" anyway).  TakeOrdered under the hood: no
    global sort at corpus scale."""
    from sagan_spark.ops.sampling import _hash8

    return (
        scored.where(F.col(score_col).isNotNull())
        .orderBy(
            F.desc_nulls_last(score_col),
            _hash8(F.col(id_col), "dsir"),
            F.col(id_col),
        )
        .limit(k)
    )
