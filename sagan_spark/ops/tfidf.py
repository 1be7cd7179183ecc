"""TF-IDF keyword extraction: top-k characteristic terms per document.

The training-data staple between raw token counts (`ops/textstats.py
vocab_stats`) and model-based scoring (`ops/webclean.py
hashed_linear_score`): rank each document's terms by how much more
often they appear in THIS document than across the corpus — keyword
tagging, topic bucketing, near-dup explanation.

Scale shape:

1. tokens explode once; per-(doc, token) counts partial-aggregate
   map-side (within-doc repetition is absorbed before any exchange);
2. the corpus side (term_freq/doc_freq per token) is capped to a
   ``max_vocab``-term vocabulary by total term frequency — sklearn's
   ``max_features`` semantics — via TakeOrdered, never a global sort,
   which makes it BROADCASTABLE BY CONSTRUCTION: the fact-side join
   on `token` is a broadcast hash join, so the hot-token skew class
   (one partition receiving "the"'s 10^12 per-doc rows under a
   hash-shuffle join) cannot occur;
3. the corpus doc count arrives as a broadcast 1-row frame;
4. doc length and the final rank are per-``doc_id`` windows — one
   shared exchange, partitions bounded by a document's distinct-term
   count, never by corpus-wide term popularity.

Scoring is the linear-idf form, one IEEE double chain replayed
operation-for-operation in the oracle (the `sample_temperature`
precedent): ``tfidf = ((tf * 1000.0) * n_docs / df) / doc_len`` —
term share of the document times the inverse corpus document share,
milli-scaled.  The classic ``log`` idf is a one-line swap
(``F.log(n_docs / df)``), deliberately NOT the gate form: cross-engine
``ln`` differs in the last ulp (Java intrinsic vs libm), the same
reason `ops/lmscore.py` keeps integer milli-probabilities.  Linear
idf preserves the per-document contrast this operator exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sagan_spark.ops.textstats import TOKEN_RE


def tfidf_topk(docs: DataFrame, k: int = 5, max_vocab: int = 65536,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` terms per document by linear-idf TF-IDF over the
    ``max_vocab``-term corpus vocabulary: (doc_id, token, tf, df,
    tfidf_milli, rank).  Ties rank by token ascending; documents with
    no in-vocabulary token are absent."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    per_doc = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # vocabulary cap = vocab_stats' (term_freq desc, token) TakeOrdered,
    # but derived from per_doc so the corpus explodes exactly once
    vocab = (
        per_doc.groupBy("token")
        .agg(
            F.sum("tf").alias("_sg_term_freq"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .orderBy(F.desc("_sg_term_freq"), F.asc("token"))
        .limit(int(max_vocab))
        .select("token", "doc_freq")
    )
    n_docs = per_doc.agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )

    w_doc = Window.partitionBy(id_col)
    scored = (
        per_doc.join(F.broadcast(vocab), "token")
        .join(F.broadcast(n_docs))
        .withColumn("_sg_len", F.sum("tf").over(w_doc))
        .withColumn(
            "tfidf_milli",
            (F.col("tf").cast("double") * F.lit(1000.0))
            * F.col("n_docs") / F.col("doc_freq") / F.col("_sg_len"),
        )
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf_milli"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select(
            id_col,
            "token",
            "tf",
            F.col("doc_freq").alias("df"),
            "tfidf_milli",
            "rank",
        )
    )
