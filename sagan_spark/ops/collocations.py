"""PMI collocation mining — corpus-level co-occurrence statistics.

``lift(x,y) = p(x,y) / (p(x)·p(y))`` over adjacent-token bigrams (the
exponential of pointwise mutual information; Church & Hanks 1990) —
the corpus-analytics pass that surfaces multi-word expressions
("vice president", "machine learning") for tokenizer vocabularies,
stop-phrase lists, and boilerplate discovery.  The reference engine's
`meta_content` matches hand-listed phrase variants
(/root/reference/src/rules.h:154-171 meta-content lists); this is the
statistical machinery that *produces* such phrase lists from a corpus.

Scale shape (100 TB posture):

1. the corpus collapses to TWO vocabulary-bounded count frames via
   map-side-combining groupBys — unigram counts (one row per distinct
   token) and bigram counts (one row per distinct adjacent pair,
   pre-pruned by ``min_count`` BEFORE any join so the long tail of
   hapax pairs never shuffles twice);
2. the corpus totals N (tokens) and P (bigrams) are aggregated from
   those count frames, NOT from a second corpus scan, and cross-joined
   back as a broadcast single row;
3. the unigram joins run on the token key between count frames —
   bounded by vocabulary, not corpus; a hot token ("the") is ONE row
   on the unigram side, so there is no skew to salt.

Determinism contract: counts are exact integers; the lift is a PINNED
IEEE-double chain — every factor cast from integer (exact for counts
< 2^53), multiplications/division left-associated in the same literal
order on both engines, one floor at milli scale — the bm25/dsir
discipline (each double op is exactly rounded, so identical operand
order gives bit-identical results).  ``lift_milli`` is clamped to
10^15 (a pathological corpus of single-token documents plus one
bigram could otherwise overflow the BIGINT cast; real corpora sit
orders of magnitude below the clamp)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LIFT_CLAMP = 1.0e15


def pmi_collocations(docs: DataFrame, min_count: int = 5,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(tok_left, tok_right, pair_count, lift_milli) for every adjacent
    bigram seen at least ``min_count`` times.

    ``lift_milli = floor(1000 · (c_xy/P) / ((c_x/N)·(c_y/N)))``
    spelled as the pinned chain
    ``floor(1000.0 · c_xy · N · N / (P · c_x · c_y))`` — > 1000 means
    the pair co-occurs more than independence predicts; collocations
    score orders of magnitude above it."""
    from sagan_spark.ops.lmscore import _pair_stream
    from sagan_spark.ops.textstats import TOKEN_RE

    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_tok"))
    pairs = _pair_stream(docs, text_col, id_col)
    big_all = pairs.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    # totals from the COUNT frames (vocab-bounded), never the corpus
    totals = (
        uni.agg(F.sum("c_tok").alias("n_tokens"))
        .crossJoin(big_all.agg(F.sum("pair_count").alias("n_pairs")))
    )
    big = big_all.filter(F.col("pair_count") >= F.lit(int(min_count)))
    cl = uni.select(F.col("tok").alias("prev"), F.col("c_tok").alias("c_left"))
    cr = uni.select("tok", F.col("c_tok").alias("c_right"))
    j = (
        big.join(cl, "prev")
        .join(cr, "tok")
        .crossJoin(F.broadcast(totals))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    lift = (
        F.lit(1000.0) * d("pair_count") * d("n_tokens") * d("n_tokens")
        / (d("n_pairs") * d("c_left") * d("c_right"))
    )
    return j.select(
        F.col("prev").alias("tok_left"),
        F.col("tok").alias("tok_right"),
        "pair_count",
        F.floor(F.least(lift, F.lit(LIFT_CLAMP))).cast("long").alias(
            "lift_milli"
        ),
    )


def pmi_sql(table: str = "documents", min_count: int = 5) -> str:
    """The SAME computation in ANSI SQL for the DuckDB oracle — same
    TOKEN_RE constant, same adjacent-pair construction (lead() over
    token positions ≡ the zip-with-slices pair stream), same pinned
    double chain and clamp."""
    from sagan_spark.ops.textstats import TOKEN_RE

    return (
        "WITH s AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM ("
        " SELECT doc_id, unnest(list_transform(regexp_extract_all(text,"
        f" '{TOKEN_RE}'), (x,i) -> struct_pack(i := i, tok := x))) AS u"
        f" FROM {table})),"
        " uni AS (SELECT tok, count(*) AS c_tok FROM s GROUP BY 1),"
        " pr AS (SELECT tok AS prev, lead(tok) OVER"
        " (PARTITION BY doc_id ORDER BY i) AS tok FROM s),"
        " big_all AS (SELECT prev, tok, count(*) AS pair_count FROM pr"
        "  WHERE tok IS NOT NULL GROUP BY 1, 2),"
        " tot AS (SELECT (SELECT sum(c_tok) FROM uni) AS n_tokens,"
        "  (SELECT sum(pair_count) FROM big_all) AS n_pairs)"
        " SELECT big_all.prev AS tok_left, big_all.tok AS tok_right,"
        " pair_count, CAST(floor(least("
        "  1000.0 * CAST(pair_count AS DOUBLE)"
        "  * CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)"
        "  / (CAST(n_pairs AS DOUBLE) * CAST(cl.c_tok AS DOUBLE)"
        "     * CAST(cr.c_tok AS DOUBLE)),"
        f"  {LIFT_CLAMP!r})) AS BIGINT) AS lift_milli"
        " FROM big_all"
        " JOIN uni cl ON big_all.prev = cl.tok"
        " JOIN uni cr ON big_all.tok = cr.tok, tot"
        f" WHERE pair_count >= {int(min_count)}"
    )
