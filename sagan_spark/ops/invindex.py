"""Inverted-index construction: term → capped, ranked posting list.

The retrieval-side sink of a web corpus (tfidf/bm25 in ops/tfidf.py
SCORE ad-hoc queries; this op MATERIALIZES the index those scores
would be served from).  The reference engine's analogous structure is
its rule prefilter index — content literals hashed to rule lists
consulted per event (/root/reference/src/processors/engine.c literal
pre-pass) — here inverted over the corpus instead of the ruleset.

Scale shape (100 TB posture):

1. (doc, token, tf) via explode + map-side-combining groupBy — the
   only corpus-sized shuffle, keyed (doc_id, token) so it is NOT
   skewed by hot terms (a stop word's occurrences spread across all
   docs);
2. document frequency per token off that frame (map-side combine,
   vocab-bounded output);
3. the posting CAP uses the salted two-stage grouped top-k
   (ops/topk.topk_per_group) — a stop word matching 10^11 documents
   must never funnel one sorting task; stage 1 bounds every sort to
   ~cap rows per salt bucket and WindowGroupLimit pushes the limit
   below the sort;
4. the final per-token assembly aggregates <= max_postings rows per
   token — array_sort on a (rank-key, rendering) struct makes the
   collect_list order deterministic (collect_list alone is
   partition-order-dependent).

Ranking: tf DESC, doc_id ASC — a total order, so the capped list is
unique and the DuckDB oracle (string_agg ... ORDER BY tf DESC, doc_id)
reproduces it byte-for-byte.  Postings render as 'doc:tf' joined with
',': a flat string survives the driver hash's cell stringification in
both engines (array-of-struct reprs differ) and is the wire shape a
serving layer would store anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(docs: DataFrame, max_postings: int = 1000,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(token, df_count, n_postings, postings): document frequency is
    counted BEFORE capping (the true corpus statistic idf needs);
    ``postings`` keeps the ``max_postings`` highest-tf documents."""
    from sagan_spark.ops.textstats import TOKEN_RE
    from sagan_spark.ops.topk import topk_per_group

    tf = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(TOKEN_RE), F.lit(0)
                )
            ).alias("token"),
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_count"))
    capped = topk_per_group(
        tf,
        ["token"],
        [F.col("tf").desc(), F.col(id_col).asc()],
        k=max_postings,
        salt_on=id_col,
    )
    entry = F.struct(
        (-F.col("tf")).alias("neg_tf"),
        F.col(id_col).alias("doc"),
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"), F.col("tf").cast("string")
        ).alias("s"),
    )
    lists = (
        capped.groupBy("token")
        .agg(F.array_sort(F.collect_list(entry)).alias("es"))
        .select(
            "token",
            F.size("es").cast("long").alias("n_postings"),
            F.array_join(F.transform("es", lambda e: e["s"]), ",").alias(
                "postings"
            ),
        )
    )
    return dfreq.join(lists, "token").select(
        "token", "df_count", "n_postings", "postings"
    )


def inverted_index_sql(table: str = "documents",
                       max_postings: int = 1000) -> str:
    """The SAME index in ANSI SQL: same TOKEN_RE, same (tf DESC,
    doc_id) total order, same cap, same 'doc:tf' rendering."""
    from sagan_spark.ops.textstats import TOKEN_RE

    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
        f" '{TOKEN_RE}')) AS token FROM {table}),"
        " tf AS (SELECT doc_id, token, count(*) AS tf FROM toks"
        "  GROUP BY 1, 2),"
        " dfreq AS (SELECT token, count(*) AS df_count FROM tf GROUP BY 1),"
        " ranked AS (SELECT *, row_number() OVER (PARTITION BY token"
        "  ORDER BY tf DESC, doc_id ASC) AS rnk FROM tf),"
        f" capped AS (SELECT * FROM ranked WHERE rnk <= {int(max_postings)}),"
        " lists AS (SELECT token, CAST(count(*) AS BIGINT) AS n_postings,"
        "  string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),"
        "   ',' ORDER BY tf DESC, doc_id ASC) AS postings"
        "  FROM capped GROUP BY 1)"
        " SELECT dfreq.token, df_count, n_postings, postings"
        " FROM dfreq JOIN lists ON dfreq.token = lists.token"
    )
