"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (JVM-side, codegen'd)
except SimHash, which is an Arrow-batched pandas UDF (bit-level math).

Scale design notes (100 TB posture):
- exact dedup: single hash-shuffle on a 128-bit digest, partial
  aggregation map-side; never materializes text twice.
- MinHash LSH: shingle explode is narrow (flatMap-like); the only wide
  ops are the per-(doc, band) min-agg and the band-bucket self-join.
  Band signatures are tiny (doc_id + 2 strings), so the join input is
  orders of magnitude smaller than the corpus.
- candidate pairs use doc_id < doc_id ordering to halve the join and
  avoid self-pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate clusters by full-content digest (hash-groupBy).

    Returns (content_hash, dup_count, min_doc_id) for groups with >1 doc.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def shingle_df(docs: DataFrame, k: int = 8, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Distinct character k-gram shingles per document."""
    seq = F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1)))
    sh = F.transform(seq, lambda i: F.col(text_col).substr(i, F.lit(k)))
    return (
        docs.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .filter(F.length("shingle") == k)
        .distinct()
    )


def minhash_band_signatures(shingles: DataFrame, n_bands: int = 4,
                            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, sig): per band, the lexicographic min of
    md5(band_seed || shingle) — a valid min-hash family (md5 with a
    per-band seed is a uniform ordering of the shingle universe).

    Kept string-typed so the identical construction is expressible in
    ANSI SQL for the DuckDB oracle.
    """
    bands = [
        F.min(F.md5(F.concat(F.lit(f"b{b}|"), F.col("shingle")))).alias(f"sig{b}")
        for b in range(n_bands)
    ]
    wide = shingles.groupBy(id_col).agg(*bands)
    stacked = wide.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"sig{b}").alias("sig"))
                for b in range(n_bands)
            ])
        ).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    return stacked


def minhash_lsh_pairs(docs: DataFrame, k: int = 8, n_bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any band signature.

    Returns (doc_a, doc_b, n_shared_bands), doc_a < doc_b.
    """
    sh = shingle_df(docs, k, text_col, id_col)
    sig = minhash_band_signatures(sh, n_bands, id_col)
    a = sig.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = sig.select(F.col(id_col).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 8, n_bands: int = 4,
                        threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard on LSH candidate pairs only (scale path:
    the O(n^2) similarity is bounded by bucket collisions, not corpus
    size).  Returns (doc_a, doc_b, jaccard) above threshold."""
    sh = shingle_df(docs, k, text_col, id_col)
    pairs = minhash_lsh_pairs(docs, k, n_bands, text_col, id_col).select("doc_a", "doc_b")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    # intersection size via join on shingle, restricted to candidate pairs
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingle"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingle"))
    inter_counts = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter_counts.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_TYPE = T.LongType()


def simhash_udf(k: int = 4):
    """64-bit SimHash over character k-gram hashes (Arrow-batched).

    Bit j of the output is the majority vote of bit j across the
    blake2b-64 hashes of the doc's k-grams.  Deterministic, seedless.
    """
    import hashlib

    @F.pandas_udf(SIMHASH_TYPE)
    def _simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            counts = [0] * 64
            n = 0
            seen = set()
            for i in range(max(len(t) - (k - 1), 1)):
                g = t[i : i + k]
                if g in seen:
                    continue
                seen.add(g)
                h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
                n += 1
                for j in range(64):
                    counts[j] += (h >> j) & 1
            v = 0
            for j in range(64):
                if counts[j] * 2 >= n:
                    v |= 1 << j
            # to signed 64-bit
            if v >= 1 << 63:
                v -= 1 << 64
            out.append(v)
        return pd.Series(out, dtype="int64")

    return _simhash


def simhash_near_dups(docs: DataFrame, k: int = 4, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded on the top
    16 bits to avoid the n^2 join (standard simhash block trick)."""
    sh = docs.select(F.col(id_col), simhash_udf(k)(F.col(text_col)).alias("simhash"))
    banded = sh.withColumn("block", F.shiftrightunsigned("simhash", 48))
    a = banded.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("h_a"), "block")
    b = banded.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("h_b"), "block")
    pairs = a.join(b, "block").filter(F.col("doc_a") < F.col("doc_b"))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_cosine_dups(emb: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs by cosine similarity.

    Brute-force form; see similarity.py for the LSH-bucketed scale path.
    """
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    n = emb.select(F.col(id_col), F.col(vec_col), norm.alias("nrm"))
    a = n.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), F.col("nrm").alias("n_a"))
    b = n.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), F.col("nrm").alias("n_b"))
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
