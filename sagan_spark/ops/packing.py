"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic shuffled order and cut fixed-size token windows, the
GPT-style "pack then split at chunk boundaries" assembly (documents may
straddle chunk boundaries; nothing is padded or dropped).

Scale shape: packing is per-SHARD, never corpus-global — a single
total-order running sum over 10^12 documents would funnel the whole
corpus through one sort.  The shard key is a uniform md5-derived hash
of the doc id, so a 100 TB corpus spreads over ``n_shards`` independent
window partitions (pick n_shards >= cluster cores; each shard's sort is
partition-local after one hash exchange).  Within a shard, order is the
deterministic hash-shuffle (salt|id md5), so the packing is
reproducible run-to-run and independent of input partitioning — same
contract as ops/sampling.py.

Everything is built-in expressions (whole-stage codegen), mirrored 1:1
in ANSI SQL for the DuckDB oracle: the shard key and order key are
md5-prefix integers via ``('0x'||substr(md5(..),1,15))::BIGINT``
(DuckDB) == ``conv(substr(md5(..),1,15),16,10)::long`` (Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sagan_spark.ops.textstats import TOKEN_RE


def _md5_long(col):
    """First 60 bits of md5 as a non-negative BIGINT (same value as
    DuckDB's ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def bpe_token_count(col):
    """BPE-ish token count: letter runs | digit runs | single other
    non-space char (the token_counts() regex from ops/textstats.py).
    NULL text counts as 0 tokens — a NULL doc must not NULL-poison its
    shard's running offsets."""
    return F.coalesce(
        F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0))).cast("long"),
        F.lit(0).cast("long"),
    )


def pack_sequences(docs: DataFrame, max_tokens: int = 2048,
                   n_shards: int = 32, text_col: str = "text",
                   id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Per-document packing assignment.

    Returns (doc_id, shard, n_tokens, tok_start, tok_end, chunk_first,
    chunk_last): the doc's offsets within its shard's concatenated
    token stream and the fixed-size chunk ids it lands in
    (chunk_first < chunk_last means the doc straddles a boundary).
    Zero-token docs get tok_start == tok_end and occupy the single
    chunk at that offset.
    """
    sid = F.col(id_col).cast("string")
    shard = F.pmod(_md5_long(F.concat(F.lit(f"shard|{salt}|"), sid)), F.lit(n_shards))
    okey = _md5_long(F.concat(F.lit(f"order|{salt}|"), sid))
    base = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        okey.alias("okey"),
        bpe_token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    out = base.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("tok_start"),
        cum.alias("tok_end"),
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "tok_start",
        "tok_end",
        F.floor(F.col("tok_start") / max_tokens).alias("chunk_first"),
        F.floor(F.greatest(F.col("tok_end") - 1, F.col("tok_start")) / max_tokens).alias(
            "chunk_last"
        ),
    )


def pack_chunk_stats(docs: DataFrame, max_tokens: int = 2048,
                     n_shards: int = 32, text_col: str = "text",
                     id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Chunk-level rollup of the packing: (shard, chunk_id, n_docs,
    n_tokens) where n_docs counts every document contributing at least
    one token position to the chunk (straddlers count in every chunk
    they cross) and n_tokens is the number of token positions of the
    chunk actually covered (== max_tokens for all but each shard's tail
    chunk).  The explode is bounded: a doc emits ceil(len/max_tokens)
    rows, so the blow-up factor is corpus_tokens/max_tokens, not n^2.
    """
    packed = pack_sequences(docs, max_tokens, n_shards, text_col, id_col, salt)
    nonempty = packed.filter(F.col("n_tokens") > 0)
    per_chunk = nonempty.select(
        "shard",
        "tok_start",
        "tok_end",
        F.explode(F.sequence(F.col("chunk_first"), F.col("chunk_last"))).alias("chunk_id"),
    )
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * max_tokens)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * max_tokens)
    return (
        per_chunk.select("shard", "chunk_id", (hi - lo).alias("cov"))
        .groupBy("shard", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("cov").alias("n_tokens"),
        )
    )


def chunk_documents(docs: DataFrame, chunk_chars: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Overlapping retrieval chunks — the RAG-indexing split (fixed
    window, fixed overlap so no boundary sentence is lost to both
    neighbors), the counterpart of :func:`pack_sequences`' training
    split.  Chunk i covers characters ``[i*stride, i*stride +
    chunk_chars)`` with ``stride = chunk_chars - overlap``; the last
    chunk starts at the final stride where the window still reaches
    text that no earlier chunk covered (``1 + ceil((len - W) / S)``
    chunks for len > W, one chunk otherwise), so every character lands
    in >= 1 chunk and no chunk is a strict suffix of its predecessor.
    Empty/NULL text yields no chunks.

    Returns (id, chunk_id, char_start, chunk_len, chunk).

    Scale shape (100 TB posture): pure scan-level codegen — sequence /
    transform / explode / substring, no shuffle, no Python; chunk
    count is data-derived per row, never a driver-side loop.  The
    explode fan-out is ~len/stride rows per doc, the same output the
    sink must hold anyway."""
    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"overlap must be in [0, chunk_chars), got {overlap}"
        )
    stride = chunk_chars - overlap
    ln = F.length(F.col(text_col)).cast("long")
    n_chunks = F.when(ln <= chunk_chars, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.expr(
            f"(length({text_col}) - {chunk_chars} + {stride} - 1)"
            f" div {stride}"
        )
    )
    ids = F.when(
        ln > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<long>"))
    exploded = docs.select(
        F.col(id_col), F.col(text_col), F.explode(ids).alias("chunk_id")
    )
    start = F.col("chunk_id") * stride
    chunk = F.col(text_col).substr(
        (start + 1).cast("int"), F.lit(int(chunk_chars))
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        start.alias("char_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk"),
    )
