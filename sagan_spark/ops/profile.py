"""Corpus column profiling — the data-quality health check a 100 TB
ingest runs before (and after) every curation stage: per-column null /
empty counts, distinct cardinality, and character-length extremes and
mean, emitted as one row per column.

The reference engine's analog is its per-run statistics output
(src/sagan-stats.c prints events/dropped/matched counters per
processor); here the SAME discipline is applied to the *input table*
columns rather than the processor counters (which live in
pipeline/metrics.py, gate a11_stats_json).

Determinism: counts and sums of 64-bit integers are exact in any
aggregation order; the mean is integer milli-units
``(sum_len * 1000) div n_nonnull`` — one rounding at the end, so the
profile is bit-identical across partitionings and replayable by a
per-column UNION ALL in the DuckDB oracle.

Scale shape (100 TB posture): ONE full-scan aggregation — every
per-column statistic partial-aggregates map-side, so the shuffle is a
single row per partition regardless of input size.  The exception is
exact ``count_distinct`` over k columns, which Spark executes via an
Expand (k+1 copies of every row feeding the partial aggregate) —
acceptable to ~a few profiled columns, the wrong tool at petabyte
width.  ``exact_distinct=False`` swaps in ``approx_count_distinct``
(HyperLogLog++, rsd 1.5 %) which keeps the single-pass no-Expand
shape; the repo's integer-exact HLL (ops/sketch.py) is the third
option when the estimate itself must be engine-reproducible.  The
final ``stack`` unpivot runs on a one-row frame — free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None,
                    exact_distinct: bool = True) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_null, n_empty, n_distinct, len_min, len_max,
    len_avg_milli).  Lengths are character counts of the value cast to
    string; ``len_*`` are NULL for an all-null column; ``n_empty``
    counts zero-length strings (never null).  ``len_avg_milli`` is the
    integer milli-character mean over non-null values."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    ndistinct = (
        F.count_distinct if exact_distinct
        else lambda c: F.approx_count_distinct(c).cast("long")
    )
    aggs = [F.count(F.lit(1)).alias("_sg_n")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        ln = F.length(s).cast("long")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"_nn_{i}"),
            F.sum(F.when(s == "", 1).otherwise(0))
            .cast("long").alias(f"_ne_{i}"),
            ndistinct(F.col(c)).alias(f"_nd_{i}"),
            F.min(ln).alias(f"_mn_{i}"),
            F.max(ln).alias(f"_mx_{i}"),
            F.sum(F.coalesce(ln, F.lit(0).cast("long"))).alias(f"_sl_{i}"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _nn_{i}, _ne_{i}, _nd_{i}, _mn_{i}, _mx_{i}, _sl_{i}"
        for i, c in enumerate(cols)
    )
    out = row.select(
        "_sg_n",
        F.expr(
            f"stack({len(cols)}, {stacked}) AS"
            " (col_name, n_null, n_empty, n_distinct, len_min, len_max, _sl)"
        ),
    )
    return out.select(
        "col_name",
        F.col("_sg_n").alias("n_rows"),
        "n_null",
        "n_empty",
        "n_distinct",
        "len_min",
        "len_max",
        F.when(
            F.col("_sg_n") > F.col("n_null"),
            F.expr("(_sl * 1000) div (_sg_n - n_null)"),
        ).alias("len_avg_milli"),
    )


def shard_checksums(docs: DataFrame, n_shards: int = 64,
                    cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive corpus integrity manifest: per shard, the row
    count and a modular checksum of row digests — verify a copy /
    migration / snapshot rebuild without sorting or moving data (two
    corpora are content-equal iff their manifests match, up to 60-bit
    digest collisions).  The reference engine's analog is its rule-set
    fingerprinting on reload (a config checksum gating dynamic rules).

    Spec (bit-identical on both contract engines):
    - row digest = md5 over the selected columns, each rendered
      INJECTIVELY as ``N`` for NULL or ``<char-length>:<value>``
      otherwise, joined by the 0x1f unit separator.  The length
      prefix makes the rendering self-delimiting, so values that
      themselves contain 0x1f/0x00 can never make two distinct rows
      render identically (('a\\x1fb','c') vs ('a','b\\x1fc')) — the
      manifest's collision bound stays the documented 60-bit one
      (ADVICE r4).  NULL's ``N`` cannot collide with a real value:
      length-prefixed renderings always start with a digit.  Columns
      default to all columns; pre-quantize floats before hashing them
      (the repo's integer-units discipline — raw double rendering is
      not a cross-engine contract), and render binary columns to hex
      first (Spark casts bytes to a UTF-8 string, DuckDB to a
      \\x-escaped form — raw blob casts are not a contract either).
    - ``v`` = first 60 digest bits as int64; ``shard`` = an
      INDEPENDENT 32-bit digest window mod ``n_shards`` (so checksum
      and shard assignment don't correlate).
    - ``checksum`` = Σ v (exact DECIMAL(38)/HUGEINT sum — order-free)
      mod 2^60, cast back to int64.  Headroom: exact through ~10^20
      rows per shard.

    One map-side-combining aggregation; the shuffle carries n_shards
    rows per task regardless of corpus size (the surt-census shape).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    cols = list(cols) if cols is not None else list(docs.columns)

    def _render(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    digest = F.md5(F.concat_ws("\x1f", *[_render(c) for c in cols]))
    v = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    shard = F.pmod(
        F.conv(F.substring(digest, 17, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    )
    return (
        docs.select(shard.alias("shard"), v.alias("_sg_v"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.col("_sg_v").cast("decimal(38,0)"))
                % F.lit(1 << 60).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("checksum"),
        )
    )


def render_value_sql(expr: str) -> str:
    """DuckDB twin of the :func:`shard_checksums` row-digest value
    rendering (one source of truth for the manifest contract):
    ``N`` for NULL, else ``<char-length>:<value>``.  ``expr`` must
    already be a VARCHAR expression."""
    return (
        f"CASE WHEN {expr} IS NULL THEN 'N'"
        f" ELSE CAST(length({expr}) AS VARCHAR) || ':' || {expr} END"
    )
