"""Count-min sketch frequency estimation (Cormode & Muthukrishnan
2005) — the fixed-memory answer to "how often does X occur?" over a
stream too large for an exact count table.

The reference engine's threshold counters keep one mmap slot per
tracked key and SWEEP stale ones (`/root/reference/src/ipc.c:78-200`)
— bounded memory bought with eviction; a count-min sketch buys the
same bound with hashing instead (no eviction, bounded overestimate).
In a corpus pipeline the sketch screens heavy hitters (hot tokens,
hot domains, hot shingles) before any exact machinery runs.

Determinism contract: row hashes are ``md5(salt_d || key) % width``
(the repo's md5 key discipline — same sketch rebuilds bit-identically
on any engine/partitioning), counts are exact integers, and the point
estimate is the plain integer ``min`` over depth rows — every value
replays exactly in DuckDB.

Scale shape (100 TB posture):

1. the SKETCH BUILD is one explode(depth) + map-side-combining
   groupBy: output is bounded by depth × width CELLS regardless of
   corpus size (the whole point), so the result broadcasts;
2. ESTIMATION joins the probe keys against the cell table per depth
   row — broadcast joins (the sketch is small by construction) + a
   min-agg, no skew possible (each probe key hits exactly one cell
   per row).

The one-sided error guarantee (estimate ≥ true count;
``P[err > ε·N] ≤ δ`` at ``width = e/ε``, ``depth = ln(1/δ)``) is
pinned against exact counts in tests/test_sketch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key_col, d: int, width: int):
    """Row-d bucket of a key: top-32-bit md5 slice mod width (exactly
    replayable: the 8-hex-char prefix as an integer)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cm{d}|"), key_col)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(int(width)))


def _cell_sql(key_expr: str, d: int, width: int) -> str:
    return (
        f"(('0x' || substr(md5('cm{d}|' || {key_expr}), 1, 8))::BIGINT"
        f" % {int(width)})"
    )


def cm_build(items: DataFrame, key_col: str = "key", width: int = 2048,
             depth: int = 4) -> DataFrame:
    """(d, cell, n): the sketch as a relation — one row per non-empty
    cell, ≤ depth × width rows total."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cell(F.col(key_col), d, width).alias("cell"),
                )
                for d in range(int(depth))
            ]
        )
    ).alias("rc")
    return (
        items.select(rows)
        .groupBy(F.col("rc.d").alias("d"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_estimate(sketch: DataFrame, probes: DataFrame, width: int = 2048,
                depth: int = 4, key_col: str = "key") -> DataFrame:
    """(key, est): point estimates for the probe keys — min over the
    depth rows; a key whose cell is empty in some row estimates 0
    (impossible for keys that were counted, exact for absent ones
    whose cells saw no collisions)."""
    per_row = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col(key_col), d, width).alias("cell"),
                    )
                    for d in range(int(depth))
                ]
            )
        ).alias("rc"),
    ).select(key_col, F.col("rc.d").alias("d"), F.col("rc.cell").alias("cell"))
    return (
        per_row.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def cm_heavy_hitters(items: DataFrame, probes: DataFrame,
                     key_col: str = "key", width: int = 2048,
                     depth: int = 4) -> DataFrame:
    """(key, est, exact): sketch estimates side-by-side with the exact
    counts for the probe set — the calibration view (est ≥ exact
    always; the gap is the collision cost of the chosen width)."""
    sk = cm_build(items, key_col, width, depth)
    est = cm_estimate(sk, probes, width, depth, key_col)
    exact = items.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact"))
    return (
        est.join(exact, key_col, "left")
        .select(
            key_col, "est", F.coalesce(F.col("exact"), F.lit(0)).alias("exact")
        )
    )


def _hll_params(p: int) -> tuple[int, int, int]:
    """(m, W, NUM): bucket count, remainder bit width, and the exact
    integer numerator ``alpha_ppm · m² · 2^(W+1)`` — computed ONCE in
    Python and injected as the same literal on both engines, so the
    only runtime arithmetic is integer sum + one integer division."""
    m = 1 << p
    w = 60 - p
    alpha_ppm = int(1_000_000 * 0.7213 / (1 + 1.079 / m))
    return m, w, alpha_ppm * m * m * (1 << (w + 1))


def hll_distinct(items: DataFrame, key_col: str = "key",
                 group_col: str = "grp", p: int = 10) -> DataFrame:
    """(group, est, exact, n_zero_buckets): HyperLogLog distinct-count
    estimate per group (Flajolet et al. 2007) next to the exact
    distinct for calibration.

    Determinism contract (the count-min discipline): the 60-bit hash
    is the md5 prefix, bucket = top ``p`` bits, and the register rank
    is derived from ``bin()``'s string length — integer/string ops
    only, no float ``log2`` whose last-ulp could flip a register.
    The estimate itself is one exact integer division
    ``NUM div (S · 10^6)`` where ``S = Σ 2^((W+1) - M_j)`` over all m
    registers (empty registers contribute ``2^(W+1)``) — byte-exact in
    DuckDB, no IEEE chain at all.  The small-range linear-counting
    correction needs ``ln`` (not cross-engine exact), so it is NOT
    folded in; ``n_zero_buckets`` is emitted for callers who want it.

    Scale shape: one map-side-combining max per (group, bucket) —
    state bounded by groups × m regardless of corpus size — then a
    per-group sum over ≤ m rows.  The exact side is the usual
    count-distinct (itself a two-phase agg); at true 100 TB scale a
    user runs the sketch ALONE and skips that column."""
    m, w, num = _hll_params(p)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col(key_col))), 1, 15),
        16, 10,
    ).cast("long")
    bucket = F.shiftright(h, w)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    rank = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(rem)) + F.lit(1)
    )
    regs = (
        items.select(F.col(group_col).alias("grp"), bucket.alias("bucket"),
                     rank.alias("rank"))
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("mx"))
    )
    # SQL form: pyspark's shiftleft only takes a literal int bit count
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - mx)")
    per_group = regs.groupBy("grp").agg(
        F.sum(pow2).alias("s_present"),
        F.count(F.lit(1)).alias("v_used"),
    )
    s = (
        F.col("s_present")
        + (F.lit(m) - F.col("v_used")) * F.lit(1 << (w + 1)).cast("long")
    )
    est = F.expr(
        f"CAST({num} AS DECIMAL(38,0))"
        " div (CAST(_sg_s AS DECIMAL(38,0)) * 1000000)"
    )
    ests = per_group.withColumn("_sg_s", s).select(
        "grp",
        est.alias("est"),
        (F.lit(m) - F.col("v_used")).cast("long").alias("n_zero_buckets"),
    )
    exact = items.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(F.col(key_col)).alias("exact")
    )
    return ests.join(exact, "grp").select(
        "grp", "est", "exact", "n_zero_buckets"
    )


def hll_distinct_sql(items_rel: str, p: int = 10) -> str:
    """The SAME registers and integer estimate in ANSI SQL over a
    relation exposing (grp, key)."""
    m, w, num = _hll_params(p)
    return (
        "WITH h AS (SELECT grp,"
        " ('0x' || substr(md5('hll|' || key), 1, 15))::BIGINT AS hv"
        f" FROM {items_rel}),"
        f" r AS (SELECT grp, hv >> {w} AS bucket,"
        f" CASE WHEN (hv & {(1 << w) - 1}) = 0 THEN {w + 1}"
        f" ELSE {w} - length(bin(hv & {(1 << w) - 1})) + 1 END AS rank"
        " FROM h),"
        " regs AS (SELECT grp, bucket, max(rank) AS mx FROM r"
        "  GROUP BY 1, 2),"
        " pg AS (SELECT grp,"
        f" CAST(sum(1::BIGINT << ({w + 1} - mx)) AS BIGINT) AS s_present,"
        " count(*) AS v_used FROM regs GROUP BY 1),"
        f" ests AS (SELECT grp, CAST({num}::HUGEINT //"
        f" ((s_present + ({m} - v_used) * {1 << (w + 1)}::BIGINT)::HUGEINT"
        " * 1000000) AS BIGINT) AS est,"
        f" CAST({m} - v_used AS BIGINT) AS n_zero_buckets FROM pg),"
        f" ex AS (SELECT grp, CAST(count(DISTINCT key) AS BIGINT) AS exact"
        f" FROM {items_rel} GROUP BY 1)"
        " SELECT ests.grp, est, exact, n_zero_buckets"
        " FROM ests JOIN ex ON ests.grp = ex.grp"
    )


def cm_heavy_hitters_sql(items_rel: str, probes_rel: str,
                         key_expr: str = "key", width: int = 2048,
                         depth: int = 4) -> str:
    """The SAME build + estimate + exact-count comparison in ANSI SQL
    over relations exposing a ``key`` column."""
    cells = " UNION ALL ".join(
        f"SELECT {d} AS d, {_cell_sql('key', d, width)} AS cell, key"
        f" FROM {items_rel}"
        for d in range(int(depth))
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT key, {d} AS d, {_cell_sql('key', d, width)} AS cell"
        f" FROM {probes_rel}"
        for d in range(int(depth))
    )
    return (
        f"WITH sk AS (SELECT d, cell, CAST(count(*) AS BIGINT) AS n"
        f" FROM ({cells}) GROUP BY 1, 2),"
        f" pc AS ({probe_cells}),"
        " est AS (SELECT pc.key, CAST(min(coalesce(sk.n, 0)) AS BIGINT)"
        "  AS est FROM pc LEFT JOIN sk ON pc.d = sk.d AND pc.cell = sk.cell"
        "  GROUP BY 1),"
        f" ex AS (SELECT key, CAST(count(*) AS BIGINT) AS exact"
        f"  FROM {items_rel} GROUP BY 1)"
        " SELECT est.key, est.est,"
        " CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact"
        " FROM est LEFT JOIN ex ON est.key = ex.key"
    )
