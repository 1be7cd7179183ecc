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
