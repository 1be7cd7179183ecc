"""Corpus column profiling (ops/profile.py) vs a pure-Python twin,
null/empty corner cases, approx-distinct mode, and guards."""

from __future__ import annotations

import pytest

from sagan_spark.ops.profile import profile_columns

ROWS = [
    (1, "hello", "en"),
    (2, "", "en"),
    (3, None, "fr"),
    (4, "wide text", None),
    (5, "hello", "en"),
]
SCHEMA = "id long, txt string, lang string"


def _twin(rows, cols, idx):
    out = {}
    for c in cols:
        vals = [r[idx[c]] for r in rows]
        sval = [None if v is None else str(v) for v in vals]
        nonnull = [s for s in sval if s is not None]
        out[c] = {
            "n_rows": len(rows),
            "n_null": sum(v is None for v in vals),
            "n_empty": sum(s == "" for s in nonnull),
            "n_distinct": len(set(v for v in vals if v is not None)),
            "len_min": min((len(s) for s in nonnull), default=None),
            "len_max": max((len(s) for s in nonnull), default=None),
            "len_avg_milli": (
                (sum(len(s) for s in nonnull) * 1000) // len(nonnull)
                if nonnull else None
            ),
        }
    return out


def test_profile_matches_python_twin(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.col_name: r.asDict() for r in profile_columns(df).collect()}
    want = _twin(ROWS, ["id", "txt", "lang"], {"id": 0, "txt": 1, "lang": 2})
    for c, w in want.items():
        for k, v in w.items():
            assert got[c][k] == v, (c, k, got[c][k], v)


def test_profile_all_null_column(spark):
    rows = [(1, None), (2, None)]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.col_name: r for r in profile_columns(df, ["t"]).collect()}
    r = got["t"]
    assert (r.n_null, r.n_distinct) == (2, 0)
    assert r.len_min is None and r.len_max is None
    assert r.len_avg_milli is None


def test_profile_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS * 20, SCHEMA)
    a = sorted(map(tuple, profile_columns(df).collect()))
    b = sorted(map(tuple, profile_columns(df.repartition(16)).collect()))
    assert a == b


def test_profile_approx_mode_shape(spark):
    """approx_count_distinct keeps the schema and is exact at tiny
    cardinalities (HLL++ is exact below its sparse threshold)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.col_name: r.n_distinct
           for r in profile_columns(df, exact_distinct=False).collect()}
    assert got == {"id": 5, "txt": 3, "lang": 2}


def test_profile_guards(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        profile_columns(df, [])
    with pytest.raises(ValueError):
        profile_columns(df, ["nope"])


def test_shard_checksums_order_insensitive_and_sensitive_to_content(spark):
    from sagan_spark.ops.profile import shard_checksums

    rows = [(1, "a"), (2, "b"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        r.shard: (r.n_rows, r.checksum)
        for r in shard_checksums(df, n_shards=4).collect()
    }
    # partitioning / row order never changes the manifest
    again = {
        r.shard: (r.n_rows, r.checksum)
        for r in shard_checksums(df.repartition(5), n_shards=4).collect()
    }
    assert base == again
    # a one-character content change changes it
    df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, None)],
                                "doc_id long, text string")
    changed = {
        r.shard: (r.n_rows, r.checksum)
        for r in shard_checksums(df2, n_shards=4).collect()
    }
    assert base != changed
    # NULL is distinct from empty string
    df3 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "")],
                                "doc_id long, text string")
    null_vs_empty = {
        r.shard: (r.n_rows, r.checksum)
        for r in shard_checksums(df3, n_shards=4).collect()
    }
    assert base != null_vs_empty

    import pytest as _pytest
    with _pytest.raises(ValueError):
        shard_checksums(df, n_shards=0)


def test_shard_checksums_injective_rendering(spark):
    """The ADVICE-r4 ambiguity: values containing the 0x1f separator
    (or the old 0x00 NULL sentinel) must not let distinct rows render
    to the same digest — the length prefix keeps the manifest's
    collision bound at the documented 60-bit one."""
    from sagan_spark.ops.profile import shard_checksums

    def manifest(rows):
        df = spark.createDataFrame(rows, "a string, b string")
        return sorted(
            (r.shard, r.n_rows, r.checksum)
            for r in shard_checksums(df, n_shards=1).collect()
        )

    assert manifest([("a\x1fb", "c")]) != manifest([("a", "b\x1fc")])
    # NULL vs the old 0x00 sentinel string, and NULL vs 'N' literal
    assert manifest([(None, "x")]) != manifest([("\x00", "x")])
    assert manifest([(None, "x")]) != manifest([("N", "x")])
    # empty string is still distinct from NULL
    assert manifest([("", "x")]) != manifest([(None, "x")])
