"""chunk_documents: RAG-style overlapping chunks.  Python twin over
hand texts; edge cases pin the one-chunk short doc, exact-multiple
lengths (no empty trailing chunk), empty text (no chunks), overlap
coverage (every char in >= 1 chunk), and scan-level plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.ops.packing import chunk_documents


def _py_chunks(text, w, o):
    s = w - o
    if not text:
        return []
    n = 1 if len(text) <= w else 1 + -(-(len(text) - w) // s)
    return [(i, i * s, text[i * s:i * s + w]) for i in range(n)]


@pytest.mark.parametrize("w,o", [(8, 3), (5, 0), (10, 9)])
def test_chunks_match_python_twin(spark, w, o):
    texts = ["", "ab", "abcdefgh", "abcdefghi", "a" * 23, "xyz" * 11]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["char_start"], r["chunk"])
        for r in chunk_documents(df, chunk_chars=w, overlap=o).collect()
    )
    want = sorted(
        (i, cid, start, chunk)
        for i, t in rows
        for cid, start, chunk in _py_chunks(t, w, o)
    )
    assert got == want
    # coverage: every character of every doc appears in >= 1 chunk
    for i, t in rows:
        covered = set()
        for _, start, chunk in _py_chunks(t, w, o):
            covered.update(range(start, start + len(chunk)))
        assert covered == set(range(len(t)))


def test_chunks_exact_multiple_no_empty_tail(spark):
    # len == W + k*S exactly: the last chunk is full-width, no empty tail
    df = spark.createDataFrame([(1, "a" * 14)], "doc_id long, text string")
    got = chunk_documents(df, chunk_chars=8, overlap=2).collect()
    assert [(r["chunk_id"], r["chunk_len"]) for r in sorted(
        got, key=lambda r: r["chunk_id"])] == [(0, 8), (1, 8)]


def test_chunks_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=8, overlap=8)


def test_chunks_plan_scan_level(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = (chunk_documents(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
