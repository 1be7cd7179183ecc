"""SURT key + shard census: hand-pinned key forms (label reversal,
www-strip, path lowering, no-authority NULL), and the md5 shard
assignment replayed by a hashlib twin."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sagan_spark.ops.urltools import surt_shard_census, url_surt

CASES = [
    ("https://www.News.Example.co.uk/A/b", "uk,co,example,news)/a/b"),
    ("https://example.com", "com,example)/"),
    ("http://sub.a.org:8080/X?q=1#f", "org,a,sub)/x"),
    ("https://www.com/", "com)/"),              # www is a full label strip
    ("mailto:user@example.com", None),          # no authority
    ("https://example.com/%7Euser/Page", "com,example)/%7euser/page"),
]


def test_url_surt_hand_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(url_surt(F.col("url"))).collect()]
    assert got == [want for _, want in CASES]


def _py_surt(u: str):
    import re
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", u)
    if not m:
        return None
    host = m.group(1).lower()
    host = re.sub(r"^www\.", "", host)
    pm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = pm.group(1) if pm else ""
    return ",".join(reversed(host.split("."))) + ")" + (path.lower() or "/")


def test_shard_census_matches_hashlib_twin(spark):
    urls = [u for u, _ in CASES] + [f"https://site{i}.net/p/{i}" for i in range(40)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["shard"]: (r["n_urls"], r["surt_min"], r["surt_max"])
           for r in surt_shard_census(df, n_shards=4).collect()}
    want: dict[int, list] = {}
    for u in urls:
        s = _py_surt(u)
        sh = -1 if s is None else (
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 4)
        want.setdefault(sh, []).append(s)
    exp = {sh: (len(v),
                min((x for x in v if x is not None), default=None),
                max((x for x in v if x is not None), default=None))
           for sh, v in want.items()}
    assert got == exp
    assert -1 in got and got[-1][1] is None   # reject bucket, NULL fences
    assert sum(n for n, _, _ in got.values()) == len(urls)


def test_shard_census_plan_is_one_partial_agg(spark):
    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = surt_shard_census(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan
