"""P6 grok/normalize extraction (reference src/liblognormalize.c:105-260)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sagan_spark.functions.grok import grok_extract, grok_fields, grok_to_regex

RULEBASE = [
    "Failed password for %{USER:username} from %{IPV4:src_ip} port %{INT:src_port}",
    "connection from %{IPV4:src_ip}:%{INT:src_port} to %{IPV4:dst_ip}",
    "user %{USER:username} logged out",
]


def test_grok_to_regex_compiles():
    rx = grok_to_regex(RULEBASE[0])
    m = re.search(rx, "Failed password for admin from 10.1.2.3 port 4711 ssh2")
    assert m and m.group("username") == "admin"
    assert m.group("src_ip") == "10.1.2.3"
    assert m.group("src_port") == "4711"


def test_grok_fields_union_order():
    assert grok_fields(RULEBASE) == ["username", "src_ip", "src_port", "dst_ip"]


def test_grok_extract_first_match_wins(spark):
    rows = [
        ("a", "Failed password for root from 10.0.0.1 port 22 ssh2"),
        ("b", "connection from 192.168.1.2:1024 to 172.16.0.9 proto tcp"),
        ("c", "user carol logged out"),
        ("d", "no pattern matches this line"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = {r.id: r for r in grok_extract(df, "text", RULEBASE).collect()}
    assert out["a"].grok_username == "root"
    assert out["a"].grok_src_ip == "10.0.0.1"
    assert out["b"].grok_src_ip == "192.168.1.2"
    assert out["b"].grok_dst_ip == "172.16.0.9"
    assert out["c"].grok_username == "carol"
    assert out["d"].grok_src_ip is None and out["d"].grok_username is None


def test_grok_vectorized_no_row_python(spark):
    # 10k rows through the Arrow batch path, sanity on counts
    df = spark.range(10000).select(
        F.concat(F.lit("connection from 10.0.0."), (F.col("id") % 250).cast("string"),
                 F.lit(":80 to 10.1.1.1")).alias("text")
    )
    got = grok_extract(df, "text", RULEBASE).filter(F.col("grok_dst_ip") == "10.1.1.1").count()
    assert got == 10000
