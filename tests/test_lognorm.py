"""liblognorm .rulebase loader -> grok patterns (P6 normalize stage;
reference src/liblognormalize.c:105-260 loads the same files)."""

from __future__ import annotations

import pytest

from sagan_spark.functions.lognorm import load_rulebase

# shapes taken from the public liblognorm documentation's sample rules
RULEBASE = """\
version=2
# sshd auth failures
rule=ssh,auth:%date:date-rfc3164% %host:word% sshd[%pid:number%]: Failed password for %user:word% from %src-ip:ipv4% port %src-port:number% ssh2
rule=dns:named[%pid:number%]: client %client:char-to:#%#%port:number%: query: %query:word% IN %rtype:word%
rule=web:%src-ip:ipv4% - %-:word% "%request:char-to:"%" %status:number% %bytes:number%
rule=pct:load at %pct:number%%% of capacity
rule=rest:%head:word% %tail:rest%
"""

LINES = [
    (
        "Jan  7 03:17:07 bastion sshd[991]: Failed password for root "
        "from 203.0.113.9 port 51234 ssh2",
        {"date": "Jan  7 03:17:07", "user": "root",
         "src_ip": "203.0.113.9", "src_port": "51234",
         "host": "bastion", "pid": "991"},
    ),
    (
        "named[4117]: client 10.2.3.4#53412: query: example.com IN A",
        {"pid": "4117", "client": "10.2.3.4", "port": "53412",
         "query": "example.com", "rtype": "A"},
    ),
    (
        '198.51.100.7 - frank "GET /x HTTP/1.0" 200 2326',
        {"src_ip": "198.51.100.7", "request": "GET /x HTTP/1.0",
         "status": "200", "bytes": "2326"},
    ),
    ("load at 93% of capacity", {"pct": "93"}),
    ("alpha the rest of it", {"head": "alpha", "tail": "the rest of it"}),
    # single token: even the word+rest catch-all needs a space
    ("nomatchhere!!!", {}),
]


def test_load_rulebase_shapes():
    rb = load_rulebase(RULEBASE)
    assert len(rb.patterns) == 5
    assert rb.tags[0] == ["ssh", "auth"]
    assert rb.tags[1] == ["dns"]
    # discard field ('-') never becomes an output column
    assert "-" not in rb.fields() and "f_" not in rb.fields()
    assert "src_ip" in rb.fields()  # sanitized from src-ip


def test_rulebase_extract_vs_expected(spark):
    rb = load_rulebase(RULEBASE)
    df = spark.createDataFrame(
        [(i, line) for i, (line, _) in enumerate(LINES)], "id long, msg string"
    )
    out = {r.id: r.asDict() for r in rb.extract(df, "msg").collect()}
    for i, (_, want) in enumerate(LINES):
        row = out[i]
        for fld in rb.fields():
            got = row.get(f"grok_{fld}")
            assert got == want.get(fld), (i, fld, got, want.get(fld))


def test_prefix_directive(spark):
    rb = load_rulebase(
        "version=2\n"
        "prefix=%date:date-rfc3164% %host:word% \n"
        "rule=:kernel: OOM killed pid %pid:number%\n"
    )
    df = spark.createDataFrame(
        [(1, "Jan  7 03:17:07 web1 kernel: OOM killed pid 4412")],
        "id long, msg string",
    )
    row = rb.extract(df, "msg").collect()[0]
    assert row.grok_pid == "4412"
    assert row.grok_host == "web1"


def test_loader_rejects_bad_lines():
    with pytest.raises(ValueError, match="unsupported liblognorm type"):
        load_rulebase("rule=:x %f:no-such-type% y\n")
    with pytest.raises(ValueError, match="unterminated"):
        load_rulebase("rule=:x %f:word y\n")
    with pytest.raises(ValueError, match="unrecognized directive"):
        load_rulebase("rulez=broken\n")
