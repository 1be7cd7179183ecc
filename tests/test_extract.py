"""Parse_IP / Parse_Hash / JSON flatten unit zoo.

Expected values derived from the reference's documented token forms
(reference src/parsers/ip.c:33-61) and scrub/tokenize semantics
(src/parsers/ip.c:135-163), hash rules (src/parsers/hash.c:41-153),
JSON flatten (src/parsers/json.c:40-134).
"""

from sagan_spark.functions.extract import json_flatten, parse_hash, parse_ip


def ips(msg):
    hits, proto = parse_ip(msg)
    return [(h.ip, h.port) for h in hits], proto


def test_standalone_ipv4():
    assert ips("connect from 192.168.2.1 done")[0] == [("192.168.2.1", 514)]


def test_trailing_period():
    assert ips("bad host 192.168.2.1.")[0] == [("192.168.2.1", 514)]


def test_quoted_and_bracketed():
    # scrub chars " ( ) [ ] -> space (src/parsers/ip.c:138-148)
    assert ips('x "192.168.2.1" y (10.0.0.5)')[0] == [
        ("192.168.2.1", 514),
        ("10.0.0.5", 514),
    ]


def test_colon_port():
    assert ips("from 192.168.2.1:1234 ok")[0] == [("192.168.2.1", 1234)]


def test_hash_port():
    assert ips("from 192.168.2.1#1234 ok")[0] == [("192.168.2.1", 1234)]


def test_inet_hash_ip():
    assert ips("via inet#192.168.2.1 ok")[0] == [("192.168.2.1", 514)]


def test_port_word():
    assert ips("192.168.2.1 port 1234")[0] == [("192.168.2.1", 1234)]


def test_source_port_windows_style():
    assert ips("192.168.2.1 source port: 1234")[0] == [("192.168.2.1", 1234)]
    assert ips("192.168.2.1 destination port 1234")[0] == [("192.168.2.1", 1234)]
    assert ips("192.168.2.1 client port: 1234")[0] == [("192.168.2.1", 1234)]


def test_standalone_ipv6():
    assert ips("from fe80::b614:89ff:fe11:5e24 ok")[0] == [
        ("fe80::b614:89ff:fe11:5e24", 514)
    ]


def test_ipv6_bracket_port_form():
    # '[' ']' and ':' scrub: "[v6]:80" -> token "fe80::..." + token ":80";
    # the v6 is found, the traditional port is NOT recovered (scrub kills it)
    got, _ = ips("login from [fe80::b614:89ff:fe11:5e24]:8080 accepted")
    assert got[0][0] == "fe80::b614:89ff:fe11:5e24"


def test_v4_mapped_normalization():
    got, _ = ips("src ::ffff:10.1.2.3 seen")
    assert got == [("10.1.2.3", 514)]


def test_proto_tokens():
    assert ips("drop tcp from 1.2.3.4")[1] == 6
    assert ips("drop udp x")[1] == 17
    assert ips("drop ICMP x")[1] == 1


def test_positional_order_and_multiple():
    got, proto = ips("connection from 192.168.1.10:22 to 172.16.0.5#443 proto tcp")
    assert got == [("192.168.1.10", 22), ("172.16.0.5", 443)]
    assert proto == 6


def test_not_an_ip():
    assert ips("version 1.2.3 build 4.5")[0] == []
    assert ips("1.2.3.4.5 is too dotty")[0] == []


def test_parse_hash_md5():
    h = "d41d8cd98f00b204e9800998ecf8427e"
    assert parse_hash(f"hash {h} found", "md5") == h
    # quoted: scrub makes it a clean token
    assert parse_hash(f'hash "{h}" found', "md5") == h
    # glued to a period: stays in token, fails hex check (no '.' scrub)
    assert parse_hash(f"hash {h}.exe found", "md5") == ""
    # wrong length
    assert parse_hash(f"hash {h[:-1]} found", "md5") == ""


def test_parse_hash_sha256():
    h = "a" * 64
    assert parse_hash(f"x {h} y", "sha256") == h
    assert parse_hash(f"x {h} y", "md5") == ""


# --- two-tier batch Parse_IP parity (udfs.parse_ip_batch) -------------------

ZOO = [
    "connect from 192.168.2.1 done",
    "bad host 192.168.2.1.",
    'x "192.168.2.1" y (10.0.0.5)',
    "from 192.168.2.1:1234 ok",
    "from 192.168.2.1#1234 ok",
    "via inet#192.168.2.1 ok",
    "192.168.2.1 port 1234",
    "192.168.2.1 source port: 1234",
    "192.168.2.1 destination port 1234",
    "192.168.2.1 client port: 1234",
    "from fe80::b614:89ff:fe11:5e24 ok",
    "login from [fe80::b614:89ff:fe11:5e24]:8080 accepted",
    "src ::ffff:10.1.2.3 seen",
    "drop tcp from 1.2.3.4",
    "drop udp x",
    "drop ICMP x",
    "connection from 192.168.1.10:22 to 172.16.0.5#443 proto tcp",
    "version 1.2.3 build 4.5",
    "1.2.3.4.5 is too dotty",
    "eth0:10.0.0.9 up",
    "10.0.0.1:",
    "10.0.0.1:99999",                       # atoi mod 2^16
    "10.0.0.1:4294967296",                  # 10 digits, & 0xFFFF
    "10.0.0.1:99999999999999999999",        # 20 digits -> tier-2 marker
    "10.0.0.1:56abc trailing junk port",
    "01.2.3.4 leading zero octet",
    "256.1.1.1 out of range",
    "0.0.0.0 all zero",
    "a 10.0.0.1\t5 tab inside token",
    "::1 two-colon v6 yields nothing",
    "12:34:56 timestamp",
    "Jan  1 03:15:07 host sshd[99]: Failed login from 203.0.113.9 port 2222 ssh2",
    "tcp and udp both: last wins",
    "",
    None,
    "1.2.3.4.",
    ".1.2.3.4",
    "x:1.2.3.4extra",
    "sources 10.9.8.7 no lookahead word boundary",  # contains 'source' but not 'port'
    "1.2 3.4 5.6.7.8 cross-token dot triple",       # dot-probe gate edge
    "1.2 3.4.5.6.7.8 too dotty after span",
    "v1.2.3.4 was tagged 1.2.3.4.5.6 and 9.8.7.6 shipped",
    "x.y.z.w letters 10.0.0.300 bad octet 10.0.0.30 good",
    "connexion depuis 10.0.0.1 réussie",            # non-ASCII -> tier 2
    "2026:03:14:07 hexish timestamp stays fast 7.7.7.7",
    "full form 2001:0db8:0000:0000:0000:8a2e:0370:7334 v6",
    "mapped 0:0:0:0:0:ffff:1.2.3.4 six colons",
    '{"src": "2001:db8::1"} seen 10.9.9.9 ok',   # mid-token '::' (regression)
    "2001:db8::1 compressed v6 with group before double colon",
    "x:2001::1 not v6 shaped but over-marking is safe",
]


def scalar_row(msg):
    from sagan_spark.functions.extract import int_to_biased_hilo

    hits, proto = parse_ip(msg if msg is not None else "")
    return (
        [
            {"ip": h.ip, "port": h.port, **dict(zip(("hi", "lo"), int_to_biased_hilo(h.ip_int)))}
            for h in hits
        ],
        proto,
    )


def test_parse_ip_batch_matches_scalar_zoo():
    import pandas as pd

    from sagan_spark.functions.udfs import parse_ip_batch

    ips_s, proto_s = parse_ip_batch(pd.Series(ZOO, dtype=object))
    for i, msg in enumerate(ZOO):
        want_hits, want_proto = scalar_row(msg)
        assert list(ips_s.iloc[i]) == want_hits, (i, msg)
        assert int(proto_s.iloc[i]) == want_proto, (i, msg)


def test_parse_ip_batch_matches_scalar_fuzz():
    """Randomized composition of the reference's token forms — tier
    assignment (vectorized vs token walk) must never change results."""
    import random

    import pandas as pd

    from sagan_spark.functions.udfs import parse_ip_batch

    rng = random.Random(20260818)
    atoms = [
        "10.{}.{}.{}", "255.255.255.{}", "0.0.0.{}", "{}.{}.{}.{}",
        "192.168.1.{}:22", "192.168.1.{}:{}", "10.0.0.{}#443",
        "fe80::b614:89ff:fe11:5e{:02x}", "::ffff:10.1.2.{}", "eth{}:10.1.1.{}",
        "2001:db8::{}", "2001:db8:0:1::{:x}",
        "10.0.0.{}.", "port", "source", "destination", "client", "tcp",
        "udp", "icmp", "x", "login", "from", "(", ")", "[", "]", '"',
        "12:34:5{}", "::1", "1.2.3", "1.2.3.4.5", "01.2.3.{}", "256.1.1.{}",
        "{}", "#", ":", "=",
    ]
    msgs = []
    for _ in range(500):
        n = rng.randint(1, 12)
        parts = []
        for _ in range(n):
            a = rng.choice(atoms)
            parts.append(a.format(*[rng.randint(0, 299) for _ in range(a.count("{"))]))
        msgs.append(" ".join(parts))
    ips_s, proto_s = parse_ip_batch(pd.Series(msgs, dtype=object))
    for i, msg in enumerate(msgs):
        want_hits, want_proto = scalar_row(msg)
        assert list(ips_s.iloc[i]) == want_hits, msg
        assert int(proto_s.iloc[i]) == want_proto, msg


def test_json_flatten_dotted_keys():
    m = '{"a": 1, "b": {"c": "x", "d": {"e": true}}}'
    flat = json_flatten(m)
    assert flat[".a"] == "1"
    assert flat[".b.c"] == "x"
    assert flat[".b.d.e"] == "true"
    # nested object also present stringified at its own key
    assert ".b" in flat and '"c"' in flat[".b"]


def test_json_flatten_requires_early_brace():
    assert json_flatten("no json here {\"a\": 1}") == {}
    assert json_flatten(' {"a": 1}')[".a"] == "1"


def test_json_flatten_null_and_numbers():
    flat = json_flatten('{"n": null, "f": 1.5, "s": "v"}')
    assert flat[".n"] == "null"
    assert flat[".f"] == "1.5"
    assert flat[".s"] == "v"
