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
