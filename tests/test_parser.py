"""Rule parser unit tests (grammar per reference src/rules.c:102-4125)."""

from sagan_spark.rules.parser import parse_rule, parse_rules


RULE = (
    'alert tcp [10.0.0.0/8,!10.1.0.0/16] 1:1024 -> any !22 '
    '(msg:"test rule"; program: sshd|ssh*; content:"Failed password"; offset: 7; '
    'depth: 12; nocase; content:!"gibberish"; pcre:"/fail.*ssh2/i"; '
    'meta_content:"for %sagan%",admin,root; event_id: 4625|4648; '
    'parse_src_ip: 1; parse_hash: md5; default_proto: tcp; default_dst_port: 22; '
    'threshold: type limit, track by_src&by_username, count 3, seconds 120; '
    'alert_time: days 12345, hours 0800-1700; '
    'xbits: set, name brute, track ip_src, expire 5m; '
    'classtype: attempted-recon; reference: url,example.com; sid:5000001; rev:2;)'
)


def test_header():
    r = parse_rule(RULE)
    assert r.action == "alert"
    assert r.flow.proto == 6
    assert len(r.flow.src_nets) == 2
    assert r.flow.src_nets[0].negated is False
    assert r.flow.src_nets[1].negated is True
    assert r.flow.src_ports[0].lo == 1 and r.flow.src_ports[0].hi == 1024
    assert r.flow.dst_ports[0].negated and r.flow.dst_ports[0].lo == 22


def test_contents_and_modifiers():
    r = parse_rule(RULE)
    assert len(r.contents) == 2
    c0, c1 = r.contents
    assert c0.literal == "failed password"  # nocase lowers at load (rules.c:2830)
    assert c0.offset == 7 and c0.depth == 12 and c0.nocase
    assert c1.negated and c1.literal == "gibberish"


def test_pcre_meta_event_id():
    r = parse_rule(RULE)
    assert r.pcres[0].pattern == "fail.*ssh2" and r.pcres[0].flags == "i"
    assert r.meta_contents[0].literals == ["for admin", "for root"]
    assert r.event_ids == ["4625", "4648"]


def test_correlation_and_misc():
    r = parse_rule(RULE)
    assert r.threshold.ttype == "limit"
    assert r.threshold.track == ["by_src", "by_username"]
    assert r.threshold.count == 3 and r.threshold.seconds == 120
    assert r.xbits[0].action == "set" and r.xbits[0].expire == 300
    assert r.parse_src_ip_pos == 1 and r.parse_hash == "md5"
    assert r.default_proto == 6 and r.default_dst_port == 22
    assert r.alert_time.days == {1, 2, 3, 4, 5}
    assert r.alert_time.start == 800 and r.alert_time.end == 1700
    assert r.sid == 5000001 and r.rev == 2
    assert r.classtype == "attempted-recon"
    assert r.programs == ["sshd", "ssh*"]


def test_hex_pipe_decode():
    r = parse_rule('alert any any any -> any any (msg:"h"; content:"a|3a 3c|b"; sid:1;)')
    assert r.contents[0].literal == "a:<b"


def test_var_expansion():
    r = parse_rule(
        'alert any $HOME_NET any -> any any (msg:"v"; meta_content:"u %sagan%",$USERS; sid:2;)',
        {"HOME_NET": "[10.0.0.0/8]", "USERS": "a,b"},
    )
    assert len(r.flow.src_nets) == 1
    assert r.meta_contents[0].literals == ["u a", "u b"]


def test_ruleset_file_and_pass():
    text = (
        '# comment\n\n'
        'pass any any any -> any any (msg:"p"; content:"x"; sid:10;)\n'
        'alert any any any -> any any (msg:"a"; content:"x"; sid:11;)\n'
    )
    rules = parse_rules(text)
    assert [r.sid for r in rules] == [10, 11]
    assert rules[0].action == "pass" and rules[0].position == 0
    assert rules[1].position == 1
