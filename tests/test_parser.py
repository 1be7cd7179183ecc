"""Rule parser unit tests (grammar per reference src/rules.c:102-4125)."""

import pytest

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


def test_syslog_option_spellings():
    # reference spellings (src/rules.c:2651,2680,2693,2706) and the short
    # aliases both land in the same IR fields
    r = parse_rule(
        'alert any any any -> any any (msg:"s"; syslog_facility: daemon|auth;'
        " syslog_level: info; syslog_tag: 2d; syslog_priority: alert|crit;"
        " sid:20;)"
    )
    assert r.facilities == ["daemon", "auth"]
    assert r.levels == ["info"]
    assert r.tags == ["2d"]
    assert r.syslog_priorities == ["alert", "crit"]
    r2 = parse_rule(
        'alert any any any -> any any (msg:"s"; facility: daemon; level: info; tag: 2d; sid:21;)'
    )
    assert r2.facilities == ["daemon"] and r2.levels == ["info"] and r2.tags == ["2d"]


def test_event_type_program_alias_and_pri():
    r = parse_rule(
        'alert any any any -> any any (msg:"e"; event_type: sshd|su; pri: 2; sid:22;)'
    )
    assert r.programs == ["sshd", "su"]
    assert r.priority == 2


def test_json_contains_modifier():
    r = parse_rule(
        'alert any any any -> any any (msg:"j"; json_content: ".k","v";'
        " json_contains; sid:23;)"
    )
    assert r.json_contents[0].strstr is True


def test_json_meta_contains_modifier():
    r = parse_rule(
        'alert any any any -> any any (msg:"j"; json_meta_content: ".k","t %sagan%",a,b;'
        " json_meta_contains; sid:24;)"
    )
    assert r.json_meta_contents[0].strstr is True
    # default is exact-equality (strcmp)
    r2 = parse_rule(
        'alert any any any -> any any (msg:"j"; json_meta_content: ".k","t %sagan%",a; sid:25;)'
    )
    assert r2.json_meta_contents[0].strstr is False


def test_parse_port_external_email_pauses():
    r = parse_rule(
        'alert any any any -> any any (msg:"x"; parse_port; external: /bin/cat;'
        " email: soc@example.com; flexbits_pause: 5; xbits_upause: 7; sid:26;)"
    )
    assert r.parse_port is True
    assert r.external_program == "/bin/cat"
    assert r.email == "soc@example.com"
    assert r.flexbit_pause == 5 and r.xbit_upause == 7


def test_bluedot_ip_reputation():
    r = parse_rule(
        'alert any any any -> any any (msg:"b"; bluedot: type ip_reputation,'
        " track by_src, mdate_effective_period 1 month, Malicious&Tor; sid:27;)"
    )
    assert r.bluedot is not None
    assert r.bluedot.btype == "ip_reputation"
    assert r.bluedot.track == "by_src"
    assert r.bluedot.mdate_period == 2592000
    assert r.bluedot.categories == ["malicious", "tor"]


def test_bluedot_file_hash():
    r = parse_rule(
        'alert any any any -> any any (msg:"b"; bluedot: type file_hash, Malicious; sid:28;)'
    )
    assert r.bluedot.btype == "file_hash"
    assert r.bluedot.categories == ["malicious"]


def test_strict_mode_unknown_option():
    bad = 'alert any any any -> any any (msg:"u"; totally_bogus: 1; sid:29;)'
    with pytest.raises(ValueError, match="totally_bogus"):
        parse_rule(bad)
    r = parse_rule(bad, strict=False)
    assert r.unknown_options == ["totally_bogus"]


def test_ignorable_options_pass_strict():
    r = parse_rule(
        'alert any any any -> any any (msg:"m"; metadata: x y; normalize;'
        " offload: http://x/; sid:30;)"
    )
    assert r.sid == 30 and not r.unknown_options


def test_valid_rule_options_all_accepted_strict():
    """Every name in the reference's VALID_RULE_OPTIONS
    (src/rules.h:25) must parse under strict mode."""
    rule = (
        'alert tcp any any -> any any ('
        'msg:"all options"; sid:31; rev:2; pri: 1; classtype: misc-activity; '
        'reference: url,example.com; program: a|b; event_type: c; '
        'syslog_tag: t; syslog_facility: f; syslog_level: l; syslog_priority: p; '
        'content:"x"; nocase; offset: 1; depth: 5; '
        'content:"y"; distance: 1; within: 4; '
        'meta_content:"m %sagan%",a,b; meta_nocase; meta_offset: 1; '
        'meta_depth: 9; meta_distance: 0; meta_within: 0; '
        'pcre:"/z/i"; alert_time: days 0123456, hours 0000-2359; '
        'threshold: type limit, track by_src, count 2, seconds 60; '
        'after: track by_src, count 2, seconds 60; '
        'blacklist: by_src; zeek-intel: src_ipaddr; '
        'external: /bin/true; metadata: a b; email: x@y.z; '
        'event_id: 4625; json_content: ".k","v"; json_nocase; json_contains; '
        'json_pcre: ".k","/v/"; json_meta_content: ".k","t %sagan%",a; '
        'json_meta_nocase; json_meta_contains; json_meta_strstr; '
        'json_strstr: ".j","w"; append_program; json_map: "src_ip",".s"; '
        'json_decode_base64; json_decode_base64_pcre; json_decode_base64_meta; '
        'parse_port; parse_proto; parse_proto_program; '
        'flexbits_upause: 1; xbits_upause: 1; flexbits_pause: 1; xbits_pause: 1; '
        'default_proto: tcp; default_src_port: 1; default_dst_port: 2; '
        'parse_src_ip: 1; parse_dst_ip: 2; parse_hash: md5; '
        'xbits: set, name n1, track ip_src, expire 60; '
        'flexbits: set, n2, 60; dynamic_load: /tmp/x.rules; '
        'country_code: track by_src, isnot [RU]; normalize; offload: http://x/;)'
    )
    r = parse_rule(rule)  # strict=True default: must not raise
    assert r.sid == 31 and not r.unknown_options


def test_flowbits_aliases_flexbits():
    """`flowbits` is the pre-rename spelling Sagan's published rules use
    (doc/source/blogs/sagan-flowbits.rst) — it must compile to the SAME
    IR as flexbits, not vanish (the C parser, rules.c:1382, silently
    drops it and over-alerts on those rulesets)."""
    a = parse_rule(
        'alert any any any -> any any (msg:"m"; content:"x"; '
        "flowbits: set, created_enabled, 30; flowbits: noalert; sid:40;)"
    )
    b = parse_rule(
        'alert any any any -> any any (msg:"m"; content:"x"; '
        "flexbits: set, created_enabled, 30; flexbits: noalert; sid:40;)"
    )
    assert [(x.action, x.name, x.expire, x.track) for x in a.xbits] == [
        (x.action, x.name, x.expire, x.track) for x in b.xbits
    ]
    assert a.flags == b.flags and "noalert" in a.flags
    c = parse_rule(
        'alert any any any -> any any (msg:"m"; content:"y"; '
        "flowbits: isnotset, by_src, created_enabled; sid:41;)"
    )
    assert [(x.action, x.track) for x in c.xbits] == [("isnotset", "flex_by_src")]
