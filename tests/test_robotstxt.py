"""robots.txt parse + screen spec: RFC 9309 group walk, longest-match,
Allow tie-break, default-allow, agent applicability."""

from __future__ import annotations

from sagan_spark.ops.robotstxt import parse_robots, url_robots_screen

BODY_MAIN = (
    "# comment only line\n"
    "User-agent: badbot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: googlebot\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok\n"
    "Disallow:\n"          # empty rule — dropped (allows everything)
    "Allow: /private/ok\n"  # duplicate rule is harmless
)

BODY_ONLY_OTHER = "User-agent: badbot\nDisallow: /\n"

BODY_ORPHANS = (
    "Disallow: /orphan\n"   # before any User-agent line: invalid, dropped
    "User-agent: *\n"
    "Disallow: /x # trailing comment\n"
)


def _rules(spark, bodies, agent="*"):
    df = spark.createDataFrame(
        [(d, b) for d, b in bodies], "domain string, robots_txt string"
    )
    return parse_robots(df, agent=agent)


def test_group_walk_and_applicability(spark):
    rules = _rules(spark, [("a.com", BODY_MAIN)]).collect()
    mine = [(r["rule_type"], r["prefix"], r["applies"]) for r in rules]
    # badbot group parsed but not applicable; empty Disallow dropped
    assert ("disallow", "/", False) in mine
    assert ("disallow", "/private/", True) in mine
    assert mine.count(("allow", "/private/ok", True)) == 2
    assert not any(p == "" for _, p, _ in mine)


def test_orphan_rules_before_any_group_dropped(spark):
    rules = _rules(spark, [("a.com", BODY_ORPHANS)]).collect()
    prefixes = {r["prefix"] for r in rules}
    assert prefixes == {"/x"}  # orphan dropped, trailing comment stripped


def test_named_agent_matches_its_group(spark):
    rules = _rules(spark, [("a.com", BODY_ONLY_OTHER)], agent="badbot")
    assert [r["applies"] for r in rules.collect()] == [True]


def _screen(spark, urls, bodies):
    pages = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rules = _rules(spark, bodies)
    out = url_robots_screen(pages, rules)
    return {r["url"]: r["robots_allowed"] for r in out.collect()}

def test_screen_longest_match_allow_tiebreak_and_default(spark):
    got = _screen(
        spark,
        [
            "https://a.com/private/secret",   # disallowed
            "https://a.com/private/ok/page",  # allow is longer -> allowed
            "https://a.com/public",           # no match -> allowed
            "https://A.COM/private/z",        # host lowercased -> disallowed
            "https://b.com/anything",         # no robots.txt -> allowed
            "https://a.com",                  # empty path -> '/'
        ],
        [("a.com", BODY_MAIN)],
    )
    assert got["https://a.com/private/secret"] is False
    assert got["https://a.com/private/ok/page"] is True
    assert got["https://a.com/public"] is True
    assert got["https://A.COM/private/z"] is False
    assert got["https://b.com/anything"] is True
    assert got["https://a.com"] is True


def test_screen_equal_length_tie_prefers_allow(spark):
    body = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    got = _screen(spark, ["https://t.com/dir/x"], [("t.com", body)])
    assert got["https://t.com/dir/x"] is True
