"""RFC 9309 robots-exclusion gate (functions/robots.py): spec
vectors (group selection, wildcard, $ anchor, longest-match
precedence, allow-wins-tie, empty Disallow), the broadcast Spark
stage, and hostile inputs.
"""

import pytest

from parquet_converters_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    robots_gate,
)

RFC_TXT = """# comment line
User-agent: trainbot
Disallow: /private/
Allow: /private/open/

User-agent: *
Disallow: /*.pdf$
Allow: /

Sitemap: https://x/sitemap.xml
Crawl-delay: 10
"""


def test_group_selection_and_fallback():
    assert robots_allowed(parse_robots(RFC_TXT, "TrainBot"),
                          "/private/a") is False
    assert robots_allowed(parse_robots(RFC_TXT, "trainbot"),
                          "/docs/a.pdf") is True  # not its group's rule
    assert robots_allowed(parse_robots(RFC_TXT, "otherbot"),
                          "/docs/a.pdf") is False
    assert parse_robots("", "any") == []
    assert robots_allowed([], "/anything") is True


def test_longest_match_and_tie():
    r = parse_robots(RFC_TXT, "trainbot")
    # /private/open/ (14) beats /private/ (9)
    assert robots_allowed(r, "/private/open/x") is True
    # equal length: allow wins
    assert robots_allowed([(False, "/dir/"), (True, "/dir*")],
                          "/dir/x") is True
    assert robots_allowed([(True, "/dir/"), (False, "/dir*")],
                          "/dir/x") is True


def test_wildcards_and_anchor():
    r = parse_robots("User-agent: *\nDisallow: /a*b/\n", "x")
    assert robots_allowed(r, "/aXYZb/c") is False
    assert robots_allowed(r, "/ab2/c") is True
    r = parse_robots("User-agent: *\nDisallow: /*.pdf$\n", "x")
    assert robots_allowed(r, "/a/b.pdf") is False
    assert robots_allowed(r, "/a/b.pdfx") is True
    # regex metacharacters in paths are LITERAL octets per the RFC
    r = parse_robots("User-agent: *\nDisallow: /q?.x\n", "x")
    assert robots_allowed(r, "/q?.x") is False
    assert robots_allowed(r, "/q.x") is True


def test_empty_disallow_and_multi_agent_group():
    assert robots_allowed(
        parse_robots("User-agent: *\nDisallow:\n", "x"), "/x") is True
    multi = "User-agent: a\nUser-agent: b\nDisallow: /\n"
    assert robots_allowed(parse_robots(multi, "b"), "/x") is False
    assert robots_allowed(parse_robots(multi, "c"), "/x") is True


def test_hostile_and_odd_inputs():
    # rules before any User-agent line govern nobody
    assert parse_robots("Disallow: /\nUser-agent: *\nAllow: /a\n",
                        "x") == [(True, "/a")]
    # junk lines and missing colons are ignored, never raise
    txt = "random junk\nUser-agent *\nUser-agent: x\nDisallow: /d\n"
    assert parse_robots(txt, "x") == [(False, "/d")]
    # pathological wildcard pattern stays linear enough to terminate
    r = [(False, "/" + "a*" * 20 + "$")]
    assert robots_allowed(r, "/" + "a" * 40) is False


def test_robots_gate_stage_broadcast_and_missing_domain(spark):
    urls = spark.createDataFrame(
        [
            (1, "d0", "https://d0.x/private/a"),
            (2, "d0", "https://d0.x/ok"),
            (3, "nodomain", "https://n.x/anything"),
        ],
        "doc_id long, domain string, url string",
    )
    robots = spark.createDataFrame(
        [("d0", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots_txt string",
    )
    gated = robots_gate(urls, robots, agent="trainbot")
    got = {r["doc_id"]: r["allowed"] for r in gated.collect()}
    assert got == {1: False, 2: True, 3: True}  # no robots.txt = allowed
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the dimension never shuffles facts


def test_repeated_groups_combine_per_rfc():
    """r16 review finding: ALL groups matching the token combine
    (RFC 9309 2.2.1) — CMS plugins routinely append a second
    'User-agent: *' section, and keeping only the first fails OPEN."""
    txt = ("User-agent: *\nDisallow: /a\n\n"
           "User-agent: *\nDisallow: /b\n")
    r = parse_robots(txt, "any")
    assert robots_allowed(r, "/a/x") is False
    assert robots_allowed(r, "/b/x") is False
    assert robots_allowed(r, "/c/x") is True
    # exact-token groups combine too, and beat the * fallback
    txt2 = ("User-agent: tb\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: tb\nDisallow: /b\n")
    r2 = parse_robots(txt2, "tb")
    assert robots_allowed(r2, "/a/x") is False
    assert robots_allowed(r2, "/b/x") is False
    assert robots_allowed(r2, "/c/x") is True  # * group not merged in


def test_gate_uppercase_scheme_and_null_url(spark):
    """r16 review findings: RFC 3986 schemes are case-insensitive (an
    uppercase scheme must not bypass the gate), and a null URL must
    not kill the stage."""
    urls = spark.createDataFrame(
        [(1, "d0", "HTTPS://D0.X/private/a"), (2, "d0", None)],
        "doc_id long, domain string, url string",
    )
    robots = spark.createDataFrame(
        [("d0", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots_txt string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in robots_gate(urls, robots, agent="tb").collect()}
    assert got == {1: False, 2: True}
