"""robots.txt politeness gate (operators/robots.py): parse + match
checked against a pure-Python re-derivation of RFC 9309 longest-match
semantics, plus the RFC's own worked examples and the plan contract
(rules side reduced before the join, no Python in the match stage)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.robots import (
    parse_robots,
    parse_robots_body,
    pattern_to_regex,
    robots_filter,
)

# ---------- pure-Python oracle ----------


def oracle_allowed(rules, agent, host, path):
    """rules = [(host, agent_token, rule, pattern)]; RFC 9309: group of
    the longest agent-token substring match (fallback '*'), longest
    pattern wins, Allow wins ties, default allow."""
    mine = [r for r in rules if r[0] == host]
    tokens = {r[1] for r in mine}
    named = [t for t in tokens if t != "*" and t in agent.lower()]
    group = max(named, key=len) if named else "*"
    best = None  # (len, allow_bit)
    for _, tok, rule, pattern in mine:
        if tok != group:
            continue
        if rule == "disallow" and pattern == "":
            rule = "allow"  # RFC 9309: empty Disallow = allow-all
        if re.match(pattern_to_regex(pattern), path):
            key = (len(pattern), 1 if rule == "allow" else 0)
            if best is None or key > best:
                best = key
    return True if best is None else best[1] == 1


ROBOTS_A = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.pdf$

User-agent: gooner
User-agent: scholarbot
Disallow: /
Allow: /articles/

Sitemap: https://a.example/sitemap.xml
Crawl-delay: 10
"""

ROBOTS_B = """
User-agent: *
Disallow:
"""  # explicit allow-all

ROBOTS_C = """
User-agent: trapbot
Disallow: /
"""


def _rules_rows(body, host):
    rules, _ = parse_robots_body(body)
    return [(host, a, r, p) for a, r, p in rules]


def test_parse_groups_and_directives():
    rules, maps = parse_robots_body(ROBOTS_A)
    # the two-agent group shares its rules
    assert ("gooner", "disallow", "/") in rules
    assert ("scholarbot", "disallow", "/") in rules
    assert ("scholarbot", "allow", "/articles/") in rules
    assert ("*", "disallow", "/*.pdf$") in rules
    assert maps == ["https://a.example/sitemap.xml"]
    # empty Disallow -> rule recorded (becomes allow-all downstream)
    rules_b, _ = parse_robots_body(ROBOTS_B)
    assert rules_b == [("*", "disallow", "")]


def test_pattern_to_regex():
    assert re.match(pattern_to_regex("/private/"), "/private/x")
    assert not re.match(pattern_to_regex("/private/"), "/privateer")
    assert re.match(pattern_to_regex("/*.pdf$"), "/a/b/file.pdf")
    assert not re.match(pattern_to_regex("/*.pdf$"), "/a.pdf?x=1")
    assert re.match(pattern_to_regex(""), "/anything")
    # mid-pattern $ is literal
    assert re.match(pattern_to_regex("/a$b"), "/a$b/c")


CASES = [
    # (agent, url, expected) against hosts a.example/b.example/c.example
    ("anybot", "https://a.example/public", True),
    ("anybot", "https://a.example/private/doc", False),
    ("anybot", "https://a.example/private/ok/x", True),   # longest = Allow
    ("anybot", "https://a.example/paper.pdf", False),     # wildcard + $
    ("anybot", "https://a.example/paper.pdf?x=1", True),  # $ fails on query
    ("scholarbot/1.2", "https://a.example/anything", False),
    ("scholarbot/1.2", "https://a.example/articles/x", True),
    ("anybot", "https://b.example/whatever", True),       # empty Disallow
    ("anybot", "https://c.example/x", True),              # group not mine
    ("trapbot", "https://c.example/x", False),
    ("anybot", "https://unknown.example/x", True),        # no robots at all
]


@pytest.fixture(scope="module")
def rules_df(spark):
    bodies = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B),
         ("c.example", ROBOTS_C)],
        "host string, body string",
    )
    rules, _ = parse_robots(bodies)
    return rules.persist()


ALL_RULES = (
    _rules_rows(ROBOTS_A, "a.example")
    + _rules_rows(ROBOTS_B, "b.example")
    + _rules_rows(ROBOTS_C, "c.example")
)


def test_filter_matches_oracle_per_agent(spark, rules_df):
    for agent in ("anybot", "scholarbot/1.2", "trapbot"):
        urls = [(i, u) for i, (a, u, _) in enumerate(CASES) if a == agent]
        df = spark.createDataFrame(urls, "doc_id bigint, url string")
        got = {
            r["doc_id"]: r["allowed"]
            for r in robots_filter(df, rules_df, agent, mode="flag").collect()
        }
        for i, (a, u, expected) in enumerate(CASES):
            if a != agent:
                continue
            m = re.match(r"https://([^/]+)(/.*)$", u)
            want = oracle_allowed(ALL_RULES, a, m.group(1), m.group(2))
            assert want == expected, (u, "test-case table is wrong")
            assert got[i] == expected, (a, u, got[i])


def test_filter_remove_mode_and_validation(spark, rules_df):
    df = spark.createDataFrame(
        [(i, u) for i, (_, u, _) in enumerate(CASES)],
        "doc_id bigint, url string",
    )
    kept = robots_filter(df, rules_df, "anybot").collect()
    expected_kept = {
        i for i, (a, u, e) in enumerate(CASES)
        if oracle_allowed(
            ALL_RULES, "anybot",
            re.match(r"https://([^/]+)", u).group(1),
            re.match(r"https://[^/]+(/.*)$", u).group(1),
        )
    }
    assert {r["doc_id"] for r in kept} == expected_kept
    assert "allowed" not in kept[0].asDict()
    with pytest.raises(ValueError):
        robots_filter(df, rules_df, "bad'agent")
    with pytest.raises(ValueError):
        robots_filter(df, rules_df, "anybot", mode="nope")


def test_filter_plan_is_jvm_side_match(spark, rules_df):
    df = spark.createDataFrame(
        [(i, f"https://a.example/p{i}") for i in range(50)],
        "doc_id bigint, url string",
    )
    out = robots_filter(df, rules_df, "anybot", mode="flag")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # the URL-side match stage is pure JVM — the only Python stages are
    # the (rules-side) parse, which is already materialized in rules_df
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_group_exclusivity_rfc_example(spark):
    """RFC 9309 §2.2.1: a crawler with a NAMED group must ignore '*' —
    scholarbot gets no benefit from the global Allow of /private/ok."""
    bodies = spark.createDataFrame(
        [("a.example", ROBOTS_A)], "host string, body string"
    )
    rules, _ = parse_robots(bodies)
    df = spark.createDataFrame(
        [(1, "https://a.example/private/ok/x")], "doc_id bigint, url string"
    )
    got = robots_filter(df, rules, "scholarbot", mode="flag").collect()[0]
    assert got["allowed"] is False  # named group Disallow: / wins


def test_rules_host_normalized_to_canonical_key(spark):
    """robots.txt is fetched per natural host — a rules table keyed
    'www.Example.com' must still gate 'http://example.com/...' (the
    canonical URL host): without the fold the join misses and the gate
    silently allows everything."""
    bodies = spark.createDataFrame(
        [("www.Example.com", "User-agent: *\nDisallow: /private/")],
        "host string, body string",
    )
    rules, _ = parse_robots(bodies)
    df = spark.createDataFrame(
        [(1, "http://example.com/private/x"),
         (2, "https://WWW.example.com:443/private/y"),
         (3, "http://example.com/public")],
        "doc_id bigint, url string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in robots_filter(df, rules, "anybot", mode="flag").collect()}
    assert got == {1: False, 2: False, 3: True}


def test_match_is_against_url_as_fetched(spark):
    """RFC 9309 matches the literal request target: a tracking param the
    dedup canonicalizer strips must still hit 'Disallow: /*?ref=', and
    param re-sorting must not create matches that the fetched URL
    wouldn't produce."""
    bodies = spark.createDataFrame(
        [("h.example",
          "User-agent: *\nDisallow: /*?ref=\nDisallow: /search?a=1&b=2")],
        "host string, body string",
    )
    rules, _ = parse_robots(bodies)
    df = spark.createDataFrame(
        [(1, "http://h.example/page?ref=spam"),   # canon strips ref= — still disallowed
         (2, "http://h.example/page"),
         (3, "http://h.example/search?b=2&a=1"),  # canon re-sorts — literal URL is allowed
         (4, "http://h.example/search?a=1&b=2")],
        "doc_id bigint, url string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in robots_filter(df, rules, "anybot", mode="flag").collect()}
    assert got == {1: False, 2: True, 3: True, 4: False}


def test_duplicate_rows_and_existing_host_column_preserved(spark, rules_df):
    """The gate is not a dedup: duplicate input rows keep their
    multiplicity, and a caller-supplied 'host' column is never
    overwritten or duplicated."""
    df = spark.createDataFrame(
        [(1, "https://a.example/public", "keep-me"),
         (1, "https://a.example/public", "keep-me"),
         (2, "https://a.example/private/doc", "mine"),
         (3, None, "null-url")],
        "doc_id bigint, url string, host string",
    )
    out = robots_filter(df, rules_df, "anybot", mode="flag")
    assert out.columns.count("host") == 1
    rows = out.collect()
    assert len(rows) == 4  # the duplicate row survives twice
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["host"], r["allowed"]))
    assert by_doc[1] == [("keep-me", True), ("keep-me", True)]
    assert by_doc[2] == [("mine", False)]
    assert by_doc[3] == [("null-url", True)]  # NULL url passes through allowed
    kept = robots_filter(df, rules_df, "anybot").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 1, 3]


def test_sitemaps_surface(spark):
    bodies = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "host string, body string",
    )
    _, maps = parse_robots(bodies)
    assert [tuple(r) for r in maps.collect()] == [
        ("a.example", "https://a.example/sitemap.xml")
    ]
