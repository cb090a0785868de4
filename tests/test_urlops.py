"""URL canonicalization / URL dedup / domain blocklist: every operator
checked against a pure-Python re-derivation of the shared spec
(linkgraph.py docstrings), plus plan hygiene (canonicalize is
exchange-free and Python-free)."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.linkgraph import (
    TRACKING_PARAM_RE,
    canonicalize_url,
    domain_filter,
    url_dedup,
)

# ---------- pure-Python oracle of the shared spec ----------

PARTS = re.compile(r"^(https?)://([^/?#]+)([^?#]*)(?:\?([^#]*))?(?:#.*)?$")
TRACK = re.compile(TRACKING_PARAM_RE)


def oracle_canon(url):
    """Mirror of canonicalize_url. NOTE: F.trim strips SPACES only, so the
    oracle strips spaces (not all whitespace)."""
    if url is None:
        return None, None
    u = url.strip(" ")
    m = PARTS.match(u)
    if not m:
        return u, ""
    scheme = m.group(1).lower()
    host = re.sub(r"^www\.", "", re.sub("^[^@]*@", "", m.group(2).lower()))
    host = re.sub(":80$" if scheme == "http" else ":443$", "", host)
    path = re.sub("/+$", "", m.group(3))
    q = m.group(4) or ""
    params = sorted(p for p in q.split("&") if p and not TRACK.match(p))
    qs = "&".join(params)
    return f"{scheme}://{host}{path or '/'}" + (f"?{qs}" if qs else ""), host


URLS = [
    "https://WWW.Example.COM:443/path/?utm_source=x&b=2&a=1#frag",
    "http://example.com:80//a//",
    "http://example.com",
    "https://example.com/?gclid=1&fbclid=2",
    "https://example.com/p?ref=abc&refx=1&utm_campaign",
    "https://sub.www.example.com/deep/page",
    "ftp://files.example.com/a",
    "not a url at all",
    "  https://padded.example.com/x  ",
    "https://example.com/a?z=1&a=2&m=3",
    "http://user@example.com:80/b",
    "https://example.com:8443/keep-port",
    None,
]


@pytest.fixture(scope="module")
def url_df(spark):
    rows = [(i, u) for i, u in enumerate(URLS)]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def test_canonicalize_matches_oracle(spark, url_df):
    got = {r.doc_id: (r.canonical_url, r.host) for r in canonicalize_url(url_df).collect()}
    for i, u in enumerate(URLS):
        assert got[i] == oracle_canon(u), (i, u, got[i], oracle_canon(u))


def test_canonicalize_specific_forms(spark, url_df):
    got = {r.url: r.canonical_url for r in canonicalize_url(url_df).collect()}
    assert (
        got["https://WWW.Example.COM:443/path/?utm_source=x&b=2&a=1#frag"]
        == "https://example.com/path?a=1&b=2"
    )
    assert got["http://example.com"] == "http://example.com/"
    assert got["https://example.com/?gclid=1&fbclid=2"] == "https://example.com/"
    # ref is tracking, refx is not; valueless utm_ param dropped
    assert (
        got["https://example.com/p?ref=abc&refx=1&utm_campaign"]
        == "https://example.com/p?refx=1"
    )
    # only a LEADING www. is stripped
    assert (
        got["https://sub.www.example.com/deep/page"]
        == "https://sub.www.example.com/deep/page"
    )
    # non-default port survives
    assert got["https://example.com:8443/keep-port"] == "https://example.com:8443/keep-port"
    # userinfo dropped from the canonical host
    assert got["http://user@example.com:80/b"] == "http://example.com/b"
    # non-http passthrough (trimmed), host empty
    assert got["ftp://files.example.com/a"] == "ftp://files.example.com/a"


def test_canonicalize_plan_is_narrow_and_jvm_side(spark, url_df):
    df = canonicalize_url(url_df)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_dedup_matches_oracle(spark):
    # three spellings of one page, two of another, one unique, one null
    rows = [
        (1, "https://example.com/a?utm_source=x"),
        (2, "http://www.other.com/b?z=1&a=2"),
        (3, "https://EXAMPLE.com/a/"),
        (4, "https://example.com/a#frag"),
        (5, "http://other.com/b?a=2&z=1"),
        (6, "https://unique.example/only"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r.doc_id: (r.keep, r.n_occ) for r in url_dedup(df).collect()}

    groups = {}
    for doc_id, u in rows:
        c, _ = oracle_canon(u)
        if c is not None:
            groups.setdefault(c, []).append(doc_id)
    want = {}
    for doc_id, u in rows:
        c, _ = oracle_canon(u)
        if c is None:
            want[doc_id] = (True, 1)
        else:
            want[doc_id] = (doc_id == min(groups[c]), len(groups[c]))
    assert got == want
    # cross-check the winner structure: docs 1,3,4 collapse to one URL
    assert [want[1], want[3], want[4]] == [(True, 3), (False, 3), (False, 3)]


BLOCKLIST = ["ads.example", "Tracker.io"]

BL_ROWS = [
    (1, "https://ads.example/banner"),        # exact host match
    (2, "https://sub.ads.example/x"),         # subdomain match
    (3, "https://badads.example/x"),          # NOT a dot-suffix -> kept
    (4, "https://ok.com/page"),               # kept
    (5, "http://a.b.tracker.io/pix"),         # deep subdomain match (case-folded)
    (6, "mailto:someone@ads.example"),        # non-http: host '' -> kept
    (7, None),                                # null url -> kept
]


@pytest.fixture(scope="module")
def bl_df(spark):
    return spark.createDataFrame(BL_ROWS, "doc_id bigint, url string")


def test_domain_filter_remove_and_flag(spark, bl_df):
    kept = sorted(r.doc_id for r in domain_filter(bl_df, BLOCKLIST).collect())
    assert kept == [3, 4, 6, 7]
    flags = {
        r.doc_id: r.blocked
        for r in domain_filter(bl_df, BLOCKLIST, mode="flag").collect()
    }
    assert flags == {1: True, 2: True, 3: False, 4: False, 5: True, 6: False, 7: False}


def test_domain_filter_dataframe_blocklist(spark, bl_df):
    bl = spark.createDataFrame([(d,) for d in BLOCKLIST], "domain string")
    kept = sorted(r.doc_id for r in domain_filter(bl_df, bl).collect())
    assert kept == [3, 4, 6, 7]


def test_domain_filter_bad_mode(spark, bl_df):
    with pytest.raises(ValueError, match="mode"):
        domain_filter(bl_df, BLOCKLIST, mode="bogus")


def test_canonicalize_component_grid_and_idempotence(spark):
    """Exhaustive combinatorial grid over URL components: engine == oracle
    on every combination, and canonicalization is IDEMPOTENT (a canonical
    URL is a fixed point — re-canonicalizing changes nothing)."""
    schemes = ["http", "https", "ftp"]
    userinfos = ["", "bob@", "a:pw@"]
    wwws = ["", "www.", "WWW."]
    hosts = ["Example.COM", "x.y.example"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b", "/a/b/", "/a//b//"]
    queries = ["", "?", "?b=2&a=1", "?utm_source=t&z=9", "?ref=r&refx=1&&"]
    frags = ["", "#sec"]
    urls = []
    for s in schemes:
        for ui in userinfos:
            for w in wwws:
                for h in hosts:
                    for p in ports:
                        for pa in paths:
                            for q in queries:
                                for f in frags:
                                    urls.append(f"{s}://{ui}{w}{h}{p}{pa}{q}{f}")
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    got = {
        r.doc_id: (r.canonical_url, r.host)
        for r in canonicalize_url(df).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == oracle_canon(u), (u, got[i], oracle_canon(u))
    # idempotence: run the canonical urls back through as the url column
    once = spark.createDataFrame(
        [(i, got[i][0]) for i in range(len(urls))], "doc_id bigint, url string"
    )
    twice = {
        r.doc_id: (r.canonical_url, r.host)
        for r in canonicalize_url(once).collect()
    }
    for i, u in enumerate(urls):
        # non-http(s) inputs pass through unchanged, so they are fixed
        # points too; http(s) canonicals must map to themselves with the
        # same host
        assert twice[i] == got[i], (u, got[i], twice[i])
