"""BM25 retrieval: scores checked against a pure-Python re-derivation of
the shared spec (Lucene-variant idf, denormalized dl), plus top-k order,
determinism, and scan-pruning behavior of a materialized index."""

import math
import re

import pytest

from deidcm_spark.operators.retrieval import bm25_search, build_bm25_index

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps"),
    (3, "lazy summer days and lazy summer nights"),
    (4, "quick quick quick repetition of quick terms"),
    (5, "an unrelated document about spark and parquet"),
    (6, "fox and cat and dog live together"),
    (7, ""),
]


def tokens(text):
    return [t for t in re.split(r"\s+", text.lower()) if t]


def oracle_bm25(docs, query, k1=1.2, b=0.75):
    """-> {doc_id: (score, n_terms_hit)} for every doc with a hit."""
    qterms = sorted({t for t in query.lower().split() if t})
    toks = {d: tokens(t) for d, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    out = {}
    for d, tv in toks.items():
        score, hit = 0.0, 0
        for t in qterms:
            tf = tv.count(t)
            if tf == 0:
                continue
            df_t = sum(1 for v in toks.values() if t in v)
            idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tv) / avgdl))
            hit += 1
        if hit:
            out[d] = (round(score, 6), hit)
    return out


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    postings, stats = build_bm25_index(df)
    return postings.cache(), stats.cache()


def test_bm25_matches_oracle(spark, index):
    postings, stats = index
    for query in ("quick fox", "lazy", "the quick the", "spark parquet dog"):
        got = {
            r.doc_id: (r.score, r.n_terms_hit)
            for r in bm25_search(postings, stats, query, k=10).collect()
        }
        want = oracle_bm25(DOCS, query)
        assert got == pytest.approx(want), query


def test_bm25_topk_order_and_k(spark, index):
    postings, stats = index
    rows = bm25_search(postings, stats, "quick", k=2).collect()
    assert len(rows) == 2
    # doc 4 has tf=4 of "quick" -> highest; scores strictly ordered
    assert rows[0].doc_id == 4
    assert rows[0].score > rows[1].score
    again = bm25_search(postings, stats, "quick", k=2).collect()
    assert [(r.doc_id, r.score) for r in rows] == [
        (r.doc_id, r.score) for r in again
    ]


def test_bm25_index_shape(spark, index):
    postings, stats = index
    # one row per distinct (term, doc); dl denormalized and consistent
    assert postings.groupBy("term", "doc_id").count().filter("count > 1").count() == 0
    dls = {r.doc_id: r.dl for r in postings.select("doc_id", "dl").distinct().collect()}
    for d, t in DOCS:
        if tokens(t):
            assert dls[d] == len(tokens(t)), d
    s = stats.first()
    assert s["n_docs"] == len(DOCS)
    assert s["avgdl"] == pytest.approx(
        sum(len(tokens(t)) for _, t in DOCS) / len(DOCS)
    )


def test_bm25_materialized_index_scan_pruning(spark, tmp_path, index):
    """A term-sorted parquet index gets the query's literal IN-list pushed
    into the scan — the 100 TB query path reads matching row groups only."""
    postings, stats = index
    path = str(tmp_path / "bm25")
    postings.sort("term").write.parquet(path)
    disk = spark.read.parquet(path)
    out = bm25_search(disk, stats, "quick fox", k=10)
    rows = out.collect()
    assert {r.doc_id for r in rows} == set(oracle_bm25(DOCS, "quick fox"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan


def test_bm25_empty_query_rejected(spark, index):
    postings, stats = index
    with pytest.raises(ValueError, match="query"):
        bm25_search(postings, stats, "   ")


def test_bm25_query_tokenizer_matches_index_ascii_split(spark):
    """The query tokenizer must be the ASCII \\s+ split the index uses
    (Java regex semantics): a token containing NBSP is ONE indexed term,
    so the same NBSP-joined query string must hit it — Python's
    Unicode-aware str.split() would split it into two terms and miss."""
    composite = "quick fox"  # NBSP-joined: one term under ASCII \s+
    df = spark.createDataFrame(
        [(1, f"the {composite} jumps"), (2, "plain quick fox here")],
        "doc_id bigint, text string",
    )
    postings, stats = build_bm25_index(df)
    terms = {r.term for r in postings.collect()}
    assert composite in terms  # index side: NBSP survives Java \s+ split
    hits = bm25_search(postings, stats, composite.upper(), k=5).collect()
    assert [r.doc_id for r in hits] == [1]
    assert hits[0].n_terms_hit == 1
