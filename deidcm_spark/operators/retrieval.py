"""Lexical retrieval over the corpus: inverted index + BM25 search.

The exploration/verification companion to the similarity lanes
(``similarity.py`` is dense/embedding retrieval; this is sparse/term
retrieval): "which documents mention X" at corpus scale powers
decontamination research, quality-filter audits, and dataset cards.

BM25 (Robertson/Spärck Jones; the Okapi BM25 form):

    score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1) /
                             (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

(the "+1" inside the log is the Lucene non-negative variant).

Spark-first decomposition — query latency never touches the corpus:

* **index build** (one explode + two hash aggregations, once): postings
  ``(term, doc_id, tf, dl)`` — the document length is DENORMALIZED into
  every posting so query time needs NO join against a corpus-sized
  doc-length table; ``stats`` is literally two numbers ``(n_docs,
  avgdl)``.  ``df(t)`` is derived from the postings at query time for
  just the query's terms (count over the already-filtered slice).
* **search**: ``term IN (<query terms>)`` — a LITERAL in-list that pushes
  into the parquet scan of a materialized index (only matching row
  groups are read when the index is written sorted/bucketed by term) —
  then a window ``df`` count per term, the pure-codegen score, one
  ``groupBy(doc_id)`` and a TakeOrderedAndProject top-k.  Everything
  after the scan is proportional to the MATCHING postings, not the
  corpus.

Terms are the engine-wide analysis tokenizer (``textops.TOKENS``:
lowercase, split on whitespace) so index terms and every other text
operator agree on what a "token" is.  Deterministic: ties in the top-k
break on doc_id.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

from deidcm_spark.operators.textops import TOKENS

# query-side tokenizer — MUST match the Java `\s+` regex used by
# textops.TOKENS (ASCII semantics), not Python's Unicode str.split
_WS = re.compile(r"\s+", re.ASCII)


def build_bm25_index(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, stats) for a ``(doc_id, text, ...)`` corpus.

    postings: ``(term, doc_id, tf, dl)`` — one row per distinct term per
    document; stats: one row ``(n_docs, avgdl)``.  Write postings
    sorted/partitioned by ``term`` for scan pruning at query time
    (``postings.sort("term").write...``).
    """
    tok = df.select("doc_id", F.explode(F.expr(TOKENS)).alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    postings = tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
    stats = df.select(
        F.count("*").alias("n_docs"),
        F.avg(F.expr(f"size({TOKENS})")).alias("avgdl"),
    )
    return postings, stats


def bm25_search(
    postings: DataFrame,
    stats: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` — ``(doc_id, score, n_terms_hit)``
    ordered by score desc (ties by doc_id).

    The query is tokenized with the SAME analysis tokenizer as the index
    (ASCII ``\\s+`` split, matching textops.TOKENS — Python's Unicode-aware
    ``str.split`` would split NBSP etc. differently than the Java
    tokenizer that built the postings);
    duplicate query terms count once (bag-of-terms query, the standard
    BM25 form).  ``stats`` is the one-row table from
    :func:`build_bm25_index` (its two scalars are collected — metadata,
    not corpus).
    """
    terms = sorted({t for t in _WS.split(query.lower()) if t})
    if not terms:
        raise ValueError("query has no terms after tokenization")
    row = stats.first()
    n_docs, avgdl = int(row["n_docs"]), float(row["avgdl"] or 0.0)
    if n_docs == 0 or avgdl == 0.0:
        return postings.select(
            "doc_id",
            F.lit(0.0).alias("score"),
            F.lit(0).alias("n_terms_hit"),
        ).limit(0)
    hits = postings.filter(F.col("term").isin(terms))
    # df(t) over the matched slice only — a window per term, no second
    # corpus pass (each (term, doc_id) is unique in the postings)
    w = Window.partitionBy("term")
    scored = hits.withColumn("df_t", F.count("*").over(w)).select(
        "doc_id",
        (
            F.log(
                (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
                + 1.0
            )
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
        ).alias("s"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("s"), 6).alias("score"),
            F.count("*").cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
