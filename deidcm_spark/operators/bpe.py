"""Byte-pair-encoding tokenizer: distributed training + batch encoding.

Sennrich et al. 2016 (arXiv:1508.07909) — the subword tokenization every
modern LM pipeline runs.  Training never touches the corpus after one
pass: BPE learns from the DISTINCT-WORD FREQUENCY TABLE (how production
tokenizers are trained — the word table is orders of magnitude smaller
than the corpus and bounded by the vocabulary, not the token count), so
each merge iteration is two Spark jobs over a small table:

1. pair counting: explode each word's adjacent symbol pairs weighted by
   word frequency → one hash aggregate → the argmax pair (deterministic
   tie-break: highest count, then lexicographic pair);
2. merge application: a JVM-side ``aggregate()`` fold rewrites each
   word's symbol array, merging leftmost-first non-overlapping
   occurrences.  The pair travels as BOUND literal columns referenced
   inside the lambda (no SQL string interpolation — corpus-derived
   symbols can contain quotes/backslashes).

The word table persists between iterations with the lineage bounded by
periodic localCheckpoint (the neardup_components discipline).  The only
driver-side state is the merge list itself — ``n_merges`` rows.

Encoding (`bpe_token_count` / `bpe_encode_words`) replays the ordered
merge list per distinct word inside a pandas UDF with a PER-BATCH MEMO
(the scrub-lane UID-memo pattern): a Zipfian batch hits the memo for
almost every word, so the Python loop runs once per distinct word, not
once per token.  Fully deterministic end to end — no RNG, no wall-clock.

Word segmentation reuses the textops token spec (lowercased whitespace
pieces) and each word carries the classic ``</w>`` end-of-word marker.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from deidcm_spark.operators.textops import TOKENS

END = "</w>"

# the Python-side tokenizer MUST match the Spark-side training spec
# (textops.TOKENS = split on Java-regex \s+, which is ASCII-only:
# [ \t\n\x0B\f\r]).  Python's default \s is Unicode-aware — a
# \xa0-bearing word would train as ONE symbol sequence but encode as
# TWO words without the ASCII flag.
_WS = re.compile(r"\s+", re.ASCII)


def _words(text: str | None) -> list[str]:
    return [w for w in _WS.split((text or "").lower()) if w]

# word → initial symbol array: per-character split + end-of-word marker
_SYMBOLS = (
    "concat(transform(sequence(1, length(word)),"
    " i -> substring(word, i, 1)), array('</w>'))"
)

# adjacent symbol pairs as structs (no separator ambiguity)
_PAIRS = (
    "zip_with(slice(symbols, 1, size(symbols) - 1),"
    " slice(symbols, 2, size(symbols) - 1), (a, b) -> struct(a, b))"
)

# leftmost-first non-overlapping merge of (_ma, _mb) → _ma || _mb.
# The guard `element_at(acc, -1) = _ma` never re-matches a just-formed
# merge token unless _ma || _mb legitimately chains (e.g. 'aa' + 'a').
_MERGE_FOLD = (
    "aggregate(symbols, cast(array() as array<string>),"
    " (acc, s) -> case when size(acc) > 0"
    "   and element_at(acc, -1) = _ma and s = _mb"
    "   then concat(slice(acc, 1, size(acc) - 1), array(concat(_ma, _mb)))"
    "   else concat(acc, array(s)) end)"
)


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over the textops token spec — ONE corpus scan + one
    hash aggregate; everything after trains on this table."""
    return (
        docs.select(F.explode(F.expr(TOKENS)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    min_freq: int = 2,
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """The ordered merge list — BPE trained on ``docs``.  Stops early when
    the best remaining pair's weighted count drops below ``min_freq``.

    Scale: the corpus is scanned ONCE (word_freqs); each of the
    ``n_merges`` iterations runs over the distinct-word table only
    (vocabulary-bounded).  Driver state = the merge list."""
    from deidcm_spark.operators.dedup import _release_local_checkpoint

    wf = word_freqs(docs).select(
        "word", "freq", F.expr(_SYMBOLS).alias("symbols")
    )
    wf = wf.localCheckpoint()
    last_ckpt = wf
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        best = (
            wf.select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .first()
        )
        if best is None or best["n"] < min_freq:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        nxt = (
            wf.withColumn("_ma", F.lit(a))
            .withColumn("_mb", F.lit(b))
            .withColumn("symbols", F.expr(_MERGE_FOLD))
            .drop("_ma", "_mb")
        )
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()  # bound the fold-chain lineage
            # superseded checkpoint blocks are unreachable from here on —
            # release them (dedup.py r3 finding: DataFrame.unpersist can't)
            _release_local_checkpoint(last_ckpt)
            last_ckpt = nxt
        wf = nxt
    # the function returns only the driver-side merge list — the LAST
    # checkpoint's blocks (the initial one, if training never crossed a
    # checkpoint boundary) would otherwise stay pinned for the session
    _release_local_checkpoint(last_ckpt)
    return merges


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference per-word encoder: replay the ordered merge list."""
    syms = list(word) + [END]
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_token_count(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) — subword counts under a trained
    merge list.  One zero-shuffle pandas-UDF pass; the per-batch word
    memo makes the Python cost ~once per DISTINCT word per batch."""
    mlist = list(merges)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_sub(word: str) -> int:
            got = memo.get(word)
            if got is None:
                got = memo[word] = len(_encode_word(word, mlist))
            return got

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = _words(text)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_words": len(words),
                        "n_bpe_tokens": sum(n_sub(w) for w in words),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens"]
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, n_words int, n_bpe_tokens int"
    )


def bpe_encode_words(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, subwords array<string>) — the full subword stream per
    document (debug/inspection surface; training pipelines usually only
    need the counts + a vocabulary)."""
    mlist = list(merges)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = _encode_word(word, mlist)
            return got

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = _words(text)
                subs: list[str] = []
                for w in words:
                    subs.extend(enc(w))
                rows.append({"doc_id": doc_id, "subwords": subs})
            yield pd.DataFrame(rows, columns=["doc_id", "subwords"])

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, subwords array<string>"
    )
