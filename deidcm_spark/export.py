"""Sink-side rebuild: span arrays → nested document trees (+ meta sink).

Re-creation of the reference's unflatten/export lane
(/root/reference/deidcm/dicom/df2dicom.py):

* R1 column partition    — build_dicom :186-241 (sequence vs leaf vs file-meta
  ``0x0002`` group split);
* R2 sequence re-nesting — get_ds_attr :115-123 / build_seq :126-139 (distinct
  ``@i`` item prefixes, LEXICOGRAPHICALLY sorted, recursively rebuilt; the
  ``@__empty`` marker becomes an empty sequence);
* R3 value decode        — decode_unit :244-263 (VR-driven re-typing:
  IS/SS/SL/US/UL → int, FD → float, VM≠1 → JSON list, OB/OW/UN stay base64);
* S5/S6/S10 sinks        — df2dicom/df2hdh :33-107 (per-doc rendered output +
  a corpus-wide meta CSV).

Since the engine's correctness surface is the span table (not DICOM bytes),
the rebuilt artifact here is a deterministic nested JSON document per row —
rendered executor-side in ``mapInPandas`` and written with the normal
DataFrame sinks.  Leaves keep their span offsets, so the rebuild is exactly
invertible: ``flatten_tree(build_tree(spans)) == spans`` (tested round-trip,
the analogue of the reference's difflib round-trip verification,
df2dicom_verification.py:55-77).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

EMPTY_SEQ = "@__empty"

_INT_VRS = {"IS", "SS", "SL", "US", "UL"}


def decode_value(key_leaf: str, value: str):
    """VR-driven re-typing of an encoded value (decode_unit parity).

    key_leaf is the final path component ``{Keyword}_{tag}_{VR}_{VM}_...``.
    """
    parts = key_leaf.split("_")
    vr = parts[2] if len(parts) > 2 else ""
    vm = parts[3] if len(parts) > 3 else "1"
    if value == "None":
        return None
    if vm != "1":
        if vm != "0" and (vr in _INT_VRS or vr in ("CS", "DS", "FD", "UN")):
            try:
                return [decode_value(f"__{vr}_1", e) for e in json.loads(value)]
            except (json.JSONDecodeError, TypeError):
                return value
        return value
    if vr in _INT_VRS:
        try:
            return int(value)
        except ValueError:
            return value
    if vr == "FD":
        try:
            return float(value)
        except ValueError:
            return value
    return value  # OB/OW/UN stay base64 strings in the JSON rendering


def build_tree(spans: list[dict]) -> dict:
    """Ordered span list → nested dict tree.

    Tree shape: leaves are ``{"v": decoded_value, "o": offset}``; a sequence
    key maps to ``{"@1": {subtree}, "@2": ...}`` with item keys sorted
    lexicographically at render time (reference: child_attr.sort(),
    df2dicom.py:123); an empty sequence maps to ``{}``.  Media spans become
    leaves under their synthetic key ``_media`` keyed by media_ref.

    DUPLICATE attribute keys (legal in the span model; the synthetic
    corpus draws tags with replacement) are preserved, not overwritten:
    the Nth duplicate is stored under ``key\\x00N`` — JSON-legal, sorts
    beside its base key — and :func:`flatten_tree` strips the suffix, so
    the round-trip invariant holds for every span list (the old
    last-wins assignment silently DROPPED spans from the rendered doc).
    """
    def _fresh(node: dict, key: str) -> str:
        if key not in node:
            return key
        k = 1
        while f"{key}\x00{k}" in node:
            k += 1
        return f"{key}\x00{k}"

    root: dict = {}
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] != "text":
            root.setdefault("_media", {})[s["media_ref"]] = {"o": s["offset"]}
            continue
        key, _, value = s["text"].partition("=")
        comps = key.split(".")
        node = root
        ok = True
        for comp in comps[:-1]:
            base, _, item = comp.partition("@")
            if not item:
                ok = False
                break
            node = node.setdefault(base, {}).setdefault(f"@{item}", {})
        if not ok:
            continue
        leaf = comps[-1]
        if leaf.endswith(EMPTY_SEQ):
            node[_fresh(node, leaf[: -len(EMPTY_SEQ)])] = {"_empty_seq": s["offset"]}
        else:
            node[_fresh(node, leaf)] = {"v": decode_value(leaf, value), "o": s["offset"]}
    return root


def flatten_tree(tree: dict, prefix: str = "") -> list[dict]:
    """Inverse of build_tree — regenerates the text spans (offset-ordered)."""
    out: list[dict] = []
    for raw_key, sub in tree.items():
        key = raw_key.split("\x00", 1)[0]  # duplicate-key suffix is internal
        if key == "_media":
            for ref, meta in sub.items():
                out.append({"kind": "media", "text": "", "media_ref": ref, "offset": meta["o"]})
            continue
        if isinstance(sub, dict) and "v" in sub and "o" in sub:
            v = sub["v"]
            if isinstance(v, list):
                enc = json.dumps([str(e) for e in v])
            elif v is None:
                enc = "None"
            else:
                enc = str(v)
            out.append({"kind": "text", "text": f"{prefix}{key}={enc}",
                        "media_ref": "", "offset": sub["o"]})
        elif isinstance(sub, dict) and set(sub) == {"_empty_seq"}:
            out.append({"kind": "text", "text": f"{prefix}{key}{EMPTY_SEQ}=",
                        "media_ref": "", "offset": sub["_empty_seq"]})
        else:
            for item in sorted(sub.keys()):
                out.extend(flatten_tree(sub[item], prefix=f"{prefix}{key}{item}."))
    out.sort(key=lambda s: s["offset"])
    return out


RENDER_SCHEMA = StructType(
    [StructField("doc_id", StringType(), False), StructField("rendered", StringType(), False)]
)


def render_documents(df: DataFrame) -> DataFrame:
    """(doc_id, spans) → (doc_id, rendered JSON document) — the S5 sink body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                tree = build_tree(list(spans))
                rows.append({"doc_id": doc_id, "rendered": json.dumps(tree, sort_keys=True)})
            yield pd.DataFrame(rows, columns=["doc_id", "rendered"])

    return df.select("doc_id", "spans").mapInPandas(run, RENDER_SCHEMA)


def export_corpus(df: DataFrame, out_dir: str) -> None:
    """S6 analogue: rendered docs as partitioned JSON + corpus meta CSV."""
    rendered = render_documents(df)
    rendered.write.mode("overwrite").json(f"{out_dir}/rendered")
    meta = df.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.expr("size(filter(spans, s -> s.kind = 'media'))").alias("n_media"),
    )
    meta.coalesce(1).write.mode("overwrite").option("header", True).csv(f"{out_dir}/meta")


def span_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """R4/R5 dataset equality/diff as a DISTRIBUTED operator (the reference
    compares datasets driver-side: ``compare_dicom_datasets``,
    utils.py:10-33, and the df2dicom round-trip diff): position-wise span
    comparison of two (doc_id, spans) tables.

    Per document: span counts on each side, the number of positions whose
    (kind, text, media_ref) agree exactly, and the equality verdict.  Shape:
    posexplode both sides → one full-outer shuffle join on (doc_id, pos) →
    hash aggregate joined back onto the doc-id universe; at corpus scale
    both sides partition on doc_id so the join co-locates after one
    exchange each.

    Every doc_id present on EITHER side appears in the output — a document
    whose span arrays are empty on both sides reports (0, 0, 0, equal=1)
    rather than silently vanishing from a verification table (empty and
    absent compare equal).  Span fields are length-prefix encoded in the
    position signature so NULL fields cannot alias adjacent values
    (concat_ws skips NULLs: text='m1'/media_ref=NULL and text=NULL/
    media_ref='m1' used to produce identical signatures).
    """
    def _sig_field(f: str) -> str:
        # length-prefixed injective field; NULL = the bare \\x1d marker
        return (
            f"CASE WHEN s.{f} IS NULL THEN '\x1d' "
            f"ELSE concat(cast(length(s.{f}) as string), ':', s.{f}) END"
        )

    sig = ("concat_ws('\x1f', "
           + ", ".join(_sig_field(f) for f in ("kind", "text", "media_ref"))
           + ")")

    def flat(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            "doc_id", F.posexplode("spans").alias("pos", "s")
        ).select("doc_id", "pos", F.expr(sig).alias(f"sig_{side}"))

    universe = a.select("doc_id").unionByName(b.select("doc_id")).distinct()
    j = flat(a, "a").join(flat(b, "b"), ["doc_id", "pos"], "full_outer")
    agg = j.groupBy("doc_id").agg(
        F.count("sig_a").cast("int").alias("_na"),
        F.count("sig_b").cast("int").alias("_nb"),
        F.sum(
            F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0)
        ).cast("int").alias("_nm"),
    )
    return universe.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("_na", F.lit(0)).alias("n_spans_a"),
        F.coalesce("_nb", F.lit(0)).alias("n_spans_b"),
        F.coalesce("_nm", F.lit(0)).alias("n_matching"),
        (
            (F.coalesce("_na", F.lit(0)) == F.coalesce("_nb", F.lit(0)))
            & (F.coalesce("_nm", F.lit(0)) == F.coalesce("_na", F.lit(0)))
        ).cast("int").alias("equal"),
    )
