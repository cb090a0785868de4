"""Deterministic span-corpus synthesizer.

Two products:

1. the 9-case adversarial recipe corpus — span-form re-creation of the
   reference's generated test cases (``deidcm/deid_verification.py:493-640``
   building on the tag lists of ``deidcm/test_cases/cases.py``), seeded so
   goldens are stable;
2. a parameterized large corpus for bench/scale tests, generated
   EXECUTOR-SIDE from ``spark.range`` (the driver never materializes rows),
   with knobs for document-size skew (hot-study analogue) and media rate.

All randomness is ``random.Random(seed)`` — no wall clock, no global RNG.

Attribute-key encoding mirrors the reference's flatten
(``deidcm/dicom/dicom2df.py:93-122``):
``{Keyword}_{0xGGGGEEEE}_{VR}_{VM}_{dW}_{uL}_{mB}_{sVR}`` with the four
display fields empty (their pydicom defaults), i.e. ``Keyword_0xTAG_VR_1____``,
nested items ``Parent_0xTAG_SQ_1____@{i}.Child...`` and empty sequences
``..._SQ_1____@__empty`` with value ``''``.  Tags are formatted lowercase
(``f"{tag:#010x}"`` in the reference) — which also reproduces the quirk that
recipe rows keyed with uppercase hex never match at runtime and fall to the
zero-trust RETIRER default.
"""

from __future__ import annotations

import base64
import random
import string
from datetime import datetime, timedelta
from functools import lru_cache
from typing import Iterator

import pandas as pd

from deidcm_spark.config import load_general_rules
from deidcm_spark.schema import BOX_WORDS as _BOX_WORDS, DOCUMENTS_SCHEMA, MEDIA_H, MEDIA_W

# ---------------------------------------------------------------------------
# tag lists — verbatim from the reference's test-case catalogue
# (/root/reference/deidcm/test_cases/cases.py; they are data: curated DICOM
# tag ids per VR family)
# ---------------------------------------------------------------------------

UI_TAGS = [
    "0x00209161", "0x30100006", "0x30100013", "0x00181002", "0x04000100",
    "0x00209164", "0x300A0013", "0x3010006E", "0x00080058", "0x0070031A",
    "0x00200052", "0x00080014", "0x00083010", "0x00281214", "0x0018100B",
    "0x003A0310", "0x0040A402", "0x0040A171", "0x00281199", "0x300A0650",
    "0x00701101", "0x3010000B", "0x300A0083", "0x3010006F", "0x30100031",
    "0x30060024", "0x00404023", "0x0040A172", "0x00081155", "0x00041511",
    "0x300600C2", "0x00001001", "0x3010003B", "0x0020000E", "0x00080018",
    "0x30100015", "0x00400554", "0x00880140", "0x0020000D", "0x00200200",
    "0x00182042", "0x0040DB0D", "0x0040DB0C", "0x00620021", "0x00081195",
    "0x300A0609", "0x300A0700", "0x0040A124",
]
SQ_TAGS = ["0x0040A730", "0x00700001", "0x00340001", "0x00081072", "0x00401101", "0x0040A073"]
DADT_TAGS = [
    "0x0018700c", "0x00402004", "0x00080012", "0x00080023", "0x30080054",
    "0x3010004D", "0x3010004C", "0x30080056", "0x00100030", "0x300A0006",
    "0x00080021", "0x00080020", "0x30080250", "0x00189517", "0x003A0314",
    "0x300A0741", "0x300A0760", "0x300A073A", "0x0018936A", "0x00189369",
    "0x00189516", "0x300A0736",
]
SHLO_TAGS = [
    "0x30100035", "0x300A067C", "0x300A0002", "0x30060002", "0x30100033",
    "0x00189371", "0x00181400", "0x00120081", "0x00120020", "0x00120010",
    "0x00120040", "0x00120042", "0x00400512", "0x3010002D", "0x30100038",
    "0x00100020", "0x00181030", "0x300A0619", "0x300A0623", "0x30100054",
    "0x300A062A", "0x00400551", "0x300A0608", "0x30100077", "0x30100034",
    "0x0040A027",
]
TM_TAGS = ["0x00080033", "0x300A0007", "0x00080031", "0x30080251"]
RM_TAGS = [
    ("0x00380010", "LO"), ("0x00380020", "DA"), ("0x00081084", "SQ"),
    ("0x00081080", "LO"), ("0x00380021", "TM"), ("0x00001000", "UI"),
    ("0x00102110", "LO"), ("0x0040A078", "LO"), ("0x00181007", "LO"),
    ("0x00120082", "LO"), ("0x00120072", "LO"), ("0x0008009D", "SQ"),
    ("0x00404011", "DT"), ("0x00160076", "DS"), ("0x0016008C", "OB"),
]
KP_TAGS = [
    ("0x00080082", "SQ"), ("0x00181160", "SH"), ("0x00201002", "IS"),
    ("0x00181110", "DS"), ("0x0018700e", "TM"), ("0x00400306", "DS"),
    ("0x00321000", "DA"),
]
ER_TAGS = [
    ("0x00401008", "LO"), ("0x00080050", "LO"), ("0x00400555", "SQ"),
    ("0x00080022", "DA"), ("0x0008002A", "DT"), ("0x00080032", "TM"),
    ("0x00120021", "LO"), ("0x00120030", "LO"), ("0x0008009C", "PN"),
    ("0x00400513", "SQ"),
]

DICOM_MOCK_UID = "1.3.6.1.4.1.14519.5.2.1.2135.6389.799402065306178004127703292730"
PERSONAL_INFO = "I am a personal information"


def runtime_tag(tag: str) -> str:
    """Lowercase 0x-prefixed 8-hex-digit form, as the flatten emits it."""
    return f"0x{int(tag, 16):08x}"


def attr_key(tag: str, vr: str, parent: str = "") -> str:
    """Leaf attribute key in the reference's column-name encoding."""
    rules = load_general_rules()
    rt = runtime_tag(tag)
    kw = rules[rt][0] if rt in rules else ""
    name = f"{kw}_" if kw else "_"
    prefix = f"{parent}." if parent else ""
    return f"{prefix}{name}{rt}_{vr}_1____"


def seq_base(tag: str, item: int | str) -> str:
    """Sequence path component: ``Keyword_0xTAG_SQ_1____@{i}``."""
    rules = load_general_rules()
    rt = runtime_tag(tag)
    kw = rules[rt][0] if rt in rules else ""
    name = f"{kw}_" if kw else "_"
    return f"{name}{rt}_SQ_1____@{item}"


def text_span(key: str, value: str, offset: int) -> dict:
    return {"kind": "text", "text": f"{key}={value}", "media_ref": "", "offset": offset}


def media_span(media_ref: str, offset: int) -> dict:
    return {"kind": "media", "text": "", "media_ref": media_ref, "offset": offset}


# ---------------------------------------------------------------------------
# seeded value generators (deid_verification.py:560-640 analogues)
# ---------------------------------------------------------------------------

def dummy_date(rng: random.Random) -> str:
    d = datetime(2022, 1, 1) + timedelta(days=rng.randint(366, 700))
    return d.strftime("%Y%m%d")


def dummy_hour(rng: random.Random) -> str:
    return f"{rng.randint(0, 23):02d}{rng.randint(0, 59):02d}{rng.randint(0, 59):02d}"


def dummy_letters(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_letters) for _ in range(n))


def value_for_vr(vr: str, rng: random.Random) -> str:
    """Encoded mock value for a VR (encode_unit semantics: everything str)."""
    if vr in ("DA", "DT"):
        return dummy_date(rng)
    if vr == "TM":
        return dummy_hour(rng)
    if vr == "SH":
        return dummy_letters(rng, 16)
    if vr == "LO":
        return dummy_letters(rng, 64)
    if vr == "UI":
        return DICOM_MOCK_UID
    if vr == "PN":
        return "Dr. William MADIE"
    if vr == "OB":
        return base64.b64encode(PERSONAL_INFO.encode()).decode()
    if vr == "IS":
        return str(rng.randint(0, 999))
    if vr == "DS":
        return str(float(rng.randint(0, 999)))
    return dummy_letters(rng, 8)


def dummy_sequence_spans(tag: str, rng: random.Random, start_offset: int) -> list[dict]:
    """1-item sequence holding 0x00080100 (SH), 0x00080102 (SH), 0x00080104 (LO),
    mirroring gen_dummy_sequence (deid_verification.py:538-557)."""
    base = seq_base(tag, 1)
    return [
        text_span(attr_key("0x00080100", "SH", base), dummy_letters(rng, 16), start_offset),
        text_span(attr_key("0x00080102", "SH", base), dummy_letters(rng, 16), start_offset + 1),
        text_span(attr_key("0x00080104", "LO", base), dummy_letters(rng, 64), start_offset + 2),
    ]


# ---------------------------------------------------------------------------
# the 9-case corpus
# ---------------------------------------------------------------------------

def case_documents(seed: int = 42) -> list[dict]:
    """Span-form re-creation of generate_test_cases (deid_verification.py:493-521)."""
    docs: list[dict] = []

    def make(case: int, spans: list[dict]) -> None:
        docs.append({"doc_id": f"case_{case}", "spans": spans})

    rng = random.Random(seed)

    make(0, [text_span(attr_key(t, "UI"), DICOM_MOCK_UID, i) for i, t in enumerate(UI_TAGS)])

    spans: list[dict] = []
    for t in SQ_TAGS:
        spans.extend(dummy_sequence_spans(t, rng, len(spans)))
    make(1, spans)

    make(2, [text_span(attr_key(t, "DA"), dummy_date(rng), i) for i, t in enumerate(DADT_TAGS)])
    make(3, [text_span(attr_key(t, "SH"), dummy_letters(rng, 16), i) for i, t in enumerate(SHLO_TAGS)])
    make(4, [text_span(attr_key(t, "TM"), dummy_hour(rng), i) for i, t in enumerate(TM_TAGS)])

    # case 5 — OB/UC specials (gen_obuc_case :560-575). The reference stores
    # bytes values which the flatten then base64-encodes (encode_unit), so the
    # encoded cell is b64(raw bytes); 0x00340007's raw bytes are themselves
    # b64(isoformat date).
    iso = (datetime(2022, 1, 1) + timedelta(days=rng.randint(366, 700))).isoformat()
    ob_date = base64.b64encode(base64.b64encode(iso.encode())).decode()
    ob_info = base64.b64encode(base64.b64encode(PERSONAL_INFO.encode())).decode()
    make(5, [
        text_span(attr_key("0x00340007", "OB"), ob_date, 0),
        text_span(attr_key("0x00189367", "UC"), PERSONAL_INFO, 1),
        text_span(attr_key("0x00340002", "OB"), ob_info, 2),
        text_span(attr_key("0x00340005", "OB"), ob_info, 3),
    ])

    def other_case(case: int, attrs: list[tuple[str, str]]) -> None:
        spans: list[dict] = []
        for tag, vr in attrs:
            if vr == "SQ":
                spans.extend(dummy_sequence_spans(tag, rng, len(spans)))
            else:
                spans.append(text_span(attr_key(tag, vr), value_for_vr(vr, rng), len(spans)))
        make(case, spans)

    other_case(6, RM_TAGS)
    other_case(7, KP_TAGS)
    other_case(8, ER_TAGS)
    return docs


def case_documents_df(spark):
    return spark.createDataFrame(case_documents(), DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# scaled corpus — executor-side generation
# ---------------------------------------------------------------------------

# tag pool for bulk docs: every recipe tag that is live at runtime (lowercase
# key) plus the curated case families, giving a realistic action mix.
# Cached: the pool is a pure module constant and doc_spans runs once per
# document — rebuilding/sorting ~700 entries per doc was pure waste.
@lru_cache(maxsize=1)
def _bulk_tag_pool() -> list[tuple[str, str]]:
    pool: list[tuple[str, str]] = []
    for tag, (kw, vr, action) in sorted(load_general_rules().items()):
        try:
            is_runtime = tag == runtime_tag(tag)
        except ValueError:
            continue  # documentation placeholder rows like '0x50xxxxxx'
        if is_runtime and vr not in ("SQ", "UN", "OB", "OW") and vr.isupper():
            pool.append((tag, vr))
    return pool


def has_media(idx: int, media_rate: float) -> bool:
    """Hash-based media membership — computable independently of the span
    RNG stream so payload/box synthesis can align with the documents.

    idx is reduced mod 1_000_003 BEFORE the multiply so the SQL mirrors
    (Spark/DuckDB bigint) never overflow: 1_000_002 * 2_246_822_519 ≈
    2.2e15 < 2^63.  Unreduced, doc_id ≳ 4.2e9 silently wraps in non-ANSI
    Spark while DuckDB raises — the engines would diverge."""
    return (idx % 1_000_003) * 2_246_822_519 % 1_000 < int(media_rate * 1_000)


def doc_spans(idx: int, seed: int, tags_per_doc: int, media_rate: float, hot: bool) -> list[dict]:
    """Deterministic spans for document #idx (pure function of arguments)."""
    rng = random.Random(seed * 1_000_003 + idx)
    pool = _bulk_tag_pool()
    n = tags_per_doc * 20 if hot else tags_per_doc
    spans: list[dict] = []
    # identity UID first, like a real file's SOPInstanceUID
    spans.append(text_span(attr_key("0x00080018", "UI"), f"1.2.826.0.1.{seed}.{idx}", 0))
    for _ in range(n - 1):
        tag, vr = pool[rng.randrange(len(pool))]
        spans.append(text_span(attr_key(tag, vr), value_for_vr(vr, rng), len(spans)))
    if has_media(idx, media_rate):
        spans.append(media_span(f"m_{seed}_{idx}", len(spans)))
    return spans


def synth_documents(
    spark,
    n_docs: int,
    seed: int = 42,
    tags_per_doc: int = 40,
    media_rate: float = 0.1,
    skew: float = 0.0,
    num_partitions: int | None = None,
):
    """Distributed deterministic corpus: ``spark.range`` → mapInPandas.

    ``skew`` = fraction of documents that are "hot" (20× the span count),
    emulating the hot-study problem the salted repartition defends against.
    The generator runs on executors; memory is bounded by the Arrow batch.
    """
    rng_threshold = int(skew * 1_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for idx in ids:
                idx = int(idx)
                hot = (idx * 2_654_435_761 % 1_000) < rng_threshold
                prefix = "1.2.840.9999.hot" if hot else f"1.2.840.{seed}"
                rows.append(
                    {
                        "doc_id": f"{prefix}.{idx}",
                        "spans": doc_spans(idx, seed, tags_per_doc, media_rate, hot),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    rng = spark.range(n_docs, numPartitions=num_partitions)
    return rng.mapInPandas(gen, DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# media ground truth — payloads + embedded OCR boxes
# ---------------------------------------------------------------------------
# Analogue of the reference's synthetic OCR harness: text burned onto images
# with a known ground-truth grid (deid_verification.py:137-229) and the
# white-text-on-black-background golden (tests/test_ocr_deidentification.py:
# 52-65).  Box categories deliberately cover every redaction gate: normal
# words (redacted), len-1 words (skipped), authorized words (exempt),
# low-confidence first boxes (whole image passes through), edge boxes
# (margin clamping).

# MEDIA_W/MEDIA_H and the box vocabulary live in schema.py (shared spec)


def media_ground_truth(idx: int, seed: int) -> tuple[dict, list[dict]]:
    """(payload_row, box_rows) for media ref ``m_{seed}_{idx}`` — pure fn."""
    import numpy as np

    rng = random.Random(seed * 7_368_787 + idx)
    ref = f"m_{seed}_{idx}"
    arr = np.zeros((MEDIA_H, MEDIA_W), dtype=np.uint8)
    n_boxes = rng.randint(0, 4)
    boxes: list[dict] = []
    low_conf_first = n_boxes > 0 and rng.random() < 0.15
    for b in range(n_boxes):
        x1 = rng.randint(0, MEDIA_W - 20)
        y1 = rng.randint(0, MEDIA_H - 12)
        x2 = min(MEDIA_W - 1, x1 + rng.randint(8, 24))
        y2 = min(MEDIA_H - 1, y1 + rng.randint(4, 10))
        word = _BOX_WORDS[rng.randrange(len(_BOX_WORDS))]
        conf = 0.1 if (b == 0 and low_conf_first) else round(0.35 + rng.random() * 0.6, 3)
        arr[y1 : y2 + 1, x1 : x2 + 1] = 200  # white-ish burned-in text blob
        boxes.append(
            {
                "media_ref": ref, "box_idx": b, "x1": x1, "y1": y1,
                "x2": x2, "y2": y2, "word": word, "confidence": conf,
            }
        )
    payload = {
        "media_ref": ref, "width": MEDIA_W, "height": MEDIA_H,
        "channels": 1, "bits": 8, "pixels": arr.tobytes(),
    }
    return payload, boxes


def synth_media(
    spark,
    n_docs: int,
    seed: int = 42,
    media_rate: float = 0.1,
    num_partitions: int | None = None,
):
    """(media_payloads_df, ocr_boxes_df) aligned with synth_documents.

    The media index is derived JVM-side from ``spark.range`` with the same
    arithmetic as :func:`has_media` (a python-list createDataFrame would ship
    pickled RDDs and fork a Python worker per task); payload bytes are
    generated executor-side in mapInPandas.
    """
    import pandas as pd

    from deidcm_spark.schema import MEDIA_PAYLOADS_SCHEMA, OCR_BOXES_SCHEMA

    idx_df = spark.range(n_docs).selectExpr("id as idx").filter(
        f"(idx % 1000003) * 2246822519 % 1000 < {int(media_rate * 1_000)}"
    )
    if num_partitions:
        idx_df = idx_df.repartition(num_partitions)

    def gen_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [media_ground_truth(int(i), seed)[0] for i in pdf["idx"]]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_PAYLOADS_SCHEMA])

    def gen_boxes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [b for i in pdf["idx"] for b in media_ground_truth(int(i), seed)[1]]
            yield pd.DataFrame(rows, columns=[f.name for f in OCR_BOXES_SCHEMA])

    return (
        idx_df.mapInPandas(gen_payloads, MEDIA_PAYLOADS_SCHEMA),
        idx_df.mapInPandas(gen_boxes, OCR_BOXES_SCHEMA),
    )
