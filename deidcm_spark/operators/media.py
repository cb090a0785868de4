"""Media-span lane: burned-in-text redaction over binary payloads.

Reference semantics (/root/reference/deidcm/dicom/deid_mammogram.py):

* OCR detection       — get_text_areas :153-179 (easyOCR ``(box, text,
  conf)``; whole-image gate: first result's confidence must exceed 0.3);
* dictionary exemption — remove_authorized_words_from :182-205 (upper-cased
  membership in the authorized-words list);
* redaction           — hide_text :208-267 (skip empty/len≤1 words, corners
  0 and 2 of the quad, sign-aware ±300 px margin expansion, filled rectangle
  in black/white — tuple-aware for RGB — or 30× blur).

Spark-first re-design: the pixel payloads live OUT of the document rows (a
``media_payloads`` table keyed by ``media_ref``), so the document shuffle
stays slim and the pixel stage is an independent ``mapInPandas`` over
payload batches.  OCR is a pluggable per-batch backend: the default is the
deterministic stub that reads the ground-truth ``ocr_boxes`` table the
corpus synthesizer embeds (a real backend — easyOCR/tesseract — would be
initialized ONCE per batch here, fixing the reference's per-image reader
construction at :169; those libs are not in this container).

Plan shape (one shuffle, no driver participation):

    ocr_boxes ──groupBy(media_ref).collect_list──┐
    media_payloads ──join(media_ref)─────────────┴─▶ mapInPandas(redact) ─▶ sink

Document rows are untouched: spans keep (kind, media_ref, order), satisfying
span-sequence equality; only the payload bytes behind ``media_ref`` change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from deidcm_spark.config import load_authorized_words

REDACT_MARGIN = 300


def expand_box(x1: int, y1: int, x2: int, y2: int, margin: int) -> tuple[int, int, int, int]:
    """Sign-aware margin expansion (hide_text :232-244): grow outward along
    whichever direction the corner pair runs."""
    if x1 < x2:
        x1, x2 = x1 - margin, x2 + margin
    else:
        x1, x2 = x1 + margin, x2 - margin
    if y1 < y2:
        y1, y2 = y1 - margin, y2 + margin
    else:
        y1, y2 = y1 + margin, y2 - margin
    return x1, y1, x2, y2


def redact_array(
    pixels: np.ndarray,
    boxes: list[dict],
    margin: int = REDACT_MARGIN,
    color_value: str = "black",
    mode: str = "rectangle",
    authorized: frozenset[str] | None = None,
) -> np.ndarray:
    """numpy redaction kernel for one image.

    Differences vs the reference, pinned by our fixtures: fills are done with
    numpy slice assignment clamped to the image (PIL's draw.rectangle clamps
    implicitly and includes both corners — we include both corners too);
    ``blur`` mode is a 30×-iterated 3×3 box blur on the crop instead of PIL
    ImageFilter.BLUR (PIL not available; same contract: content destroyed,
    shape preserved).
    """
    out = pixels.copy()
    if not boxes:
        return out
    ordered = sorted(boxes, key=lambda b: b["box_idx"])
    # whole-image confidence gate on the FIRST detection (:171-179)
    if ordered[0]["confidence"] <= 0.3:
        return out
    words = authorized if authorized is not None else load_authorized_words()
    h, w = out.shape[0], out.shape[1]
    rgb = out.ndim == 3
    for b in ordered:
        word = b["word"]
        if word == "" or len(word) <= 1:  # false-positive guard (:228)
            continue
        if word.upper() in words:  # dictionary exemption (:201)
            continue
        x1, y1, x2, y2 = expand_box(b["x1"], b["y1"], b["x2"], b["y2"], margin)
        xa, xb = sorted((int(x1), int(x2)))
        ya, yb = sorted((int(y1), int(y2)))
        xa, xb = max(0, xa), min(w - 1, xb)
        ya, yb = max(0, ya), min(h - 1, yb)
        if xa > xb or ya > yb:
            continue
        if mode == "blur":
            crop = out[ya : yb + 1, xa : xb + 1].astype(np.float32)
            for _ in range(30):
                padded = np.pad(crop, ((1, 1), (1, 1)) + ((0, 0),) * (crop.ndim - 2), mode="edge")
                crop = (
                    padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2]
                    + padded[1:-1, 2:] + padded[1:-1, 1:-1]
                ) / 5.0
            out[ya : yb + 1, xa : xb + 1] = crop.astype(out.dtype)
        else:
            fill = 255 if color_value == "white" else 0
            out[ya : yb + 1, xa : xb + 1] = fill
    return out


def decode_payload(row: dict | pd.Series) -> np.ndarray:
    """binary column + typed metadata → ndarray (S8 analogue, dicom2png.py:15-51)."""
    dtype = np.uint16 if row["bits"] == 16 else np.uint8
    arr = np.frombuffer(row["pixels"], dtype=dtype)
    shape = (row["height"], row["width"]) if row["channels"] == 1 else (
        row["height"], row["width"], row["channels"])
    return arr.reshape(shape)


def redact_media(
    payloads: DataFrame,
    boxes: DataFrame,
    margin: int = REDACT_MARGIN,
    color_value: str = "black",
    mode: str = "rectangle",
) -> DataFrame:
    """media_payloads × ocr_boxes → redacted media_payloads (same schema).

    Left join: payloads with no detections pass through identity (the
    reference returns the original pixels when OCR finds nothing, :43).
    """
    grouped = boxes.groupBy("media_ref").agg(
        F.collect_list(
            F.struct("box_idx", "x1", "y1", "x2", "y2", "word", "confidence")
        ).alias("_boxes")
    )
    joined = payloads.join(grouped, "media_ref", "left")
    schema = payloads.schema
    authorized = load_authorized_words()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real OCR backend would be constructed HERE, once per batch
        for pdf in batches:
            out_pixels = []
            for _, row in pdf.iterrows():
                blist = row["_boxes"]
                if blist is None or len(blist) == 0:
                    out_pixels.append(row["pixels"])
                    continue
                arr = decode_payload(row)
                red = redact_array(
                    arr,
                    [dict(b) for b in blist],
                    margin=margin,
                    color_value=color_value,
                    mode=mode,
                    authorized=authorized,
                )
                out_pixels.append(red.tobytes())
            res = pdf[["media_ref", "width", "height", "channels", "bits"]].copy()
            res["pixels"] = out_pixels
            yield res

    return joined.mapInPandas(run, schema)
