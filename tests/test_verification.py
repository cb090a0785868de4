"""Tests for media transforms (LUT/normalize/resize) and the OCR
verification aggregations (fuzzy match, confusion matrix, P/R/F1)."""

import numpy as np
import pytest

from deidcm_spark import corpus
from deidcm_spark.operators.media import (
    decode_payload,
    lut_window_level,
    normalize_to_uint8,
    resize_area,
    transform_media,
)
from deidcm_spark.operators.verification import (
    confusion_matrix,
    fuzzy_match_words,
    prf_metrics,
    recognition_rates,
)


def test_lut_window_level():
    data = np.array([0, 50, 100, 150, 200], dtype=np.float64)
    out = lut_window_level(data, window=100, level=100)
    assert out[0] == 0.0 and out[-1] == 255.0
    assert 0 < out[2] < 255  # mid ramp


def test_normalize_to_uint8():
    arr = np.array([[100, 200], [300, 400]], dtype=np.uint16)
    out = normalize_to_uint8(arr)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    inv = normalize_to_uint8(arr, monochrome1=True)
    assert inv[0, 0] == 255 and inv[1, 1] == 0


def test_normalize_flat_image_no_div_zero():
    flat = np.full((4, 4), 7, dtype=np.uint8)
    out = normalize_to_uint8(flat)
    assert (out == 0).all()


def test_resize_area():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_area(arr, 2)
    assert out.shape == (2, 2)
    assert out[0, 0] == int(np.mean([0, 1, 4, 5]))


def test_transform_media_pipeline(spark):
    payloads, _ = corpus.synth_media(spark, 60, seed=9, media_rate=0.5)
    out = transform_media(payloads, normalize=True, resize_factor=2)
    rows = out.collect()
    assert len(rows) == payloads.count()
    for r in rows:
        assert r["width"] == corpus.MEDIA_W // 2
        assert r["height"] == corpus.MEDIA_H // 2
        arr = decode_payload(r.asDict())
        assert arr.shape == (corpus.MEDIA_H // 2, corpus.MEDIA_W // 2)


@pytest.fixture(scope="module")
def ocr_tables(spark):
    truth = spark.createDataFrame(
        [("m1", "PATIENT"), ("m1", "DUPONT"), ("m2", "JTRX4"), ("m3", "NAME")],
        "media_ref: string, word: string",
    )
    detected = spark.createDataFrame(
        [("m1", "PATIENT"), ("m1", "DUP0NT"),   # exact + 1-edit fuzzy hit
         ("m2", "ZZZZZZZZ"),                      # miss for JTRX4
         ("m4", "GHOST")],                        # false positive image
        "media_ref: string, word: string",
    )
    images = spark.createDataFrame(
        [("m1",), ("m2",), ("m3",), ("m4",), ("m5",)], "media_ref: string"
    )
    return images, detected, truth


def test_fuzzy_match(spark, ocr_tables):
    _, detected, truth = ocr_tables
    m = {(r["media_ref"], r["tword"]): r["recognized"]
         for r in fuzzy_match_words(detected, truth).collect()}
    assert m[("m1", "PATIENT")] == 1
    assert m[("m1", "DUPONT")] == 1   # levenshtein 1 ≤ 3
    assert m[("m2", "JTRX4")] == 0
    assert m[("m3", "NAME")] == 0     # no detections on m3


def test_recognition_rates(spark, ocr_tables):
    _, detected, truth = ocr_tables
    rates = {r["media_ref"]: r["recognition_rate"]
             for r in recognition_rates(detected, truth).collect()}
    assert rates["m1"] == 1.0
    assert rates["m2"] == 0.0


def test_confusion_and_prf(spark, ocr_tables):
    images, detected, truth = ocr_tables
    cm = confusion_matrix(images, detected, truth).collect()[0]
    # m1, m2 = TP; m3 = FN; m4 = FP; m5 = TN
    assert (cm["tp"], cm["fn"], cm["fp"], cm["tn"]) == (2, 1, 1, 1)
    prf = prf_metrics(confusion_matrix(images, detected, truth)).collect()[0]
    assert prf["precision"] == round(2 / 3, 4)
    assert prf["recall"] == round(2 / 3, 4)
    assert prf["f1"] == round(4 / 6, 4)
    assert prf["accuracy"] == 0.6


def test_ghost_word_check_post_redaction(spark):
    """is_there_ghost_words analogue: redacted output must be clean inside
    every planned rect; the unredacted input must show ghosts (the burned
    blobs) wherever rects were planned."""
    from deidcm_spark.corpus import synth_media
    from deidcm_spark.operators.media import redact_media, redaction_plan
    from deidcm_spark.operators.verification import ghost_word_check

    payloads, boxes = synth_media(spark, 100, seed=31, media_rate=0.5)
    plan = redaction_plan(boxes, margin=8, width=96, height=96)
    red = redact_media(payloads, boxes, margin=8)

    after = ghost_word_check(red, plan).collect()
    assert len(after) > 20
    assert all(r["clean"] for r in after)

    before = {r["media_ref"]: r for r in ghost_word_check(payloads, plan).collect()}
    ghosts = [r for r in before.values() if r["n_ghost"] > 0]
    assert ghosts, "unredacted input must show ghost words in planned rects"
    # luminance drops when burned-in blobs are blacked out
    lum_after = {r["media_ref"]: r["mean_luminance"] for r in after}
    dropped = [
        ref for ref, r in before.items()
        if r["n_rects"] > 0 and lum_after[ref] < r["mean_luminance"]
    ]
    assert len(dropped) == len([r for r in before.values() if r["n_rects"] > 0])


def test_fuzzy_threshold_uses_min_length(spark):
    """Reference rule (deid_verification.py:400-409): the band is chosen
    by min(len(detected), len(truth)) — a 2-char OCR fragment must not
    fuzzy-claim a 5-char truth word at distance 3."""
    truth = spark.createDataFrame([("m1", "JTRX4")], "media_ref string, word string")
    det = spark.createDataFrame([("m1", "JT")], "media_ref string, word string")
    m = fuzzy_match_words(det, truth).collect()[0]
    assert m["recognized"] == 0  # lev('JTRX4','JT')=3 but min-len band is <=1
    det2 = spark.createDataFrame([("m1", "JTRX")], "media_ref string, word string")
    m2 = fuzzy_match_words(det2, truth).collect()[0]
    assert m2["recognized"] == 1  # min len 4 > 3 -> band <=3, lev=1
