"""Backend-seam wiring tests (r3 VERDICT item #3).

The OCR (media.ocr_detect), PDF (extract.parse_layout callable backend)
and video-codec (mediastream.frame_sample codec_factory) seams each claim
"a real third-party backend drops in, constructed once per task".  These
tests wire a MOCK backend through each seam and prove:

* the factory is invoked once per TASK — not per image/payload/clip (the
  reference's per-image ``easyocr.Reader`` construction,
  deid_mammogram.py:169, is the anti-pattern being fixed).  Init counting
  is done with ``tempfile.mkstemp`` marker files because Python workers
  are separate processes — in-object counters never make it back to the
  driver;
* backend output flows through the UNCHANGED downstream machinery
  (gates -> exemption -> mask for OCR; span schema/ordering for PDF;
  frame rows for video).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from deidcm_spark import corpus
from deidcm_spark.operators import media
from deidcm_spark.operators.extract import parse_layout
from deidcm_spark.operators.mediastream import frame_sample






def test_ocr_backend_seam(spark, tmp_path):
    # defined in-function: cloudpickle serializes local classes by VALUE,
    # so the Python workers need no importable test module
    class MockOCRReader:
        """easyOCR-shaped reader: fixed detections derived from the image.

        Emits three boxes exercising every gate: a normal word (redacted), an
        authorized word (exempted), and a len-1 word (dropped)."""

        def __init__(self, marker_dir: str):
            # tempfile/os resolve on the worker; no test-module globals
            import os as _os
            import tempfile as _tf
            fd, _ = _tf.mkstemp(dir=marker_dir)
            _os.close(fd)

        def readtext(self, arr):
            h, w = arr.shape[:2]
            quad = lambda x1, y1, x2, y2: [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]
            return [
                (quad(2, 3, min(20, w - 1), min(9, h - 1)), "JOHN", 0.91),
                (quad(30, 3, min(44, w - 1), min(9, h - 1)), "HELLO", 0.88),
                (quad(50, 3, min(52, w - 1), min(9, h - 1)), "R", 0.99),
            ]

    marker_dir = str(tmp_path / "inits")
    os.makedirs(marker_dir)
    payloads, _ = corpus.synth_media(spark, 400, seed=7, media_rate=0.5)
    payloads = payloads.repartition(2).persist()
    n_images = payloads.count()
    assert n_images >= 20

    boxes = media.ocr_detect(
        payloads, lambda: MockOCRReader(marker_dir)
    ).persist()
    got = boxes.groupBy("word").count().collect()
    by_word = {r["word"]: r["count"] for r in got}
    # every image produced all three detections, quad corners 0/2 kept
    assert by_word == {"JOHN": n_images, "HELLO": n_images,
                       "R": n_images}

    # one init per task: 2 partitions -> at most a few tasks, never
    # per-image (the count() above may re-run the subtree before persist
    # materializes, so allow a small multiple of the partition count —
    # anything per-image would be >= n_images)
    inits = len(os.listdir(marker_dir))
    assert 1 <= inits <= 8 < n_images

    # gates -> exemption -> mask: authorized + len-1 words dropped, the
    # remaining box expands by the margin and fills black
    plan = media.redaction_plan(boxes, margin=2).collect()
    assert {r["media_ref"] for r in plan} == {
        r["media_ref"] for r in payloads.select("media_ref").collect()
    }
    # ONLY the JOHN box survives (HELLO exempted, R len-1 dropped):
    # one rect per image, expanded by the margin and clamped
    assert len(plan) == n_images
    for r in plan:
        assert (r["xa"], r["ya"]) == (0, 1)  # 2-2 clamped to 0, 3-2

    redacted = media.redact_media(payloads, boxes, margin=2)
    row = redacted.limit(1).collect()[0]
    arr = media.decode_payload(row.asDict())
    assert (arr[1:10, 0:21] == 0).all()  # JOHN box (expanded) filled
    payloads.unpersist()
    boxes.unpersist()




def test_pdf_backend_seam(spark, tmp_path):
    class MockPDFParser:
        """Real-PDF-adapter stand-in: parses 'TEXT:a|b|IMG:ref' payloads."""

        def __init__(self, marker_dir: str):
            # tempfile/os resolve on the worker; no test-module globals
            import os as _os
            import tempfile as _tf
            fd, _ = _tf.mkstemp(dir=marker_dir)
            _os.close(fd)

        def parse(self, payload: str):
            if payload.startswith("BROKEN"):
                raise ValueError("corrupt payload")
            out, off = [], 0
            for part in payload.split("|"):
                if part.startswith("IMG:"):
                    out.append(("media", "", part[4:], off))
                else:
                    out.append(("text", part, "", off))
                off += 1
            return out

    marker_dir = str(tmp_path / "inits")
    os.makedirs(marker_dir)
    rows = [(f"d{i:03d}", f"alpha {i}|IMG:m{i}|omega {i}") for i in range(40)]
    rows[7] = ("d007", "BROKEN payload")
    df = spark.createDataFrame(rows, "doc_id string, layout string").repartition(2)

    out = parse_layout(
        df, backend=lambda: MockPDFParser(marker_dir), on_error="skip"
    ).collect()
    spans = {r["doc_id"]: r["spans"] for r in out}
    assert len(spans) == 40
    assert spans["d007"] == []  # on_error='skip' -> empty spans, row kept
    s = spans["d003"]
    assert [x["kind"] for x in s] == ["text", "media", "text"]
    assert s[1]["media_ref"] == "m3" and s[0]["text"] == "alpha 3"
    assert [x["offset"] for x in s] == [0, 1, 2]

    inits = len(os.listdir(marker_dir))
    assert 1 <= inits <= 4 < 40

    # on_error='fail' escalates through the seam too
    with pytest.raises(Exception):
        parse_layout(df, backend=lambda: MockPDFParser(marker_dir),
                     on_error="fail").collect()




def test_video_codec_seam(spark, tmp_path):
    class MockVideoCodec:
        """pyav-adapter stand-in: 'decodes' frame i as a constant-value
        image i, ignoring the raw payload bytes entirely — proving the seam
        feeds the codec's OUTPUT (not the raw slice) downstream."""

        def __init__(self, marker_dir: str):
            # tempfile/os resolve on the worker; no test-module globals
            import os as _os
            import tempfile as _tf
            fd, _ = _tf.mkstemp(dir=marker_dir)
            _os.close(fd)

        def decode_frames(self, buf, width, height, n_frames, indices):
            return [np.full((height, width), i % 251, dtype=np.uint8)
                    for i in indices]

    marker_dir = str(tmp_path / "inits")
    os.makedirs(marker_dir)
    w, h, n = 8, 6, 10
    rows = [(f"v{i}", w, h, n, b"\x00" * (w * h * n)) for i in range(30)]
    videos = spark.createDataFrame(
        rows,
        "media_ref string, width int, height int, n_frames int, frames binary",
    ).repartition(2)

    out = frame_sample(
        videos, k=4, codec_factory=lambda: MockVideoCodec(marker_dir)
    ).collect()
    assert len(out) == 30 * 4
    for r in out:
        assert len(r["pixels"]) == w * h
        # pixel value == frame_idx proves codec output reached the row
        assert set(r["pixels"]) == {r["frame_idx"] % 251}

    inits = len(os.listdir(marker_dir))
    assert 1 <= inits <= 4 < 30
