"""Video frame sampling and audio feature extraction — the remaining
multimodal lanes of a training-data pipeline.

Both lanes follow the media.py contract: payloads are OPAQUE binary
columns with typed metadata, out of the document rows, so the document
shuffle stays slim and the byte-level work is an independent
``mapInPandas`` over payload batches (Arrow transfer, numpy inside, no
per-row Python beyond the outer zip).

DECODE SCOPE: no codec libraries ship in this container (declared scope,
same as easyOCR/pydicom), so the payload formats are the *raw* ones a
decode stage would produce —

* video: ``n_frames`` contiguous 8-bit grayscale frames of
  ``width × height`` bytes (exactly what a real decoder emits per
  frame); a real backend (pyav/ffmpeg) would replace ``_frame_slice``
  per batch, everything else — schema, sampling spec, batching,
  partitioning — is the production plumbing;
* audio: interleaved little-endian PCM16 at ``sample_rate`` Hz ×
  ``n_channels`` — this is a REAL decode (``np.frombuffer``), not a
  stub; WAV bodies are exactly this.

Everything is deterministic: sampled frame indices are a pure function
of (n_frames, k), features are pure arithmetic — retries and engines
agree bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VIDEO_COLS = ["media_ref", "width", "height", "n_frames", "frames"]
AUDIO_COLS = ["media_ref", "sample_rate", "n_channels", "pcm"]

FRAME_OUT_SCHEMA = (
    "media_ref string, frame_idx int, n_frames int, "
    "width int, height int, pixels binary"
)
AUDIO_OUT_SCHEMA = (
    "media_ref string, n_samples long, duration_s double, "
    "rms double, peak int, zero_cross_rate double"
)


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """The k uniformly-spaced frame indices of an n_frames clip —
    ``floor((i + 0.5) * n / k)`` (midpoint rule: no bias toward frame 0,
    always in range, the whole clip when ``n <= k``).  This IS the spec
    the oracle re-derives; keep it a pure function."""
    if n_frames <= 0:
        return []
    if n_frames <= k:
        return list(range(n_frames))
    return [int((i + 0.5) * n_frames / k) for i in range(k)]


class RawFrameCodec:
    """The built-in decoder for the raw contiguous-grayscale payload
    format (see module docstring): frame i is the byte slice
    ``[i*w*h, (i+1)*w*h)``.  This class IS the codec contract a real
    backend (pyav/ffmpeg adapter) must satisfy —
    ``decode_frames(buf, width, height, n_frames, indices)`` returning
    one ``(height, width)`` uint8 array per requested index."""

    def decode_frames(self, buf: bytes, width: int, height: int,
                      n_frames: int, indices: list[int]) -> list[np.ndarray]:
        fsz = width * height
        if len(buf) != n_frames * fsz:
            raise ValueError(
                f"payload is {len(buf)} bytes, expected "
                f"{n_frames} frames x {fsz}"
            )
        arr = np.frombuffer(buf, dtype=np.uint8)
        return [
            arr[i * fsz:(i + 1) * fsz].reshape(height, width)
            for i in indices
        ]


def frame_sample(videos: DataFrame, k: int = 4,
                 codec_factory=RawFrameCodec) -> DataFrame:
    """(media_ref, frame_idx, n_frames, width, height, pixels) — k
    uniformly-sampled frames per clip, one output row per frame.

    ``codec_factory()`` constructs the decoder ONCE per task (amortized
    over every Arrow batch/clip the task sees — codec contexts are
    expensive to open); the default :class:`RawFrameCodec` handles the
    container-scope raw format, and a real pyav/ffmpeg adapter drops in
    by satisfying the same ``decode_frames`` contract.

    One zero-shuffle ``mapInPandas`` pass: each task slices its own
    clips' frame bytes (a numpy view per frame, no copy until Arrow
    serializes).  Fan-out is ≤k rows per clip and each output row
    carries ONE frame, so downstream per-frame stages (feature extract,
    resize, redaction) batch over frames without ever materializing
    whole clips again."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = codec_factory()  # once per task, NOT per clip
        for pdf in batches:
            out = []
            cols = [pdf[c].to_numpy() for c in VIDEO_COLS]
            for ref, w, h, n, buf in zip(*cols):
                w, h, n = int(w), int(h), int(n)
                idxs = sample_frame_indices(n, k)
                try:
                    frames = codec.decode_frames(buf, w, h, n, idxs)
                except ValueError as exc:
                    raise ValueError(f"{ref}: {exc}") from exc
                for idx, frame in zip(idxs, frames):
                    out.append(
                        {
                            "media_ref": ref,
                            "frame_idx": idx,
                            "n_frames": n,
                            "width": w,
                            "height": h,
                            "pixels": np.ascontiguousarray(
                                frame, dtype=np.uint8).tobytes(),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_ref", "frame_idx", "n_frames", "width",
                         "height", "pixels"],
            )

    return videos.mapInPandas(run, FRAME_OUT_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """(media_ref, n_samples, duration_s, rms, peak, zero_cross_rate) —
    per-clip features from interleaved PCM16: sample count and duration,
    RMS energy and absolute peak over all channels, and the
    mean-over-channels zero-crossing rate (sign changes / (n-1)).

    Zero-shuffle ``mapInPandas``; all arithmetic is numpy over the full
    clip (int64 accumulation — no int16 overflow), floats rounded to 6
    decimals so results are comparison-stable across engines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            cols = [pdf[c].to_numpy() for c in AUDIO_COLS]
            for ref, sr, ch, buf in zip(*cols):
                sr, ch = int(sr), int(ch)
                # every validation error carries the clip's media_ref —
                # a bare ZeroDivisionError / numpy buffer error from deep
                # inside a task is undebuggable at corpus scale
                if sr < 1:
                    raise ValueError(f"{ref}: sample_rate={sr} invalid")
                if len(buf) % 2:
                    raise ValueError(
                        f"{ref}: {len(buf)}-byte PCM16 buffer has an odd "
                        f"length (torn write?)"
                    )
                flat = np.frombuffer(buf, dtype="<i2")
                if ch < 1 or len(flat) % ch:
                    raise ValueError(
                        f"{ref}: {len(flat)} samples not divisible by "
                        f"{ch} channels"
                    )
                M = flat.reshape(-1, ch).astype(np.int64)
                n = M.shape[0]
                rms = (
                    float(np.sqrt(np.mean(M.astype(np.float64) ** 2)))
                    if n else 0.0  # empty clip: 0.0, not NaN
                )
                signs = M >= 0
                zcr = (
                    float(np.mean(signs[1:] != signs[:-1])) if n > 1 else 0.0
                )
                out.append(
                    {
                        "media_ref": ref,
                        "n_samples": n,
                        "duration_s": round(n / sr, 6),
                        "rms": round(rms, 6),
                        "peak": int(np.max(np.abs(M))) if n else 0,
                        "zero_cross_rate": round(zcr, 6),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_ref", "n_samples", "duration_s", "rms",
                         "peak", "zero_cross_rate"],
            )

    return audio.mapInPandas(run, AUDIO_OUT_SCHEMA)
