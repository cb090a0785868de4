"""Frame sampling + audio features vs hand-computed oracles.

Payloads are synthesized deterministically in the test (arange/sin
patterns — no RNG) and every expectation is re-derived with plain
Python/struct arithmetic, not the operator's numpy path."""

import math
import struct

import pytest

from deidcm_spark.operators.mediastream import (
    audio_features,
    frame_sample,
    sample_frame_indices,
)


def _clip(ref: str, w: int, h: int, n: int) -> tuple:
    # frame f is filled with byte value (f*7 + ord(ref[-1])) % 256
    buf = b"".join(
        bytes([(f * 7 + ord(ref[-1])) % 256]) * (w * h) for f in range(n)
    )
    return (ref, w, h, n, buf)


@pytest.fixture(scope="module")
def videos(spark):
    rows = [
        _clip("vid_a", 8, 6, 10),
        _clip("vid_b", 4, 4, 3),   # fewer frames than k → all frames
        _clip("vid_c", 16, 2, 25),
    ]
    return spark.createDataFrame(
        rows,
        "media_ref string, width int, height int, n_frames int, frames binary",
    )


def test_sample_frame_indices_spec():
    assert sample_frame_indices(10, 4) == [1, 3, 6, 8]
    assert sample_frame_indices(3, 4) == [0, 1, 2]
    assert sample_frame_indices(0, 4) == []
    assert sample_frame_indices(1000, 4) == [125, 375, 625, 875]
    # always in range, sorted, unique
    for n in range(1, 40):
        idx = sample_frame_indices(n, 4)
        assert idx == sorted(set(idx)) and all(0 <= i < n for i in idx)


def test_frame_sample_bytes_and_fanout(spark, videos):
    got = frame_sample(videos, k=4).collect()
    by_ref = {}
    for r in got:
        by_ref.setdefault(r["media_ref"], []).append(r)
    assert sorted(len(v) for v in by_ref.values()) == [3, 4, 4]
    for ref, rows in by_ref.items():
        n = rows[0]["n_frames"]
        assert sorted(r["frame_idx"] for r in rows) == sample_frame_indices(n, 4)
        for r in rows:
            fill = (r["frame_idx"] * 7 + ord(ref[-1])) % 256
            assert r["pixels"] == bytes([fill]) * (r["width"] * r["height"])


def test_frame_sample_rejects_torn_payload(spark):
    bad = spark.createDataFrame(
        [("x", 4, 4, 2, b"\x00" * 31)],
        "media_ref string, width int, height int, n_frames int, frames binary",
    )
    with pytest.raises(Exception, match="expected 2 frames"):
        frame_sample(bad, k=2).collect()


def _pcm(ref: str, sr: int, ch: int, samples: list[list[int]]) -> tuple:
    buf = b"".join(struct.pack(f"<{ch}h", *s) for s in samples)
    return (ref, sr, ch, buf)


def test_audio_features_match_hand_computation(spark):
    mono = [[int(1000 * math.sin(i / 3))] for i in range(48)]
    stereo = [[100, -100], [-200, 300], [50, -50], [0, 7]]
    df = spark.createDataFrame(
        [_pcm("a_mono", 16000, 1, mono), _pcm("a_st", 8000, 2, stereo)],
        "media_ref string, sample_rate int, n_channels int, pcm binary",
    )
    got = {r["media_ref"]: r for r in audio_features(df).collect()}

    flat = [v for s in mono for v in s]
    rms = math.sqrt(sum(v * v for v in flat) / len(flat))
    zc = sum(1 for a, b in zip(flat, flat[1:]) if (a >= 0) != (b >= 0))
    m = got["a_mono"]
    assert m["n_samples"] == 48
    assert m["duration_s"] == round(48 / 16000, 6)
    assert m["rms"] == round(rms, 6)
    assert m["peak"] == max(abs(v) for v in flat)
    assert m["zero_cross_rate"] == round(zc / 47, 6)

    s = got["a_st"]
    vals = [v for fr in stereo for v in fr]
    assert s["n_samples"] == 4 and s["peak"] == 300
    assert s["rms"] == round(math.sqrt(sum(v * v for v in vals) / 8), 6)
    # per-channel sign changes across the 3 frame transitions, averaged
    ch0 = [fr[0] >= 0 for fr in stereo]
    ch1 = [fr[1] >= 0 for fr in stereo]
    flips = sum(a != b for a, b in zip(ch0, ch0[1:])) + sum(
        a != b for a, b in zip(ch1, ch1[1:])
    )
    assert s["zero_cross_rate"] == round(flips / 6, 6)


def test_audio_empty_clip_is_zeroes_not_nan(spark):
    df = spark.createDataFrame(
        [("e", 8000, 2, b"")],
        "media_ref string, sample_rate int, n_channels int, pcm binary",
    )
    r = audio_features(df).first()
    assert (r["n_samples"], r["duration_s"], r["rms"], r["peak"],
            r["zero_cross_rate"]) == (0, 0.0, 0.0, 0, 0.0)


def test_lanes_are_zero_shuffle(spark, videos):
    for df in (frame_sample(videos, k=2),):
        df.collect()
        plan = (df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0])
        assert "Exchange" not in plan and "MapInPandas" in plan


def test_audio_features_ref_tagged_validation(spark):
    """Bad metadata / torn payloads must fail with the clip's media_ref in
    the message — a bare ZeroDivisionError or numpy buffer error from deep
    inside a task is undebuggable at corpus scale."""
    import pytest as _pytest

    from deidcm_spark.operators.mediastream import audio_features

    base = {"sample_rate": 8000, "n_channels": 1, "pcm": b"\x01\x00\x02\x00"}
    bad_rate = spark.createDataFrame(
        [("a/clip", 0, 1, b"\x01\x00")],
        "media_ref string, sample_rate int, n_channels int, pcm binary",
    )
    with _pytest.raises(Exception, match="a/clip.*sample_rate"):
        audio_features(bad_rate).collect()
    torn = spark.createDataFrame(
        [("a/torn", 8000, 1, b"\x01\x00\x02")],
        "media_ref string, sample_rate int, n_channels int, pcm binary",
    )
    with _pytest.raises(Exception, match="a/torn.*odd"):
        audio_features(torn).collect()
    ok = spark.createDataFrame(
        [("a/ok", base["sample_rate"], base["n_channels"], base["pcm"])],
        "media_ref string, sample_rate int, n_channels int, pcm binary",
    )
    assert audio_features(ok).collect()[0]["n_samples"] == 2
