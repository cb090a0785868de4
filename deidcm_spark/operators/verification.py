"""OCR quality-verification aggregations (the reference's test harness as
first-class distributed operators).

Parity targets (/root/reference/deidcm/deid_verification.py):

* A5 word-recognition tally — compare_ocr_data_and_reality :361-426: fuzzy
  set matching of detected vs ground-truth words, thresholds: edit distance
  ≤ 3 for words longer than 3 chars, ≤ 1 otherwise (:400-409);
* A3 confusion-matrix accumulation — calculate_test_values :339-358
  (TP: text present + detected; FN: present + missed; FP: absent +
  "detected"; TN: absent + nothing detected);
* A4 precision / recall / F1 / accuracy — save_test_information :429-458.

Spark shape: one broadcast-friendly equi-join on media_ref, the fuzzy match
as a built-in ``levenshtein`` predicate, then a single hash aggregation —
partial (map-side) + final, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_match_words(detected: DataFrame, truth: DataFrame) -> DataFrame:
    """Per (media_ref, truth word): was it recognized by any detection?

    ``detected``/``truth``: (media_ref, word).  Fuzzy rule of the reference
    (deid_verification.py:400-409): levenshtein ≤ 3 when
    ``min(len(detected), len(truth)) > 3``, else ≤ 1 — the MIN of both
    lengths, so a 2-char detection never fuzzy-claims a long truth word.

    DOCUMENTED DEVIATION: the reference consumes each matched truth word
    once (a sequential greedy walk over the OCR list); this vectorized
    reformulation asks "was the truth word matched by ANY detection", so
    one detection can satisfy several equal-up-to-threshold truth words —
    an upper bound on the reference's tally that differs only when
    distinct truth words collide within the threshold on one image.
    """
    d = detected.select("media_ref", F.upper("word").alias("dword"))
    t = truth.select("media_ref", F.upper("word").alias("tword"))
    joined = t.join(d, "media_ref", "left").withColumn(
        "hit",
        F.when(F.col("dword").isNull(), F.lit(0))
        .when(
            F.levenshtein("tword", "dword")
            <= F.when(
                F.least(F.length("tword"), F.length("dword")) > 3, 3
            ).otherwise(1),
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    return joined.groupBy("media_ref", "tword").agg(
        F.max("hit").alias("recognized")
    )


def recognition_rates(detected: DataFrame, truth: DataFrame) -> DataFrame:
    """A5: per-image recognized/total word counts."""
    m = fuzzy_match_words(detected, truth)
    return m.groupBy("media_ref").agg(
        F.sum("recognized").alias("n_recognized"),
        F.count("*").alias("n_words"),
        F.round(F.sum("recognized") / F.count("*"), 4).alias("recognition_rate"),
    )


def confusion_matrix(images: DataFrame, detected: DataFrame, truth: DataFrame) -> DataFrame:
    """A3: corpus-level TP/FN/FP/TN over images.

    ``images``: (media_ref) universe; an image is positive when it has
    ground-truth words, detected-positive when it has any detection.
    """
    t = truth.groupBy("media_ref").agg(F.count("*").alias("n_true"))
    d = detected.groupBy("media_ref").agg(F.count("*").alias("n_det"))
    u = (
        images.select("media_ref")
        .join(t, "media_ref", "left")
        .join(d, "media_ref", "left")
        .na.fill(0)
    )
    return u.agg(
        F.sum(F.when((F.col("n_true") > 0) & (F.col("n_det") > 0), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("n_true") > 0) & (F.col("n_det") == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("n_true") == 0) & (F.col("n_det") > 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("n_true") == 0) & (F.col("n_det") == 0), 1).otherwise(0)).alias("tn"),
    )


def ghost_word_check(
    payloads: DataFrame,
    plan: DataFrame,
    fill_value: int = 0,
) -> DataFrame:
    """Post-redaction verification — the ``is_there_ghost_words`` /
    ``is_background_black_enough`` analogue (deid_verification.py:226-301):
    every rectangle the redaction plan committed to must be UNIFORMLY the
    fill value in the actual output pixels; any other byte inside a planned
    rect is a ghost (burned-in text that survived).

    ``plan`` = (media_ref, box_idx, xa, ya, xb, yb) from
    :func:`deidcm_spark.operators.media.redaction_plan`.  One broadcast-
    friendly join on media_ref + one mapInPandas scan; output one row per
    image: (media_ref, n_rects, n_ghost, clean, mean_luminance).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from deidcm_spark.operators.media import decode_payload

    grouped = plan.groupBy("media_ref").agg(
        F.collect_list(F.struct("xa", "ya", "xb", "yb")).alias("_rects")
    )
    joined = payloads.join(grouped, "media_ref", "left")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            cols = (pdf["media_ref"], pdf["pixels"], pdf["width"],
                    pdf["height"], pdf["channels"], pdf["bits"], pdf["_rects"])
            for ref, pixels, w, h, ch, bits, rects in zip(*[c.to_numpy() for c in cols]):
                arr = decode_payload(
                    {"pixels": pixels, "width": w, "height": h,
                     "channels": ch, "bits": bits}
                )
                n_ghost = 0
                rects = [] if rects is None else list(rects)
                for r in rects:
                    crop = arr[r["ya"] : r["yb"] + 1, r["xa"] : r["xb"] + 1]
                    if crop.size and not np.all(crop == fill_value):
                        n_ghost += 1
                out.append({
                    "media_ref": ref,
                    "n_rects": len(rects),
                    "n_ghost": n_ghost,
                    "clean": n_ghost == 0,
                    "mean_luminance": round(float(arr.mean()), 4),
                })
            yield pd.DataFrame(
                out, columns=["media_ref", "n_rects", "n_ghost", "clean", "mean_luminance"]
            )

    return joined.mapInPandas(
        run,
        "media_ref string, n_rects int, n_ghost int, clean boolean, "
        "mean_luminance double",
    )


def prf_metrics(cm: DataFrame) -> DataFrame:
    """A4: precision / recall / F1 / accuracy from a confusion-matrix row."""
    return cm.select(
        "tp", "fn", "fp", "tn",
        F.round(F.expr("tp / greatest(tp + fp, 1)"), 4).alias("precision"),
        F.round(F.expr("tp / greatest(tp + fn, 1)"), 4).alias("recall"),
        F.round(F.expr("2 * tp / greatest(2 * tp + fp + fn, 1)"), 4).alias("f1"),
        F.round(F.expr("(tp + tn) / greatest(tp + tn + fp + fn, 1)"), 4).alias("accuracy"),
    )
