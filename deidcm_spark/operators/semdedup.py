"""SemDeDup — semantic deduplication by cluster-then-prune.

Abbas et al. 2023 (arXiv:2303.09540): k-means-cluster the embedding
space, then remove near-duplicates WITHIN each cluster only — the
clustering bounds the pair space, turning the O(n²) global cosine
search into sum-of-c² local searches that each fit in one task.

Spark-first decomposition:

* the codebook comes from :func:`similarity.ivf_centroids` — hash-seeded
  deterministic k-means, k×d floats riding a closure, never a shuffle;
* assignment is the same one-matmul-per-Arrow-batch pandas UDF the IVF
  index uses (numpy BLAS, no per-row Python);
* the ONLY corpus-sized shuffle is ``groupBy(cluster)``; each cluster's
  pairwise cosine matrix + greedy prune runs vectorized inside one
  ``applyInPandas`` task.

At 10^12 rows the knob is ``n_centroids``: the paper sizes k ∝ n so the
expected cluster stays ~constant (they use 50k clusters for LAION);
per-task work is c² floats on a (c, d) block — bounded by construction,
and the cluster id doubles as the Iceberg partition key so re-runs
prune at scan time.

Keep rule (deterministic, matches the paper's "keep the example least
similar to the centroid"): within a cluster, visit items ordered by
(centroid_sim ascending, vec_id); keep an item iff its cosine to every
ALREADY-KEPT item is below ``threshold``.  A pure function of the
corpus — no RNG, retries and engines agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from deidcm_spark.operators.similarity import _assign_udf, ivf_centroids

OUT_SCHEMA = (
    "vec_id long, cluster int, centroid_sim double, action string"
)


def _prune_cluster(C: np.ndarray, threshold: float, max_cluster_size: int):
    """Per-cluster greedy prune: one (c, d) normalize + one (c, c) matmul,
    then a keep scan over rows in (centroid_sim asc, vec_id) order."""

    def prune(key, pdf):
        cluster = int(key[0])
        if len(pdf) > max_cluster_size:
            # the (c, c) similarity matrix is the cost model — a
            # degenerate codebook (or k too small for n) must fail loudly
            # here, not OOM an executor at scale
            raise ValueError(
                f"cluster {cluster} holds {len(pdf)} vectors "
                f"(> max_cluster_size={max_cluster_size}); raise "
                f"n_centroids (paper recipe: k proportional to n) or "
                f"max_cluster_size"
            )
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        c = C[cluster]
        sim_c = M @ c
        order = np.lexsort((pdf["vec_id"].to_numpy(), sim_c))
        S = M @ M.T
        kept: list[int] = []
        action = np.empty(len(pdf), dtype=object)
        for i in order:
            if kept and np.max(S[i, kept]) >= threshold:
                action[i] = "DROP"
            else:
                action[i] = "KEEP"
                kept.append(i)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": cluster,
                "centroid_sim": np.round(sim_c, 6),
                "action": action,
            }
        )

    return prune


def semdedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    centroids: list[list[float]] | None = None,
    max_cluster_size: int = 30_000,
) -> DataFrame:
    """(vec_id, cluster, centroid_sim, action KEEP/DROP) — SemDeDup over
    an ``(vec_id, embedding)`` table.  ``centroids`` short-circuits the
    codebook build (pass a precomputed/persisted codebook in production
    so re-runs and incremental batches prune against the SAME space).
    ``max_cluster_size`` is the loud-failure bound on the per-task (c, c)
    similarity matrix — a cluster past it raises with guidance instead of
    OOMing an executor (the 30k default is a 7.2 GB float64 matrix; at
    200k it would be 320 GB)."""
    Cl = centroids if centroids is not None else ivf_centroids(
        emb, n_centroids, lloyd_iters
    )
    C = np.asarray(Cl, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    assigned = emb.select(
        "vec_id", "embedding", _assign_udf(Cl)(F.col("embedding")).alias("cluster")
    )
    return assigned.groupBy("cluster").applyInPandas(
        _prune_cluster(C, threshold, max_cluster_size), schema=OUT_SCHEMA
    )
