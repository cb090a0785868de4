"""Cluster-balanced selection — topic rebalancing for the training mix.

Web crawls are topically skewed: a handful of dominant topics (spam
clusters, boilerplate genres) own most of the mass while the long tail
carries the diversity.  The standard fix is to k-means-cluster the
embedding space and re-draw the training set with per-cluster quotas —
flat ("every topic equally"), proportional (keep the natural mix), or
temperature-scaled ``n_c**alpha`` (the multilingual-sampling trick from
Conneau & Lample, arXiv:1901.07291, applied to clusters: ``alpha=0.5``
up-weights the tail without flattening it; DeepSeek-style data curation
uses exactly this cluster-rebalance shape).

Spark-first decomposition — the same bounded-state discipline as
SemDeDup/IVF, whose codebook machinery this reuses:

1. **assign** — nearest normalized centroid per doc; one matmul-per-
   Arrow-batch pandas UDF over the scan, ZERO shuffles (the k×d
   codebook rides the closure).
2. **sizes** — one hash aggregate → ≤ ``n_centroids`` rows; the only
   driver-visible table, bounded at ANY corpus size.
3. **quotas** — largest-remainder apportionment of ``k`` over the
   cluster weights, capacity-capped, resolved on the bounded table.
4. **select** — per-cluster deterministic top-``quota`` by
   ``(md5(vec_id), vec_id)`` — the SAME order every sampling operator
   here uses.  A window partitioned by cluster alone would SORT a hot
   cluster in one task, so ``n_salts > 1`` runs the standard two-phase
   top-N (cap_per_source's pattern): local window per ``(cluster,
   xxhash64(vec_id) % n_salts)`` with the per-cluster quota as local
   cap — every global survivor ranks ≤ quota in its salt too, so the
   result is IDENTICAL for any ``n_salts`` — then the exact window
   sorts ≤ ``quota × n_salts`` rows per cluster.

Determinism: hash-seeded centroids (similarity.ivf_centroids), hash
ordering, no RNG anywhere — retries and engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from deidcm_spark.operators.similarity import _assign_udf, ivf_centroids


def cluster_quotas(
    sizes: dict[int, int], k: int, policy: str = "uniform",
    alpha: float = 0.5,
) -> dict[int, int]:
    """Apportion ``k`` selection slots over clusters.

    ``policy``: ``uniform`` (weight 1 per cluster), ``proportional``
    (weight = cluster size), ``temperature`` (weight = size**alpha).
    Largest-remainder rounding with deterministic tie-break (bigger
    remainder first, then cluster id), capacity-capped at the cluster
    size; slots a full cluster cannot absorb spill to the next
    largest-remainder cluster with room.  Pure driver arithmetic over
    the ≤ n_centroids-row size table."""
    if policy == "uniform":
        w = {c: 1.0 for c in sizes}
    elif policy == "proportional":
        w = {c: float(n) for c, n in sizes.items()}
    elif policy == "temperature":
        w = {c: float(n) ** alpha for c, n in sizes.items()}
    else:
        raise ValueError(f"unknown policy {policy!r}")
    k = min(k, sum(sizes.values()))
    total_w = sum(w.values()) or 1.0
    exact = {c: k * w[c] / total_w for c in sizes}
    quota = {c: min(sizes[c], int(exact[c])) for c in sizes}
    # hand out remaining slots by largest fractional remainder among
    # clusters with spare capacity; loop because capacity caps can free
    # more slots than one pass can place
    while (left := k - sum(quota.values())) > 0:
        room = [c for c in sizes if quota[c] < sizes[c]]
        room.sort(key=lambda c: (-(exact[c] - int(exact[c])), c))
        for c in room[:left]:
            quota[c] += 1
    return quota


def cluster_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """(emb + cluster column, centroids) — zero-shuffle assignment pass
    (the codebook is a closure constant; train it here or pass a
    persisted one for reuse across snapshots)."""
    cents = centroids or ivf_centroids(emb, n_centroids, lloyd_iters)
    return (
        emb.withColumn("cluster", _assign_udf(cents)(F.col("embedding"))),
        cents,
    )


def similarity_pack_keys(
    emb: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    max_blocks: int = 100_000,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """(doc_id, _key, _blk) — the packing order for in-context
    pretraining (Shi et al., arXiv:2310.10638): documents sorted
    cluster-major, so topically-related documents are ADJACENT in the
    token stream and share training sequences.  Feed to
    ``pack_sequences(..., order="keyed", keys=...)``.

    Key layout: ``(cluster << 44) | md5-44bit(doc_id)`` — the high bits
    group a topic, the hash bits order documents WITHIN the topic.  The
    hash (rather than a nearest-neighbor chain) is a documented
    simplification: the topical-adjacency term is what the paper's
    ablations attribute the gains to, and uniform within-cluster bits
    are what make the two-pass prefix sum's blocks (``_blk`` = equal
    key-space slices over the POPULATED ``n_clusters << 44`` span)
    balanced without a global sort or a quantile pass.  ``_blk`` is
    nondecreasing in ``_key`` by construction, as ``order="keyed"``
    requires.  Assignment is the zero-shuffle matmul UDF; nothing here
    exceeds ``max_blocks`` driver rows."""
    assigned, cents = cluster_assign(emb, n_centroids, lloyd_iters, centroids)
    span = len(cents) << 44
    blk_width = max(1, span // max_blocks)
    h44 = (
        f"cast(conv(substring(md5(concat(cast({id_col} as string), "
        f"':packkey')), 1, 11), 16, 10) as bigint)"
    )
    return (
        assigned.select(
            F.col(id_col).alias("doc_id"),
            (F.shiftleft(F.col("cluster").cast("long"), 44)
             + F.expr(h44)).alias("_key"),
        )
        .withColumn("_blk", F.expr(f"_key div {blk_width}"))
    )


def cluster_balanced_sample(
    emb: DataFrame,
    k: int,
    n_centroids: int = 16,
    policy: str = "uniform",
    alpha: float = 0.5,
    lloyd_iters: int = 1,
    n_salts: int = 1,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The ``k`` selected rows ``(vec_id, cluster)`` under the
    cluster-quota policy — deterministic, repartition-stable, identical
    for every ``n_salts`` (pick it so hot_cluster/n_salts fits a task).

    The assignment frame is persisted internally: the sizes collect AND
    the returned selection plan both read it, and without the cache the
    centroid-matmul pandas UDF (the dominant cost) runs over the full
    corpus twice.  The cache rides the result as ``_persisted_deps`` —
    release with :func:`deidcm_spark.operators.dedup.release_caches`
    after materializing."""
    assigned, cents = cluster_assign(emb, n_centroids, lloyd_iters, centroids)
    assigned = assigned.select("vec_id", "cluster").persist()
    sizes = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    quota = cluster_quotas(sizes, k, policy, alpha)
    # per-cluster quota rides as a plan literal (bounded by n_centroids)
    quota_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in quota.items() for x in kv]),
        F.col("cluster"),
    )
    order = [F.md5(F.col("vec_id").cast("string")), F.col("vec_id")]
    df = assigned.withColumn("_q", quota_col)
    if n_salts > 1:
        w1 = Window.partitionBy(
            "cluster", F.expr(f"pmod(xxhash64(vec_id), {n_salts})")
        ).orderBy(*order)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= F.col("_q"))
            .drop("_rn1")
        )
    w = Window.partitionBy("cluster").orderBy(*order)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_q"))
        .drop("_rn", "_q")
    )
    out._persisted_deps = (assigned,)  # type: ignore[attr-defined]
    return out
