"""Similarity search over an embedding column (``array<float>``).

* ``ann_brute_force`` — exact cosine top-k against a query vector; the
  correctness baseline.  Pure Spark SQL higher-order functions
  (``zip_with`` + ``aggregate``), JVM-side, one scan, no shuffle until the
  final top-k (``orderBy ... limit`` = TakeOrdered, partial per partition).
* ``ann_lsh_bucketed`` — the scale path: deterministic random-hyperplane
  signs (planes derived from md5, no RNG state) bucket the corpus by a
  sign-prefix; the query probes only its own bucket, falling back to
  brute force within it.  At 10^12 rows the bucket column would be the
  Iceberg partition key so probing prunes partitions at scan time.

Floats: embeddings are float32; all arithmetic is done in double and scores
ROUNDED (4 dp) when they feed the DuckDB oracle hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType

# cosine(x, y) assuming non-zero vectors; {x}/{y} are column names
COSINE_EXPR = (
    "round(aggregate(zip_with({x}, {y}, (a, b) -> cast(a as double) * cast(b as double)),"
    " 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate({x}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    " * sqrt(aggregate({y}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))), 4)"
)


def query_vector(emb: DataFrame, vec_id: int = 0) -> list[float]:
    """Deterministic query vector: the embedding of a fixed vec_id."""
    return list(emb.filter(F.col("vec_id") == vec_id).head()["embedding"])


def _lit_array(vec: list[float]):
    return F.array(*[F.lit(float(v)) for v in vec])


def ann_brute_force(emb: DataFrame, query: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k; deterministic tie-break on vec_id."""
    scored = emb.withColumn("q", _lit_array(query)).select(
        "vec_id", F.expr(COSINE_EXPR.format(x="embedding", y="q")).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def ann_threshold(emb: DataFrame, query: list[float], threshold: float) -> DataFrame:
    """All vectors with cosine ≥ threshold (set semantics — oracle-friendly,
    no top-k boundary sensitivity to float noise)."""
    scored = emb.withColumn("q", _lit_array(query)).select(
        "vec_id", F.expr(COSINE_EXPR.format(x="embedding", y="q")).alias("cosine")
    )
    return scored.filter(F.col("cosine") >= threshold)


def hyperplane_sign_expr(col: str, plane: int, dim: int) -> str:
    """Deterministic pseudo-random hyperplane sign bit: coefficient for
    dimension d of plane p = (md5int(p:d) mod 2001) - 1000, i.e. uniform in
    [-1000, 1000].  HOF form (aggregate over a coefficient-array literal):
    the unrolled ``e[0]*c0 + e[1]*c1 + ...`` chain blows the 64 KB JVM
    method limit at 16 planes x 64 dims and falls out of codegen; this
    compiles to a loop.  The fold starts at 0D and adds left-to-right —
    bit-identical to the unrolled chain (0+t0 == t0 in IEEE) and to the
    Python twin :func:`query_signature_bits`."""
    coeffs = "array(" + ", ".join(
        f"{_plane_coeff(plane, d)}D" for d in range(dim)
    ) + ")"
    return (
        f"case when aggregate(zip_with({col}, {coeffs}, "
        "(a, b) -> cast(a as double) * b), 0D, (acc, v) -> acc + v) > 0 "
        "then 1 else 0 end"
    )


def signature_expr(col: str, n_planes: int, dim: int) -> str:
    bits = [hyperplane_sign_expr(col, p, dim) for p in range(n_planes)]
    return "concat(" + ", ".join(f"cast({b} as string)" for b in bits) + ")"


def _assign_udf(centroids):
    """Vectorized cluster assignment: stack the Arrow batch into one (n, d)
    matrix, one matmul against the normalized centroid matrix, argmax.
    This is the IVF scale path — numpy BLAS per batch, no per-row Python."""
    C = np.asarray(centroids, dtype=np.float64)
    # zero-norm guard like the batch side below: one all-zero centroid (a
    # zero seed embedding, or a Lloyd mean landing at zero) would divide
    # to a NaN row and argmax would send EVERY row to that cluster
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(IntegerType())
    def assign(embedding: pd.Series) -> pd.Series:
        M = np.stack(embedding.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return assign


def ivf_centroids(emb: DataFrame, n_centroids: int = 16, lloyd_iters: int = 1
                  ) -> list[list[float]]:
    """Deterministic IVF codebook: initialize from a hash-ordered sample
    (no RNG state — reproducible on retry), then ``lloyd_iters`` k-means
    refinement passes expressed as DataFrame ops (assign via the matmul
    UDF, re-center via explode + groupBy avg).  The codebook is tiny
    (k x d) — it rides a broadcast/closure, never a shuffle."""
    seeds = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .select("embedding")
        .collect()
    )
    centroids = [list(r["embedding"]) for r in seeds]
    if not centroids:
        # downstream would otherwise die on an opaque numpy AxisError
        # (norm over axis 1 of a (0,) array) deep inside _assign_udf
        raise ValueError("cannot build IVF centroids on an empty corpus")
    # corpus smaller than n_centroids → fewer seeds; clamp so the
    # empty-cluster fallback below never indexes past the seed list
    n_centroids = len(centroids)
    for _ in range(lloyd_iters):
        assigned = emb.withColumn("cluster", _assign_udf(centroids)(F.col("embedding")))
        means = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        centroids = [
            [by_cluster[c][d] for d in sorted(by_cluster[c])]
            if c in by_cluster else centroids[c]  # empty cluster keeps its seed
            for c in range(n_centroids)
        ]
    return centroids


def ann_ivf(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_centroids`` inverted
    lists, probe the ``nprobe`` lists nearest to the query, exact-rerank
    inside them.  At 10^12 rows the cluster id is the Iceberg partition
    key, so probing prunes partitions at scan time; assignment is one
    numpy matmul per Arrow batch.  Recall vs ann_brute_force is measured
    in tests (test_training_ops)."""
    C = centroids if centroids is not None else ivf_centroids(emb, n_centroids, lloyd_iters)
    Cn = np.asarray(C, dtype=np.float64)
    Cn = Cn / np.maximum(np.linalg.norm(Cn, axis=1, keepdims=True), 1e-12)
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    # stable sort: centroid-similarity ties must order identically across
    # numpy builds (ivfpq_search already does this for the same operation)
    probe = np.argsort(-(Cn @ q), kind="stable")[:nprobe].tolist()

    assigned = emb.withColumn("cluster", _assign_udf(C)(F.col("embedding")))
    in_lists = assigned.filter(F.col("cluster").isin([int(p) for p in probe]))
    scored = in_lists.withColumn("q", _lit_array(query)).select(
        "vec_id", F.expr(COSINE_EXPR.format(x="embedding", y="q")).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def _plane_coeff(plane: int, d: int) -> int:
    """Python twin of the coefficient in :func:`hyperplane_sign_expr` —
    identical md5 arithmetic, so driver-side query signatures match the
    SQL-computed corpus signatures bit for bit."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{d}".encode("utf8")).hexdigest()[:8], 16)
    return (h % 2001) - 1000


def query_signature_bits(query: list[float], n_planes: int) -> list[int]:
    """Sign bits of the query vector under the shared hyperplane spec.

    The dot product accumulates left-to-right in float64 exactly like the
    SQL ``t0 + t1 + ...`` chain (same IEEE operation order), so the result
    equals what ``signature_expr`` computes for the same vector."""
    bits = []
    for p in range(n_planes):
        s = 0.0
        for d, v in enumerate(query):
            s += float(v) * _plane_coeff(p, d)
        bits.append(1 if s > 0 else 0)
    return bits


def ann_lsh_bucketed(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """Sign-LSH bucketed ANN with Hamming-1 MULTI-PROBE: scan the query's
    own sign bucket plus every bucket one hyperplane-bit away
    (``n_planes + 1`` buckets total), then exact-cosine rerank.

    Single-probe has a structural miss mode — a true neighbor one bit away
    is invisible; multi-probe removes the radius-1 misses while still
    pruning the corpus to (n_planes+1)/2^n_planes of its buckets.  The
    probe set is a literal IN-list, so it pushes down to the scan (at
    10^12 rows the bucket column is the Iceberg partition key and probing
    prunes partitions at planning time).  Recall vs ann_brute_force is
    asserted in tests across multiple query vectors.
    """
    dim = len(query)
    sig = signature_expr("embedding", n_planes, dim)
    bucketed = emb.withColumn("bucket", F.expr(sig))
    qbits = query_signature_bits(query, n_planes)
    base = "".join(str(b) for b in qbits)
    probes = [base]
    if multiprobe:
        for p in range(n_planes):
            flipped = qbits.copy()
            flipped[p] = 1 - flipped[p]
            probes.append("".join(str(b) for b in flipped))
    in_bucket = bucketed.filter(F.col("bucket").isin(probes))
    scored = in_bucket.withColumn("q", _lit_array(query)).select(
        "vec_id", F.expr(COSINE_EXPR.format(x="embedding", y="q")).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)
