"""Product quantization (PQ) for embedding compression + ANN search
(Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011 — public method).

At 100 TB an ``array<float>`` embedding column dominates storage: 64
float32 dims = 256 bytes/row.  PQ splits each vector into ``m``
subvectors, quantizes each against its own ``ksub``-centroid codebook,
and stores only the code indices — ``m`` small ints per row (m=4,
ksub=16 → the 256-byte column becomes 4 codes), while search runs on
the CODES table via asymmetric distance computation (ADC): the query
is NOT quantized; its exact distance to every centroid of every
subspace is a tiny m x ksub lookup table computed once driver-side,
and each row's approximate distance is a sum of m table lookups.

Spark mapping (mirrors ``similarity.py``'s IVF conventions):

* ``pq_train`` — deterministic codebooks: seeds from the md5-ordered
  sample (no RNG), optional Lloyd passes expressed as DataFrame ops
  (assign = the encode kernel, re-center = posexplode + groupBy avg).
  The codebook (m x ksub x d/m floats, k x d total) is the ONLY
  collect, same bound as ``ivf_centroids``.
* ``pq_encode`` — one vectorized pandas-UDF projection, zero shuffles:
  the Arrow batch stacks into an (n, d) matrix and each subspace is one
  broadcasting distance computation + argmin.  The output codes table
  is what gets persisted; encoding happens once per corpus, not per
  query.
* ``pq_search`` — the hot path is PURE JVM: the LUT rides into the plan
  as a nested array literal and the score is
  ``aggregate(zip_with(codes, lut, (c, r) -> element_at(r, c+1)), ...)``
  — whole-stage codegen over the codes scan, then top-k =
  TakeOrderedAndProject (partial per partition, no global sort).  With
  ``rerank=N`` the ADC shortlist (N rows) joins back to the original
  embeddings for exact re-scoring — the standard recall repair, and the
  join side is shortlist-sized so AQE broadcasts it.

Distances are squared L2 (the PQ-native metric).  On L2-normalized
vectors squared L2 = 2 - 2*cosine, so ascending L2 ranking on a
normalized corpus is exactly descending-cosine ranking — callers
wanting cosine semantics normalize first (``normalize=True`` on
``pq_train``/``pq_encode``/``pq_search`` applies the same in-row
normalization everywhere).

Determinism: seeding and tie-breaks are md5/argmin-lowest-index; the
encode kernel and the tests' numpy oracle perform the identical
float64 operations in the identical order, so codes and ADC scores are
bit-reproducible (Lloyd re-centering uses Spark ``avg`` like
``ivf_centroids`` — deterministic for a fixed layout; tests pin
two-run equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_search",
    "adc_table",
    "l2_brute_force",
    "ivfpq_train",
    "ivfpq_encode",
    "ivfpq_search",
]

# squared L2 between two array<float/double> columns, left-to-right fold
_SQL2_EXPR = (
    "aggregate(zip_with({x}, {y}, (a, b) -> (cast(a as double) - cast(b as double))"
    " * (cast(a as double) - cast(b as double))), 0D, (acc, v) -> acc + v)"
)

# NOTE: the norm must NOT live inside the transform lambda — HOF lambdas
# get no common-subexpression elimination, so the aggregate would
# re-evaluate per element (textops' measured 15x pitfall).  _normalized
# layers two projections instead: norm once, then the divide.
_NORM_AGG = (
    "greatest(sqrt(aggregate({x}, 0D, (acc, u) ->"
    " acc + cast(u as double) * cast(u as double))), 1e-12D)"
)


def _normalized(df: DataFrame, embedding_col: str) -> DataFrame:
    return (
        df.withColumn("_emb_norm", F.expr(_NORM_AGG.format(x=embedding_col)))
        .withColumn(
            embedding_col,
            F.expr(f"transform({embedding_col}, v -> cast(v as double) / _emb_norm)"),
        )
        .drop("_emb_norm")
    )


def _check_geometry(dim: int, m: int, ksub: int) -> None:
    if m < 1 or dim % m != 0:
        raise ValueError(f"m={m} must divide the embedding dim {dim}")
    if ksub < 1 or ksub > 256:
        raise ValueError(f"ksub={ksub} out of range [1, 256] (codes are bytes at scale)")


def _encode_matrix(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float64 matrix -> (n, m) int32 codes.  Shared between the
    executor kernel and the tests' oracle twin: identical broadcasting
    subtract/square/sum/argmin in float64, so codes match bit for bit."""
    m, ksub, dsub = books.shape
    codes = np.empty((M.shape[0], m), dtype=np.int32)
    for s in range(m):
        X = M[:, s * dsub:(s + 1) * dsub]
        D = ((X[:, None, :] - books[None, s]) ** 2).sum(axis=-1)
        codes[:, s] = np.argmin(D, axis=1)  # ties -> lowest code
    return codes


def _encode_udf(codebooks: list[list[list[float]]]):
    # normalization happens in the JVM projection (_normalized) BEFORE
    # this stage, so the kernel sees final vectors in every mode
    books = np.asarray(codebooks, dtype=np.float64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(embedding: pd.Series) -> pd.Series:
        M = np.stack(embedding.to_numpy()).astype(np.float64)
        codes = _encode_matrix(M, books)
        return pd.Series(list(codes))

    return encode


def pq_train(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    lloyd_iters: int = 1,
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train the PQ codebooks: ``codebooks[sub][code]`` is a d/m-dim
    centroid.  Seeds are the first ``ksub`` vectors in deterministic
    md5(id) order (hash sample, retry-stable), split into their m
    subvectors; each Lloyd pass assigns codes with the encode kernel and
    re-centers via posexplode + groupBy avg — the collect is bounded by
    the codebook size (m * ksub * d/m = ksub * d values), never by the
    corpus."""
    first = emb.select(embedding_col).head()
    if first is None:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    dim = len(first[0])
    _check_geometry(dim, m, ksub)
    dsub = dim // m

    src = emb.select(id_col, embedding_col)
    if normalize:
        src = _normalized(src, embedding_col)
    seeds = (
        src.orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(ksub)
        .select(embedding_col)
        .collect()
    )
    vecs = [list(r[0]) for r in seeds]
    books = [
        [v[s * dsub:(s + 1) * dsub] for v in vecs]
        for s in range(m)
    ]
    # corpus smaller than ksub: fewer codes, clamp like ivf_centroids
    ksub_eff = len(vecs)
    for _ in range(lloyd_iters):
        # normalize=False here: src is already normalized when requested
        enc = src.withColumn("codes", _encode_udf(books)(F.col(embedding_col)))
        means = (
            enc.select("codes", F.posexplode(embedding_col).alias("d", "v"))
            .select(
                (F.col("d") / dsub).cast("int").alias("sub"),
                F.expr(f"element_at(codes, cast(d / {dsub} as int) + 1)").alias("code"),
                (F.col("d") % dsub).alias("dd"),
                "v",
            )
            .groupBy("sub", "code", "dd")
            .agg(F.avg("v").alias("mean"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            acc.setdefault((r["sub"], r["code"]), {})[r["dd"]] = r["mean"]
        books = [
            [
                [acc[(s, c)][d] for d in range(dsub)]
                if (s, c) in acc else books[s][c]  # empty code keeps its seed
                for c in range(ksub_eff)
            ]
            for s in range(m)
        ]
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus -> the persistable codes table ``(id, codes array<int>)``.
    One vectorized projection, zero exchanges; this is the compression
    step run once per corpus (the 100 TB float column reduces ~d*4/m x)."""
    src = emb
    if normalize:
        src = _normalized(src, embedding_col)
    return src.select(
        id_col,
        _encode_udf(codebooks)(F.col(embedding_col)).alias("codes"),
    )


def adc_table(query: list[float], codebooks: list[list[list[float]]],
              normalize: bool = False) -> list[list[float]]:
    """The m x ksub asymmetric-distance lookup table: exact squared L2
    from each query SUBVECTOR to each centroid of its subspace.  Tiny —
    computed once driver-side per query, shipped as a plan literal."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    q = np.asarray(query, dtype=np.float64)
    if normalize:
        q = q / max(np.linalg.norm(q), 1e-12)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != codebook dim {m * dsub}")
    lut = ((q.reshape(m, 1, dsub) - books) ** 2).sum(axis=-1)
    return [[float(v) for v in row] for row in lut]


def _lut_literal(lut: list[list[float]]):
    return F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in lut])


def _exact_l2_topk(rows: DataFrame, q: list[float], k: int,
                   embedding_col: str, id_col: str) -> DataFrame:
    """Exact squared-L2 top-k of ``rows`` against an already-normalized
    query — the ONE copy of the scoring projection shared by
    :func:`l2_brute_force` and both searchers' rerank stages: the 6-dp
    rounding and the (dist, id) tie-break feed oracle hashes, so a change
    here must change all three lanes together."""
    scored = rows.withColumn(
        "_q", F.array(*[F.lit(float(v)) for v in q])
    ).select(
        id_col,
        F.expr(
            "round(" + _SQL2_EXPR.format(x=embedding_col, y="_q") + ", 6)"
        ).alias("l2_dist"),
    )
    return scored.orderBy(F.col("l2_dist").asc(), F.col(id_col)).limit(k)


def _exact_rerank(shortlist: DataFrame, emb: DataFrame, q: list[float],
                  k: int, normalize: bool, embedding_col: str,
                  id_col: str) -> DataFrame:
    """Join an ADC shortlist back to the original embeddings (shortlist-
    sized side — AQE broadcasts it) and return the true top-k — the
    standard PQ recall repair, shared by pq_search and ivfpq_search."""
    src = emb
    if normalize:
        src = _normalized(src, embedding_col)
    return _exact_l2_topk(
        shortlist.select(id_col).join(src.select(id_col, embedding_col), id_col),
        q, k, embedding_col, id_col,
    )


def pq_search(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    rerank: int | None = None,
    emb: DataFrame | None = None,
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the codes table -> ``(id, adc_dist)`` ascending
    (squared-L2 estimate, 6 dp).  The scoring expression is pure JVM
    codegen (LUT literal + zip_with/element_at fold) and top-k is
    TakeOrderedAndProject — no Python, no global sort, at any corpus
    size.

    ``rerank=N`` (requires ``emb``): keep the N best ADC rows, join back
    to the original embeddings (shortlist-sized side — AQE broadcasts
    it), score exact squared L2, return the true top-k of the shortlist
    as ``(id, l2_dist)`` — the standard PQ recall repair."""
    if rerank is not None and emb is None:
        raise ValueError("rerank requires the original embeddings DataFrame")
    lut = adc_table(query, codebooks, normalize=normalize)
    scored = codes.withColumn("_lut", _lut_literal(lut)).select(
        id_col,
        F.expr(
            "round(aggregate(zip_with(codes, _lut, (c, r) -> element_at(r, c + 1)),"
            " 0D, (acc, v) -> acc + v), 6)"
        ).alias("adc_dist"),
    )
    shortlist = scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(
        rerank if rerank is not None else k
    )
    if rerank is None:
        return shortlist
    return _exact_rerank(shortlist, emb, adc_query_vector(query, normalize),
                         k, normalize, embedding_col, id_col)


def adc_query_vector(query: list[float], normalize: bool) -> list[float]:
    q = np.asarray(query, dtype=np.float64)
    if normalize:
        q = q / max(np.linalg.norm(q), 1e-12)
    return [float(v) for v in q]


def l2_brute_force(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact squared-L2 top-k — the recall baseline for PQ (the L2 twin
    of ``similarity.ann_brute_force``)."""
    src = emb
    if normalize:
        src = _normalized(src, embedding_col)
    return _exact_l2_topk(src, adc_query_vector(query, normalize), k,
                          embedding_col, id_col)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product quantization
# (Jégou et al. TPAMI 2011 §IV — the composed billion-scale layout)
# ---------------------------------------------------------------------------


def _residual_encode_udf(coarse: list[list[float]], codebooks):
    """(embedding, list_id) -> residual PQ codes: subtract the row's
    coarse centroid, then the shared encode kernel."""
    C = np.asarray(coarse, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(embedding: pd.Series, list_id: pd.Series) -> pd.Series:
        M = np.stack(embedding.to_numpy()).astype(np.float64)
        R = M - C[list_id.to_numpy()]
        return pd.Series(list(_encode_matrix(R, books)))

    return encode


def ivfpq_train(
    emb: DataFrame,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 16,
    lloyd_iters: int = 1,
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the composed index: ``(coarse, codebooks)``.

    The coarse quantizer IS product quantization with m=1 and
    ksub=nlist — same seeded init, same Lloyd machinery, L2 assignment
    (``similarity.ivf_centroids`` assigns by cosine; this lane is
    L2-native).  The PQ codebooks then train on the RESIDUALS
    ``x - coarse[list(x)]`` — residuals concentrate near zero, so the
    same ksub spends its resolution where the data actually is (the
    reason IVF-PQ beats flat PQ at equal code size).  Both codebooks
    are collect-bounded (nlist·d + ksub·d floats)."""
    coarse_books = pq_train(
        emb, m=1, ksub=nlist, lloyd_iters=lloyd_iters, normalize=normalize,
        embedding_col=embedding_col, id_col=id_col,
    )
    coarse = coarse_books[0]
    src = emb.select(id_col, embedding_col)
    if normalize:
        src = _normalized(src, embedding_col)
    assigned = src.withColumn(
        "_list", _encode_udf(coarse_books)(F.col(embedding_col))[0]
    )
    Cb = np.asarray(coarse, dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _residual(embedding: pd.Series, list_id: pd.Series) -> pd.Series:
        M = np.stack(embedding.to_numpy()).astype(np.float64)
        return pd.Series(list(M - Cb[list_id.to_numpy()]))

    res = assigned.select(
        id_col, _residual(F.col(embedding_col), F.col("_list")).alias("res")
    )
    # the nested pq_train runs several actions (dim probe, seed collect,
    # one per Lloyd iteration) — without a persist each one re-executes
    # the coarse-encode AND residual pandas UDFs over the full corpus;
    # persist (not localCheckpoint) keeps lineage for executor-loss
    # recovery and is released as soon as training is done
    res = res.persist()
    try:
        books = pq_train(
            res, m=m, ksub=ksub, lloyd_iters=lloyd_iters,
            embedding_col="res", id_col=id_col,
        )
    finally:
        res.unpersist()
    return coarse, books


def ivfpq_encode(
    emb: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus -> ``(id, list_id, codes)``: the persistable IVF-PQ index
    rows.  One vectorized projection, zero exchanges.  At corpus scale
    ``list_id`` is the partition key, so probing prunes at planning
    time (the ann_lsh/ann_ivf pattern)."""
    src = emb
    if normalize:
        src = _normalized(src, embedding_col)
    assigned = src.withColumn(
        "list_id", _encode_udf([coarse])(F.col(embedding_col))[0]
    )
    return assigned.select(
        id_col,
        "list_id",
        _residual_encode_udf(coarse, codebooks)(
            F.col(embedding_col), F.col("list_id")
        ).alias("codes"),
    )


def ivfpq_search(
    index: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: int | None = None,
    emb: DataFrame | None = None,
    normalize: bool = False,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the ``nprobe`` lists nearest the query.

    Driver side computes nprobe coarse distances + one LUT per probed
    list (against the query's PER-LIST residual ``q - c_list``); the
    plan carries them as a ``map<int, array<array<double>>>`` literal,
    so scoring is ``element_at(map, list_id)`` then the same
    zip_with/element_at fold — PURE JVM over the pruned scan
    (``list_id IN (...)`` is a pushable IN-list; at 10^9+ rows the list
    id is the partition key and pruning happens at planning time).
    Top-k = TakeOrderedAndProject; ``rerank=N`` repairs recall exactly
    like :func:`pq_search`."""
    if rerank is not None and emb is None:
        raise ValueError("rerank requires the original embeddings DataFrame")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    q = np.asarray(adc_query_vector(query, normalize), dtype=np.float64)
    C = np.asarray(coarse, dtype=np.float64)
    dists = ((q[None, :] - C) ** 2).sum(axis=1)
    probes = [int(p) for p in np.argsort(dists, kind="stable")[:nprobe]]
    luts = {
        p: adc_table([float(v) for v in (q - C[p])], codebooks)
        for p in probes
    }
    map_entries: list = []
    for p in probes:
        map_entries.append(F.lit(p))
        map_entries.append(_lut_literal(luts[p]))
    scored = (
        index.filter(F.col("list_id").isin(probes))
        .withColumn("_luts", F.create_map(*map_entries))
        .select(
            id_col,
            F.expr(
                "round(aggregate(zip_with(codes, element_at(_luts, list_id),"
                " (c, r) -> element_at(r, c + 1)), 0D, (acc, v) -> acc + v), 6)"
            ).alias("adc_dist"),
        )
    )
    shortlist = scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(
        rerank if rerank is not None else k
    )
    if rerank is None:
        return shortlist
    return _exact_rerank(shortlist, emb, [float(v) for v in q], k,
                         normalize, embedding_col, id_col)
