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

from pyspark.sql import DataFrame, functions as F

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
    """Deterministic pseudo-random hyperplane: coefficient for dimension d of
    plane p = (md5int(p:d) mod 2001) - 1000, i.e. uniform in [-1000, 1000]."""
    terms = " + ".join(
        f"cast({col}[{d}] as double) * "
        f"(cast(conv(substring(md5('{plane}:{d}'), 1, 8), 16, 10) as bigint) % 2001 - 1000)"
        for d in range(dim)
    )
    return f"case when ({terms}) > 0 then 1 else 0 end"


def signature_expr(col: str, n_planes: int, dim: int) -> str:
    bits = [hyperplane_sign_expr(col, p, dim) for p in range(n_planes)]
    return "concat(" + ", ".join(f"cast({b} as string)" for b in bits) + ")"


def ann_lsh_bucketed(
    emb: DataFrame, query: list[float], k: int = 10, n_planes: int = 4
) -> DataFrame:
    """Sign-LSH bucketed ANN: prune to the query's bucket, then exact rerank.

    Approximate by construction (a true neighbor can land one bit away);
    recall is measured in tests against ann_brute_force.
    """
    dim = len(query)
    sig = signature_expr("embedding", n_planes, dim)
    bucketed = emb.withColumn("bucket", F.expr(sig))
    qdf = emb.sparkSession.createDataFrame([(query,)], "q: array<float>")
    qsig = qdf.select(F.expr(signature_expr("q", n_planes, dim)).alias("bucket"))
    in_bucket = bucketed.join(F.broadcast(qsig), "bucket")
    scored = in_bucket.withColumn("q", _lit_array(query)).select(
        "vec_id", F.expr(COSINE_EXPR.format(x="embedding", y="q")).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)
