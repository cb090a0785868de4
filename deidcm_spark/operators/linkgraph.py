"""Link-graph operators over crawled HTML: outlink extraction and
host-level PageRank.

Web-scale curation weights documents by the standing of their host (the
Common-Crawl-style host-level rank): a quality signal orthogonal to the
text itself.  Two operators:

* :func:`extract_links` — (url, html) rows → distinct ``(src_host,
  dst_host, n_links)`` host edges, pure codegen (``regexp_extract_all``
  over ``href`` attributes, absolute http(s) targets only, self-loops
  dropped);
* :func:`host_rank` — PageRank power iteration at host granularity.

PageRank spec (shared with the pure-Python test oracle, tests/test_linkgraph.py):

* nodes = distinct hosts over src ∪ dst; ``N = |nodes|``; ``rank_0 = 1/N``;
* ``out_deg(h)`` = number of distinct out-neighbors;
* per iteration: ``contrib(dst) = Σ_src rank(src) / out_deg(src)``;
  dangling mass = Σ rank over zero-out-degree hosts;
  ``rank'(h) = (1 - d)/N + d · (contrib(h) + dangling/N)``;
* ranks sum to 1 after every iteration (asserted in tests).

Scale shape: each iteration is ONE equi-join of the edge list with the
rank table on ``src_host`` plus one hash aggregation on ``dst_host`` —
the canonical distributed PageRank; the rank/out-degree tables are
|hosts| rows (orders of magnitude below |edges|), the dangling mass is a
single-scalar aggregate per round.  Round state is materialized with the
same lineage-bounding machinery as ``dedup.neardup_components``:
``localCheckpoint`` by default, a reliable per-round parquet directory
via ``checkpoint_dir`` on real clusters, superseded rounds released.

Host skew: a mega-host (wikipedia) is a HOT KEY on both join sides; the
per-iteration join is exactly the AQE skew-join case
(``spark.sql.adaptive.skewJoin`` splits it at runtime — enabled in the
engine session profile and evidenced in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from deidcm_spark.operators.dedup import _release_local_checkpoint

HOST_RE = r"^https?://([^/:?#]+)"
# passed through F.lit (never through SQL text): both quote styles appear
# in the class, which would terminate any SQL string literal
HREF_RE = "href\\s*=\\s*[\"']([^\"']+)[\"']"


def extract_links(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, html) rows → distinct host-level edges ``(src_host, dst_host,
    n_links)``.  Absolute http(s) targets only (relative links stay on
    their own host and carry no cross-host signal); self-loops dropped;
    hosts lowercased.  One scan → explode → one hash aggregation."""
    links = df.select(
        F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
        ).alias("target"),
    )
    return (
        links.select(
            "src_host",
            F.lower(F.regexp_extract("target", HOST_RE, 1)).alias("dst_host"),
        )
        .filter("src_host != '' and dst_host != '' and src_host != dst_host")
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


def host_rank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over distinct host edges → ``(host, rank)``; see the
    module docstring for the exact spec and scale shape.  ``edges`` needs
    ``src_host``/``dst_host`` columns (extra columns ignored; duplicate
    pairs collapse — the rank is structural, not link-count-weighted)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        counter = iter(range(10 * iterations + 10))

        def _ckpt(d: DataFrame) -> DataFrame:
            path = f"{checkpoint_dir}/round_{next(counter)}"
            d.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
            out._round_path = path  # type: ignore[attr-defined]
            return out

        def _release(d: DataFrame) -> None:
            jvm = spark.sparkContext._jvm
            p = jvm.org.apache.hadoop.fs.Path(d._round_path)
            fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
            fs.delete(p, True)
    else:
        _ckpt = lambda d: d.localCheckpoint()  # noqa: E731
        _release = _release_local_checkpoint

    # only e and the per-round ranks are checkpointed: out_deg/nodes are
    # one-shot derivations OF e (already a checkpoint root), so their
    # lineage is bounded without pinning extra frames for the whole run
    e = _ckpt(edges.select("src_host", "dst_host").distinct())
    out_deg = e.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    nodes = (
        e.select(F.col("src_host").alias("host"))
        .union(e.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("host", F.lit(0.0).alias("rank"))
    ranks = _ckpt(
        nodes.join(out_deg, "host", "left")
        .select("host", "out_deg", F.lit(1.0 / n).alias("rank"))
    )
    base = (1.0 - damping) / n
    for _ in range(iterations):
        dangling = (
            ranks.filter("out_deg is null").agg(F.sum("rank")).first()[0] or 0.0
        )
        contrib = (
            e.join(
                ranks.select(
                    F.col("host").alias("src_host"),
                    (F.col("rank") / F.col("out_deg")).alias("share"),
                ),
                "src_host",
            )
            .groupBy(F.col("dst_host").alias("host"))
            .agg(F.sum("share").alias("contrib"))
        )
        new_ranks = _ckpt(
            ranks.join(contrib, "host", "left").select(
                "host",
                "out_deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        _release(ranks)
        ranks = new_ranks
    return ranks.select("host", "rank")


# simple (non-nested) anchor elements; group 0 = the whole tag+text+close
ANCHOR_TAG_RE = "<a[^>]*>[^<]*</a>"


def anchor_texts(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, html) rows → one row per anchor: ``(src_host, dst_host,
    target, anchor)`` — the classic weakly-supervised (query, document)
    training pairs (anchor text describes the page it links to).
    Absolute http(s) targets with non-empty visible text only; pure
    codegen (regexp over the simple non-nested ``<a>`` form; nested
    markup inside anchors is out of contract, like multi-line script
    bodies in the strip-tags tier)."""
    tags = F.expr(
        f"regexp_extract_all({html_col}, '{ANCHOR_TAG_RE}', 0)"
    )
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, HREF_RE, 1).alias("target"),
            F.trim(F.regexp_extract(t, ">([^<]*)</a>", 1)).alias("anchor"),
        ),
    )
    return (
        df.select(
            F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1)).alias(
                "src_host"
            ),
            F.explode(pairs).alias("p"),
        )
        .select(
            "src_host",
            F.lower(F.regexp_extract("p.target", HOST_RE, 1)).alias("dst_host"),
            F.col("p.target").alias("target"),
            F.col("p.anchor").alias("anchor"),
        )
        .filter("src_host != '' and dst_host != '' and anchor != ''")
    )
