"""Worker for bench.py — one FRESH process, one full pass over the headline
queries.  The parent launches several of these (CPU-pinned, interleaved) and
takes the per-query best across processes: the same methodology as
bench_scaling.py, adopted for the driver-visible bench per r2's VERDICT
(single-shot in-one-JVM timings moved up to ±25% with host jitter and made
round-over-round comparison meaningless).

Modes:
  prepare <sf_dir> <cpus>      — materialize the lane corpora under /tmp
                                 (deid span corpus, replicated HTML corpus,
                                 media payload/box tables) so NO generation
                                 cost ever lands in a timed window;
  run <sf_dir> <cpus>          — time every lane + query, print ONE JSON.

Per query: one warm pass (codegen, Arrow worker spin-up, parquet footers),
then timed runs at the bench sf — best-of-2 for the multi-second lanes
(deid/extract/media: long windows already average jitter), best-of-3 for
the mostly sub-second contract queries (50 ms of host steal is 15% on a
0.3 s query).  The in-process min smooths GC pauses; the cross-process min
smooths host steal-time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

DEID_CORPUS = "/tmp/bench_deid_corpus.parquet"
HTML_CORPUS = "/tmp/bench_html_corpus.parquet"
MEDIA_PAYLOADS = "/tmp/bench_media_payloads.parquet"
MEDIA_BOXES = "/tmp/bench_media_boxes.parquet"
EMB_CORPUS = "/tmp/bench_emb_corpus.parquet"
WARC_SHARDS = "/tmp/bench_warc_shards"
MARKER = "/tmp/bench_corpora_marker.json"
WARM_SF = "/root/testdata/sf0.001"

# bench query set: every operator family with a contract entry, plus the
# round-3 additions (text_stats replaces the five row-local signal queries)
HEADLINERS = [
    "deid_ingest_testdata",
    "q1_pricing_summary",
    "join_customer_nation_region",
    "anti_join_customers_without_orders",
    "events_rollup",
    "rule_classification",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "dedup_exact",
    "text_stats",
    "simhash",
    "ann_threshold",
    "media_redaction_plan",
    "html_strip_tags",
    "extract_main_content",
    "layout_parse",
    "phi_scrub",
    "dataset_split",
    "gopher_repetition",
    "passage_dedup",
    "decontaminate",
    "events_asof_join",
]
ALIASES = {"media_redaction_plan": "media_redaction"}

# lanes whose contract entry was merged away (html_strip_tags lives inside
# the html_signals tagged union since r4) keep their historical timing
# basis by calling the standalone operator directly
def _lane_html_strip_tags(spark, sf_dir):
    from deidcm_spark.operators import extract

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract.strip_tags(extract.with_html(docs)).select(
        "doc_id", "plain_text", "n_chars"
    )


def _lane_simhash(spark, sf_dir):
    # r5: the simhash contract entry became a tagged union (signatures +
    # banded near-dup pairs over the doubled corpus); the bench lane keeps
    # timing the historical signature operator alone
    from deidcm_spark.operators import dedup

    return dedup.simhash(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    )


LOCAL_LANES = {
    "html_strip_tags": _lane_html_strip_tags,
    "simhash": _lane_simhash,
}


def _sf(sf_dir: str) -> float:
    from tools.bench_common import sf_from_dir

    return sf_from_dir(sf_dir)


def prepare(sf_dir: str, cpus: int) -> None:
    from deidcm_spark.corpus import synth_documents, synth_media
    from deidcm_spark.session import get_spark

    # cpus is part of the identity: the corpora are written with a
    # cpus-derived partition layout, and the no-shuffle lane consumes that
    # layout as-is — reusing a 32-core layout for an 8-core run would
    # silently misattribute the headline number (r3 review finding 3)
    marker = {"sf_dir": sf_dir, "cpus": cpus}
    if os.path.exists(MARKER):
        try:
            if json.load(open(MARKER)) == marker and os.path.isdir(
                WARC_SHARDS
            ) and all(
                os.path.exists(os.path.join(p, "_SUCCESS"))
                for p in (DEID_CORPUS, HTML_CORPUS, MEDIA_PAYLOADS,
                          MEDIA_BOXES, EMB_CORPUS)
            ):
                return
        except Exception:
            pass
    spark = get_spark(app_name="bench_prepare", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    n_docs = max(2000, int(200_000 * _sf(sf_dir)))
    synth_documents(
        spark, n_docs, seed=97, tags_per_doc=40, media_rate=0.1, skew=0.02,
        num_partitions=cpus * 2,
    ).write.mode("overwrite").parquet(DEID_CORPUS)

    from tools.bench_common import replicate_docs

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    replicate_docs(base, 16).repartition(cpus * 2).write.mode(
        "overwrite"
    ).parquet(HTML_CORPUS)

    payloads, boxes = synth_media(spark, 200, seed=17, media_rate=0.5)
    payloads.write.mode("overwrite").parquet(MEDIA_PAYLOADS)
    boxes.write.mode("overwrite").parquet(MEDIA_BOXES)

    # PQ/ANN lane corpus: the sf embeddings replicated 32x with distinct
    # vec_ids (in-row explode, no shuffle) — 64k vectors at sf0.1
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.expr("explode(sequence(0, 31))").alias("rep"),
            "vec_id", "embedding",
        )
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
            "embedding",
        )
        .repartition(cpus * 2)
        .write.mode("overwrite")
        .parquet(EMB_CORPUS)
    )

    # deterministic .warc.gz shard tree from the documents table (each
    # page body carries two cross-host links so the hostrank lane has a
    # real graph); written once, outside every timed window
    import shutil

    from deidcm_spark.warc import encode_warc

    shutil.rmtree(WARC_SHARDS, ignore_errors=True)
    os.makedirs(WARC_SHARDS)
    rows = base.select("doc_id", "text").orderBy("doc_id").collect()
    per_shard = max(1, len(rows) // 16)
    for s in range(0, len(rows), per_shard):
        recs = []
        for r in rows[s : s + per_shard]:
            body = (
                f'<html><a href="https://hub{r.doc_id % 97}.example/t">t</a>'
                f'<a href="https://peer{r.doc_id % 7}.example/u">u</a>'
                f"<p>{r.text}</p></html>"
            ).encode("utf-8", "replace")
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
                b"\r\n\r\n" + body
            )
            recs.append({
                "type": "response",
                "record_id": f"<urn:uuid:{r.doc_id}>",
                "date": "2024-01-01T00:00:00Z",
                "uri": f"https://site{r.doc_id % 211}.example/p{r.doc_id}",
                "content_type": "application/http; msgtype=response",
                "payload": http,
            })
        with open(f"{WARC_SHARDS}/shard{s // per_shard:04d}.warc.gz", "wb") as f:
            f.write(encode_warc(recs, gzip_members=True))
    json.dump(marker, open(MARKER, "w"))
    spark.stop()


def run(sf_dir: str, cpus: int) -> None:
    import __spark_entry__ as entry_mod
    from deidcm_spark.operators import extract
    from deidcm_spark.operators.deidentify import deidentify_attributes
    from deidcm_spark.operators.media import redact_media
    from deidcm_spark.session import get_spark

    spark = get_spark(
        app_name="bench_worker", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name: str, fn, runs: int = 2) -> None:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    # --- deid lane (flagship): pre-written span corpus, persisted+counted
    docs = spark.read.parquet(DEID_CORPUS).persist()
    n_docs = docs.count()
    deidentify_attributes(docs.limit(512), "9.9.9.9.9", "warm").agg(
        F.count("*")
    ).collect()
    timed("deid_synth", lambda: deidentify_attributes(
        docs, "9.9.9.9.9", "bench", num_partitions=cpus * 2
    ).agg(F.sum(F.size("spans"))).collect())
    # runs=4: sub-second at sf0.1 — one 50 ms steal episode is >8%, so
    # this lane takes two more in-process samples than the >1s lanes
    timed("deid_synth_noshuffle", lambda: deidentify_attributes(
        docs, "9.9.9.9.9", "bench_nx"
    ).agg(F.sum(F.size("spans"))).collect(), runs=4)
    extras["deid_n_docs"] = n_docs
    extras["deid_docs_per_sec"] = round(n_docs / timings["deid_synth"], 1)
    extras["deid_noshuffle_docs_per_sec"] = round(
        n_docs / timings["deid_synth_noshuffle"], 1
    )
    docs.unpersist()

    # --- extraction lane (north_rule): pre-written HTML corpus
    html = extract.with_html(spark.read.parquet(HTML_CORPUS)).persist()
    n_html = html.count()
    extract.extract_main_content(html.limit(256)).agg(F.count("*")).collect()
    timed("extract_bulk", lambda: extract.extract_main_content(html).agg(
        F.sum(F.size("spans"))
    ).collect())
    extras["extract_n_docs"] = n_html
    extras["extract_docs_per_sec"] = round(n_html / timings["extract_bulk"], 1)
    html.unpersist()

    # --- pixel-redaction lane: payloads/boxes from parquet (generation cost
    # excluded per r2 VERDICT — the r2 window timed synth_media too, which
    # made the 2.2x "regression" unattributable)
    payloads = spark.read.parquet(MEDIA_PAYLOADS).persist()
    boxes = spark.read.parquet(MEDIA_BOXES).persist()
    payloads.count(), boxes.count()
    redact_media(payloads.limit(8), boxes, margin=8).select(
        F.md5(F.col("pixels"))
    ).collect()
    timed("media_redaction", lambda: redact_media(
        payloads, boxes, margin=8
    ).select("media_ref", F.md5(F.col("pixels")).alias("m")).collect(),
        runs=4)  # sub-second lane: see deid_synth_noshuffle note
    payloads.unpersist(), boxes.unpersist()

    # --- at-scale hash-swap evidence: the SAME minhash signature job with
    # hash_impl="fast" (xxhash64 integer mix, not oracle-portable) vs the
    # md5 portable spec timed as the `minhash_signatures` contract query —
    # the pair quantifies what pipelines buy by choosing the fast path
    from deidcm_spark.operators import dedup as _dedup

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    _dedup.minhash_signatures(docs_tbl.limit(64), hash_impl="fast").agg(
        F.count("*")
    ).collect()
    timed(
        "minhash_signatures_fast",
        lambda: _dedup.minhash_signatures(docs_tbl, hash_impl="fast").select(
            "doc_id", "n_shingles", *[f"mh{i}" for i in range(_dedup.N_MINHASH)]
        ).collect(),
        runs=3,
    )
    # evidence number, not a contract query: report in extras so the
    # headline total stays comparable round-over-round
    extras["minhash_signatures_fast_sec"] = timings.pop(
        "minhash_signatures_fast"
    )

    # --- round-3 training-data additions, also extras-only evidence:
    # SemDeDup prune with a prebuilt codebook (the production shape —
    # codebooks persist across incremental runs) and DSIR importance
    # sampling (English-target steering over the documents table)
    from deidcm_spark.operators.sampling import importance_sample
    from deidcm_spark.operators.semdedup import semdedup
    from deidcm_spark.operators.similarity import ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = ivf_centroids(emb, n_centroids=16)
    semdedup(emb.limit(64), threshold=0.9, centroids=cents).agg(
        F.count("*")
    ).collect()
    timed("semdedup", lambda: semdedup(
        emb, threshold=0.9, centroids=cents
    ).agg(F.count("*"), F.count_if(F.col("action") == "DROP")).collect(),
        runs=3)
    extras["semdedup_sec"] = timings.pop("semdedup")

    docs_all = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    raw = docs_all.filter("doc_id % 10 != 0").select("doc_id", "text")
    tgt = docs_all.filter("doc_id % 10 = 0 and lang = 'en'").select(
        "doc_id", "text"
    )
    importance_sample(raw.limit(64), tgt.limit(64), 8, n_buckets=512).collect()
    timed("dsir_sample", lambda: importance_sample(
        raw, tgt, 200, n_buckets=4096
    ).collect(), runs=3)
    extras["dsir_sample_sec"] = timings.pop("dsir_sample")

    # LM-perplexity scoring and BPE subword counting (encoding with a
    # PRETRAINED merge list — training is a one-time index build, like
    # the semdedup codebook)
    from deidcm_spark.operators.bpe import bpe_token_count, train_bpe
    from deidcm_spark.operators.sampling import perplexity_score

    perplexity_score(raw.limit(64), tgt.limit(64), n_buckets=512).collect()
    timed("ppl_score", lambda: perplexity_score(
        docs_all.select("doc_id", "text"), tgt, n_buckets=65536
    ).agg(F.avg("ppl")).collect(), runs=3)
    extras["ppl_score_sec"] = timings.pop("ppl_score")

    merges = train_bpe(tgt, n_merges=60)
    bpe_token_count(docs_all.limit(64), merges).collect()
    timed("bpe_count", lambda: bpe_token_count(
        docs_all.select("doc_id", "text"), merges
    ).agg(F.sum("n_bpe_tokens")).collect(), runs=3)
    extras["bpe_count_sec"] = timings.pop("bpe_count")

    # sub-document dedup (line + exact-substring), Bloom shard probe, and
    # sequence packing — extras-only evidence like the other r3 lanes
    # (headline set unchanged for vs_prev comparability); hash_impl="fast"
    # throughout = the at-scale choice
    from deidcm_spark.operators.bloom import bloom_build, bloom_probe
    from deidcm_spark.operators.spandedup import line_dedup, substring_dedup
    from deidcm_spark.operators.textops import pack_sequences

    txt = docs_all.select("doc_id", "text")
    line_dedup(txt.limit(64), hash_impl="fast").agg(F.count("*")).collect()
    timed("line_dedup", lambda: line_dedup(txt, hash_impl="fast").agg(
        F.count("*"), F.sum("n_dropped")
    ).collect(), runs=3)
    extras["line_dedup_sec"] = timings.pop("line_dedup")

    substring_dedup(txt.limit(64), window=32, hash_impl="fast").agg(
        F.count("*")
    ).collect()
    timed("substring_dedup", lambda: substring_dedup(
        txt, window=32, hash_impl="fast"
    ).agg(F.count("*"), F.sum("n_removed_tokens")).collect(), runs=3)
    extras["substring_dedup_sec"] = timings.pop("substring_dedup")

    # the recurring per-shard op is the PROBE; the historical filter is a
    # one-time index build like the semdedup codebook / BPE merge list
    bl = bloom_build(txt, 1 << 22, 4, hash_impl="fast").persist()
    bl.count()
    bloom_probe(txt.limit(64), bl, 1 << 22, 4, hash_impl="fast").agg(
        F.count("*")
    ).collect()
    timed("bloom_probe", lambda: bloom_probe(
        txt, bl, 1 << 22, 4, hash_impl="fast"
    ).agg(F.count_if("maybe_seen")).collect(), runs=3)
    extras["bloom_probe_sec"] = timings.pop("bloom_probe")
    bl.unpersist()

    pack_sequences(txt.limit(64), seq_len=2048).agg(F.count("*")).collect()
    timed("pack_sequences", lambda: pack_sequences(
        txt, seq_len=2048
    ).agg(F.count("*"), F.max("seq_id")).collect(), runs=3)
    extras["pack_sequences_sec"] = timings.pop("pack_sequences")

    # WARC ingest + host-rank lanes: parse throughput over the prebuilt
    # .warc.gz shard tree, and the link-graph power iteration over the
    # parsed records (records persisted so the rank lane times the graph
    # work, not a re-parse)
    from deidcm_spark.operators.linkgraph import extract_links, host_rank
    from deidcm_spark.warc import read_warc_documents

    read_warc_documents(spark, WARC_SHARDS).count()  # warm (codec import etc.)
    timed("warc_parse", lambda: read_warc_documents(spark, WARC_SHARDS).agg(
        F.count("*"), F.sum("n_bytes")
    ).collect(), runs=3)
    extras["warc_parse_sec"] = timings.pop("warc_parse")

    recs = read_warc_documents(spark, WARC_SHARDS).persist()
    n_recs = recs.count()
    extras["warc_n_records"] = n_recs
    extras["warc_parse_docs_per_sec"] = round(
        n_recs / extras["warc_parse_sec"], 1
    )
    host_rank(extract_links(recs.limit(64)), iterations=2).count()  # warm
    timed("host_rank", lambda: host_rank(
        extract_links(recs), iterations=3
    ).count(), runs=2)
    extras["host_rank_sec"] = timings.pop("host_rank")
    recs.unpersist()

    # PQ embedding-compression lane: the codebook is a one-time index
    # build (semdedup-codebook tier, outside the timed windows); the
    # recurring ops are encoding a NEW shard and the ADC search with
    # exact rerank — both timed
    from deidcm_spark.operators import pq as pqop
    from deidcm_spark.operators.quantile import select_top_k

    emb = spark.read.parquet(EMB_CORPUS).persist()
    extras["pq_n_vecs"] = emb.count()
    books = pqop.pq_train(emb, m=16, ksub=32, lloyd_iters=0)
    # smallest-id row, not a hardcoded id — a re-keyed/filtered embeddings
    # table without vec_id=7 would TypeError after every lane already ran
    qrow = emb.orderBy("vec_id").select("embedding").head()
    if qrow is None:
        raise RuntimeError(f"{EMB_CORPUS}: embeddings table is empty")
    qvec = list(qrow["embedding"])
    pqop.pq_encode(emb.limit(64), books).agg(F.count("*")).collect()  # warm
    timed("pq_encode", lambda: pqop.pq_encode(emb, books).agg(
        F.count("*"), F.sum(F.element_at("codes", 1))
    ).collect(), runs=3)
    extras["pq_encode_sec"] = timings.pop("pq_encode")
    extras["pq_encode_vecs_per_sec"] = round(
        extras["pq_n_vecs"] / extras["pq_encode_sec"], 1
    )
    codes = pqop.pq_encode(emb, books).persist()
    codes.count()
    pqop.pq_search(codes, books, qvec, k=10).collect()  # warm
    timed("pq_search", lambda: pqop.pq_search(
        codes, books, qvec, k=10, rerank=100, emb=emb
    ).collect(), runs=3)
    extras["pq_search_sec"] = timings.pop("pq_search")
    codes.unpersist()
    emb.unpersist()

    # top-k selection lane: the "keep the best k documents" primitive
    # over the 600k-row lineitem table (score = extended price) — the
    # no-global-sort path bench_scaling's dedup lanes don't cover
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("doc_id"),
            F.col("l_extendedprice").alias("score"),
        )
        .persist()
    )
    extras["topk_n_rows"] = li.count()
    select_top_k(li.limit(2048), 64).agg(F.count("*")).collect()  # warm
    timed("topk_select", lambda: select_top_k(li, 5000).agg(
        F.count("*"), F.min("score")
    ).collect(), runs=3)
    extras["topk_select_sec"] = timings.pop("topk_select")
    li.unpersist()

    # classifier quality-filter lane (GPT-3 App. A shape): train on a
    # deterministic positive slice, crawl-as-negative, score + Pareto
    # gate the whole corpus — one end-to-end job, fast-hash path
    from deidcm_spark.operators.balance import cluster_balanced_sample
    from deidcm_spark.operators.classify import quality_classifier_select
    from deidcm_spark.operators.similarity import ivf_centroids

    docs_txt = docs_all.select("doc_id", "text").persist()
    docs_txt.count()
    pos = docs_txt.filter("doc_id % 10 = 0")
    quality_classifier_select(
        docs_txt.limit(64), pos.limit(32), docs_txt.limit(64), n_buckets=512
    ).collect()  # warm
    timed("quality_classifier", lambda: quality_classifier_select(
        docs_txt, pos, docs_txt, n_buckets=4096, hash_impl="fast"
    ).agg(F.count("*")).collect(), runs=3)
    extras["quality_classifier_sec"] = timings.pop("quality_classifier")
    docs_txt.unpersist()

    # cluster-balance lane over the 64k-vector corpus: the codebook is a
    # one-time index build (semdedup tier, outside the window); timed =
    # assignment + sizes + salted two-phase quota selection
    emb_b = spark.read.parquet(EMB_CORPUS).persist()
    emb_b.count()
    cents_b = ivf_centroids(emb_b, n_centroids=16, lloyd_iters=0)
    cluster_balanced_sample(
        emb_b.limit(256), 64, centroids=cents_b
    ).agg(F.count("*")).collect()  # warm
    timed("cluster_balance", lambda: cluster_balanced_sample(
        emb_b, 5000, centroids=cents_b, n_salts=4, policy="temperature"
    ).agg(F.count("*")).collect(), runs=3)
    extras["cluster_balance_sec"] = timings.pop("cluster_balance")
    emb_b.unpersist()

    # --- contract queries
    qs = entry_mod.queries()
    # best-of-3 for the (mostly sub-second) contract queries: 50 ms of host
    # steal is 15% on a 0.3 s query, so these need one more in-process
    # sample than the multi-second lanes to stay under the ±10% target
    for name in HEADLINERS:
        fn = LOCAL_LANES.get(name) or qs[ALIASES.get(name, name)]
        fn(spark, WARM_SF).collect()  # warm pass
        timed(name, lambda f=fn: f(spark, sf_dir).collect(), runs=3)

    print(json.dumps({"queries": timings, "extras": extras}))
    spark.stop()


if __name__ == "__main__":
    mode, sf_dir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if mode == "prepare":
        prepare(sf_dir, cpus)
    else:
        run(sf_dir, cpus)
