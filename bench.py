#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "common17_total": <sec>, "common25_total": <sec>}

Each query materializes through the noop sink (full computation, no
driver-side row transfer, no output I/O in the timing).

Round-over-round comparability is emitted natively (VERDICT r4 item 6):
``common17_total`` sums the exact query set BENCH_r01 recorded and
``common25_total`` the BENCH_r03 set, so the headline total can grow with
new queries without faking a regression. Four of those queries
(top_customers, running_total, events_hourly, events_sessions) were
consolidated out of the driver registry in round 5; their gate functions
are kept in __spark_entry__ solely so these fixed sets stay measurable.

Streaming replays run LAST (VERDICT r4 item 1): each replay spins up
micro-batch infrastructure and state stores inside the shared JVM, and
r4 showed batch queries timed after them drifting ~5-30%; isolating them
keeps the batch common-set numbers clean.

Host-normalized metric (VERDICT r6 item 3): raw walls on this virtualized
host drift 1.0-1.7x between runs (BENCHNOTES r6 study), so the harness
times every query's DuckDB oracle SQL at the SAME sf_dir, INTERLEAVED
with the Spark walls (probe immediately after each query's Spark run,
min of 2 reps) — numerator and denominator share one drift window, so
CPU steal cancels out of the ratio. Output adds ``duckdb_walls``
(per-query oracle sec), ``normalized`` (spark_wall / duckdb_wall per
query), and ``common25_norm_ratio`` / ``common17_norm_ratio`` (ratio of
SUMS over the common set ∩ oracled queries). THE COMPARISON RULE: judge
rounds on the norm ratios — the per-query ratios are noisy below ~0.1 s
of DuckDB wall; the ratio of sums is the stable signal.

Symmetric rep policy (r8, VERDICT r7 item 5 + ADVICE): the normalized
ratio previously divided a SINGLE-rep Spark wall by a min-of-2 DuckDB
wall — methodologically asymmetric (Spark pays cold I/O, DuckDB does
not) and ~15-18% noisier run-to-run. Batch oracled queries now run the
Spark side twice as well; ``spark_walls_min2`` records the min and the
``normalized`` / ``common*_norm_ratio`` numbers use it, so both sides
of the ratio follow the same min-of-2 rule. ``queries`` (raw walls)
stays FIRST-rep so the r1-r7 raw-wall lineage (common17_total vs the
93.0 s round-1 baseline) remains apples-to-apples.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdata_lab02_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# The exact query sets of BENCH_r01 / BENCH_r03 (minus bbc_tfidf_pipeline_e2e,
# timed separately below and included in both totals).
COMMON17 = [
    "p5_doc_term_matrix",
    "p10_tfidf",
    "p13_category_top5",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "running_total",
    "events_hourly",
    "events_sessions",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embedding_topk",
    "ivf_topk",
    "asof_join",
    "kmeans_assign",
    "kmeans_update",
]
COMMON25 = COMMON17 + [
    "chunk_docs",
    "contamination",
    "curation_pipeline",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_simhash_pairs",
    "embedding_dup_pairs",
    "quantized_topk",
]

# Representative slice of the inventory beyond the common sets: round 4/5
# selection + streaming additions. Streaming entries must stay last.
EXTRA = [
    "semantic_dedup_pipeline",
    "dsir_importance",
    "dsir_select",
    "dedup_spans",
    "lm_perplexity",
    "sketch_profile",
    "relational_suite",
    "ann_recall",
    "jpeg_decode",
    "resize_mixed",
    "language_id",
    # r8 additions (headline total grows accordingly — the common sets
    # stay the comparable numbers)
    "png_edges",
    "wav_edges",
    "stratified_sample",
    "range_join",
    "dedup_incremental",
    "ivf_topk_persisted",
    # r9: the composed crawl-curation chain (in-window) — it runs the
    # full html-strip + C4 + Gopher quality + 13-fraction repetition
    # stack end-to-end. The standalone gopher_repetition gate is NOT
    # benched: its stripe fixture deliberately repeat()s long texts to
    # trip every rule, which makes its wall fixture-weight (~32 s at
    # sf0.1), not engine signal — the same folds run inside the
    # composed gate at ~2.6 s over realistic text.
    "crawl_curation_pipeline",
    # r9: corpus-trained BPE (10-merge train loop + tokenize)
    "bpe_pipeline",
    # r10: the URL/domain tier (normalize + registered-domain +
    # blocklist + recrawl dedup); the composed crawl gate above now also
    # runs it as its first stage
    "url_filters",
    # r10: SOF3 Annex-H lossless decode (seven predictors, formula corpus)
    "jpeg_lossless",
    # r10: WARC record walk + HTTP split over generated framed bytes
    "warc_ingest",
    # r10: 4-component CMYK/YCCK decode (print-derived profile)
    "jpeg_cmyk",
    # r11: the full WARC->URL->crawl composition (framing + charset
    # decode ahead of the crawl chain), revisit resolution, applied
    # EXIF orientation, and Annex-J hierarchical pyramids
    "warc_crawl_pipeline",
    "warc_revisits",
    "exif_orientation",
    "jpeg_hierarchical",
    # r11: CCNet cross-document line dedup, the per-domain quota, and
    # the composed CCNet chain (dedup -> LID -> perplexity terciles)
    "dedup_lines",
    "url_domain_cap",
    "ccnet_pipeline",
    # r12: the skew-bounded two-phase quota (same fixture as
    # url_domain_cap — the delta IS the two-phase plan), per-language
    # CCNet perplexity, perceptual image dedup (dHash + pigeonhole
    # Hamming pairs), and the CDX index emitted by WARC shard assembly
    "url_domain_cap_bounded",
    "ccnet_perlang",
    "image_dedup",
    "warc_cdx",
    # r12: robots.txt politeness over the URL-tier survivors (RFC 9309
    # longest-match; broadcast rule-array dim + per-row HOF decision)
    "url_robots",
    # r12: product-quantization ANN (trained codebooks + m-byte codes +
    # ADC top-k — the 32x compression tier beyond int8) and the deployed
    # shortlist+exact-re-rank pattern
    "pq_topk",
    "pq_rerank",
    # r12: image dedup to SURVIVORS (pairs -> connected components ->
    # keep flags)
    "image_dedup_clusters",
    # r13: the composed IVF x PQ index (coarse-list pruning + m-byte ADC
    # + exact re-rank, per-row hit vs the exact L2 top-5)
    "ivfpq_topk",
    # r13: the residual-encoded form (IVFADC: codes quantize residuals,
    # per-(query, list) ADC tables)
    "ivfpq_residual_topk",
    # r13: the cross-modality media dedup composition (magic routing ->
    # per-modality hashes -> modality-keyed pairs -> one CC pass)
    "media_dedup_pipeline",
    # r13: perceptual audio dedup (WAV decode -> block-energy print ->
    # pigeonhole Hamming pairs; amplitude-invariant)
    "audio_dedup",
    # r13: per-video near-dup (per-frame luma dHash -> MinHash-LSH over
    # the frame-hash set -> exact Jaccard verify)
    "video_dedup",
    # r13: trained model-based quality classifier (DCLM family: one-pass
    # hashed-bucket NB, exact integer scoring, perplexity-tercile join)
    "quality_classifier",
    # r13: the DCLM selection composition (classifier score -> budgeted
    # top-score admission via the shared distributed-prefix kernel)
    "quality_select",
    # r13: BM25 top-k retrieval (integer micro-unit scoring; postings
    # cut to the broadcast query vocabulary before any heavy exchange)
    "bm25_topk",
    # r13: link-graph domain PageRank (href extraction -> PSL domain
    # graph -> 5 exact integer power-iteration rounds)
    "link_pagerank",
    # r13: source-weighted token-budget mixture (data mixing; group-
    # aware distributed prefix-sum admission)
    "mixture_sample",
    # r13: centrality-prioritized selection (the composed link-graph ->
    # PageRank -> budgeted-admission chain)
    "rank_select",
    # r13: the persisted inverted-index workflow (build + bucket-pruned
    # query; the persist_ivf_lists convention for text) and the
    # crawl-increment update (append + exact stats add)
    "bm25_persisted",
    "bm25_incremental",
    # r13: the per-target anchor-text corpus (anchor-based weak
    # supervision aggregation over extracted links)
    "anchor_texts",
    # r14: corpus-derived-embedding SemDeDup (hashed-trigram featurize
    # -> sampled k-means fit -> cluster-blocked near-dup pass)
    "embed_semantic_dedup",
    # r14: incremental dup-cluster maintenance (label-level quotient CC
    # absorb; oracle = full rebuild)
    "dedup_clusters_incremental",
    # r14: image-alt caption corpus joined to the dHash media-dedup
    # survivors (the VLM image-text pair table)
    "image_captions",
    # r14: mergeable deterministic quantile registers (direct + merged-
    # halves estimates in one gate)
    "sketch_quantiles",
    # r14: the vector tier's increment face (shard vs fixed quantizer +
    # assignment table; old x old never recomputes)
    "semantic_dedup_incremental",
    # r14: hybrid lexical+semantic retrieval (BM25 + derived-embedding
    # cosine fused by exact integer RRF)
    "hybrid_retrieval",
    # r15: the capstone — WARC ingest -> URL tier -> exact + MinHash
    # dedup -> NB quality -> mixture -> packing under one oracle
    "pretrain_corpus_pipeline",
    # r15: the deployed hybrid shape — persisted BM25 index + persisted
    # IVF lists, both legs pruned, fused by integer RRF
    "hybrid_retrieval_persisted",
    # r15: the daily-shard face of the capstone — shard absorbed
    # against the base crawl's persisted artifacts, zero base recompute
    "pretrain_increment_pipeline",
    # r15: the vector tier's persisted-layout face (stats-row guard +
    # journal; same oracle as semantic_dedup_incremental)
    "semantic_index_persisted",
    # r16: the capstone's persisted-artifact layout face — base
    # artifacts journaled on disk, the shard absorbed through them
    "pretrain_artifacts_persisted",
    # r16: the two-level register build's register table, hashed
    # bit-for-bit against a both-levels restatement
    "sketch_quantiles_twolevel",
    # r16: the capstone's last mile — packed corpus written as
    # training shards + manifest from a read-back
    "pretrain_training_shards",
]
STREAMING_LAST = [
    "stream_hourly",
    "stream_sessions",
    "stream_pairs",
    # r8: the stateless incremental-dedup candidate replay
    "stream_dedup_cands",
    # r12: the perceptual-image candidate replay (dHash + pigeonhole
    # against the static corpus hash table)
    "stream_image_cands",
    # r13: the perceptual-audio candidate replay (block-energy prints
    # vs the pinned static corpus print table; shared pigeonhole core)
    "stream_audio_cands",
    # r16: the capstone's streaming face — per-tier candidate emission
    # (recrawl/exact/near) against the persisted artifact layout
    "stream_pretrain_cands",
]

# Consolidated out of the registry in round 5; resolved via their kept
# gate functions for common-set comparability only.
BENCH_ONLY = {
    "top_customers", "running_total", "events_hourly", "events_sessions",
    # consolidated in round 6: kernel gated as ann_recall's exact baseline
    "embedding_topk",
}


def _resolve(qs, name):
    if name in qs:
        return qs[name]
    assert name in BENCH_ONLY, name
    return getattr(entrymod, f"q_{name}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    # untimed warmup: session init, codegen compiler, parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    # DuckDB probe setup (interleaved host-drift normalization — see
    # module docstring); failures degrade to raw walls only
    duck_walls: dict[str, float] = {}
    duck_con = None
    oracles: dict[str, str] = {}
    try:
        import duckdb

        from bigdata_lab02_spark.sources.tables import TABLE_NAMES

        oracles = entrymod.oracle_sql()
        duck_con = duckdb.connect()
        for t in TABLE_NAMES:
            duck_con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    except Exception:
        duck_con = None

    def duck_probe(name: str) -> None:
        if duck_con is None or name not in oracles:
            return
        best = None
        for _ in range(2):  # min-of-2: first rep may pay cold I/O
            t0 = time.time()
            try:
                duck_con.sql(oracles[name]).fetchall()
            except Exception:
                return  # oracle not runnable at this sf
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        duck_walls[name] = round(best, 3)

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    spark_min2: dict[str, float] = {}
    for name in COMMON25 + EXTRA:
        fn = _resolve(qs, name)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        if duck_con is not None and name in oracles:
            # second Spark rep (symmetric min-of-2 — only queries that
            # feed the normalized ratio pay for it)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark_min2[name] = round(min(timings[name], time.time() - t0), 3)
        duck_probe(name)

    # The reference's ENTIRE DataProcessing DAG (11 chained MapReduce jobs,
    # SURVEY §3.1) end-to-end on the real BBC corpus: dictionaries, COO
    # matrix, frequency filter, top-10, TF-IDF vectors, category top-5 —
    # every final output materialized once. Timed BEFORE the streaming
    # replays: it belongs to both common sets, so it must not absorb the
    # post-streaming JVM pressure.
    bbc_input = "/root/reference/BigDataLab02/DataProcessing/Input"
    bbc_stop = "/root/reference/BigDataLab02/DataProcessing/StopWords/stop_words.txt"
    if os.path.isdir(bbc_input):
        from bigdata_lab02_spark.pipeline import bbc_pipeline

        t0 = time.time()
        p = bbc_pipeline(spark, bbc_input, bbc_stop)
        for out in (
            p.filtered_matrix(),
            p.top_terms(10),
            p.sparse_vectors(),
            p.category_top_terms(5),
        ):
            out.write.format("noop").mode("overwrite").save()
        timings["bbc_tfidf_pipeline_e2e"] = round(time.time() - t0, 3)

    for name in STREAMING_LAST:
        t0 = time.time()
        _resolve(qs, name)(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.time() - t0, 3)
        duck_probe(name)

    def _common(names):
        keys = [*names, "bbc_tfidf_pipeline_e2e"]
        if not all(k in timings for k in keys):
            return None
        return round(sum(timings[k] for k in keys), 3)

    def _spark_wall(n):
        return spark_min2.get(n, timings[n])

    normalized = {
        n: round(_spark_wall(n) / duck_walls[n], 2)
        for n in duck_walls
        if duck_walls[n] > 0
    }

    def _norm_ratio(names):
        keys = [n for n in names if n in duck_walls and duck_walls[n] > 0]
        if not keys:
            return None
        return round(
            sum(_spark_wall(n) for n in keys)
            / sum(duck_walls[n] for n in keys),
            3,
        )

    total = round(sum(timings.values()), 3)
    line = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "common17_total": _common(COMMON17),
                "common25_total": _common(COMMON25),
                "duckdb_walls": duck_walls,
                "spark_walls_min2": spark_min2,
                "normalized": normalized,
                "common17_norm_ratio": _norm_ratio(COMMON17),
                "common25_norm_ratio": _norm_ratio(COMMON25),
                "notes": "common-set totals use the exact BENCH_r01/r03 "
                "query sets over FIRST-rep walls (r1-r7 lineage); raw "
                "walls drift 1.0-1.7x on this host (BENCHNOTES r6 "
                "study). COMPARISON RULE since r7, tightened r8: judge "
                "rounds on common*_norm_ratio = sum(min-of-2 spark "
                "walls) / sum(INTERLEAVED min-of-2 DuckDB oracle walls "
                "at the same sf_dir) over the common set's oracled "
                "queries — symmetric rep policy, and pairing each probe "
                "with its Spark wall cancels host drift out of the "
                "ratio.",
            }
    )
    # VERDICT r16 item 2: the r15 round-over-round comparison was lost to
    # a driver-side truncation of this single very long line
    # (prev_bench_ok=false). Persist the identical payload to the repo so
    # the next round can always recover it, then print the one JSON line
    # LAST on its own line. Additions only: the line's content, the rep
    # policy and the common sets are unchanged.
    try:
        (Path(__file__).resolve().parent / "BENCH_LAST.json").write_text(
            line + "\n"
        )
    except Exception:
        pass  # read-only checkout must not break the bench contract
    print(line)


if __name__ == "__main__":
    main()
