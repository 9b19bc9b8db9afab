#!/usr/bin/env python
"""Generate PLANS.md: physical-plan audit of the headline queries.

For each query: the scale-relevant plan facts (join strategies, shuffle
count, pushdown, top-k operator) plus the formatted plan. Run after plan
changes; the output is the reviewable record that each query compiles to
the plan we want at 1000 executors, not just a plan that passes.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_lab02_spark.plans import plan_report  # noqa: E402
from bigdata_lab02_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

AUDIT = [
    "p5_doc_term_matrix",
    "p10_tfidf",
    "p13_category_top5",
    "pricing_summary",
    "revenue_by_nation",
    "p7_top_terms",
    "relational_suite",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "embedding_topk",
    "embedding_dup_pairs",
    "ivf_topk",
    "ann_recall",
    "kmeans_assign",
    "asof_join",
    "quantized_topk",
    "scrub_pii",
    "repetition_stats",
    "token_budget",
    "chunk_docs",
    "contamination",
    "dedup_keep_best",
    "pack_sequences",
    "skew_salted_join",
    "multimodal_mixed",
    "png_edges",
    "jpeg_decode",
    "resize_mixed",
    "language_id",
    "video_frames",
    "semantic_dedup_pipeline",
    "dsir_importance",
    "dsir_select",
    "merge_upsert",
    "dedup_spans",
    "lm_perplexity",
    "sketch_profile",
    "stratified_sample",
    "range_join",
    "wav_edges",
    "dedup_incremental",
    "ivf_topk_persisted",
    "html_extract",
    "crawl_curation_pipeline",
    "bpe_pipeline",
    "url_filters",
    "warc_ingest",
    "jpeg_lossless",
    "jpeg_cmyk",
    # r11 gates (VERDICT r11 item 2)
    "dedup_lines",
    "url_domain_cap",
    "ccnet_pipeline",
    "warc_crawl_pipeline",
    "warc_revisits",
    "exif_orientation",
    "jpeg_hierarchical",
    # r12 gates
    "url_domain_cap_bounded",
    "ccnet_perlang",
    "image_dedup",
    "warc_cdx",
    "url_robots",
    "pq_topk",
    "pq_rerank",
    "image_dedup_clusters",
    # r13 gates
    "ivfpq_topk",
    "ivfpq_residual_topk",
    "audio_dedup",
    "video_dedup",
    "quality_classifier",
    "quality_select",
    "media_dedup_pipeline",
    "bm25_topk",
    "link_pagerank",
    "mixture_sample",
    "bm25_persisted",
    "bm25_incremental",
    "anchor_texts",
    # r14 gates
    "embed_semantic_dedup",
    "dedup_clusters_incremental",
    "image_captions",
    "sketch_quantiles",
    "semantic_dedup_incremental",
    "hybrid_retrieval",
    # r15 capstone
    "pretrain_corpus_pipeline",
    "hybrid_retrieval_persisted",
    "pretrain_increment_pipeline",
    "semantic_index_persisted",
    # r16: the capstone's persisted-artifact layout face
    "pretrain_artifacts_persisted",
    # r16: the bounded-sort two-level register build
    "sketch_quantiles_twolevel",
    # r16: the capstone's shard-writer last mile
    "pretrain_training_shards",
    # r17 (VERDICT r16 item 8): the capstone's streaming face — the
    # audited frame is the gate's output (memory-sink distinct); the
    # candidate plan itself is gated on the BATCH TWIN in
    # tests/test_plans.py::test_stream_pretrain_cands_plan_shape
    # because a replayed stream's per-micro-batch plan is not visible
    # from the returned frame
    "stream_pretrain_cands",
]

COMMENT = {
    "pretrain_corpus_pipeline": "The capstone chain stays narrow end-to-end: WARC framing/decode are Arrow-batched mapInPandas projections; the URL tier is one norm_url exchange + broadcast PSL/blocklist dims; exact dedup one digest exchange; MinHash candidates banded (band, band_hash) keys — never all-pairs; the NB model is B+1 rows collected once and broadcast back; mixture admission is the range-partitioned distributed prefix sum; packing windows per source. The exact-dedup survivor set is PINNED (localCheckpoint) before the multi-tier fan-out — unpinned, the ingest subtree re-derived per consumer (repeated_scans was 9; now 0; 2.5x A/B in BENCHNOTES).",
    "hybrid_retrieval": "Both legs are candidate-sized by construction before fusion: BM25 cuts postings to the broadcast query vocabulary, the semantic leg broadcasts the 6 query vectors over the featurized corpus; RRF is a (query, doc) aggregation + window over <= 2*|queries|*20 rows.",
    "hybrid_retrieval_persisted": "The deployed hybrid: the lexical leg's postings scan is term-bucket directory-pruned (PartitionFilters INSET), the semantic leg's list scan is list_id directory-pruned to the <= |queries|*nprobe probed lists; neither leg re-tokenizes or re-featurizes the corpus at query time; fusion is candidate-sized.",
    "pretrain_increment_pipeline": "The daily-shard job: base artifacts (survivor set, corpus, model) are pinned once and fan out; shard-side cost is anti-joins against index-sized tables + band-hash-keyed candidate joins against the PRE-BANDED corpus (never re-shingled) + one broadcast-model scoring pass — nothing base-sized recomputes per shard (repeated_scans=0).",
    "stream_pretrain_cands": "The streaming face of the capstone's shard absorb: the audited frame is the gate's OUTPUT (distinct over the replay's memory sink — LocalTableScan-rooted, trivially one exchange), because a bounded replay's per-micro-batch plan never appears in the returned frame. The candidate plan itself is gated on the batch twin in tests/test_plans.py (every join equi-keyed against the corpus-sized static sides — no cartesian/nested-loop; URL dims broadcast). Split-wall attribution (r17, BENCHNOTES): the gate's wall is ~55% persist_pretrain_artifacts build (the batch layout the replay probes — shares the r17 one-shingle-pass fix) + ~40% replay fixed cost (micro-batch infrastructure, the attributed streaming class) + <1 s shard write and distinct.",
    "pretrain_training_shards": "The shard writer's one shuffle is the keyed repartition on (source, shard_id) before the partitioned write — every shard is one file written by the task owning its key (no small-file spray); the manifest is one groupBy over the READ-BACK of the written shards (manifest describes what is on disk), and the gate's returned frame is a manifest-sized parquet scan.",
    "sketch_quantiles_twolevel": "The bounded-sort register build: level one's rank window partitions by n_buckets*fanout md5 sub-shards (biggest single-task sort N/(n_buckets*fanout) rows — the r14 one-task-bucket-sort seam, closed); level two's fold windows run over register-table-sized frames (<= fanout*k knots per bucket). One bucket-keyed exchange per level; output <= n_buckets*k rows.",
    "pretrain_artifacts_persisted": "The deployed daily-shard job: the shard chain is rooted at the on-disk artifact layout (urls/digests md5-bucket-partitioned, bands by band_id, frozen broadcast model) — anti-joins against index-sized parquet scans, band-hash candidates vs the persisted band table (the base is never re-shingled), one broadcast-model scoring pass; the old-beats-new guard is one column-pruned shard aggregate collected BEFORE any mutating write; appends and the stats flip are shard-sized; decisions are pinned before the appends so the caller's action never recomputes against the mutated layout.",
    "semantic_index_persisted": "The shard reads the cluster-partitioned assignment layout (the pair join's key is the directory key); the append-only guard is one column-pruned shard aggregate collected BEFORE any mutating write; journal/stats writes are JVM-side one-row frames (the r15 _write_journal lesson).",
    "semantic_dedup_incremental": "Shard assigns against the broadcast centroid array (zero shuffle); the pair join touches (shard x cluster-mates) rows only — old x old pairs never recompute; the indexed assignment table streams into the cluster-keyed join.",
    "embed_semantic_dedup": "Featurize: one (doc,bucket) exchange with map-side combine + one doc-keyed map aggregation + the doc-spine left join; then the SemDeDup pipeline shape — sampled fit over a broadcast centroid array (per-row argmin fold, corpus never shuffles for assignment), cluster-blocked pair join keyed by cluster_id.",
    "dedup_clusters_incremental": "Base CC runs the alternating-star rounds (localCheckpoint per round, fresh-alias re-projection — the r14 analyzer-bug hardening); the quotient absorb streams the label table twice against BROADCAST increment-sized frames (touched lookup + remap) — the corpus labels never shuffle.",
    "image_captions": "Extraction + alt cleanup is one fused projection; caption corpus is one groupBy on image_url; the dHash survivor side pins the decode once (localCheckpoint) before the pair/CC/recombine fan-out; final join keyed by media_id (34 rows).",
    "sketch_quantiles": "Two bucket-keyed rank windows (direct + per-half) feed register-table-sized frames (<= buckets*k rows); merge and estimates are windows over those registers — the corpus is touched twice (direct + halves), each one scan + one bucket exchange.",
    "p5_doc_term_matrix": "Dictionary broadcast; counts pre-aggregated before the dict join so the dictionary derives from the (doc,term) aggregate; the duplicated aggregate subtree is deduped at runtime by exchange reuse when AQE plans both sides identically.",
    "p10_tfidf": "TF window reuses the doc_id exchange; IDF (term-level, small) broadcasts back onto TF.",
    "p13_category_top5": "One exchange on (category, term); ranking window within partitions.",
    "pricing_summary": "Scan-level date filter pushdown; decimal sums partial-aggregated map-side.",
    "revenue_by_nation": "All dimension joins broadcast-hash; the lineitem side never sort-merges.",
    "p7_top_terms": "Filter fused into the aggregate scan; TakeOrderedAndProject: per-partition bounded heaps, no global sort.",
    "relational_suite": "Seven relational families, one gate: semi/anti joins broadcast, cube via one Expand, running sum + lag share ONE hash exchange, percentiles partial-aggregated; the normalizing unions add no exchange.",
    "dedup_exact": "Exactly one exchange, keyed by content digest.",
    "dedup_minhash_lsh": "Shingles exploded once and PINNED (r13: the five consumers — signature agg via both band self-join sides, sizes, and the exact-Jaccard verify twice — otherwise re-inlined the tokenize+shingle subtree; measured 11% faster warm / 2.7x cold); signature min-aggregates map-side; candidate join keyed by LSH band bucket (subquadratic).",
    "dedup_simhash_pairs": "One groupBy builds 60-bit sketches (explode-once, 60 conditional sums); pair join keyed by 16-bit pigeonhole chunk equality — subquadratic. repeated_scans receipt: the sketch subtree feeds both self-join sides through ONE structurally identical exchange that AQE reuses at runtime (the text sketch is one groupBy, not a decode — unlike the image/audio tiers there is no expensive upstream to pin).",
    "embedding_topk": "Query vectors broadcast; corpus side streams; per-query rank window.",
    "embedding_dup_pairs": "Hyperplane sign buckets computed in one pass (explode over (table,bucket)) and PINNED with the norm-carrying vector table (r13: both fan out to two consumers each; measured 29% faster warm / 3x cold); self-join keyed by the LSH cell; pair-deduped before one cosine verify per candidate.",
    "kmeans_assign": "Centroid table broadcast; argmin via rank window over k rows/point.",
    "ivf_topk": "Centroids collapse to ONE broadcast sorted-array row; list assignment and probing are per-row array expressions (no windows); probes broadcast into the list join — the corpus never shuffles before the final per-query top-k (the only data-sized exchange).",
    "ann_recall": "Exact baseline + three approximate paths; every heavy side reuses the broadcast-probe shape, and the recall join is exact-side (100 rows) left-joined to each approximate top-k. repeated_scans receipt: the four paths each re-read the 2-column embeddings parquet — pruned leaf scans, not recompute (the expensive exact baseline is localCheckpoint-pinned and runs once).",
    "asof_join": "Union + carry-forward last window keyed by the NATURAL join key — one shuffle, parallelism scales with distinct customers.",
    "quantized_topk": "int8 codes + integer dot products: same broadcast-probe shape as embedding_topk with 4× fewer bytes in flight.",
    "scrub_pii": "Pure regexp projection fused with the scan — zero exchanges.",
    "repetition_stats": "All three ratios from one split() array in a single codegen'd projection — no explode, zero exchanges.",
    "token_budget": "One prefix-scan window per group partition; no self-join.",
    "chunk_docs": "Zero exchanges: chunk explosion is per-row array math fused into the scan.",
    "contamination": "Inverted-index shingle join; probe (benchmark) side broadcast, corpus never shuffles.",
    "dedup_keep_best": "Rank + group-size windows share ONE hash exchange on the fingerprint key.",
    "pack_sequences": "Group-partitioned prefix-scan window — no global single-partition window.",
    "skew_salted_join": "Dim replicated per salt (fact never replicated); hot fact keys spread across salt_buckets tasks.",
    "jpeg_decode": "Zero exchanges: JPEG bytes are generated, entropy-decoded (huffman + IDCT) and reduced to channel sums inside one Arrow-batched mapInPandas chain - binary never crosses a shuffle.",
    "resize_mixed": "Format-mixed payloads (PNG formula / JPEG block-constant / tiny) union, then ONE Arrow-batched mapInPandas sniffs magic bytes and routes per payload — decode, box-filter resize and PNG re-encode all happen before any exchange; binary never crosses a shuffle.",
    "language_id": "Trigram occurrences explode once; the <=L*B-row NB model broadcasts into the only data-sized join; per-language sums PIVOT into one row per doc (language list = an L-row driver visit, the kmeans model-state pattern) so scoring never inflates to (doc,lang) rows and the argmax is a per-row expression chain, not a rank window; the doc-keyed aggregate pair meets in one co-partitioned sort-merge join. repeated_scans receipt: the trigram explode feeds the model counts and the scoring side — the <=L*B model side collapses to a broadcast, and AQE reuses the shared exchange at runtime (the lm_perplexity A/B generalizes: eager pins of word-count-shaped streams are slower warm).",
    "multimodal_mixed": "Zero exchanges: payload bytes are generated, decoded and featurized inside one Arrow-batched mapInPandas chain — binary never crosses a shuffle.",
    "png_edges": "Same zero-exchange mapInPandas shape as multimodal_mixed over the r8 profile-edge corpus (16-bit samples, tRNS color keys, truncated-corrupt stripe).",
    "video_frames": "Zero exchanges: Y4M parse + per-frame plane sums explode row-per-video to row-per-frame INSIDE the kernel, so frame rows exist only after the bytes are gone.",
    "semantic_dedup_pipeline": "Sampled k-means fit assigns via a broadcast (cluster,dim,val) join + per-cluster mean each iteration (cost independent of k at plan-compile time; k x dim model to the driver); then centroids broadcast for the corpus assignment; the pair join is keyed by cluster_id (hash exchange), so pair fan-out is bounded by cluster size — never global n².",
    "dsir_importance": "One bigram explode feeds both count models; the <=256-row weight table broadcasts back; the only data-sized exchange is the per-doc score aggregation.",
    "dsir_select": "Scores + seeded Gumbel key, then a DISTRIBUTED global prefix: range-repartition on the key, per-partition offsets (driver sees <=num_partitions rows), per-partition window — no one-partition global window.",
    "dedup_spans": "Stride-1 windows hashed to md5 digests; distinct-doc count map-side-combined on the digest; covered positions explode only from duplicated windows; anti-join on (doc,pos); one ordered groupBy rebuild — nothing all-pairs. repeated_scans receipt (r13): the window/base frames fan out but AQE reuse dedupes them at runtime — pinning was A/B'd and is SLOWER warm (1.48 vs 0.74 s min-of-2 at sf0.1), so the plan stays unpinned.",
    "lm_perplexity": "Bigram explode feeds both count tables; <=B-row context table broadcasts; the bigram-weight join is a plain equi-join with map-side-combined counts (word-count shuffle discipline). repeated_scans receipt (r13): the occ explode is consumed by big/ctx/scoring — A/B'd at sf0.1, AQE ReuseExchange already dedupes it at runtime and an eager pin is SLOWER warm (2.22 vs 1.03 s), so it stays unpinned.",
    "sketch_profile": "Both sketches are map-side-combined aggregates (<=depth*width / 2^p rows cross the shuffle); point queries broadcast the register table onto the distinct-item stream.",
    "merge_upsert": "Delta keys broadcast into a LEFT ANTI join — the base snapshot never shuffles; unmatched-update inserts ride the same union.",
    "stratified_sample": "Quota mode: ONE exchange on the group key (hash-rank window). The fraction mode is a zero-exchange pure filter — plan-asserted in tests/test_curation.py.",
    "range_join": "Interval containment WITHOUT a nested loop: intervals explode into time bins, points map to one bin, plain equi-join on the bin key + exact predicate — candidate set bounded by intervals-per-bin, never |points|x|intervals|.",
    "wav_edges": "Zero exchanges: WAV bytes generated, decoded (8/16/24-bit PCM) and reduced to integer stream stats inside one Arrow-batched mapInPandas chain.",
    "dedup_incremental": "New shard's bands join the precomputed corpus band table on the single band_hash key (bucketed layout joins co-located — only the shard side shuffles); exact-Jaccard verify shingles candidate-matched docs only via leftsemi pruning. pin receipts (r14, superseding the r13 wash): the candidate pair table (3 consumers) and the candidate-matched shingle tables (2 each) are localCheckpoint-pinned inside the operator — the r13 A/B pinned a DIFFERENT subtree (the whole verify chain); pinning these increment-bounded frames measured first-rep 17.56->5.07 s and warm 5.32->4.77 s at sf0.1, so the pins ship and repeated_scans drops to 0.",
    "ivf_topk_persisted": "Corpus lists read from the hive layout with list_id PartitionFilters (directory pruning to the probed lists); probes broadcast; the only data-sized exchange is the per-query top-k. repeated_scans receipt: the probe-side embeddings parquet is read once per consumer (probe build + id collect) — pruned 2-column leaf scans of the query subset.",
    "html_extract": "Zero exchanges: the whole strip kernel + markup features are ONE generated projection fused with the scan.",
    "crawl_curation_pipeline": "ONE exchange END-TO-END (r10: the URL tier's norm_url dedup window — the unavoidable recrawl-dedup shuffle; suffix/blocklist dims broadcast): URL survivors -> html strip -> C4 line rules -> Gopher quality + 13 repetition folds chain through column passthrough (no re-join on doc_id) — everything after the URL tier is one fused map over the corpus.",
    "url_filters": "Normalization is a pure projection fused with the scan; the PSL lookup is one broadcast left join per (rule length, kind) slice of the suffix dim (11 at depth 4 with wildcard/exception rules — each a filtered PSL-sized build, corpus-independent) plus the blocklist; the ONLY shuffle is the norm_url dedup window — the global recrawl group-by no URL dedup can avoid.",
    "warc_ingest": "Record walk + HTTP split is one Arrow-batched projection over the payload column — zero exchanges; at archive scale the binaryFile scan gives one task per WARC file, the grain the writers size for.",
    "jpeg_lossless": "Generate -> decode -> per-payload stats: chained mapInPandas projections, zero exchanges — per-row decode cost, no shuffle at any corpus size.",
    "jpeg_cmyk": "Same shape as jpeg_lossless: the whole 4-component decode pipeline is fused per-row work, zero exchanges.",
    "bpe_pipeline": "The audited plan is the POST-TRAINING shape: tokenization is k chained literal replaces fused into one zero-shuffle projection (the merge table unions in as a literal local relation). Training itself is a driver loop over the vocabulary-sized word-count table — one pair-count shuffle per merge, one argmax row to the driver per iteration.",
    "dedup_lines": "Three keyed exchanges, all linear: the corpus-wide line count shuffles md5 DIGESTS of the normalized key (never line text), one distinct-doc count, one digest equi-join back, one per-doc ordered reassembly bounded by doc size — nothing all-pairs.",
    "url_domain_cap": "URL tier (broadcast PSL slices + the one norm_url dedup exchange) then ONE domain-keyed exchange with a streaming rank window. EXACT mode — the oracle surface: the partition key is definitionally max-skew (the mega-domains being capped sort in one task); the production mode is bounded=True below.",
    "url_domain_cap_bounded": "The two-phase quota: phase 1 pre-ranks on (salt, domain) with salt = xxhash64(order keys) mod salt_parts (r13: deterministic — the r12 spark_partition_id salt could split a row inconsistently across the kept/dropped branches if the exchange were recomputed, and gave no spreading on few-partition inputs) — the hot domain spreads across salt_parts groups, so no task sorts more than ~1/salt_parts of it; phase 2 runs the exact window only over the ≤ cap·salt_parts candidates. The compile-time plan triplicates the input subtree across the kept/dropped/exempt union branches (repeated_scans counts it); at runtime AQE ReuseExchange dedupes both shared exchanges (pre-rank + the URL tier's dedup window — asserted in tests/test_url.py), and with the deterministic salt correctness no longer depends on that reuse. Adversarial 90%-one-domain receipt in SCALING.md.",
    "ccnet_pipeline": "The dedup_lines result is PINNED once (localCheckpoint — the r12 fix: the compiled plan otherwise inlined the 3-exchange dedup subtree into every consumer, measured 16 posexplode copies with zero ReuseExchange); downstream is the zero-shuffle LID projection, the word-count-shaped LM shuffles, the ≤1-row tercile-cutoff broadcast, and ONE id-keyed recombine join. Receipt asserted in tests/test_plans.py.",
    "ccnet_perlang": "Same pinned-dedup shape as ccnet_pipeline with every LM table and the tercile cutoffs keyed by pred_lang: the context table stays ≤ n_langs·B rows (broadcast), the cutoffs become an ≤ n_langs-row broadcast join instead of a one-row crossJoin — no new data-sized exchange.",
    "warc_crawl_pipeline": "ONE exchange end-to-end (asserted in tests/test_plans.py): WARC framing + HTTP split + charset decode are Arrow-batched zero-shuffle projections feeding the URL tier's single norm_url dedup window; everything after (html strip, C4, Gopher, LID) chains through column passthrough.",
    "warc_revisits": "Zero exchanges + one broadcast hash join: the revisit side (Refers-To keys) builds, the record stream probes on WARC-Record-ID. At archive scale the build side is the revisit subset — CommonCrawl revisit rates keep it far under the record count.",
    "exif_orientation": "Zero exchanges: EXIF header scan, full decode, transpose/flip and PNG re-encode all happen inside one Arrow-batched mapInPandas — pixels never cross a shuffle.",
    "jpeg_hierarchical": "Zero exchanges: the Annex-J pyramid decode (DHP dims, EXP upsampling, SOF5 differential refinement) is per-payload work fused into the generate→decode mapInPandas chain.",
    "image_dedup": "dHash tier is a zero-shuffle mapInPandas (decode + orientation-normalize + 64-bit block-sum hash — only 8-byte hashes leave it), PINNED once (localCheckpoint, r13: the r12 plan re-inlined the decode subtree into all five consumers — pair join both sides, degree, recombine); the consuming plan scans the materialized 8-byte hash table (zero MapInPandas nodes — receipt in tests/test_plans.py); the pair join is keyed by 16-bit pigeonhole chunk equality (subquadratic, the simhash kernel with hash_col='dhash'); the dup-degree aggregate is one hash-keyed exchange.",
    "warc_cdx": "ONE shuffle — the shard-key group-by that shard assembly is at any scale; the CDX index rows are emitted by the SAME applyInPandas pass that assembles the content (no second walk to drift), then explode to a table. The per-shard memory contract is enforced by max_shard_bytes.",
    "url_robots": "The robots parse (line explode, group windows, collect_list to rule arrays) runs entirely on the ROBOTS DIM — one row per domain, bounded like the blocklist; the parsed rule-array dim then BROADCASTS and the RFC longest-match decision is a per-row filter/array_max expression, so the corpus gains zero exchanges beyond the URL tier's own dedup window — the PSL-join discipline applied to politeness.",
    "pq_topk": "Training: the m·ksub codebook broadcasts into the per-(row, subspace) argmin window and the mean update is a map-side-combined (s, code, dim) aggregate. Query time: the per-query distance tables (queries·m·ksub rows) broadcast; the corpus carries only its m-byte codes into a per-row zip_with table-lookup sum — the corpus never shuffles before the per-query top-k window, the cosine_topk plan with 32× smaller rows in flight.",
    "pq_rerank": "ADC stage as pq_topk; the exact re-rank then joins only the queries·shortlist CANDIDATE ids back to their vectors — full-precision math is candidate-sized, never corpus-sized, which is the §V deployment shape (and the join a persisted id-keyed vector layout serves at 100 TB). repeated_scans receipt: the re-rank re-reads the 2-column embeddings parquet for the vector join — a pruned leaf scan, the read a persisted id-keyed layout serves at scale.",
    "ivfpq_topk": "The composed IVF×PQ index: the codebook trains once and pins (localCheckpoint); coarse assignment is a per-row integer-L2 argmin fold over the broadcast one-row centroid array, carried THROUGH the encode aggregation as a grouping column (one build pass — exactly pq_encode's exchanges, no extra id join); probes + per-query ADC tables broadcast into the coded-list join, so the m-byte-code corpus never shuffles before the per-query top-shortlist window; the exact re-rank joins candidate ids only (candidate-sized full-precision math); the exact-baseline `hit` join adds one broadcast of the queries-sized exact top-5. Against the persisted layout the probed-list scan is directory-pruned (PartitionFilters on list_id — asserted in tests). repeated_scans receipt: build/probe/re-rank/baseline each re-read the 2-column embeddings parquet — pruned leaf scans, not recompute (the expensive training subtree is the pinned codebook); at scale the re-rank reads an id-keyed persisted vector layout.",
    "ivfpq_residual_topk": "ivfpq_topk's shape with residual encoding (IVFADC): the residual derivation is per-row array math over a broadcast centroid dim (zero new exchanges), the codebook trains on residual subvectors and pins, and the ADC tables become per-(query, probed list) — still queries·nprobe·m·ksub values, still broadcast; the coded corpus still never shuffles before the per-query top-shortlist window. repeated_scans receipt: same pruned embeddings-parquet leaf re-reads as ivfpq_topk plus the residual derivation under train and encode — each a scan + broadcast join + array subtraction, no data-sized exchange.",
    "bm25_topk": "The bounded query vocabulary is an IN-set filter pushed onto the raw token projection, so the (doc, term) aggregation, df counts and scoring run over matched postings only; idf (query-term-count-sized) and the query-term table broadcast onto the matched postings; the per-query ranking window partitions by query_id over score rows (|queries| x matched docs), never the corpus. repeated_scans receipt: the matched-postings subtree compiles into both its consumers (df/idf and scoring) but they meet through ONE structurally identical (doc_id, term) exchange AQE reuses at runtime (measured at sf0.1: pinning is a wash, 3.00 vs 2.94 s warm — stays unpinned per the measure-first rule); the doc-length frame is a deliberate second NO-EXPLODE projection scan — deriving dl from the exploded stream would cost a corpus-wide token exchange.",
    "link_pagerank": "The audited plan is the FINAL power-iteration round rooted at checkpointed scans (the kmeans driver-loop discipline): the edges x out-weight join is pinned ONCE before the loop and each round's rank frame is pinned, so lineage stays O(1) across rounds; each round = one src-keyed join exchange + one dst-keyed aggregation + one node-set left join; the dangling mass is a single-row driver scalar per round, and link extraction + the PSL domain mapping run upstream of the pinned edge table (zero exchanges beyond the edge groupBy).",
    "bm25_persisted": "The persisted-index query plan: the postings scan carries PartitionFilters on term_bucket (hive pruning reads only the query vocabulary's bucket directories — asserted in tests/test_retrieval.py) plus the residual term IN pushed filter; doc lengths and the one-row stats table are plain parquet reads — NO corpus tokenize at query time, which is the layout's whole point; downstream is the shared micro-unit scoring chain (broadcast idf + query terms, per-query window).",
    "anchor_texts": "One groupBy exchange on the resolved target url over the zero-shuffle extraction projection (anchor regex + href + strip_html all fuse with the scan); collect_set bounds hot-target width by text VARIETY, not in-degree.",
    "bm25_incremental": "Same query plan as bm25_persisted (the layout is identical after the increment lands): term_bucket PartitionFilters + residual term IN at the postings scan, no corpus tokenize at query time; the increment itself is an append write + a one-row exact stats add, so nothing in the query path changes shape.",
    "mixture_sample": "The data-mixing admission reuses _budget_admit's distributed prefix-sum discipline with GROUP-AWARE offsets: range-repartition on (group, draw-key, id) spreads a mega-source across many partitions (never a one-task group window); per-(partition, group) totals are ONE bounded driver visit; offsets broadcast back onto a LOCAL per-partition window. The quota dim (|weights| rows) broadcasts; the audited plan is the post-checkpoint admission shape rooted at the pinned range partitioning.",
    "media_dedup_pipeline": "The media twin of crawl_curation_pipeline: magic-byte routing is a per-row projection over the payload prefix; each modality's decode+hash is one zero-shuffle Arrow mapInPandas PINNED before fan-out (the decode runs once per modality); pairs are modality-keyed pigeonhole joins (identical cross-modality sketches never meet); one alternating-star CC pass over the pair union (disjoint id spaces keep clusters single-modality); the audited plan is the post-fixpoint recombine over two pinned hash tables.",
    "audio_dedup": "The image_dedup shape on the audio tier: WAV decode + block-energy differential print is one zero-shuffle Arrow mapInPandas (PCM bytes never cross an exchange; only 8-byte prints leave it), PINNED before fan-out from birth (the r13 image-gate lesson); the pair join is the same 16-bit pigeonhole kernel (hash_col='afp'); the dup-degree aggregate is one hash-keyed exchange.",
    "quality_classifier": "Training is ONE aggregation pass: token explode → per-bucket conditional counts (map-side combined, ≤ B rows cross the shuffle) → a 1-row totals broadcast → the B+1-row model, pinned (localCheckpoint) before its two scorer consumers; scoring is explode → broadcast model join → one doc-keyed sum; the perplexity join reuses the lm_perplexity word-count shuffle discipline. No SGD, no iteration, nothing all-pairs — the exactly-replayable member of the linear-scorer family. repeated_scans receipt: training, scoring and the perplexity chain each re-read the 2-column documents parquet — pruned leaf scans (a production run trains on a materialized stage); the final scored⋈perplexity SMJ is doc-keyed on two corpus-sized sides — the correct join at scale, deliberately not broadcast-hinted.",
    "quality_select": "The classifier scorer's broadcast-model pass feeds the shared dsir_select admission kernel: ONE range-repartition on (score DESC, id ASC) pinned by localCheckpoint, per-partition token sums to the driver (≤ num_partitions rows — model-state-sized), per-partition prefix window + offset — never a one-partition global window. The audited plan is the post-checkpoint admission shape.",
    "video_dedup": "Container walk + per-frame luma dHash is one zero-shuffle Arrow mapInPandas (video bytes never cross an exchange; only (id, 8-byte hash) rows leave it), PINNED before the set-dedup fan-out; the frame-hash set then rides the minhash kernel — items explode once into the signature aggregation, candidates come only from shared LSH bands (subquadratic self-join on the band hash), and the exact-Jaccard verify is a pair-constrained equi-join on the item — candidate-sized, never all-pairs.",
    "image_dedup_clusters": "dHash tier zero-shuffle and PINNED once before fan-out (r13 — decode executes once; zero MapInPandas in the consuming plan, receipt in tests/test_plans.py); pair join pigeonhole-keyed; the alternating-star CC loop is the dedup_clusters kernel — each round two node-keyed groupBy/join passes over a shrinking edge set, localCheckpoint per round, O(log n) rounds on adversarial chains; the audited plan is the post-fixpoint star-forest join back onto the id set.",
}


def main() -> None:
    spark = get_spark(app_name="plan_audit")
    sf_dir = "/root/testdata/sf0.01"
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Generated by `python tools/plan_audit.py` (sf0.01 schemas; plan",
        "shapes are data-size independent except AQE runtime choices).",
        "",
    ]
    for name in AUDIT:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        r = plan_report(fn(spark, sf_dir))
        facts = (
            f"exchanges={r.n_exchanges}, broadcast_joins={r.n_broadcast_joins}, "
            f"sortmerge_joins={r.n_sortmerge_joins}, "
            f"take_ordered={r.has_take_ordered}, "
            f"repeated_scans={r.repeated_scans}, "
            f"pushed_filters={[p for p in r.pushed_filters if p]}"
        )
        out += [
            f"## {name}",
            "",
            COMMENT.get(name, ""),
            "",
            f"**Facts:** {facts}",
            "",
            "```",
            r.raw.strip()[:3000],
            "```",
            "",
        ]
    # ---- bucketed corpus layout (VERDICT r7 item 3): the repeated-run
    # dedup workflow over a digest-bucketed table must plan with ZERO
    # exchanges — the layout paid the content-key shuffle once at write.
    from bigdata_lab02_spark.sources.sinks import write_bucketed  # noqa: E402
    from pyspark.sql import functions as F  # noqa: E402

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keyed = docs.select(F.md5("text").alias("digest"), "doc_id", "text")
    write_bucketed(keyed, "plans_docs_bkt", ["digest"], 16, sort_cols=["digest"])
    bkt = spark.table("plans_docs_bkt")
    agg = bkt.groupBy("digest").agg(
        F.min("doc_id").alias("survivor_id"), F.count("*").alias("n_copies")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = (
            bkt.alias("a")
            .join(bkt.alias("b"), "digest")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select("digest", F.col("a.doc_id"), F.col("b.doc_id"))
        )
        for title, df in (("exact-dedup groupBy", agg), ("dup-pair self-join", pairs)):
            r = plan_report(df)
            assert r.n_exchanges == 0, f"bucketed {title} grew an exchange:\n{r.raw}"
            out += [
                f"## bucketed_dedup_layout — {title}",
                "",
                "Documents written once with `write_bucketed(..., ['digest'], …)`"
                " (one content-key shuffle at layout time); every re-run dedup"
                f" {title} over the bucketed table then plans with ZERO exchanges"
                " — the 100 TB lever for the many-passes-same-corpus curation"
                " workflow. Asserted here AND in tests/test_bucketing.py.",
                "",
                f"**Facts:** exchanges={r.n_exchanges}, "
                f"sortmerge_joins={r.n_sortmerge_joins}",
                "",
                "```",
                r.raw.strip()[:3000],
                "```",
                "",
            ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS plans_docs_bkt")

    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDIT)} queries + bucketed layout)")


if __name__ == "__main__":
    main()
