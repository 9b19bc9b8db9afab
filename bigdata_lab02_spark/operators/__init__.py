"""Operator inventory (SURVEY.md §2) as composable DataFrame transforms.

- ``encode``     — P2 stopword filter, P3/P4 dictionaries, P5 doc-term counts
- ``matrix``     — P6 frequency filter, P7 global top-k, P8 TF, P9 IDF,
                   P10 TF-IDF, P11 sparse-vector pivot
- ``category``   — P12 cTFIDF rollup, P13 grouped top-k
- ``topk``       — global & grouped top-k helpers (TakeOrderedAndProject /
                   window-based)
- ``kmeans``     — K1-K11 + D1 (dense Euclidean, sparse cosine, K-Means||)
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                   embedding near-dup (training-data extensions)
- ``similarity`` — brute-force & LSH-bucketed ANN over embeddings
- ``textstats``  — language id, quality scoring, token counts, fingerprints
- ``curation``   — scrubbing, chunking, packing, splits, stratified
                   sampling, DSIR, CCNet perplexity
- ``sketch``     — CMS / HLL algebraic sketches
- ``skew``       — salted joins/aggregations for hot keys
- ``merge``      — snapshot merge/upsert
- ``temporal``   — binned range (interval-containment) join
- ``html``       — WET-style HTML → text extraction + markup features
- ``bpe``        — corpus-trained byte-pair encoding (train + tokenize)
- ``crawl``      — composed crawl-curation pipeline (html → C4 →
                   Gopher quality + repetition) as one projection
- ``multimodal`` — binary-column plumbing with REAL vendored codecs
                   (png/jpeg/wav/y4m) — byte-level decode on executors
- ``pretrain``   — the capstone composition: URL tier → exact +
                   MinHash dedup → quality classifier → mixture →
                   packing, decoded pages in, training packs out
"""
