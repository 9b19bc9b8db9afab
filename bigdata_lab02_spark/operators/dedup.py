"""Deduplication operators for training-data pipelines.

Five families, all shuffle-disciplined for 100 TB corpora:

- **Exact** (``exact_dedup``): hash-groupBy on a content digest. One
  shuffle keyed by the digest; survivor = min id (deterministic).
- **MinHash + LSH** (``minhash_signatures`` / ``lsh_candidate_pairs`` /
  ``minhash_dedup_pairs``): shingle → per-seed min-hash → band → bucket
  join. Candidate generation never compares all pairs: docs meet only
  inside an LSH bucket, so the join key is (band_id, band_hash) and the
  shuffle is proportional to Σ bucket² not n².
- **SimHash** (``simhash``): 60-bit hyperplane sketch from md5 token
  hashes; near-dups have small Hamming distance. Bit math via built-ins;
  portable (the DuckDB oracle reproduces it bit-for-bit).
- **n-gram Jaccard** (``ngram_jaccard_pairs``): exact Jaccard over shingle
  sets for candidate pairs (inverted-index join on shared shingles —
  rare-shingle blocking keeps it subquadratic).
- **Embedding cosine** (``embedding_dup_pairs`` in operators.similarity):
  near-dup = cosine above threshold.

Hash choice: MinHash uses ``md5(seed || shingle)`` compared as hex strings
(min of hex = min of 128-bit value). Deterministic, portable (any engine
with md5 reproduces signatures bit-for-bit — the DuckDB oracle does), and
collision-free at corpus scale. ``xxhash64`` variants are faster but
engine-specific; both are exposed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokens_column

# ----------------------------------------------------------------- exact


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on content digest. Returns one survivor row per distinct
    content: (digest, survivor_id, n_copies). Survivor = min id."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ----------------------------------------------------------------- shingles


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct, order-free) from normalized
    tokens. Short docs (< n tokens) get their whole text as one shingle.

    Built from ``n`` shifted slices combined with ``zip_with`` — O(n·len)
    array work. (The obvious ``transform(sequence, i -> slice(toks, i, n))``
    is O(len²) per doc because each slice re-copies; measured 13.8 s → 1.7 s
    for signatures at sf0.1.)"""
    toks = tokens_column(text)
    m = F.greatest(F.lit(0), F.size(toks) - (n - 1))  # gram count
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, i + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    out = F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(grams)
    return F.array_distinct(out)


# ----------------------------------------------------------------- minhash


def shingle_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """The exploded ``(id, sh)`` shingle stream — the shared upstream of
    MinHash signatures and exact-Jaccard verification (r17). Callers
    that feed it to more than one consumer (``minhash_signatures`` AND
    ``minhash_dedup_pairs`` over the same corpus) should pin it and
    pass it via those functions' ``shingled=`` parameter so the
    tokenize+shingle+md5 kernel runs once instead of once per
    consumer."""
    return docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    *,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(id, signature array<string>): signature[i] = min over shingles of
    md5(i || '|' || shingle). Portable across engines (hex-string min).

    Shape: explode shingles ONCE, then a single groupBy with ``num_hashes``
    min-aggregates. One pass over the shingle stream with map-side partial
    aggregation — the array-expression formulation (min over ``transform``
    per row) duplicates the whole tokenize+shingle tree per hash and falls
    off the codegen cliff (measured 180 s → 4 s at sf0.1).

    ``shingled`` (r17, keyword-only, INTERNAL reuse seam): the caller's
    pre-built ``shingle_stream(docs, ...)`` — MUST be derived from the
    same docs/text_col/shingle_n or the signatures silently describe
    the wrong corpus; used by the pretrain layout build to share one
    shingle pass between the band artifact and the pair verification."""
    ex = (
        shingled
        if shingled is not None
        else shingle_stream(docs, text_col, id_col, shingle_n)
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
        )
    )


def minhash_band_table(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id, band_id, band_hash) — the LSH banding of a signature table.

    This IS the corpus artifact the repeated-curation workflow persists:
    write it once with ``write_bucketed(..., ['band_hash'])`` and every
    later shard's ``minhash_dedup_incremental`` joins it CO-LOCATED —
    the corpus side never shuffles again (plan-asserted in
    tests/test_dedup_similarity.py).

    ``band_hash`` BAKES THE BAND INDEX IN (``"<b>|v1|v2"``): two docs
    share a band_hash iff they collide in the SAME band, so band joins
    are single-key — which is what lets a table bucketed on just
    ``band_hash`` satisfy the join's clustering without an exchange
    (a two-key (band_id, band_hash) join over a one-key bucket spec
    re-shuffles the bucketed side)."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            F.lit(str(b)),
                            *[
                                F.col("signature")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Band the signatures and self-join on (band_id, band_hash) →
    candidate (id_a, id_b) pairs, id_a < id_b, distinct.

    The self-join key is the banded hash, so co-bucketed docs only — this
    is the subquadratic heart of LSH dedup. Skewed buckets (boilerplate
    shingles) are handled by AQE skew-join splitting.
    """
    banded = minhash_band_table(signatures, id_col, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col(f"b.band_id"))
            & (F.col(f"a.band_hash") == F.col(f"b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    threshold: float = 0.6,
    *,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH dedup: candidates from LSH buckets, verified with
    exact Jaccard over shingle sets → (id_a, id_b, jaccard >= threshold).

    The corpus is tokenized+shingled ONCE — and PINNED (r13): the
    exploded (id, shingle) stream feeds the signature aggregation (both
    sides of the band self-join), the set sizes, and the exact-Jaccard
    verification twice; without the pin the compiled plan re-inlined the
    tokenize+shingle subtree into every consumer (measured: 16 Generate
    nodes, 5 repeated scans — the ccnet/image-gate re-inlining class),
    and the pin is measured 11% faster warm and 2.7× faster cold at
    sf0.1. Production runs materialize the band table instead
    (``persist_corpus_bands``); the intersection is counted via a
    pair-constrained join on the shingle — no per-row set arrays.

    ``shingled`` (r17, keyword-only, INTERNAL reuse seam — same
    contract as ``minhash_signatures``): a caller-pinned
    ``shingle_stream`` of the same docs; when passed, the internal
    explode+pin is skipped so the shingle pass is shared with the
    caller's other consumers instead of materializing a second pinned
    copy."""
    ex = (
        shingled
        if shingled is not None
        else shingle_stream(docs, text_col, id_col, shingle_n).localCheckpoint()
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
        )
    )
    cands = lsh_candidate_pairs(sigs, id_col, bands, num_hashes // bands)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        cands.join(ex.withColumnsRenamed({id_col: "id_a"}), "id_a")
        .join(ex.withColumnsRenamed({id_col: "id_b"}), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def set_minhash_signatures(
    items: DataFrame,
    id_col: str = "doc_id",
    item_col: str = "item",
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signatures over an ALREADY-EXPLODED (id, item) table —
    the ``minhash_signatures`` kernel for records that ARE sets rather
    than text (a video's frame-hash set, an n-gram set, a citation
    list): signature[i] = min over the record's distinct items of
    md5(i || '|' || item). NULL items are ignored; records whose items
    are all NULL produce no signature (nothing to hash). Same portable
    hex-string-min currency as the text kernel, so the band table and
    every downstream join are shared code. Items are hashed through
    their STRING form — use string/integer item columns (floats
    stringify with engine-specific formatting, which would break a
    cross-engine oracle over the signatures)."""
    ex = (
        items.select(
            F.col(id_col), F.col(item_col).cast("string").alias("sh")
        )
        .where(F.col("sh").isNotNull())
        .distinct()
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
                "signature"
            ),
        )
    )


def set_dup_pairs(
    items: DataFrame,
    id_col: str = "doc_id",
    item_col: str = "item",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate SET pairs: MinHash-LSH candidates over the item
    sets, verified with EXACT Jaccard → (id_a, id_b, n_common, n_union,
    jaccard ≥ threshold, jaccard rounded 6 dp). The set face of
    ``minhash_dedup_pairs`` (r13, built for per-video frame-hash-set
    dedup — the standard video near-dup stage: a trimmed or re-encoded
    copy keeps most of its frame hashes, so its set Jaccard stays high
    while byte identity is long gone).

    Scale shape: items explode once — PINNED, the minhash_dedup_pairs
    discipline (five consumers otherwise re-inline the distinct
    subtree) — and feed both the signature aggregation and the verify
    joins; candidates come only from shared LSH bands (subquadratic);
    intersections are counted via a pair-constrained equi-join on the
    item (candidate-sized, no per-row set arrays); sizes join back
    keyed by id. Nothing all-pairs."""
    ex = (
        items.select(
            F.col(id_col), F.col(item_col).cast("string").alias("sh")
        )
        .where(F.col("sh").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
                "signature"
            ),
        )
    )
    cands = lsh_candidate_pairs(sigs, id_col, bands, num_hashes // bands)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        cands.join(ex.withColumnsRenamed({id_col: "id_a"}), "id_a")
        .join(ex.withColumnsRenamed({id_col: "id_b"}), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
            .cast("long")
            .alias("n_union"),
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def persist_corpus_bands(
    corpus: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    n_buckets: int = 32,
) -> None:
    """One-call setup for the incremental-dedup workflow: compute the
    corpus MinHash band table and persist it BUCKETED (and sorted) on
    ``band_hash`` — the layout under which every later
    ``minhash_dedup_incremental`` call joins the corpus co-located.
    This is the step a 100 TB curation pipeline runs once per corpus
    version; ``spark.table(table_name)`` hands the artifact back."""
    from bigdata_lab02_spark.sources.sinks import write_bucketed

    sigs = minhash_signatures(corpus, text_col, id_col, num_hashes, shingle_n)
    band_tbl = minhash_band_table(sigs, id_col, bands, num_hashes // bands)
    write_bucketed(
        band_tbl, table_name, ["band_hash"], n_buckets,
        sort_cols=["band_hash"],
    )


def minhash_dedup_incremental(
    new_docs: DataFrame,
    corpus: DataFrame,
    corpus_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """Incremental MinHash-LSH dedup of a NEW shard against an existing
    corpus whose banded signatures were computed ONCE (r8 — the actual
    repeated-curation workflow: at 100 TB, re-hashing every corpus
    shingle per incoming shard is the dominant cost, and this path never
    does it).

    ``corpus_bands`` is a ``minhash_band_table`` output, typically read
    back from a ``write_bucketed(..., ['band_hash'])`` table so the band
    join is CO-LOCATED: the only exchange in candidate generation is on
    the (small) new-shard side. The exact-Jaccard verification then
    shingles ONLY candidate-matched docs on both sides (semi-join
    pruning) — corpus text is touched just for the docs that collide.

    Returns (id_new, id_old, jaccard >= threshold). Signatures are
    per-doc functions of the text, so the result equals the full-batch
    ``minhash_dedup_pairs`` restricted to (new x old) pairs —
    equivalence-tested in tests/test_dedup_similarity.py. ``corpus``
    must carry the same text the bands were computed from; drift between
    them surfaces as candidate pairs whose verified Jaccard disagrees,
    never silently.

    Pin receipts (r14, VERDICT r13 item 5 — the largest repeated_scans
    residual in PLANS.md, 13 leaf re-scans): the candidate pair table
    is consumed THREE times (both semi-join id sets + the intersection
    join) and each consumer recompiled the full LSH subtree; the
    candidate-matched shingle tables are each consumed twice (size agg
    + intersection). Pinning both (the r13 dedup-tier pin-sweep shape)
    measured at sf0.1: first-rep 17.56 s → 5.07 s (3.5× — the driver
    measures first-rep), warm min-of-2 5.32 s → 4.77 s. Both pinned
    frames are bounded: ``cand`` is the increment's collision pair
    set, and the shingle tables cover candidate-MATCHED docs only."""
    rows_per_band = num_hashes // bands
    new_sigs = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_n
    )
    new_bands = minhash_band_table(
        new_sigs, id_col, bands, rows_per_band
    ).withColumnsRenamed({id_col: "id_new"})
    # single-key join: band_hash carries the band index (see
    # minhash_band_table), so a corpus table bucketed on band_hash
    # joins co-located
    cand = (
        new_bands.select("id_new", "band_hash")
        .join(
            corpus_bands.withColumnsRenamed({id_col: "id_old"}).select(
                "id_old", "band_hash"
            ),
            "band_hash",
        )
        .where(F.col("id_new") != F.col("id_old"))
        .select("id_new", "id_old")
        .distinct()
        .localCheckpoint()  # 3 consumers; see pin receipts above
    )
    # exact verification over candidate-matched docs only
    new_ids = cand.select(F.col("id_new").alias(id_col)).distinct()
    old_ids = cand.select(F.col("id_old").alias(id_col)).distinct()
    new_ex = (
        new_docs.join(new_ids, id_col, "leftsemi")
        .select(
            F.col(id_col).alias("id_new"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
        .localCheckpoint()  # 2 consumers; see pin receipts above
    )
    old_ex = (
        corpus.join(old_ids, id_col, "leftsemi")
        .select(
            F.col(id_col).alias("id_old"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
        .localCheckpoint()  # 2 consumers; see pin receipts above
    )
    sz_new = new_ex.groupBy("id_new").agg(F.count("*").alias("sz_new"))
    sz_old = old_ex.groupBy("id_old").agg(F.count("*").alias("sz_old"))
    inter = (
        cand.join(new_ex, "id_new")
        .join(old_ex, ["id_old", "sh"])
        .groupBy("id_new", "id_old")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        inter.join(sz_new, "id_new")
        .join(sz_old, "id_old")
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("sz_new") + F.col("sz_old") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_new", "id_old", "jaccard")
    )


# ----------------------------------------------------------------- jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard dedup via inverted-index join.

    Explode shingle sets, join docs sharing a shingle, count shared
    shingles per pair, Jaccard = |∩| / (|A| + |B| − |∩|). The pair space is
    bounded by co-occurring shingles, not n²; ``max_shingle_df`` drops
    ubiquitous shingles (boilerplate) from candidate generation the way a
    search engine drops stop-shingles, collapsing the worst skew.

    The exploded shingle stream is PINNED (r13): sizes, the df filter
    and both self-join sides consume it — unpinned, the compiled plan
    re-ran tokenize+shingle once per consumer (measured 19% faster
    warm, 2.9× cold at sf0.1 with the pin).
    """
    sh = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
    ).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_shingle_df is not None:
        rare = sh.groupBy("sh").agg(F.count("*").alias("df")).where(
            F.col("df") <= max_shingle_df
        )
        sh_c = sh.join(rare.select("sh"), "sh")
    else:
        sh_c = sh
    a = sh_c.withColumnsRenamed({id_col: "id_a"})
    b = sh_c.withColumnsRenamed({id_col: "id_b"})
    inter = (
        a.join(b, ["sh"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        inter.join(
            sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a"
        )
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


# ----------------------------------------------------------------- simhash


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> DataFrame:
    """Portable SimHash (Charikar 2002): a ``bits``-bit sketch per doc from
    md5 token hashes — per bit position, majority vote over the distinct
    tokens' hash bits. Returns (id, simhash long). Near-dups ⇒ small
    Hamming distance (``F.bit_count(a ^ b)``).

    This is the single SimHash implementation — the gate query, the
    Hamming-pair blocking, and the DuckDB oracle all use it. The hash is
    ``conv(substr(md5(tok),1,15),16,10)`` (top 60 bits of md5), which any
    engine with md5 reproduces bit-for-bit (DuckDB:
    ``('0x'||substr(md5(tok),1,15))::BIGINT``).

    Shape (the 100 TB plan): explode distinct tokens ONCE, then ONE
    groupBy(doc) carrying ``bits`` conditional-sum aggregates plus a count,
    then a single bit-assembly projection. Map-side partial aggregation
    does the heavy lifting; nothing multiplies the token stream ×bits
    through the shuffle (the bit-grid crossJoin form does), and no per-row
    array expression is duplicated ``bits`` times (the codegen cliff the
    minhash operator documents).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_column(F.col(text_col)))).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    th = toks.select(F.col(id_col), h.alias("h"))
    aggs = [F.count("*").alias("__n")] + [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != F.lit(0), 1).otherwise(0)
        ).alias(f"__o{b}")
        for b in range(bits)
    ]
    grouped = th.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"__o{b}") * 2 > F.col("__n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    sketches = grouped.select(F.col(id_col), sim.alias("simhash"))
    # Docs producing ZERO distinct tokens (empty/whitespace text) emit no
    # explode rows — left-join back and sketch them as 0 so every input doc
    # has a sketch (two empty docs are trivially identical, hamming 0).
    return (
        docs.select(id_col)
        .join(sketches, id_col, "left")
        .fillna({"simhash": 0})
    )


def simhash_dup_pairs(
    simhashes: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_col: str = "simhash",
) -> DataFrame:
    """Near-dup pairs by Hamming distance over a 64-bit-or-less sketch
    column, blocked on 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at
    least one of 4 chunks equal), so the join is on chunk equality —
    subquadratic, no full cross join. ``hash_col`` (r12) names the
    sketch: the same kernel serves SimHash text sketches and the
    perceptual image dHash (``multimodal.image_dhash``); NULL sketches
    (undecodable images) never enter the join."""
    # One explode + ONE equi-join keyed by (chunk_idx, chunk) — not four
    # union'd self-join branches, which re-evaluate the sketch subtree once
    # per branch per side. Identical candidate set (a pair collides on some
    # chunk either way); the sketch column is read once per join side WITHIN
    # this function. The self-join still plans the input subtree on BOTH
    # sides, and gate-level consumers typically read `simhashes` again for
    # the final recombine — callers fanning out an EXPENSIVE upstream (image
    # decode, LSH banding) must pin it first (localCheckpoint), or the
    # compiled plan inlines that subtree once per consumer (r12 image-gate
    # receipt: 5 decode chains).
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.shiftrightunsigned(F.col(hash_col), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("c"),
            )
            for i in range(4)
        ]
    )
    ch = simhashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col).alias("simhash"), F.explode(chunks).alias("x")
    ).select(
        F.col(id_col),
        F.col("simhash"),
        F.col("x.i").alias("i"),
        F.col("x.c").alias("c"),
    )
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.c") == F.col("b.c"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------- duplicate clustering


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the duplicate-pair graph by alternating
    large-star / small-star rounds (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14).

    This is the step a dedup pipeline ends with: LSH/Jaccard emit PAIRS,
    but near-duplication is transitive (A~B, B~C ⇒ one group), so
    survivors must be picked per component, not per pair.

    Scale shape: each round is two groupBy/join passes keyed by node id —
    never an all-pairs product — and the edge set only shrinks toward the
    star forest. Alternating stars converges in O(log n) rounds even on
    adversarial chains (plain min-label propagation needs diameter rounds,
    and duplicate chains A~B~C~… make the diameter unbounded). Per round
    the frame is ``localCheckpoint``-ed to truncate lineage; on a real
    cluster with flaky executors use ``spark.sparkContext.setCheckpointDir``
    + reliable checkpoints instead.

    Returns (node, component) for every node that appears in ``pairs``;
    component = the smallest node id in the component (deterministic).

    r14 hardening: every checkpointed frame is re-projected through
    fresh column aliases before the next star round. Spark 4.1's
    analyzer can fail with ``NoSuchElementException: key not found:
    u#N`` when a checkpointed LogicalRDD's raw attributes appear in
    both legs of the round's self-union/self-join (surfaced by the r14
    million-edge scaling receipt; independent of AQE — reproduced with
    it off). The re-projection is a zero-cost alias pass that gives
    each round's plan its own attribute ids."""

    def _fresh(df: DataFrame) -> DataFrame:
        return df.select(
            [F.col(c).alias(f"__{c}") for c in df.columns]
        ).toDF(*df.columns)

    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        # For each node u over the SYMMETRIC neighborhood: connect every
        # strictly-larger neighbor to m = min(Γ(u) ∪ {u}).
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        return (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # Direct every edge high→low, then connect each node's smaller
        # neighbors (and the node itself) to the minimum of that set.
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        return (
            d.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _fingerprint(e: DataFrame):
        # bit_xor, not sum: order-independent over the distinct edge set
        # and cannot overflow under ANSI mode.
        row = e.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).first()
        return (row["n"], row["h"])

    e = _fresh(edges.localCheckpoint())
    fp = _fingerprint(e)
    for _ in range(max_iter):
        e = _fresh(_small_star(_large_star(e)).localCheckpoint())
        nfp = _fingerprint(e)
        if nfp == fp:
            break
        fp = nfp

    # Fixpoint is a star forest: every remaining edge is (node, root) with
    # root = component minimum; roots label themselves.
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(
            e.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .distinct()
    )


def update_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    comp_col: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """Absorb a crawl increment's duplicate pairs into an existing
    ``connected_components`` label table WITHOUT recomputing CC over
    the full pair set (r14, VERDICT r13 item 2 — the
    ``minhash_dedup_incremental`` / ``update_bm25_index`` increment
    convention applied to the cluster-maintenance side).

    The algebra: new pairs can only MERGE existing components (or link
    fresh nodes). Map each new pair's endpoints to their current
    component labels (unseen nodes label themselves — exactly how a
    singleton enters the batch kernel), run the alternating-star CC on
    that LABEL-LEVEL quotient graph — increment-sized, never
    corpus-sized — and rewrite the label table through the resulting
    old-label → new-label remap. Labels are component minima and fresh
    nodes carry their own ids, so the merged label is again the global
    minimum node id: bit-for-bit what a full rebuild over
    (old pairs ∪ new pairs) produces (oracle-gated).

    Scale shape: the corpus-sized ``labels`` table is never shuffled —
    it is streamed twice, once against the broadcast shard node-set
    (to look up touched labels) and once against the broadcast remap
    (≤ 2·|new pairs| rows each); every other frame is
    increment-sized. Cost ∝ shard, not corpus (SCALING receipt).

    Returns the updated (node, component) table covering every
    previously-labeled node plus every node of ``new_pairs``."""
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(comp_col).alias("component")
    )
    np_ = (
        new_pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes_new = (
        np_.select(F.col("u").alias("node"))
        .unionByName(np_.select(F.col("v").alias("node")))
        .distinct()
    )
    # one streamed pass over labels; broadcast the shard-sized node set
    touched = lab.join(F.broadcast(nodes_new), "node")
    cu = touched.select(
        F.col("node").alias("u"), F.col("component").alias("cu")
    )
    cv = touched.select(
        F.col("node").alias("v"), F.col("component").alias("cv")
    )
    quotient = (
        np_.join(F.broadcast(cu), "u", "left")
        .join(F.broadcast(cv), "v", "left")
        .select(
            F.coalesce(F.col("cu"), F.col("u")).alias("la"),
            F.coalesce(F.col("cv"), F.col("v")).alias("lb"),
        )
        .where(F.col("la") != F.col("lb"))
    )
    remap = connected_components(
        quotient, src="la", dst="lb", max_iter=max_iter
    ).withColumnsRenamed({"node": "old_label", "component": "new_label"})
    # second streamed pass: rewrite only the labels the remap touches
    updated_old = lab.join(
        F.broadcast(remap), lab["component"] == remap["old_label"], "left"
    ).select(
        "node",
        F.coalesce(F.col("new_label"), F.col("component")).alias(
            "component"
        ),
    )
    fresh = (
        nodes_new.join(F.broadcast(touched.select("node")), "node", "left_anti")
        .join(
            F.broadcast(remap),
            F.col("node") == F.col("old_label"),
            "left",
        )
        .select(
            "node",
            F.coalesce(F.col("new_label"), F.col("node")).alias("component"),
        )
    )
    return updated_old.unionByName(fresh)


def dedup_clusters_incremental(
    docs: DataFrame,
    base_labels: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """``dedup_clusters`` face of the increment: absorb ``new_pairs``
    into ``base_labels`` via ``update_components`` and emit the full
    (id, cluster_id, keep) decision table over ``docs`` — identical,
    row for row, to rebuilding the clusters from the union pair set
    (the gate's oracle IS the full-rebuild SQL)."""
    cc = update_components(
        base_labels, new_pairs, src=src, dst=dst, max_iter=max_iter
    )
    d = docs.select(F.col(id_col))
    return (
        d.join(cc, d[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster near-duplicate pairs transitively and pick one survivor per
    cluster: (id, cluster_id, keep). cluster_id is the component's smallest
    doc id; docs in no pair are singleton clusters of themselves; the
    survivor (keep=true) is the cluster id holder — deterministic, so the
    keep-set is stable across runs and engines."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    d = docs.select(F.col(id_col))
    return (
        d.join(cc, d[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


# ----------------------------------------------------- contamination check


def cross_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 3,
    min_shared: int = 3,
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: which corpus docs share ≥
    ``min_shared`` distinct word ``n``-gram shingles with any probe
    (benchmark/eval) document — the standard decontamination pass before
    training (n-gram collision, cf. the 13-gram overlap checks described
    for GPT-3, Brown et al. 2020, and PaLM).

    Shape: an inverted-index equi-join on the shingle, NOT an all-pairs
    scan — cost is Σ per-shingle (corpus_df × probe_df), and the probe
    side (eval sets are small by definition) is broadcast so the corpus
    never shuffles. Returns (id, probe_id, n_shared) for flagged pairs.
    """
    c_sh = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    p_sh = probes.select(
        F.col(probe_id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    return (
        c_sh.join(F.broadcast(p_sh), "shingle")
        .groupBy(id_col, probe_id_col)
        .agg(F.count("*").alias("n_shared"))  # shingle sets are distinct
        .where(F.col("n_shared") >= min_shared)
    )


def dedup_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    min_docs: int = 2,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "md5",
) -> DataFrame:
    """Cross-document exact-SPAN dedup, OFFSET-INVARIANT — the sixth
    family: remove passages repeated across documents rather than whole
    near-dup documents (the practical core of ExactSubstr dedup, Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better").

    Every token position starts a candidate window of ``span_tokens``
    tokens (``stride=1``, the default — a duplicated passage is caught at
    ANY offset, which is the actual ExactSubstr property; a licence
    header injected mid-sentence does not need to land on a block
    boundary). A window whose text occurs in ≥ ``min_docs`` DISTINCT
    documents marks all ``span_tokens`` token positions it covers as
    duplicated; covered tokens are dropped from every copy and each doc's
    surviving tokens are reassembled in order. ``stride>1`` trades recall
    for window volume (``stride=span_tokens`` degenerates to the legacy
    block-aligned scheme, which misses passages shifted by
    ``< span_tokens`` tokens between documents). Passages shorter than
    ``span_tokens`` are below the match-length contract and always
    survive — that is the knob separating "duplicated passage" from
    "common phrase".

    Scale shape (nothing all-pairs): one explode to (doc, window-hash) —
    window keys are digests so the corpus-wide count shuffles fixed-size
    keys, not passage text; one distinct-doc count keyed by that digest;
    one equi-join back; duplicated windows explode to ≤ span_tokens
    covered positions each (bounded by span × duplicated volume, not by
    corpus size); one anti-join of the (doc, pos) token stream against
    covered positions; one per-doc ordered reassembly. Every exchange is
    keyed by window digest or (doc, pos) — linear in data, no per-doc
    quadratic work. (Lee et al. use a single-node suffix array; stride
    windows over digests are the shuffle-disciplined distributed
    equivalent.)

    ``hash_mode`` picks the window-key digest (the module-header
    promise): ``"md5"`` (default) shuffles a 32-char hex string —
    portable, the oracle-parity form, collision-free for practical
    purposes (128-bit). ``"xxhash64"`` is the engine-fast mode: an
    8-byte long key cuts the dominant (doc, window-key) shuffle ~4× in
    bytes (measured at 4x duplicate saturation in SCALING.md). Its
    64-bit space admits birthday collisions past ~2^32 distinct windows
    (≈4 B positions); a collision can only FALSELY MARK a window as
    duplicated (over-removal, never under-removal) — acceptable for
    training-data curation, not for the cross-engine oracle, which
    stays on md5.

    Returns (id, text, n_tokens, n_removed) for EVERY input doc — a doc
    made entirely of duplicated spans comes back with empty text.
    """
    if stride < 1 or span_tokens < 1:
        raise ValueError("span_tokens and stride must be >= 1")
    if hash_mode not in ("md5", "xxhash64"):
        raise ValueError("hash_mode must be 'md5' or 'xxhash64'")
    digest = F.md5 if hash_mode == "md5" else F.xxhash64
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("toks")).select(
        id_col,
        F.when(F.col("toks") == F.array(F.lit("")), F.array().cast("array<string>"))
        .otherwise(F.col("toks"))
        .alias("toks"),
    )
    n = F.size("toks")
    # window start offsets: 0, stride, ... while start + span_tokens <= n
    n_win = F.when(
        n >= span_tokens, F.floor((n - span_tokens) / stride).cast("int") + 1
    ).otherwise(F.lit(0))
    windows = base.select(
        id_col,
        F.explode(
            F.when(n_win > 0, F.sequence(F.lit(0), n_win - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("widx"),
        F.col("toks"),
    ).select(
        id_col,
        (F.col("widx") * stride).alias("off"),
        digest(
            F.array_join(F.slice(F.col("toks"), F.col("widx") * stride + 1, span_tokens), " ")
        ).alias("wh"),
    )
    dup_wh = (
        windows.groupBy("wh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("wh")
    )
    covered = (
        windows.join(dup_wh, "wh")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("off"), F.col("off") + (span_tokens - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    tok_pos = base.select(id_col, F.posexplode("toks").alias("pos", "tok"))
    kept = tok_pos.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = base.select(id_col, n.cast("long").alias("n_tokens"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text", F.lit("")).alias("text"),
            F.col("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    normalize: bool = True,
    min_chars: int = 1,
) -> DataFrame:
    """Cross-document LINE (paragraph) dedup — the CCNet first stage
    (Wenzek et al. 2020 §3.1: boilerplate lines — nav, cookie banners,
    copyright footers — repeat across a crawl's pages; dropping every
    line that occurs in ≥ ``min_docs`` documents removes them without
    touching unique prose). The seventh dedup family: coarser than
    ``dedup_spans`` (whole newline-delimited lines, not token windows)
    and upstream of it in a CCNet-shaped pipeline.

    ``normalize=True`` keys lines on a documented subset of CCNet's
    normalization — lowercase, trimmed, digit runs removed, whitespace
    collapsed — so "Visitor count 123" and "visitor count 99" are the
    same boilerplate. Keys shorter than ``min_chars`` after
    normalization (blank or all-digit lines) are never counted as
    duplicates. Per doc returns the surviving ``text`` (original lines,
    original order), ``n_lines``, and ``n_removed``.

    Scale shape (nothing all-pairs, the dedup_spans discipline): one
    posexplode to (doc, pos, line); the corpus-wide count shuffles
    md5 DIGESTS of the normalized key, not line text; one distinct-doc
    count, one equi-join back on the digest, one per-doc ordered
    reassembly — three keyed exchanges, all linear in data."""
    lines = F.split(F.col(text_col), "\n")
    exploded = docs.select(
        id_col, F.posexplode(lines).alias("__pos", "__line")
    )
    key = F.trim(F.lower(F.col("__line")))
    if normalize:
        key = F.regexp_replace(key, "[0-9]+", "")
        key = F.trim(F.regexp_replace(key, r"\s+", " "))
    exploded = exploded.withColumn(
        "__key",
        F.when(F.length(key) >= min_chars, F.md5(key)),
    )
    counts = (
        exploded.where(F.col("__key").isNotNull())
        .groupBy("__key")
        .agg(F.countDistinct(id_col).alias("__ndocs"))
        .where(F.col("__ndocs") >= min_docs)
        .select("__key", F.lit(True).alias("__dup"))
    )
    marked = exploded.join(counts, "__key", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_lines"),
            F.sum(
                F.when(F.col("__dup"), 1).otherwise(0)
            ).cast("int").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.coalesce(F.col("__dup"), F.lit(False)),
                                F.struct(F.col("__pos"), F.col("__line")),
                            )
                        )
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col),
        )
    )
