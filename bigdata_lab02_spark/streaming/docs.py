"""Streaming document-shard operators (r8): STATELESS MinHash banding
and LSH candidate generation against a persisted corpus band table —
the streaming face of the incremental-dedup workflow
(``operators.dedup.minhash_dedup_incremental``): documents arrive as a
file stream, and every micro-batch emits its candidate duplicate pairs
against the corpus with NO stateful operator at all.

Statelessness is the design point. The batch signature path
(``minhash_signatures``) explodes shingles and groupBy-aggregates —
in Structured Streaming that is a stateful aggregation (watermarks,
state stores, output-mode constraints). Here the signature is instead a
PER-ROW array expression (min over ``transform`` per hash). That
formulation duplicates the tokenize+shingle subtree per hash — the
codegen cliff the batch path deliberately avoids at corpus scale
(dedup.py:90) — but a streaming SHARD is micro-batch sized, the
duplication is bounded by num_hashes, and in exchange the whole
pipeline is append-mode, watermark-free, and state-store-free: each
batch's cost is exactly its own rows. The two formulations compute the
SAME md5-min values, so candidates match the batch path exactly
(equivalence-tested in tests/test_multimodal_streaming.py and gated
against the batch SQL oracle).

Candidates may repeat across bands (a pair colliding in two bands
emits twice): streaming ``distinct`` would reintroduce state, so
multiplicity is left to the consumer — the batch verify/dedup step
downstream collapses it (the gate applies a batch-side distinct to the
materialized sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators.dedup import shingles

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_doc_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-stream over a directory of documents parquet shards
    (``readStream`` needs the explicit schema)."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(path)


def minhash_band_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash) per incoming doc, all per-row
    expressions — works unchanged on a stream or a batch frame. Values
    are IDENTICAL to ``operators.dedup.minhash_band_table`` over the
    same docs (same md5-min per hash, same band-index-baked band_hash),
    so bands from either path join interchangeably."""
    rows_per_band = num_hashes // bands
    sh = shingles(F.col(text_col), shingle_n)

    # closure factory, NOT a default arg: a two-parameter lambda would
    # make Spark's transform() pass the ARRAY INDEX as the second
    # argument, silently shadowing the hash seed
    def _seeded(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    sig = F.array(
        *[
            F.array_min(F.transform(sh, _seeded(i)))
            for i in range(num_hashes)
        ]
    )
    banded = docs.select(F.col(id_col), sig.alias("signature")).select(
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
    )
    return banded.select(id_col, "band.band_id", "band.band_hash")


def url_dedup_stream(
    page_stream: DataFrame,
    suffixes: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    passthrough: list[str] | None = None,
    canonical: bool = False,
) -> DataFrame:
    """The URL tier's STREAMING face (r10): the stateless stages
    (normalize → registered domain → blocklist — pure projections plus
    broadcast dims, ``operators.url.url_filters(dedup=False)``) run
    per micro-batch, the rejects drop immediately, and recrawl dedup
    becomes the one stateful stage: ``dropDuplicatesWithinWatermark``
    keyed by ``norm_url`` — the first fetch of a URL inside the
    watermark horizon survives, refetches are dropped, and the key
    state is EVICTED once the watermark passes (a plain
    ``dropDuplicates`` would keep every URL forever — unbounded state
    at crawl scale; recrawls of the same URL arrive hours apart, so a
    horizon is the honest semantics anyway: dedup-within-window, with
    the PERSISTED batch layout handling cross-window recrawls the way
    ``minhash_dedup_incremental`` does for content). Output: the
    surviving pages with the tier's columns, append-mode.
    ``canonical=True`` (r11) keys the stateful dedup on the fused-twin
    ``canon_url`` instead (IDNA host + full percent-decode — the
    variants the expression key can't unify); the twin is a stateless
    Arrow projection, so the stream plan shape is unchanged."""
    from bigdata_lab02_spark.operators.url import url_filters

    uf = url_filters(
        page_stream,
        suffixes,
        blocklist,
        url_col=url_col,
        id_col=id_col,
        passthrough=[ts_col, *(passthrough or [])],
        dedup=False,
        canonical=canonical,
    )
    kept = uf.where(F.col("url_keep"))
    key = "canon_url" if canonical else "norm_url"
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def image_dedup_candidates_stream(
    media_stream: DataFrame,
    corpus_hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    orient: bool = True,
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Streaming PERCEPTUAL image dedup candidates (r12): incoming
    media payloads dHash per micro-batch (``image_dhash`` — a
    stateless Arrow projection, so it runs unchanged on a stream),
    then candidate pairs ``(id_new, id_old, hamming)`` against a
    static corpus hash table via the same 16-bit pigeonhole the batch
    pair join uses (Hamming ≤ 3 ⇒ some chunk equal), with the exact
    Hamming verify as a per-row expression. Append-mode, stateless —
    the streaming twin of ``dedup_candidates_stream`` for the image
    tier: new crawl shards collide against the already-curated image
    corpus without re-decoding it.

    Scale design mirrors the text face: the corpus hash table is one
    8-byte hash per image (tiny relative to payloads) but still
    corpus-sized — the default is a plain stream-static equi-join on
    the (chunk_idx, chunk) key (each micro-batch shuffles only its own
    rows against a bucketed corpus layout); ``broadcast_corpus=True``
    is the known-small opt-in. Undecodable payloads (NULL hash) drop
    before the join. Cross-chunk multiplicity is left to the consumer
    (batch-side distinct), exactly like the band stream."""
    from bigdata_lab02_spark.operators.multimodal import image_dhash

    return hash_dedup_candidates_stream(
        image_dhash(media_stream, orient=orient, id_col=id_col),
        corpus_hashes,
        id_col=id_col,
        hash_col="dhash",
        max_hamming=max_hamming,
        broadcast_corpus=broadcast_corpus,
    )


def audio_dedup_candidates_stream(
    media_stream: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Streaming perceptual AUDIO dedup candidates (r13): incoming WAV
    payloads fingerprint per micro-batch (``audio_fingerprint`` — a
    stateless Arrow projection, so it runs unchanged on a stream), then
    pigeonhole candidate pairs against a static corpus print table —
    the audio face of ``image_dedup_candidates_stream``, completing
    the streaming modality matrix (text bands ✓ image dHash ✓ audio
    block-energy print ✓). Amplitude-invariance carries over: a
    re-levelled re-upload of a curated clip collides. Same contracts:
    append-mode stateless, NULL prints (undecodable/too-short) drop
    before the join, multiplicity to the consumer, the static side
    should be pinned/persisted by the caller."""
    from bigdata_lab02_spark.operators.multimodal import audio_fingerprint

    return hash_dedup_candidates_stream(
        audio_fingerprint(media_stream, id_col=id_col),
        corpus_fps,
        id_col=id_col,
        hash_col="afp",
        max_hamming=max_hamming,
        broadcast_corpus=broadcast_corpus,
    )


def hash_dedup_candidates_stream(
    new_hashes: DataFrame,
    corpus_hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    broadcast_corpus: bool = False,
) -> DataFrame:
    """The shared 64-bit-sketch stream-static candidate core (r13,
    factored from the image face so every fingerprint modality reuses
    it): 16-bit pigeonhole chunks on both sides (Hamming ≤ 3 ⇒ some
    chunk equal), equi-join on (chunk_idx, chunk), exact per-row
    Hamming verify. ``new_hashes`` may be a streaming frame (the
    projection is stateless); ``corpus_hashes`` is the static side.
    Returns (id_new, id_old, hamming ≤ max_hamming)."""

    def chunked(df: DataFrame, idc: str, hc: str) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.shiftrightunsigned(F.col(hc), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("c"),
                )
                for i in range(4)
            ]
        )
        return df.select(idc, hc, F.explode(arr).alias("x")).select(
            idc, hc, F.col("x.i").alias("i"), F.col("x.c").alias("c")
        )

    new = (
        new_hashes.where(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id_new"), F.col(hash_col).alias("h_new"))
    )
    corpus = (
        corpus_hashes.where(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id_old"), F.col(hash_col).alias("h_old"))
    )
    oc = chunked(corpus, "id_old", "h_old")
    if broadcast_corpus:
        oc = F.broadcast(oc)
    return (
        chunked(new, "id_new", "h_new")
        .join(oc, ["i", "c"])
        .where(F.col("id_new") != F.col("id_old"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("h_new").bitwiseXOR(F.col("h_old"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_new", "id_old", "hamming")
    )


def dedup_candidates_stream(
    doc_stream: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    broadcast_corpus: bool = False,
    **band_kwargs,
) -> DataFrame:
    """Streaming LSH candidate pairs (id_new, id_old) of the incoming
    shard against the static corpus band table — a stream-static
    equi-join on the single ``band_hash`` key; the static side is
    re-planned per micro-batch, so a refreshed corpus table is picked
    up without restarting the query. Append-mode, stateless.

    Scale design: the corpus band table is O(bands × corpus docs) — at
    100 TB it cannot be rebuilt into a broadcast every micro-batch, so
    the DEFAULT is a plain equi-join with no hint: a corpus persisted
    with ``write_bucketed(..., ['band_hash'])`` (the same layout the
    batch twin ``minhash_dedup_incremental`` probes) plans with NO
    exchange on the corpus side — each batch shuffles only its own
    (micro-batch-sized) shard rows (plan-asserted in
    tests/test_bucketing.py). Spark's own
    ``autoBroadcastJoinThreshold`` still size-gates genuinely small
    corpora into a broadcast automatically; pass
    ``broadcast_corpus=True`` only to force the hint when corpus
    statistics are missing and the table is known-small."""
    new_bands = minhash_band_stream(
        doc_stream, id_col=id_col, **band_kwargs
    ).withColumnsRenamed({id_col: "id_new"})
    corpus = corpus_bands.withColumnsRenamed({id_col: "id_old"}).select(
        "id_old", "band_hash"
    )
    if broadcast_corpus:
        corpus = F.broadcast(corpus)
    return (
        new_bands.select("id_new", "band_hash")
        .join(corpus, "band_hash")
        .where(F.col("id_new") != F.col("id_old"))
        .select("id_new", "id_old")
    )


def pretrain_candidates_stream(
    page_stream: DataFrame,
    suffixes: DataFrame,
    indexed_urls: DataFrame,
    indexed_digests: DataFrame,
    corpus_bands: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    broadcast_corpus: bool = False,
) -> DataFrame:
    """The STREAMING face of the pretrain capstone's shard absorb
    (r16, VERDICT r15 item 6): crawl pages arrive as a stream and
    every micro-batch emits its per-tier duplicate CANDIDATES against
    the static persisted base artifacts — the
    ``dedup_candidates_stream`` contract lifted to the full artifact
    set of ``operators.pretrain.persist_pretrain_artifacts``:

    - the stateless URL-tier stages (normalize → registered domain →
      blocklist; ``url_filters(dedup=False)``) run per micro-batch and
      rejects drop before any content work — same ordering as the
      batch chain;
    - ``kind='recrawl'``: the page's ``norm_url`` already fetched
      (stream-static join vs the layout's ``urls/``), ``ref`` = the
      norm_url;
    - ``kind='exact'``:   md5(text) already indexed (vs ``digests/``),
      ``ref`` = the digest;
    - ``kind='near'``:    LSH band-hash collision vs the PRE-BANDED
      corpus (``bands/`` — the base is never re-shingled), ``ref`` =
      the colliding corpus doc id as a string.

    DECISIONS STAY BATCH by design: candidates are signals for the
    batch shard job (``update_pretrain_artifacts``), which verifies
    near-dups (exact Jaccard), applies within-shard first-fetch rules
    (stateful — ``url_dedup_stream`` offers the watermarked streaming
    variant), scores quality, and mutates the layout transactionally.
    A streaming job must never mutate the journaled layout: appends
    are the batch side's single-writer job.

    Append-mode, watermark-free, state-store-free: every stage is a
    projection or a stream-static equi-join, so each batch's cost is
    exactly its own rows. The static sides are corpus-sized — none is
    broadcast by default (the layout's md5-bucket/band partitioning
    co-locates a bucketed read; ``broadcast_corpus=True`` is the
    known-small opt-in for all three). Static frames are re-planned
    per micro-batch, so a layout refreshed by the batch job is picked
    up without restarting the query. Multiplicity (a page colliding in
    two bands, or matching two tiers) is left to the consumer — the
    batch decision join collapses it.

    Returns ``(id_col, kind string, ref string)``."""
    from bigdata_lab02_spark.operators.url import url_filters

    tier = url_filters(
        page_stream,
        suffixes,
        blocklist,
        url_col=url_col,
        id_col=id_col,
        passthrough=[text_col],
        dedup=False,
    )
    kept = tier.where(F.col("url_keep")).select(
        id_col, "norm_url", text_col
    )

    urls = indexed_urls.select("norm_url").distinct()
    digests = indexed_digests.select("digest").distinct()
    corpus = corpus_bands.select(
        F.col(id_col).alias("__id_old"), "band_hash"
    )
    if broadcast_corpus:
        urls = F.broadcast(urls)
        digests = F.broadcast(digests)
        corpus = F.broadcast(corpus)

    recrawl = kept.join(urls, "norm_url").select(
        F.col(id_col),
        F.lit("recrawl").alias("kind"),
        F.col("norm_url").alias("ref"),
    )
    exact = (
        kept.withColumn("__digest", F.md5(F.col(text_col)))
        .join(digests, F.col("__digest") == F.col("digest"))
        .select(
            F.col(id_col),
            F.lit("exact").alias("kind"),
            F.col("__digest").alias("ref"),
        )
    )
    near = (
        minhash_band_stream(
            kept,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            shingle_n=shingle_n,
            bands=bands,
        )
        .join(corpus, "band_hash")
        .where(F.col(id_col) != F.col("__id_old"))
        .select(
            F.col(id_col),
            F.lit("near").alias("kind"),
            F.col("__id_old").cast("string").alias("ref"),
        )
    )
    return recrawl.unionByName(exact).unionByName(near)
