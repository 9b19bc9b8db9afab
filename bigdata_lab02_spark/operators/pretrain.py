"""End-to-end pretraining-corpus assembly — the capstone composition.

``pretrain_corpus`` chains the already-gated tiers in the order a real
training shard is built from crawl bytes (the pipeline every LLM-data
paper publishes some slice of — CCNet, Wenzek et al. 2020; C4/Gopher
rules; DCLM, Li et al. 2024; The Pile's mixture weights, Gao et al.
2021):

    decoded pages
      → URL tier        (normalize → registered domain → blocklist →
                         recrawl dedup; operators.url.url_filters —
                         the cheapest, highest-yield filter runs first,
                         before any content byte is touched)
      → exact dedup     (first fetch per content digest)
      → MinHash-LSH     (near-dup pairs at a Jaccard threshold; the
                         LOWER id of each verified pair survives)
      → quality         (DCLM-style hashed-bucket NB classifier,
                         trained on a caller-supplied label column and
                         applied to the dedup survivors — train and
                         score see exactly the corpus the earlier
                         tiers kept, the coupling this composition
                         exists to pin)
      → mixture         (source-weighted admission under a global
                         token budget; curation.mixture_sample)
      → packing         (greedy fixed-budget sequence packing;
                         curation.pack_sequences)

WARC framing/decode stays with the caller (``sources.warc``): this
operator starts at decoded pages because ingest containers differ
(WARC, zip, plain directories) while everything from the URL tier on
is container-independent.

Scale shape, stage by stage: the URL tier is one norm_url exchange +
broadcast dims; exact dedup is one digest exchange; MinHash candidates
are banded (band_id, band_hash) keys — never all-pairs; the NB model
is one aggregation pass collected as B+1 rows of model state and
broadcast back; mixture admission is the range-partitioned distributed
prefix sum (no per-group one-task window); packing windows per source.
Nothing in the chain collects corpus-sized data to the driver, and
every stage's output is a pure deterministic function of its input —
the whole chain replays exactly, which is what the oracle checks.

Reference analog: BigDataLab02's chained lifecycle (task1_1.java:179
feeding task1_5_2.java) — ingest → encode → filter → derive, writ
large across the curation tiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .curation import (
    mixture_sample,
    pack_sequences,
    quality_classifier_score,
    quality_classifier_train,
)
from .dedup import minhash_dedup_incremental, minhash_dedup_pairs
from .url import url_filters


def pretrain_corpus(
    pages: DataFrame,
    suffixes: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    positive: Column,
    blocklist: DataFrame | None = None,
    pack_budget: int = 256,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    passthrough: list[str] | None = None,
    minhash_threshold: float = 0.5,
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    n_buckets: int = 512,
    salt: str = "",
    pin: bool = True,
) -> DataFrame:
    """Assemble a packed training corpus from decoded pages.

    ``pages`` must carry ``id_col``, ``url_col``, ``text_col`` and
    ``group_col`` (plus any ``passthrough`` columns to ride the chain
    into the output). ``positive`` is a boolean Column over the page
    columns labelling the classifier's reference class — evaluated on
    the dedup SURVIVORS, the set the classifier will score.

    Near-dup policy: for every verified MinHash pair (id_a < id_b,
    jaccard >= threshold) the HIGHER id is dropped — the deterministic
    greedy first-fetch-wins rule. It is applied per pair, not per
    connected component (a doc is dropped if ANY lower-id near-dup
    exists, even one that was itself dropped): the one-pass rule that
    needs no iterative closure, restated identically by the oracle.

    Returns one row per packed document: ``(id, group, *passthrough,
    registered_domain, score_mu, n_tokens, cum_tokens, quota,
    pack_id)`` — admission bookkeeping (cum_tokens vs quota) and the
    classifier score ride along so downstream shard writers can audit
    every keep decision without re-running a stage.
    """
    extra = list(passthrough or [])

    # --- URL tier: the only stage allowed to see a raw URL ---------
    tier = url_filters(
        pages,
        suffixes,
        blocklist=blocklist,
        url_col=url_col,
        id_col=id_col,
        passthrough=[group_col, text_col, *extra],
    )
    surv = tier.where("url_keep").select(
        id_col, group_col, text_col, "registered_domain", *extra
    )

    # --- exact dedup: first fetch per content digest ----------------
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    ex = (
        surv.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )
    if pin:
        # The exact-dedup survivor set feeds EVERY later tier (both
        # minhash pair sides, classifier train AND score, mixture,
        # packing, the final joins) — unpinned, the compiled plan
        # re-derives the whole ingest→URL-tier→dedup subtree (with its
        # Arrow decode) once per consumer (the expensive-decode
        # fan-out seam, SCALING.md r13). localCheckpoint materializes
        # it once; a production run writes this tier boundary to
        # parquet instead. A/B receipt in BENCHNOTES (r15).
        ex = ex.localCheckpoint()

    # --- MinHash near-dup: drop the higher id of each verified pair -
    pairs = minhash_dedup_pairs(
        ex.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        bands=bands,
        threshold=minhash_threshold,
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    nd = ex.join(drops, id_col, "left_anti")

    # --- DCLM-style quality classifier over the survivors -----------
    model = quality_classifier_train(
        nd, positive, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    ).localCheckpoint()
    scored = quality_classifier_score(
        nd, model, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    qk = nd.join(
        scored.where("quality_keep").select(id_col, "score_mu"), id_col
    )

    # --- mixture under the global token budget ----------------------
    mix = mixture_sample(
        qk,
        weights,
        token_budget,
        group_col=group_col,
        text_col=text_col,
        id_col=id_col,
        salt=salt,
    ).select(id_col, "n_tokens", "cum_tokens", "quota")

    # --- sequence packing over the admitted set ---------------------
    admitted = qk.join(mix, id_col)
    packed = pack_sequences(
        admitted,
        budget=pack_budget,
        group_col=group_col,
        text_col=text_col,
        id_col=id_col,
    ).select(id_col, "pack_id")
    return admitted.join(packed, id_col).select(
        id_col,
        group_col,
        *extra,
        "registered_domain",
        F.col("score_mu").cast("long").alias("score_mu"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("quota").cast("long").alias("quota"),
        F.col("pack_id").cast("int").alias("pack_id"),
    )


def pretrain_shard_increment(
    new_pages: DataFrame,
    suffixes: DataFrame,
    indexed_urls: DataFrame,
    indexed_digests: DataFrame,
    corpus: DataFrame,
    corpus_bands: DataFrame,
    model: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    passthrough: list[str] | None = None,
    minhash_threshold: float = 0.5,
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    n_buckets: int = 512,
) -> DataFrame:
    """The daily-shard face of ``pretrain_corpus`` (r15): absorb a
    crawl shard against the BASE corpus's persisted artifacts without
    recomputing any base-side work — the per-tier increment operators
    (minhash band table, digest index, frozen classifier) composed the
    way the daily job actually runs them.

    Base artifacts (each the output of one base-corpus pass, persisted
    between shards in production):

    - ``indexed_urls``    — one ``norm_url`` column: every URL the
      base crawl already fetched (a shard page re-crawling one is
      dropped before any content work, same as the tier's in-crawl
      recrawl rule);
    - ``indexed_digests`` — one ``digest`` column (md5 of text): every
      content digest the base kept after ITS url tier — a shard page
      duplicating indexed content is an exact dup;
    - ``corpus`` / ``corpus_bands`` — the base exact-dedup survivors
      (kept AND near-dup-dropped: dropped members still suppress later
      near-copies, the semantic-assignment-table rule) and their
      persisted LSH band table (``minhash_band_table``) — the corpus
      side of the candidate join never re-shingles;
    - ``model``           — the base-trained NB quality model,
      FROZEN: a shard never re-trains the classifier (the
      persist_ivf_lists fixed-quantizer contract, classifier form).

    Shard chain: URL tier (within-shard recrawl dedup) → anti-join vs
    ``indexed_urls`` → within-shard exact dedup (first fetch per
    digest) → flags: ``dup_of_index`` (digest already indexed),
    ``near_dup`` (a verified ≥threshold pair with a LOWER shard id OR
    any verified pair into the corpus — old-beats-new by contract),
    ``quality_keep`` (frozen-model score > 0); ``keep`` is their
    conjunction. Flags are returned rather than applied so the shard
    writer can route drops to their tier's audit table.

    Scale shape: the anti-joins are keyed exchanges against index-
    sized tables; the cross-candidate join touches only band-hash
    collisions against the PRE-BANDED corpus; scoring broadcasts the
    B+1-row model. Nothing base-sized is recomputed; cost ∝ shard
    (+ candidate sets).

    Returns one row per within-shard exact-dedup survivor:
    ``(id, group, *passthrough, registered_domain, dup_of_index,
    near_dup, score_mu, quality_keep, keep)``."""
    extra = list(passthrough or [])

    # --- URL tier over the shard, then drop already-fetched URLs ----
    tier = url_filters(
        new_pages,
        suffixes,
        blocklist=blocklist,
        url_col=url_col,
        id_col=id_col,
        passthrough=[group_col, text_col, *extra],
    )
    surv = tier.where("url_keep").join(
        indexed_urls.select("norm_url"), "norm_url", "left_anti"
    ).select(id_col, group_col, text_col, "registered_domain", *extra)

    # --- within-shard exact dedup + indexed-digest flag --------------
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    ex = (
        surv.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
        .withColumn("__digest", F.md5(F.col(text_col)))
    )
    ex = ex.join(
        indexed_digests.select(
            F.col("digest").alias("__digest"), F.lit(True).alias("dup_of_index")
        ),
        "__digest",
        "left",
    ).drop("__digest").withColumn(
        "dup_of_index", F.coalesce(F.col("dup_of_index"), F.lit(False))
    ).localCheckpoint()

    # --- near-dup: within-shard pairs + shard-vs-corpus candidates ---
    within = minhash_dedup_pairs(
        ex.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        bands=bands,
        threshold=minhash_threshold,
    ).select(F.col("id_b").alias(id_col))
    cross = minhash_dedup_incremental(
        ex.select(id_col, text_col),
        corpus,
        corpus_bands,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        bands=bands,
        threshold=minhash_threshold,
    ).select(F.col("id_new").alias(id_col))
    near = within.unionByName(cross).distinct().withColumn(
        "near_dup", F.lit(True)
    )

    # --- frozen-model quality scoring --------------------------------
    scored = quality_classifier_score(
        ex, model, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    ).select(id_col, "score_mu", "quality_keep")

    out = (
        ex.join(near, id_col, "left")
        .withColumn("near_dup", F.coalesce(F.col("near_dup"), F.lit(False)))
        .join(scored, id_col)
    )
    return out.select(
        id_col,
        group_col,
        *extra,
        "registered_domain",
        "dup_of_index",
        "near_dup",
        F.col("score_mu").cast("long").alias("score_mu"),
        "quality_keep",
        (
            ~F.col("dup_of_index")
            & ~F.col("near_dup")
            & F.col("quality_keep")
        ).alias("keep"),
    )
