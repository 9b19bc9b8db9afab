#!/usr/bin/env python
"""Interleaved A/B harness for optimization round r17 (guide §1 measure
first; §5 reuse-justified materialization / §3.3 re-derived subtrees).

Arms alternate inside ONE session with the arm ORDER alternating per
rep ([A,B], [B,A], ...) — the r16 discovery: the first arm of every
interleaved pair pays a systematic penalty on this host, so only
effects that survive both orders are real.

Candidates (VERDICT r16 items 4, 5, 7):

  sem_inc_base   semantic_dedup_incremental: pin the batch base result
                 (semantic_dedup over the indexed 400 rows) — it is
                 consumed TWICE (the output union and, via the
                 assignment table, the increment's a-side), so the
                 base pair join re-executes per consumer
                 (repeated_scans=12 in the before plan).
  media_routed   media_dedup_pipeline: pin the routed synthetic corpus
                 before the modality split — the generation mapInPandas
                 feeds BOTH modality branch pins and runs twice.
  pq_topk_agg    pq_topk with the rank window replaced by a grouped
                 top-k aggregation (VERDICT item 7) — measured against
                 the window form, which Spark 4 already compiles to
                 WindowGroupLimit (map-side partial top-k).

Usage: r17_ab.py sem_inc_base media_routed pq_topk_agg [--reps=N]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdata_lab02_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# ------------------------------------------------- semantic_dedup_inc
def arm_sem_inc_base(spark, sf_dir, on: bool):
    from bigdata_lab02_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_incremental,
    )

    if not on:
        return entrymod.q_semantic_dedup_incremental(spark, sf_dir)
    emb = entrymod._t(spark, sf_dir, "embeddings")
    cents = emb.where(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
    ).select(
        (F.col("vec_id") / 50).cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    old = emb.where(F.col("vec_id") < 400)
    new = emb.where(F.col("vec_id") >= 400)
    base = semantic_dedup(old, cents, threshold=0.45).localCheckpoint()
    indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
    inc = semantic_dedup_incremental(new, cents, indexed, threshold=0.45)
    return base.unionByName(inc)


def arm_sem_inc_members(spark, sf_dir, on: bool):
    """VERDICT item 5 second half: the shard-side re-derivation —
    semantic_dedup_incremental derives new_members (assign fold over
    the 1600-row shard) THREE times (a-side union, b-side, final
    join). The on-arm replays the operator with new_members pinned."""
    if not on:
        return entrymod.q_semantic_dedup_incremental(spark, sf_dir)
    from bigdata_lab02_spark.functions.vectors import (
        array_dot,
        array_norm,
        as_double_array,
    )
    from bigdata_lab02_spark.operators.similarity import (
        _semantic_assign,
        semantic_dedup,
    )

    emb = entrymod._t(spark, sf_dir, "embeddings")
    cents_raw = emb.where(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
    ).select(
        (F.col("vec_id") / 50).cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    old = emb.where(F.col("vec_id") < 400)
    new = emb.where(F.col("vec_id") >= 400)
    base = semantic_dedup(old, cents_raw, threshold=0.45)
    indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
    # --- semantic_dedup_incremental body with new_members pinned ---
    c = new.select(
        F.col("vec_id"), as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nrm", array_norm(F.col("v")))
    cents = cents_raw.select(
        F.col("cluster_id").alias("cid"),
        as_double_array(F.col("centroid")).alias("cvec"),
    ).withColumn("cvn", array_norm(F.col("cvec")))
    cid_type = cents.schema["cid"].dataType.simpleString()
    new_members = _semantic_assign(
        c, cents, "vec_id", cid_type, 6
    ).localCheckpoint()  # <-- the candidate
    old_members = indexed.select(
        F.col("vec_id"),
        F.col("cluster_id"),
        as_double_array(F.col("embedding")).alias("v"),
    ).withColumn("nrm", array_norm(F.col("v")))
    a = old_members.unionByName(new_members).alias("a")
    b = new_members.alias("b")
    pair_denom = F.col("a.nrm") * F.col("b.nrm")
    cos_ab = F.round(
        F.when(pair_denom == 0.0, F.lit(0.0)).otherwise(
            array_dot(F.col("a.v"), F.col("b.v")) / pair_denom
        ),
        6,
    )
    dups = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos_ab >= 0.45)
        .select(F.col("b.vec_id").alias("dup_id"))
        .distinct()
    )
    inc = (
        new_members.join(dups, new_members["vec_id"] == dups["dup_id"], "left")
        .select(
            F.col("vec_id"),
            F.col("cluster_id"),
            F.col("dup_id").isNull().alias("keep"),
        )
    )
    return base.unionByName(inc)


# ------------------------------------------------- media_dedup_pipeline
def arm_media_routed(spark, sf_dir, on: bool):
    if not on:
        return entrymod.q_media_dedup_pipeline(spark, sf_dir)
    from bigdata_lab02_spark.operators.dedup import (
        dedup_clusters,
        simhash_dup_pairs,
    )
    from bigdata_lab02_spark.operators.multimodal import (
        audio_fingerprint,
        image_dhash,
        synthetic_dhash_images,
        synthetic_fp_audio,
    )

    imgs = synthetic_dhash_images(spark, 32)
    auds = synthetic_fp_audio(spark, 32).select(
        (F.col("media_id") + 100).alias("media_id"), "payload"
    )
    media = imgs.unionByName(auds)
    magic = F.hex(F.substring(F.col("payload"), 1, 4))
    routed = media.withColumn(
        "modality",
        F.when(magic == "89504E47", F.lit("image"))
        .when(magic == "52494646", F.lit("audio"))
        .otherwise(F.lit("unknown")),
    ).localCheckpoint()  # <-- the candidate: generation runs ONCE
    ih = image_dhash(
        routed.where(F.col("modality") == "image")
    ).localCheckpoint()
    ah = audio_fingerprint(
        routed.where(F.col("modality") == "audio")
    ).localCheckpoint()
    hashes = ih.select(
        "media_id", F.lit("image").alias("modality"),
        F.col("dhash").alias("h64"), "decode_ok",
    ).unionByName(
        ah.select(
            "media_id", F.lit("audio").alias("modality"),
            F.col("afp").alias("h64"), "decode_ok",
        )
    )
    pairs = simhash_dup_pairs(
        ih, id_col="media_id", max_hamming=3, hash_col="dhash"
    ).select("id_a", "id_b").unionByName(
        simhash_dup_pairs(
            ah, id_col="media_id", max_hamming=3, hash_col="afp"
        ).select("id_a", "id_b")
    )
    cc = dedup_clusters(hashes.select("media_id"), pairs, id_col="media_id")
    return hashes.join(cc, "media_id").select(
        "media_id", "modality", "h64", "decode_ok", "cluster_id", "keep"
    )


# ------------------------------------------------- pq_topk window vs agg
def arm_pq_topk_agg(spark, sf_dir, on: bool):
    from bigdata_lab02_spark.operators import similarity as sim

    emb = entrymod._t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    if not on:
        return sim.pq_topk(emb, queries, dim=64, m=8, ksub=16, k=5)
    # agg variant: same chain, the final rank window replaced by
    # collect_list + array_sort + slice + posexplode
    cb = sim.pq_codebooks(emb, 64, m=8, ksub=16, iters=1).localCheckpoint()
    codes = sim.pq_encode(emb, cb, 64, m=8)
    qtab = sim._pq_query_tables(queries, cb, 64, 8, "vec_id", "embedding")
    scored = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .crossJoin(F.broadcast(qtab))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim._adc_col().alias("adc_d2"))
    )
    top = scored.groupBy("query_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("adc_d2", "neighbor_id"))
            ),
            1,
            5,
        ).alias("__top")
    )
    return top.select(
        "query_id", F.posexplode("__top").alias("__pos", "__t")
    ).select(
        "query_id",
        F.col("__t.neighbor_id").alias("neighbor_id"),
        F.col("__t.adc_d2").alias("adc_d2"),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )


# --------------------------------------------- tfidf chain coo re-derivation
# _coo(docs) is consumed THREE times by tfidf_matrix (the eager n_docs
# count at construction, the tf window side, the idf aggregate side) and
# inside _coo the (doc_id, token, count) aggregate feeds both the
# dictionary and the id join — the tokenize+group kernel re-derives ~5x
# per p10/p12/p13 gate (guide §3.3/§5).
def arm_p10_pin_coo(spark, sf_dir, on: bool):
    from bigdata_lab02_spark.operators import matrix as mx

    if not on:
        return entrymod.q_p10_tfidf(spark, sf_dir)
    docs = entrymod._t(spark, sf_dir, "documents")
    coo = entrymod._coo(docs).localCheckpoint()
    return mx.tfidf_matrix(coo).select(
        "doc_id", "term_id", F.round("tfidf", 6).alias("tfidf")
    )


def arm_p13_pin_coo(spark, sf_dir, on: bool):
    from bigdata_lab02_spark.operators import matrix as mx

    if not on:
        return entrymod.q_p13_category_top5(spark, sf_dir)
    docs = entrymod._t(spark, sf_dir, "documents")
    coo = entrymod._coo(docs).localCheckpoint()
    tfidf = mx.tfidf_matrix(coo)
    j = tfidf.join(docs.select("doc_id", "lang"), "doc_id")
    ct = j.groupBy(F.col("lang").alias("category"), "term_id").agg(
        F.avg("tfidf").alias("ctfidf")
    )
    w = Window.partitionBy("category").orderBy(
        F.desc("ctfidf"), F.asc("term_id")
    )
    return (
        ct.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "category", "term_id",
            F.round("ctfidf", 6).alias("ctfidf"), "rank",
        )
    )


def arm_p5_pin_counts(spark, sf_dir, on: bool):
    from bigdata_lab02_spark.operators.encode import dense_ids

    docs = entrymod._t(spark, sf_dir, "documents")
    if not on:
        return entrymod._coo(docs)
    counts = (
        entrymod._ftokens(docs)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("count"))
        .localCheckpoint()
    )
    td = dense_ids(counts.select("token"), "token", "term_id", scalable=True)
    return counts.join(F.broadcast(td), "token").select(
        "doc_id", "term_id", "count"
    )


# --------------------------------------- pretrain layout shingle sharing
_PRETRAIN_EX: dict[str, object] = {}


def arm_pretrain_shingle_share(spark, sf_dir, on: bool):
    """The persist_pretrain_artifacts tail: bands + near-dup pairs over
    the written corpus. off = each derives its own shingle pass (the
    pre-r17 shape: one for signatures, one pinned inside the pairs
    call); on = one pinned shingle_stream shared by both. The corpus
    input is pinned once OUTSIDE the timed arms so both consume the
    identical frame."""
    from bigdata_lab02_spark.operators.dedup import (
        minhash_band_table,
        minhash_dedup_pairs,
        minhash_signatures,
        shingle_stream,
    )

    if sf_dir not in _PRETRAIN_EX:
        docs = entrymod._t(spark, sf_dir, "documents")
        _PRETRAIN_EX[sf_dir] = docs.select(
            "doc_id", F.expr(entrymod._PRETRAIN_BODY_EXPR).alias("text")
        ).where(F.col("doc_id") % 4 != 0).localCheckpoint()
    ex = _PRETRAIN_EX[sf_dir]
    if on:
        shingled = shingle_stream(ex).localCheckpoint()
        kw = {"shingled": shingled}
    else:
        kw = {}
    band_tbl = minhash_band_table(
        minhash_signatures(ex, num_hashes=8, shingle_n=3, **kw),
        bands=4, rows_per_band=2,
    )
    drops = minhash_dedup_pairs(
        ex, num_hashes=8, shingle_n=3, bands=4, threshold=0.5, **kw
    ).select(F.col("id_b").alias("doc_id"))
    return band_tbl.select("doc_id").unionByName(drops)


# ------------------------------------------- shipped-pin regression guard
# After the r17 tfidf_matrix coo pin shipped, these arms toggle the pin
# by monkeypatching matrix.tfidf_matrix back to the unpinned chain, so
# any gate downstream of the shared helper can be A/B'd as-is.
def _unpinned_tfidf_matrix(coo, min_count=None):
    import bigdata_lab02_spark.operators.matrix as mx

    if min_count is not None:
        coo = mx.frequency_filter(coo, min_count)
    tf = mx.term_frequency(coo)
    idf = mx.inverse_doc_frequency(coo)
    return mx.tf_idf(tf, idf)


def _make_tfidf_pin_arm(gate: str):
    def arm(spark, sf_dir, on: bool):
        import bigdata_lab02_spark.operators.matrix as mx

        real = mx.tfidf_matrix
        if not on:
            mx.tfidf_matrix = _unpinned_tfidf_matrix
        try:
            fn = entrymod.queries().get(gate) or getattr(
                entrymod, f"q_{gate}"
            )
            return fn(spark, sf_dir)
        finally:
            mx.tfidf_matrix = real

    return arm


# ------------------------------------------ pretrain decision-frame pins
def _make_pretrain_decisions_arm(gate: str):
    """off = the shipped-through-r16 shape (ex pin only; pairs/scoring
    re-derived per consumer JOB — the model pin and mixture's internal
    prefix-sum pin each run eager construction-time jobs AQE reuse
    cannot span); on = additionally pin the two small decision frames
    (near-dup drop ids, quality-keep (id, score_mu))."""

    def arm(spark, sf_dir, on: bool):
        import bigdata_lab02_spark.operators.pretrain as pt

        real = pt.pretrain_corpus

        def forced(*a, **k):
            k["pin_decisions"] = on
            return real(*a, **k)

        pt.pretrain_corpus = forced
        try:
            fn = entrymod.queries().get(gate) or getattr(
                entrymod, f"q_{gate}"
            )
            return fn(spark, sf_dir)
        finally:
            pt.pretrain_corpus = real

    return arm


ARMS = {
    "sem_inc_base": arm_sem_inc_base,
    "pretrain_decisions": _make_pretrain_decisions_arm(
        "pretrain_corpus_pipeline"
    ),
    "pretrain_decisions_shards": _make_pretrain_decisions_arm(
        "pretrain_training_shards"
    ),
    "sem_inc_members": arm_sem_inc_members,
    "pretrain_shingle_share": arm_pretrain_shingle_share,
    "tfidf_pin_kmeans_update": _make_tfidf_pin_arm("kmeans_update"),
    "tfidf_pin_kmeans_assign": _make_tfidf_pin_arm("kmeans_assign"),
    "tfidf_pin_p12": _make_tfidf_pin_arm("p12_ctfidf"),
    "media_routed": arm_media_routed,
    "pq_topk_agg": arm_pq_topk_agg,
    "p10_pin_coo": arm_p10_pin_coo,
    "p13_pin_coo": arm_p13_pin_coo,
    "p5_pin_counts": arm_p5_pin_counts,
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r17_ab")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    out: dict[str, dict[str, list[float]]] = {}
    for name in args:
        build = ARMS[name]
        walls: dict[str, list[float]] = {"off": [], "on": []}
        for rep in range(reps):
            order = (("off", False), ("on", True))
            if rep % 2:
                order = tuple(reversed(order))
            for arm, flag in order:
                spark.sparkContext.setJobDescription(
                    f"r17_ab:{name}:{arm}:rep{rep}"
                )
                t0 = time.time()
                _noop(build(spark, sf_dir, flag))
                walls[arm].append(round(time.time() - t0, 3))
        out[name] = walls
        print(f"# {name}: off={walls['off']} on={walls['on']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
