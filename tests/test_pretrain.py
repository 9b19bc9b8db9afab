"""Capstone composition (operators/pretrain.py): stage-by-stage
hand-checkable behavior on a tiny page set — URL-tier filtering, exact
dedup survivor choice, the per-pair higher-id near-dup drop rule, the
classifier trained on the survivor set, quota binding, and packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokens_column
from bigdata_lab02_spark.operators.pretrain import pretrain_corpus

# A long shared body so near-dup variants clear the 0.5 Jaccard bar.
_BASE = (
    "shared very long body where almost every shingle is common "
    "across the pair of near duplicate documents in this family"
)
_GOOD = "good spark doc with plenty of words about joins and scans"
_OK = "plain spark text row counting words and tokens for packing"


def _pages(spark):
    rows = [
        # src a: a good doc, an exact dup of it (higher id loses), and
        # a near-dup pair (the higher id of the verified pair drops).
        (1, "http://site-a.com/p1", _GOOD, "a"),
        (4, "http://site-a.com/p4", _GOOD, "a"),            # exact dup of 1
        (2, "http://site-a.com/p2", _BASE + " tail one", "a"),
        (3, "http://site-a.com/p3", _BASE + " tail two", "a"),  # near-dup of 2
        # src b: a negative-class doc (no 'spark'), a positive doc, a
        # recrawl duplicate URL (dropped by the tier), and a blocked host.
        (5, "http://site-b.com/p5", "junk junk junk junk junk junk", "b"),
        (6, "http://site-b.com/p6", _OK, "b"),
        (7, "http://site-a.com/p1", _OK + " recrawl", "b"),  # dup norm_url
        (8, "http://bad.com/p8", _OK + " blocked", "b"),
        # src c: weighted zero — whitelist exclusion.
        (9, "http://site-c.com/p9", _OK + " excluded", "c"),
        # ftp scheme fails the tier.
        (10, "ftp://site-a.com/p10", _OK + " ftp", "a"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, text string, source string"
    )


def _dims(spark):
    sfx = spark.createDataFrame([("com",)], "suffix string")
    blk = spark.createDataFrame([("bad.com",)], "domain string")
    return sfx, blk


def _run(spark, weights, budget, pack_budget=8):
    sfx, blk = _dims(spark)
    return pretrain_corpus(
        _pages(spark),
        sfx,
        weights=weights,
        token_budget=budget,
        positive=F.array_contains(tokens_column(F.col("text")), "spark"),
        blocklist=blk,
        pack_budget=pack_budget,
    )


def test_stage_composition(spark):
    out = _run(spark, {"a": 1, "b": 1, "c": 0}, budget=200)
    rows = {r.doc_id: r for r in out.collect()}
    # tier drops: 7 (recrawl dup URL), 8 (blocked), 10 (ftp)
    # exact dedup drops: 4 (same digest as 1, higher id)
    # minhash drops: 3 (near-dup of 2, higher id)
    # classifier drops: 5 (no 'spark' — all its tokens are
    # negative-only, score < 0) and 2 (the surviving near-dup body has
    # no 'spark' either)
    # mixture drops: 9 (source c weighted 0)
    assert set(rows) == {1, 6}
    assert rows[1].source == "a" and rows[6].source == "b"
    assert rows[1].registered_domain == "site-a.com"
    # quota = 200 * 1 // 2 per source; both docs fit
    assert rows[1].quota == 100 and rows[6].quota == 100
    assert rows[1].n_tokens == 11 and rows[1].cum_tokens == 11
    assert rows[1].score_mu > 0 and rows[6].score_mu > 0


def test_near_dup_rule_is_per_pair_higher_id(spark):
    # the 2-3 verified near-dup pair: the HIGHER id (3) must never
    # survive, whatever later stages do with 2.
    full = _run(spark, {"a": 1, "b": 1}, budget=1000)
    ids = {r.doc_id for r in full.collect()}
    assert 3 not in ids


def test_decision_pins_change_nothing(spark):
    """r17: the decision-frame pins (near-dup drop ids, quality-keep
    (id, score_mu)) are a pure materialization seam — rows with
    pin_decisions on and off must be identical, and the pinned run
    must keep the per-pair higher-id drop and the tier drops."""
    sfx, blk = _dims(spark)

    def run(flag):
        out = pretrain_corpus(
            _pages(spark),
            sfx,
            weights={"a": 1, "b": 1},
            token_budget=1000,
            positive=F.array_contains(
                tokens_column(F.col("text")), "spark"
            ),
            blocklist=blk,
            pack_budget=8,
            pin_decisions=flag,
        )
        return sorted(map(tuple, out.collect()))

    assert run(True) == run(False)


def test_quota_binds_and_packing_walks_id_order(spark):
    # tiny budget: quota a = 30 // 2 = 15 tokens — doc 1 (11 tokens)
    # admitted, the family survivor (if quality-kept) would not fit;
    # src b gets doc 6 (10 tokens) via first-doc make-progress.
    out = _run(spark, {"a": 1, "b": 1}, budget=30, pack_budget=4)
    rows = sorted(out.collect(), key=lambda r: r.doc_id)
    assert [r.doc_id for r in rows] == [1, 6]
    assert all(r.cum_tokens <= r.quota or r.cum_tokens == r.n_tokens
               for r in rows)
    # packing: pack_id = floor(tokens-before / 4) within each source
    assert rows[0].pack_id == 0 and rows[1].pack_id == 0
    # larger budget: two docs in src b pack consecutively in id order
    big = _run(spark, {"b": 1}, budget=1000, pack_budget=4)
    brows = sorted(big.collect(), key=lambda r: r.doc_id)
    cum = 0
    for r in brows:
        assert r.pack_id == cum // 4
        cum += r.n_tokens


def test_shard_increment_flags(spark):
    # Daily-shard face: base = docs 1,2,5,6 processed into artifacts;
    # shard rows get per-tier flags against them.
    from bigdata_lab02_spark.operators import dedup as dd
    from bigdata_lab02_spark.operators.curation import (
        quality_classifier_train,
    )
    from bigdata_lab02_spark.operators.pretrain import (
        pretrain_shard_increment,
    )
    from bigdata_lab02_spark.operators.url import url_filters

    sfx, blk = _dims(spark)
    base = _pages(spark).where("doc_id IN (1, 2, 5, 6)")
    tier = url_filters(base, sfx, blocklist=blk,
                       passthrough=["source", "text"])
    bsurv = tier.where("url_keep").select(
        "doc_id", "source", "text", "norm_url")
    indexed_urls = bsurv.select("norm_url")
    indexed_digests = bsurv.select(F.md5("text").alias("digest")).distinct()
    corpus = bsurv.select("doc_id", "text")
    bands = dd.minhash_band_table(
        dd.minhash_signatures(corpus, num_hashes=8, shingle_n=3),
        bands=4, rows_per_band=2)
    model = quality_classifier_train(
        corpus,
        F.array_contains(tokens_column(F.col("text")), "spark"),
        n_buckets=512,
    ).localCheckpoint()

    shard = spark.createDataFrame(
        [
            # exact copy of base doc 1 -> dup_of_index (and a 1.0-
            # jaccard corpus near-dup)
            (11, "http://site-a.com/s11", _GOOD, "a"),
            # recrawl of base url p1 -> dropped before content work
            (12, "http://site-a.com/p1", _OK + " recrawl", "b"),
            # near-dup of base doc 2 (tail differs) -> near_dup
            (13, "http://site-a.com/s13", _BASE + " tail two", "a"),
            # genuinely new, positive-class -> keep (no shingle overlap
            # with any base doc — an _OK-prefixed text would share 8 of
            # 11 shingles with base doc 6 and near-dup at 0.73)
            (14, "http://site-b.com/s14",
             "entirely novel spark payload describing filters and maps",
             "b"),
            # within-shard exact dup of 13 -> dropped (13 survives)
            (15, "http://site-a.com/s15", _BASE + " tail two", "a"),
            # new but negative-class -> quality_keep False
            (16, "http://site-b.com/s16",
             "junk junk junk junk junk junk fresh", "b"),
        ],
        "doc_id long, url string, text string, source string",
    )
    out = pretrain_shard_increment(
        shard, sfx, indexed_urls, indexed_digests, corpus, bands, model,
        blocklist=blk,
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {11, 13, 14, 16}   # 12 recrawl, 15 shard-dup
    assert rows[11].dup_of_index and not rows[11].keep
    assert not rows[13].dup_of_index and rows[13].near_dup
    assert not rows[13].keep
    assert rows[14].keep and rows[14].quality_keep
    assert not rows[14].dup_of_index and not rows[14].near_dup
    assert not rows[16].quality_keep and not rows[16].keep


class TestPersistedArtifacts:
    """r16 (VERDICT r15 item 1): the journaled on-disk layout for the
    increment face's base artifacts — build(A); update(B) must replay
    build(A ∪ B)'s artifact tables table-for-table (model excepted:
    frozen by contract), the decisions must match the caller-supplied-
    DataFrame face, and the old-beats-new guard must fire BEFORE any
    mutating write."""

    _SHARD = [
        (11, "http://site-a.com/s11", _GOOD, "a"),
        (12, "http://site-a.com/p1", _OK + " recrawl", "b"),
        (13, "http://site-a.com/s13", _BASE + " tail two", "a"),
        (14, "http://site-b.com/s14",
         "entirely novel spark payload describing filters and maps", "b"),
        (15, "http://site-a.com/s15", _BASE + " tail two", "a"),
        (16, "http://site-b.com/s16",
         "junk junk junk junk junk junk fresh", "b"),
    ]

    def _shard(self, spark):
        return spark.createDataFrame(
            self._SHARD, "doc_id long, url string, text string, source string"
        )

    def _positive(self):
        return F.array_contains(tokens_column(F.col("text")), "spark")

    def test_roundtrip_matches_rebuild(self, spark, tmp_path):
        from bigdata_lab02_spark.operators.pretrain import (
            check_pretrain_artifacts,
            persist_pretrain_artifacts,
            update_pretrain_artifacts,
        )

        sfx, blk = _dims(spark)
        base = _pages(spark)
        path = str(tmp_path / "arts")
        persist_pretrain_artifacts(
            base, sfx, self._positive(), path, blocklist=blk
        )
        st = check_pretrain_artifacts(spark, path, deep=True)
        # tier survivors: 1,2,3,4,5,6,9 (7 recrawl, 8 blocked, 10 ftp);
        # exact dedup drops 4 (digest of 1)
        assert st["max_id"] == 10
        assert st["n_urls"] == 7 and st["n_digests"] == 6
        assert st["n_corpus"] == 6

        out = update_pretrain_artifacts(
            self._shard(spark), sfx, path, blocklist=blk
        )
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {11, 13, 14, 16}
        # vs the FULL base: 11 copies base 1, 13 copies base 3 (exact),
        # 16 near-dups base 5 ("junk…" + one extra token)
        assert rows[11].dup_of_index and not rows[11].keep
        assert rows[13].dup_of_index and not rows[13].keep
        assert rows[16].near_dup and not rows[16].quality_keep
        assert rows[14].keep and not rows[14].dup_of_index
        assert not rows[14].near_dup

        # layout == rebuild over the merged crawl, table for table
        path2 = str(tmp_path / "arts_rebuild")
        persist_pretrain_artifacts(
            base.unionByName(self._shard(spark)),
            sfx,
            self._positive(),
            path2,
            blocklist=blk,
        )
        for name, cols in (
            ("urls", ["norm_url"]),
            ("digests", ["digest"]),
            ("corpus", ["doc_id", "source", "text"]),
            ("bands", ["doc_id", "band_id", "band_hash"]),
        ):
            got = sorted(
                map(tuple, spark.read.parquet(f"{path}/{name}")
                    .select(*cols).collect())
            )
            want = sorted(
                map(tuple, spark.read.parquet(f"{path2}/{name}")
                    .select(*cols).collect())
            )
            assert got == want, name
        st = check_pretrain_artifacts(spark, path, deep=True)
        st2 = check_pretrain_artifacts(spark, path2, deep=True)
        assert st["n_corpus"] == st2["n_corpus"] == 8   # +14,16
        assert st["n_urls"] == st2["n_urls"] == 12      # +11,13,14,15,16
        assert st["n_digests"] == st2["n_digests"] == 8
        assert st["n_bands"] == st2["n_bands"]
        assert st["max_id"] == 16

    def test_decisions_match_unpersisted_face(self, spark, tmp_path):
        # Layout invisible in results: update == pretrain_shard_increment
        # over the equivalent caller-supplied artifacts.
        from bigdata_lab02_spark.operators import dedup as dd
        from bigdata_lab02_spark.operators.pretrain import (
            persist_pretrain_artifacts,
            pretrain_shard_increment,
            update_pretrain_artifacts,
        )
        from bigdata_lab02_spark.operators.url import url_filters

        sfx, blk = _dims(spark)
        base = _pages(spark)
        path = str(tmp_path / "arts_eq")
        persist_pretrain_artifacts(
            base, sfx, self._positive(), path, blocklist=blk
        )
        got = {
            tuple(r)
            for r in update_pretrain_artifacts(
                self._shard(spark), sfx, path, blocklist=blk
            ).collect()
        }

        tier = url_filters(base, sfx, blocklist=blk,
                           passthrough=["source", "text"])
        bsurv = tier.where("url_keep").select(
            "doc_id", "source", "text", "norm_url")
        from pyspark.sql import Window
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
        corpus = (bsurv.withColumn("__rn", F.row_number().over(w))
                  .where("__rn = 1").select("doc_id", "text"))
        bands = dd.minhash_band_table(
            dd.minhash_signatures(corpus, num_hashes=8, shingle_n=3),
            bands=4, rows_per_band=2)
        drops = dd.minhash_dedup_pairs(corpus, threshold=0.5).select(
            F.col("id_b").alias("doc_id"))
        nd = corpus.join(drops, "doc_id", "left_anti")
        from bigdata_lab02_spark.operators.curation import (
            quality_classifier_train,
        )
        model = quality_classifier_train(nd, self._positive(), n_buckets=512)
        want = {
            tuple(r)
            for r in pretrain_shard_increment(
                self._shard(spark), sfx,
                bsurv.select("norm_url"),
                bsurv.select(F.md5("text").alias("digest")).distinct(),
                corpus, bands, model, blocklist=blk,
            ).collect()
        }
        assert got == want

    def test_guard_fires_before_mutation(self, spark, tmp_path):
        from bigdata_lab02_spark.operators.pretrain import (
            check_pretrain_artifacts,
            persist_pretrain_artifacts,
            update_pretrain_artifacts,
        )

        sfx, blk = _dims(spark)
        path = str(tmp_path / "arts_guard")
        persist_pretrain_artifacts(
            _pages(spark), sfx, self._positive(), path, blocklist=blk
        )
        stale = spark.createDataFrame(
            [(5, "http://site-z.com/z", "brand new stale text", "a")],
            "doc_id long, url string, text string, source string",
        )
        import pytest
        with pytest.raises(ValueError, match="old-beats-new"):
            update_pretrain_artifacts(stale, sfx, path, blocklist=blk)
        st = check_pretrain_artifacts(spark, path, deep=True)
        assert st["journal"] == "committed" and st["n_corpus"] == 6

    def test_empty_base_then_first_shard(self, spark, tmp_path):
        from bigdata_lab02_spark.operators.pretrain import (
            check_pretrain_artifacts,
            persist_pretrain_artifacts,
            update_pretrain_artifacts,
        )

        sfx, blk = _dims(spark)
        path = str(tmp_path / "arts_empty")
        empty = spark.createDataFrame(
            [], "doc_id long, url string, text string, source string"
        )
        persist_pretrain_artifacts(
            empty, sfx, self._positive(), path, blocklist=blk
        )
        st = check_pretrain_artifacts(spark, path, deep=True)
        assert st["max_id"] == -1 and st["n_corpus"] == 0
        out = update_pretrain_artifacts(
            self._shard(spark), sfx, path, blocklist=blk
        )
        rows = {r.doc_id: r for r in out.collect()}
        # no base: 11 is novel now, 12's URL is no longer a recrawl;
        # 15 still loses within-shard to 13
        assert set(rows) == {11, 12, 13, 14, 16}
        assert not rows[11].dup_of_index
        assert check_pretrain_artifacts(spark, path)["max_id"] == 16


class TestPretrainCandidatesStream:
    """r16 (VERDICT r15 item 6): the capstone's streaming face —
    stateless per-tier candidate emission against the static base
    artifacts; decisions stay batch."""

    def test_candidate_tiers(self, spark, tmp_path):
        from pyspark.sql import Window
        from bigdata_lab02_spark.operators import dedup as dd
        from bigdata_lab02_spark.operators.url import url_filters
        from bigdata_lab02_spark.streaming import run_stream_to_memory
        from bigdata_lab02_spark.streaming.docs import (
            pretrain_candidates_stream,
        )

        sfx, blk = _dims(spark)
        base = _pages(spark).where("doc_id IN (1, 2, 5, 6)")
        tier = url_filters(base, sfx, blocklist=blk,
                           passthrough=["source", "text"])
        bsurv = tier.where("url_keep").select(
            "doc_id", "text", "norm_url").localCheckpoint()
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
        corpus = (bsurv.withColumn("__rn", F.row_number().over(w))
                  .where("__rn = 1").select("doc_id", "text"))
        bands = dd.minhash_band_table(
            dd.minhash_signatures(corpus, num_hashes=8, shingle_n=3),
            bands=4, rows_per_band=2)

        shard = spark.createDataFrame(
            [
                (11, "http://site-a.com/s11", _GOOD, "a"),      # exact of 1
                (12, "http://site-a.com/p1", _OK + " rc", "b"),  # recrawl
                (13, "http://site-a.com/s13", _BASE + " tail two", "a"),
                (14, "http://site-b.com/s14",
                 "entirely novel spark payload describing filters", "b"),
                (15, "http://bad.com/s15", _GOOD, "b"),  # blocked: no rows
            ],
            "doc_id long, url string, text string, source string",
        )
        src = str(tmp_path / "pages_stream")
        shard.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, source string, url string, text string"
        ).parquet(src)
        out = run_stream_to_memory(
            spark,
            pretrain_candidates_stream(
                stream, sfx,
                bsurv.select("norm_url"),
                bsurv.select(F.md5("text").alias("digest")).distinct(),
                bands,
                blocklist=blk,
            ),
            "t_stream_pretrain_cands",
            mode="append",
        ).distinct()
        rows = {(r.doc_id, r.kind, r.ref) for r in out.collect()}
        got_ids = {r[0] for r in rows}
        # the URL tier drops the blocked host BEFORE any content work —
        # doc 15's text is an exact dup of base 1, yet no rows emit
        assert 15 not in got_ids
        # doc 14 is genuinely novel
        assert 14 not in got_ids
        import hashlib
        good_md5 = hashlib.md5(_GOOD.encode()).hexdigest()
        assert (11, "exact", good_md5) in rows
        assert (12, "recrawl", "http://site-a.com/p1") in rows
        # 13 collides with base 2 in some band (the verified near-dup
        # of the batch face); candidates are UNVERIFIED collisions
        assert (13, "near", "2") in rows
        # every near ref is a corpus doc id, never a shard id
        near_refs = {int(r[2]) for r in rows if r[1] == "near"}
        assert near_refs <= {1, 2, 5, 6}


def test_pretrain_update_crash_leaves_pending(spark, tmp_path, monkeypatch):
    # r16: a crash between update's first mutating write and the
    # journal flip must read as crashed, not committed — the
    # bm25/semantic crash-window contract, artifact-layout form.
    import pytest
    from bigdata_lab02_spark.functions.text import tokens_column
    from bigdata_lab02_spark.operators.pretrain import (
        check_pretrain_artifacts,
        persist_pretrain_artifacts,
        update_pretrain_artifacts,
    )

    sfx = spark.createDataFrame([("com",)], "suffix string")
    path = str(tmp_path / "arts_crash")
    base = spark.createDataFrame(
        [(1, "http://a.com/p1", "alpha beta spark", "a")],
        "doc_id long, url string, text string, source string",
    )
    persist_pretrain_artifacts(
        base, sfx,
        F.array_contains(tokens_column(F.col("text")), "spark"), path,
    )
    assert check_pretrain_artifacts(spark, path)["journal"] == "committed"

    shard = spark.createDataFrame(
        [(5, "http://a.com/p5", "gamma delta spark", "a")],
        "doc_id long, url string, text string, source string",
    )
    df_cls = type(base)
    real_write = df_cls.write.fget

    class _Boom(Exception):
        pass

    calls = {"n": 0}

    def crashing_write(self):
        calls["n"] += 1
        if calls["n"] >= 2:  # pending journal is call 1; urls append is 2
            raise _Boom()
        return real_write(self)

    monkeypatch.setattr(df_cls, "write", property(crashing_write))
    with pytest.raises(_Boom):
        update_pretrain_artifacts(shard, sfx, path)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="crashed mid-flight"):
        check_pretrain_artifacts(spark, path)


def test_persisted_artifacts_passthrough_schema(spark, tmp_path):
    # r16: passthrough columns persist into corpus/ and updates append
    # them with the same schema (no layout fork).
    from bigdata_lab02_spark.functions.text import tokens_column
    from bigdata_lab02_spark.operators.pretrain import (
        persist_pretrain_artifacts,
        update_pretrain_artifacts,
    )

    sfx = spark.createDataFrame([("com",)], "suffix string")
    base = spark.createDataFrame(
        [(1, "http://a.com/p1", "alpha beta spark", "a", "utf-8")],
        "doc_id long, url string, text string, source string, cs string",
    )
    path = str(tmp_path / "arts_pt")
    persist_pretrain_artifacts(
        base, sfx,
        F.array_contains(tokens_column(F.col("text")), "spark"),
        path, passthrough=["cs"],
    )
    shard = spark.createDataFrame(
        [(5, "http://a.com/p5", "gamma delta spark", "a", "latin-1")],
        "doc_id long, url string, text string, source string, cs string",
    )
    out = update_pretrain_artifacts(shard, sfx, path, passthrough=["cs"])
    assert [r.cs for r in out.collect()] == ["latin-1"]
    corpus = spark.read.parquet(f"{path}/corpus")
    assert sorted(corpus.columns) == ["cs", "doc_id", "source", "text"]
    assert {(r.doc_id, r.cs) for r in corpus.collect()} == {
        (1, "utf-8"), (5, "latin-1")
    }


def test_training_shards_roundtrip_and_crash_window(
    spark, tmp_path, monkeypatch
):
    # r16: the shard writer's manifest must describe exactly what is
    # on disk, shard assignment must be pack-contiguous, and a crash
    # before the manifest lands must read as crashed.
    import pytest
    from bigdata_lab02_spark.operators.pretrain import (
        check_training_shards,
        write_training_shards,
    )

    packed = spark.createDataFrame(
        [
            (1, "a", 5, 0), (2, "a", 7, 0), (3, "a", 4, 1),
            (4, "a", 9, 2), (5, "b", 3, 0), (6, "b", 6, 3),
        ],
        "doc_id long, source string, n_tokens long, pack_id int",
    )
    path = str(tmp_path / "shards")
    write_training_shards(packed, path, packs_per_shard=2)
    st = check_training_shards(spark, path, deep=True)
    assert st == {
        "journal": "committed", "n_shards": 4, "n_docs": 6,
        "n_tokens": 34,
    }
    man = {
        (r.source, r.shard_id): (r.n_docs, r.n_packs, r.n_tokens,
                                 r.min_id, r.max_id)
        for r in spark.read.parquet(f"{path}/manifest").collect()
    }
    # packs 0,1 -> shard 0; pack 2 -> shard 1; pack 3 -> shard 1
    assert man[("a", 0)] == (3, 2, 16, 1, 3)
    assert man[("a", 1)] == (1, 1, 9, 4, 4)
    assert man[("b", 0)] == (1, 1, 3, 5, 5)
    assert man[("b", 1)] == (1, 1, 6, 6, 6)
    # shards/ rows carry the full packed columns + shard_id
    rows = spark.read.parquet(f"{path}/shards")
    assert set(rows.columns) == {
        "doc_id", "source", "n_tokens", "pack_id", "shard_id"
    }
    assert rows.count() == 6

    # crash window: fail after the shards write, before the manifest
    df_cls = type(packed)
    real_write = df_cls.write.fget

    class _Boom(Exception):
        pass

    calls = {"n": 0}

    def crashing_write(self):
        calls["n"] += 1
        if calls["n"] >= 3:  # journal=1, shards=2, manifest=3
            raise _Boom()
        return real_write(self)

    monkeypatch.setattr(df_cls, "write", property(crashing_write))
    with pytest.raises(_Boom):
        write_training_shards(packed, str(tmp_path / "crash"), 2)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="crashed mid-flight"):
        check_training_shards(spark, str(tmp_path / "crash"))
