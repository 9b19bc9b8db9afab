"""Unit tests for dedup + similarity operators not exercised by the oracle
harness (LSH internals, SimHash pairs, IVF, hyperplane buckets)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA

from bigdata_lab02_spark.operators import dedup as dd
from bigdata_lab02_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup
        (4, "completely different content about spark query engines at scale"),
        (5, "another unrelated document discussing parquet columnar storage"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup(near_dup_docs):
    out = {r["digest"]: r for r in dd.exact_dedup(near_dup_docs).collect()}
    assert len(out) == 4  # 5 docs, one exact pair
    dup = [r for r in out.values() if r["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["survivor_id"] == 1


def test_minhash_lsh_finds_exact_and_near_dups(near_dup_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.minhash_dedup_pairs(near_dup_docs, threshold=0.5).collect()
    }
    assert pairs.get((1, 2)) == 1.0  # exact dup always in same buckets
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert all(a < b for a, b in pairs)
    assert (4, 5) not in pairs


def test_lsh_candidates_subset_property(near_dup_docs):
    sigs = dd.minhash_signatures(near_dup_docs)
    cands = {
        (r["id_a"], r["id_b"])
        for r in dd.lsh_candidate_pairs(sigs).collect()
    }
    # identical docs share all bands
    assert (1, 2) in cands
    # candidates never pair a doc with itself
    assert all(a != b for a, b in cands)


def test_ngram_jaccard_blocking_consistent(near_dup_docs):
    full = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in dd.ngram_jaccard_pairs(near_dup_docs, threshold=0.3).collect()
    }
    assert full[(1, 2)] == 1.0
    assert (1, 3) in full
    # rare-shingle blocking must not change scores of surviving pairs
    blocked = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in dd.ngram_jaccard_pairs(
            near_dup_docs, threshold=0.3, max_shingle_df=4
        ).collect()
    }
    for k, v in blocked.items():
        assert full[k] == v


def test_simhash_hamming_close_for_near_dups(spark, near_dup_docs):
    sh = dd.simhash(near_dup_docs)
    pairs = dd.simhash_dup_pairs(sh, max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0  # identical text → identical sketch
    assert got.get((1, 3), 99) <= 6  # near dup → small hamming
    assert (4, 5) not in got


def test_simhash_values_fit_60_bits(near_dup_docs):
    vals = [r["simhash"] for r in dd.simhash(near_dup_docs).collect()]
    assert all(0 <= v < (1 << 60) for v in vals)


def test_embedding_dup_pairs_multi_table_superset(embeddings_small):
    """More tables ⇒ candidate set grows monotonically (OR-amplification);
    every reported pair meets the threshold."""
    one = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_dup_pairs(
            embeddings_small, dim=64, threshold=0.3, n_planes=4, n_tables=1
        ).collect()
    }
    three = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_dup_pairs(
            embeddings_small, dim=64, threshold=0.3, n_planes=4, n_tables=3
        ).collect()
    }
    assert one <= three


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def embeddings_small(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        F.col("vec_id") < 60
    )


def test_cosine_topk_self_excluded(embeddings):
    out = sim.cosine_topk(embeddings, embeddings.where(F.col("vec_id") < 3), k=4)
    rows = out.collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["cosine"])
    assert set(per_q) == {0, 1, 2}
    for cos_list in per_q.values():
        assert len(cos_list) == 4
        assert cos_list == sorted(cos_list, reverse=True)


def test_hyperplane_buckets_deterministic(embeddings):
    b1 = {r["vec_id"]: r["bucket"] for r in sim.hyperplane_buckets(embeddings, dim=64).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in sim.hyperplane_buckets(embeddings, dim=64).collect()}
    assert b1 == b2
    assert all(len(v) == 8 and set(v) <= {"0", "1"} for v in b1.values())


def test_ivf_recall_against_brute_force(embeddings):
    queries = embeddings.where(F.col("vec_id") < 10)
    exact = sim.cosine_topk(embeddings, queries, k=5)
    cents = embeddings.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") / 50).cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    approx = sim.ivf_topk(embeddings, queries, cents, k=5, nprobe=4)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # IVF with 10 lists and nprobe=4 on random data: expect meaningful
    # overlap with exact top-5 (recall >= 40% average), all queries answered
    assert set(ap) == set(ex)
    recalls = [len(ex[q] & ap[q]) / 5 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.4

@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.1",  # bench scale (VERDICT r6 item 8)
])
def test_ann_recall_floors(spark, sf_dir):
    """The ann_recall gate's stated quality floors (VERDICT r5 item 2,
    extended to bench scale r6 item 8): recall@10 vs the exact baseline
    must stay at or above int8 0.9 / IVF 0.5 / LSH 0.2 at BOTH scale
    dirs (measured: 1.0/0.50/0.38 at sf0.001, 0.97/0.53/0.27 at sf0.1 —
    data and hash configs are fixed, so these are deterministic). A
    centroid-quality regression at realistic data volume can no longer
    pass on the small fixture alone."""
    import __spark_entry__ as e

    rows = {r["method"]: r["recall"]
            for r in e.queries()["ann_recall"](spark, sf_dir).collect()}
    assert rows["int8"] >= 0.9, (sf_dir, rows)
    assert rows["ivf"] >= 0.5, (sf_dir, rows)
    assert rows["lsh"] >= 0.2, (sf_dir, rows)


def test_lsh_topk_subset_of_exact_scores(embeddings_small):
    """lsh_topk returns (query, neighbor, cosine) whose cosine equals the
    exact pairwise cosine (LSH only restricts CANDIDATES, never rescores),
    and never more than k rows per query."""
    q = embeddings_small.where(F.col("vec_id") < 3)
    out = sim.lsh_topk(embeddings_small, q, dim=64, k=4, n_planes=4, n_tables=3)
    rows = out.collect()
    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["cosine"])
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in sim.cosine_topk(embeddings_small, q, k=100).collect()}
    for r in rows:
        assert abs(exact[(r["query_id"], r["neighbor_id"])] - r["cosine"]) < 1e-12
    for cos_list in per_q.values():
        assert len(cos_list) <= 4
        assert cos_list == sorted(cos_list, reverse=True)


# ------------------------------------------------- duplicate clustering


class TestConnectedComponents:
    def test_chain_converges_to_min(self, spark):
        """A 12-node duplicate chain (worst case for plain min-label
        propagation: diameter == n) collapses to one cluster in the
        O(log n) star rounds."""
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"]
        )
        comp = {
            r.node: r.component
            for r in dd.connected_components(pairs).collect()
        }
        assert comp == {i: 1 for i in range(1, 13)}

    def test_components_stay_separate_and_merge(self, spark):
        """Two components stay apart; a bridging pair merges them."""
        base = [(1, 2), (2, 3), (10, 11)]
        pairs = spark.createDataFrame(base, ["id_a", "id_b"])
        comp = {
            r.node: r.component
            for r in dd.connected_components(pairs).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        bridged = spark.createDataFrame(base + [(3, 10)], ["id_a", "id_b"])
        comp2 = {
            r.node: r.component
            for r in dd.connected_components(bridged).collect()
        }
        assert comp2 == {n: 1 for n in (1, 2, 3, 10, 11)}

    def test_reversed_and_self_pairs(self, spark):
        """Pair order must not matter; self-pairs are ignored."""
        pairs = spark.createDataFrame(
            [(5, 2), (2, 5), (7, 7), (2, 9)], ["id_a", "id_b"]
        )
        comp = {
            r.node: r.component
            for r in dd.connected_components(pairs).collect()
        }
        assert comp == {2: 2, 5: 2, 9: 2}

    def test_dedup_clusters_survivors(self, spark):
        """Every doc gets a cluster; exactly one keep=True per cluster,
        and it is the minimum id. Docs in no pair are singletons."""
        docs = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 4, 50)], ["doc_id"]
        )
        pairs = spark.createDataFrame([(2, 3), (3, 4)], ["id_a", "id_b"])
        out = dd.dedup_clusters(docs, pairs).collect()
        m = {r.doc_id: (r.cluster_id, r.keep) for r in out}
        assert m == {
            1: (1, True),
            2: (2, True),
            3: (2, False),
            4: (2, False),
            50: (50, True),
        }

    def test_empty_pairs_all_singletons(self, spark):
        docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
        pairs = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
        out = dd.dedup_clusters(docs, pairs).collect()
        assert {(r.doc_id, r.cluster_id, r.keep) for r in out} == {
            (1, 1, True),
            (2, 2, True),
        }


class TestUpdateComponents:
    """r14 incremental CC maintenance: increment-then-query must equal
    a full rebuild over the union pair set, for every increment shape —
    merges of old components, fresh nodes, links from fresh to old, and
    no-op duplicates."""

    def _parity(self, spark, base, inc):
        bdf = spark.createDataFrame(base, ["id_a", "id_b"])
        idf = spark.createDataFrame(inc, "id_a BIGINT, id_b BIGINT")
        lab0 = dd.connected_components(bdf)
        got = {
            (r.node, r.component)
            for r in dd.update_components(lab0, idf).collect()
        }
        want = {
            (r.node, r.component)
            for r in dd.connected_components(bdf.unionByName(idf)).collect()
        }
        assert got == want, (sorted(got), sorted(want))

    def test_all_increment_shapes(self, spark):
        base = [(1, 2), (2, 3), (10, 11), (20, 21)]
        inc = [
            (3, 10),    # merges two old components
            (30, 31),   # entirely fresh component
            (32, 21),   # fresh node linking into an old component
            (2, 1),     # duplicate of an existing relation (no-op)
            (11, 10),   # reversed duplicate (no-op)
        ]
        self._parity(spark, base, inc)

    def test_chain_through_increment(self, spark):
        # increment bridges old comps through a fresh middle node:
        # label-level quotient must chase the transitive merge
        base = [(1, 2), (10, 11), (20, 21)]
        inc = [(2, 100), (100, 10), (11, 20)]
        self._parity(spark, base, inc)

    def test_empty_increment_is_identity(self, spark):
        bdf = spark.createDataFrame([(1, 2), (5, 6)], ["id_a", "id_b"])
        idf = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
        lab0 = dd.connected_components(bdf)
        got = {
            (r.node, r.component)
            for r in dd.update_components(lab0, idf).collect()
        }
        assert got == {(r.node, r.component) for r in lab0.collect()}

    def test_clusters_incremental_face(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 10, 11, 50)], ["doc_id"]
        )
        base = spark.createDataFrame([(1, 2), (10, 11)], ["id_a", "id_b"])
        inc = spark.createDataFrame([(2, 3), (3, 10)], ["id_a", "id_b"])
        lab0 = dd.connected_components(base)
        out = dd.dedup_clusters_incremental(docs, lab0, inc).collect()
        m = {r.doc_id: (r.cluster_id, r.keep) for r in out}
        assert m == {
            1: (1, True), 2: (1, False), 3: (1, False),
            10: (1, False), 11: (1, False), 50: (50, True),
        }


# ------------------------------------------------------------ quantization


class TestQuantization:
    def test_quantize_shapes_and_scale(self, spark):
        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
            ["vec_id", "embedding"],
        )
        out = {r.vec_id: r for r in sim.quantize_embeddings(df).collect()}
        assert out[1].scale == pytest.approx(1.0)
        assert out[1].qvec == [64, -127, 32]  # round(0.5*127)=64 (HALF_UP)
        assert out[2].qvec == [0, 0, 0] and out[2].scale == 1.0

    def test_quantized_topk_agrees_with_exact(self, spark):
        emb = spark.read.parquet(f"{TESTDATA}/sf0.01/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 10)
        exact = sim.cosine_topk(emb, q, k=5)
        quant = sim.quantized_cosine_topk(emb, q, k=5)
        ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        qz = {(r.query_id, r.neighbor_id) for r in quant.collect()}
        # int8 rounding perturbs cosines by ~1e-3; on near-random vectors
        # a tail-of-top-5 swap is possible but most of the set must agree
        assert len(ex & qz) / len(ex) >= 0.9


class TestSemanticDedup:
    def test_keep_lowest_within_cluster(self, spark):
        from bigdata_lab02_spark.operators.similarity import semantic_dedup

        # two tight groups on orthogonal axes: centroids = the axis units;
        # within each cluster the lower id survives, the near-parallel
        # higher ids are dropped
        rows = [
            (0, [1.0, 0.0]), (10, [0.99, 0.01]),   # cluster of centroid 0
            (1, [0.0, 1.0]), (11, [0.01, 0.99]),   # cluster of centroid 1
            (20, [-1.0, 0.2]),                     # alone near no one
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "cluster_id long, centroid array<double>",
        )
        out = {r["vec_id"]: r for r in
               semantic_dedup(vecs, cents, threshold=0.9).collect()}
        assert out[0]["keep"] and not out[10]["keep"]
        assert out[1]["keep"] and not out[11]["keep"]
        assert out[20]["keep"]
        assert out[10]["cluster_id"] == 0 and out[11]["cluster_id"] == 1

    def test_cross_cluster_pairs_never_compared(self, spark):
        from bigdata_lab02_spark.operators.similarity import semantic_dedup

        # identical vectors forced into DIFFERENT clusters stay kept:
        # the pair join is cluster-local by construction
        vecs = spark.createDataFrame(
            [(0, [1.0, 1.0]), (1, [1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.9]), (1, [0.9, 1.0])],
            "cluster_id long, centroid array<double>",
        )
        out = {r["vec_id"]: r for r in
               semantic_dedup(vecs, cents, threshold=0.99).collect()}
        # same vector → same nearest centroid → same cluster → dedup fires
        assert out[0]["cluster_id"] == out[1]["cluster_id"]
        assert out[0]["keep"] and not out[1]["keep"]


class TestSemanticDedupShufflePath:
    def test_string_centroid_ids_preserved(self, spark):
        """The r6 argmax-fold replan must preserve the caller's centroid-id
        TYPE: non-numeric ids (a legal pre-r6 input) must not be cast to
        NULL and silently dropped by the empty-centroid guard."""
        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [("east", [1.0, 0.0]), ("north", [0.0, 1.0])],
            "cluster_id string, centroid array<double>",
        )
        out = {r["vec_id"]: r["cluster_id"]
               for r in sim.semantic_dedup(vecs, cents, threshold=0.99).collect()}
        assert out == {1: "east", 2: "north", 3: "east"}

    def test_broadcast_optout_same_result(self, spark):
        from bigdata_lab02_spark.operators.similarity import semantic_dedup

        rows = [
            (0, [1.0, 0.0]), (10, [0.99, 0.01]),
            (1, [0.0, 1.0]), (11, [0.01, 0.99]),
            (20, [-1.0, 0.2]),
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "cluster_id long, centroid array<double>",
        )
        bc = {(r.vec_id, r.cluster_id, r.keep) for r in
              semantic_dedup(vecs, cents, threshold=0.9).collect()}
        sh = {(r.vec_id, r.cluster_id, r.keep) for r in
              semantic_dedup(vecs, cents, threshold=0.9,
                             broadcast_dups=False).collect()}
        assert bc == sh


class TestSemanticDedupPipeline:
    def test_data_derived_centroids_end_to_end(self, spark):
        from bigdata_lab02_spark.operators.similarity import (
            semantic_dedup_pipeline,
        )

        # two tight groups; sample_mod=1 so every vector is in the fit
        rows = [
            (0, [1.0, 0.0]), (4, [0.99, 0.01]),
            (1, [0.0, 1.0]), (5, [0.01, 0.99]),
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r for r in semantic_dedup_pipeline(
            vecs, threshold=0.9, k=2, sample_mod=1, max_iter=2
        ).collect()}
        assert len(out) == 4
        assert out[0]["keep"] and not out[4]["keep"]
        assert out[1]["keep"] and not out[5]["keep"]
        # group members share a cluster
        assert out[0]["cluster_id"] == out[4]["cluster_id"]
        assert out[1]["cluster_id"] == out[5]["cluster_id"]


class TestDedupSpans:
    def test_cross_doc_span_removed_order_kept(self, spark):
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        boiler = "aa bb cc dd"  # one 4-token passage shared by both docs
        docs = spark.createDataFrame(
            [
                (1, f"{boiler} u1 u2 u3 u4"),
                (2, f"v1 v2 v3 v4 {boiler}"),
                (3, "w1 w2 w3 w4"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               dedup_spans(docs, span_tokens=4).collect()}
        assert out[1]["text"] == "u1 u2 u3 u4"
        assert out[2]["text"] == "v1 v2 v3 v4"
        assert out[3]["text"] == "w1 w2 w3 w4"
        assert out[1]["n_tokens"] == 8 and out[1]["n_removed"] == 4
        assert out[3]["n_removed"] == 0

    def test_shifted_passage_caught_at_any_offset(self, spark):
        """The ExactSubstr property (Lee et al. 2022): the SAME passage at
        DIFFERENT offsets in two docs is removed from both. The legacy
        block-aligned scheme (stride=span_tokens) provably misses it —
        asserted here as the contrast case."""
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        passage = "p1 p2 p3 p4"
        docs = spark.createDataFrame(
            [
                (1, f"{passage} a1 a2"),            # passage at offset 0
                (2, f"b1 b2 b3 {passage} c1"),      # passage at offset 3
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               dedup_spans(docs, span_tokens=4, stride=1).collect()}
        assert out[1]["text"] == "a1 a2" and out[1]["n_removed"] == 4
        assert out[2]["text"] == "b1 b2 b3 c1" and out[2]["n_removed"] == 4
        # contrast: block-aligned stride misses the shifted copy entirely
        legacy = {r["doc_id"]: r for r in
                  dedup_spans(docs, span_tokens=4, stride=4).collect()}
        assert legacy[2]["n_removed"] == 0

    def test_fully_duplicated_doc_empties(self, spark):
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        docs = spark.createDataFrame(
            [(1, "x y z w"), (2, "x y z w")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in
               dedup_spans(docs, span_tokens=4).collect()}
        assert out[1]["text"] == "" and out[2]["text"] == ""
        assert out[1]["n_removed"] == 4

    def test_short_docs_below_span_survive(self, spark):
        # passages shorter than span_tokens are below the match-length
        # contract: two identical 3-token docs produce no 4-token window
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        docs = spark.createDataFrame(
            [(1, "x y z"), (2, "x y z"), (3, "")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in
               dedup_spans(docs, span_tokens=4).collect()}
        assert out[1]["text"] == "x y z" and out[1]["n_removed"] == 0
        assert out[3]["text"] == "" and out[3]["n_tokens"] == 0

    def test_min_docs_threshold_and_intradoc_repeat_kept(self, spark):
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        # doc 3's repeated passage lives twice in ONE doc -> distinct-doc
        # count is 1, nothing removed; min_docs=3 spares the 2-doc overlap
        # between docs 1 and 2 as well
        docs = spark.createDataFrame(
            [
                (1, "a b c d z1 z2 z3 z4"),
                (2, "a b c d e f g h"),
                (3, "q1 q2 q3 q4 q1 q2 q3 q4"),
            ],
            "doc_id long, text string",
        )
        out2 = {r["doc_id"]: r for r in
                dedup_spans(docs, span_tokens=4, min_docs=3).collect()}
        assert all(out2[i]["n_removed"] == 0 for i in (1, 2, 3))
        out3 = {r["doc_id"]: r for r in
                dedup_spans(docs, span_tokens=4, min_docs=2).collect()}
        assert out3[1]["text"] == "z1 z2 z3 z4" and out3[1]["n_removed"] == 4
        assert out3[2]["text"] == "e f g h"
        assert out3[3]["n_removed"] == 0  # intra-doc repeat is not cross-doc

    def test_xxhash64_fast_mode_matches_md5(self, spark):
        """The engine-fast mode (8-byte xxhash64 window keys, ~4x fewer
        shuffle bytes than 32-char md5 hex) must produce IDENTICAL output
        on real data — a 64-bit digest only diverges on a birthday
        collision (~2^32 distinct windows; sf0.001 has ~10^5)."""
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, dedup_spans(docs, span_tokens=8).collect()))
        b = sorted(map(tuple, dedup_spans(
            docs, span_tokens=8, hash_mode="xxhash64").collect()))
        assert a == b

    def test_bad_hash_mode_rejected(self, spark):
        from bigdata_lab02_spark.operators.dedup import dedup_spans

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            dedup_spans(docs, hash_mode="sha1")


class TestIncrementalMinhash:
    """r8 incremental dedup: a new shard against a PRECOMPUTED corpus
    band table — result equivalence with the batch path, and the
    bucketed-layout plan contract (corpus side never shuffles)."""

    def _split(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        return (docs.where(F.col("doc_id") % 4 != 0),
                docs.where(F.col("doc_id") % 4 == 0), docs)

    def test_matches_batch_cross_pairs(self, spark):
        corpus, new, docs = self._split(spark)
        bands = dd.minhash_band_table(
            dd.minhash_signatures(corpus, num_hashes=8, shingle_n=3),
            bands=4, rows_per_band=2,
        )
        inc = {
            frozenset((r["id_new"], r["id_old"])): round(r["jaccard"], 6)
            for r in dd.minhash_dedup_incremental(
                new, corpus, bands, num_hashes=8, shingle_n=3,
                bands=4, threshold=0.5,
            ).collect()
        }
        batch = {
            frozenset((r["id_a"], r["id_b"])): round(r["jaccard"], 6)
            for r in dd.minhash_dedup_pairs(
                docs, num_hashes=8, shingle_n=3, bands=4, threshold=0.5
            ).collect()
            if (r["id_a"] % 4 == 0) != (r["id_b"] % 4 == 0)  # cross pairs
        }
        assert inc == batch
        assert inc  # the sf0.001 corpus actually has cross-split dups

    def test_persist_corpus_bands_end_to_end(self, spark):
        """The one-call workflow setup: persist_corpus_bands writes the
        bucketed artifact, and incremental dedup over spark.table(...)
        matches the in-memory band-table path exactly."""
        corpus, new, _ = self._split(spark)
        dd.persist_corpus_bands(corpus, "corpus_bands_api")
        persisted = spark.table("corpus_bands_api")
        via_table = sorted(map(tuple, dd.minhash_dedup_incremental(
            new, corpus, persisted, threshold=0.5
        ).select("id_new", "id_old").collect()))
        fresh = dd.minhash_band_table(
            dd.minhash_signatures(corpus), bands=4, rows_per_band=2
        )
        via_fresh = sorted(map(tuple, dd.minhash_dedup_incremental(
            new, corpus, fresh, threshold=0.5
        ).select("id_new", "id_old").collect()))
        assert via_table == via_fresh and via_table

    def test_bucketed_band_table_join_shuffles_only_new_side(self, spark):
        """The 100 TB contract: with corpus_bands persisted bucketed on
        band_hash, the candidate join's ONLY exchange is on the (small)
        new-shard side — the corpus never re-shuffles per shard."""
        from bigdata_lab02_spark.plans import plan_report
        from bigdata_lab02_spark.sources.sinks import write_bucketed

        corpus, new, _ = self._split(spark)
        bands = dd.minhash_band_table(
            dd.minhash_signatures(corpus, num_hashes=8, shingle_n=3),
            bands=4, rows_per_band=2,
        )
        write_bucketed(bands, "corpus_bands_bkt", ["band_hash"], 8,
                       sort_cols=["band_hash"])
        persisted = spark.table("corpus_bands_bkt")
        new_bands = dd.minhash_band_table(
            dd.minhash_signatures(new, num_hashes=8, shingle_n=3),
            bands=4, rows_per_band=2,
        ).withColumnsRenamed({"doc_id": "id_new"})
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            cand = new_bands.select("id_new", "band_hash").join(
                persisted.withColumnsRenamed({"doc_id": "id_old"}).select(
                    "id_old", "band_hash"
                ),
                "band_hash",
            ).select("id_new", "id_old")
            r = plan_report(cand)
            # exactly the NEW side's two exchanges (its signature
            # aggregation + its repartition to the join key); the
            # bucketed corpus side satisfies the single-key band_hash
            # join via its buckets — a third exchange means the corpus
            # re-shuffled and the layout contract broke
            assert r.n_exchanges == 2, r.raw
            assert "corpus_bands_bkt" in r.raw
            assert cand.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestPersistedIvf:
    """r8 persisted-IVF workflow: corpus list assignment computed once,
    probes prune partitions at the scan."""

    @pytest.fixture(scope="class")
    def setup(self, spark, tmp_path_factory):
        emb = spark.read.parquet(f"{TESTDATA}/sf0.001/embeddings.parquet")
        cents = emb.where(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
        ).select(
            (F.col("vec_id") / 50).cast("int").alias("cluster_id"),
            F.col("embedding").alias("centroid"),
        )
        path = str(tmp_path_factory.mktemp("ivf") / "lists")
        sim.persist_ivf_lists(emb, cents, path)
        return emb, cents, path

    def test_matches_inline_ivf_topk(self, spark, setup):
        emb, cents, path = setup
        queries = emb.where(F.col("vec_id") < 10)
        got = sorted(
            (r["query_id"], r["neighbor_id"], round(r["cosine"], 6))
            for r in sim.ivf_topk_persisted(
                spark, path, queries, cents, k=5, nprobe=3
            ).collect()
        )
        want = sorted(
            (r["query_id"], r["neighbor_id"], round(r["cosine"], 6))
            for r in sim.ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
        )
        assert got == want and got

    def test_scan_prunes_to_probed_lists(self, spark, setup):
        """The layout contract: the corpus scan carries a list_id
        PartitionFilter (directory pruning — only probed lists are
        read), and list_id never degrades to a post-scan data filter."""
        import re

        from bigdata_lab02_spark.plans import plan_report

        emb, cents, path = setup
        queries = emb.where(F.col("vec_id") < 10)
        r = plan_report(
            sim.ivf_topk_persisted(spark, path, queries, cents, k=5, nprobe=3)
        )
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", r.raw)
        assert m and "list_id" in m.group(1), r.raw
        pf = re.findall(r"PushedFilters: \[([^\]]*)\]", r.raw)
        assert not any("list_id" in x for x in pf), r.raw


class TestIvfPq:
    """r13 composed IVF×PQ index (VERDICT r12 item 3): coarse lists
    prune which rows a query touches, PQ codes shrink what each row
    costs, exact re-rank restores precision — and the persisted layout
    must be invisible in the results (the ivf_topk_persisted
    convention)."""

    @pytest.fixture(scope="class")
    def setup(self, spark, tmp_path_factory):
        emb = spark.read.parquet(f"{TESTDATA}/sf0.001/embeddings.parquet")
        cents = emb.where(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
        ).select(
            (F.col("vec_id") / 50).cast("int").alias("cluster_id"),
            F.col("embedding").alias("centroid"),
        )
        cb = sim.pq_codebooks(emb, dim=64, m=8, ksub=16).localCheckpoint()
        path = str(tmp_path_factory.mktemp("ivfpq") / "lists")
        sim.persist_ivfpq_lists(emb, cents, cb, path, dim=64, m=8)
        return emb, cents, cb, path

    def test_index_rows_are_coded_and_single_list(self, spark, setup):
        emb, cents, cb, path = setup
        lists = spark.read.parquet(path)
        rows = lists.collect()
        assert len(rows) == emb.count()  # every vector indexed once
        assert all(len(r["codes"]) == 8 for r in rows)
        assert all(0 <= c < 16 for r in rows for c in r["codes"])
        # codes must MATCH the standalone encoder (one-pass build is a
        # pure composition, not a reimplementation drift)
        want = {
            r["vec_id"]: list(r["codes"])
            for r in sim.pq_encode(emb, cb, dim=64, m=8).collect()
        }
        assert all(list(r["codes"]) == want[r["vec_id"]] for r in rows)

    def test_persisted_matches_inline(self, spark, setup):
        emb, cents, cb, path = setup
        queries = emb.where(F.col("vec_id") < 10)
        for short in (None, 30):
            dcol = "adc_d2" if short is None else "d2"
            got = sorted(
                (r["query_id"], r["neighbor_id"], r[dcol], r["rank"])
                for r in sim.ivfpq_topk_persisted(
                    spark, path, queries, cents, cb, dim=64, m=8,
                    k=5, nprobe=3, shortlist=short, rerank_corpus=emb,
                ).collect()
            )
            want = sorted(
                (r["query_id"], r["neighbor_id"], r[dcol], r["rank"])
                for r in sim.ivfpq_topk(
                    emb, queries, cents, dim=64, m=8, ksub=16,
                    k=5, nprobe=3, shortlist=short,
                ).collect()
            )
            assert got == want and got, short

    def test_scan_prunes_to_probed_lists(self, spark, setup):
        """The layout contract: the coded-corpus scan carries a list_id
        PartitionFilter (directory pruning), never a post-scan data
        filter — each probe reads ~nprobe/nlist of the index, and each
        read row is m BYTES of codes."""
        import re

        from bigdata_lab02_spark.plans import plan_report

        emb, cents, cb, path = setup
        queries = emb.where(F.col("vec_id") < 10)
        r = plan_report(
            sim.ivfpq_topk_persisted(
                spark, path, queries, cents, cb, dim=64, m=8,
                k=5, nprobe=3,
            )
        )
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", r.raw)
        assert m and "list_id" in m.group(1), r.raw
        pf = re.findall(r"PushedFilters: \[([^\]]*)\]", r.raw)
        assert not any("list_id" in x for x in pf), r.raw

    def test_candidates_come_only_from_probed_lists(self, spark, setup):
        emb, cents, cb, path = setup
        queries = emb.where(F.col("vec_id") < 10)
        lists = {
            r["vec_id"]: r["list_id"]
            for r in spark.read.parquet(path).collect()
        }
        out = sim.ivfpq_topk(
            emb, queries, cents, dim=64, m=8, ksub=16, k=5, nprobe=3
        ).collect()
        cent_mu = sim._ivfpq_cent_array(cents, "cluster_id", "centroid")
        qmu = queries.select(
            F.col("vec_id"), sim._mu_array(F.col("embedding")).alias("mv")
        )
        probed = {}
        for r in sim._ivfpq_top_lists(qmu, cent_mu, 3, "vec_id").collect():
            probed.setdefault(r["vec_id"], set()).add(r["list_id"])
        assert out
        for r in out:
            assert lists[r["neighbor_id"]] in probed[r["query_id"]]

    def test_residual_beats_global_codebook_on_clustered_corpus(self, spark):
        """r13 by_residual (Jégou's deployed IVFADC): residual spread
        within a list is far smaller than raw-vector spread, so the
        same m·ksub budget buys finer cells — on a CLUSTERED corpus
        (where IVF is actually used) the residual ADC ranking must be
        measurably closer to exact than the global-codebook ADC.
        Deterministic fixture: 10 separated centers, ±0.25 noise."""
        import math

        def vec(i):
            c = i % 10
            return [
                round(
                    math.sin(0.7 * c * (j + 1)) * 5.0
                    + ((i * 2654435761 + j * 40503) % 2001 - 1000) / 4000.0,
                    6,
                )
                for j in range(64)
            ]

        emb = spark.createDataFrame(
            [(i, vec(i)) for i in range(500)],
            "vec_id long, embedding array<double>",
        )
        cents = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").cast("int").alias("cluster_id"),
            F.col("embedding").alias("centroid"),
        )
        q = emb.where(F.col("vec_id") >= 490)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.exact_l2_topk(emb, q, k=5).collect()
        }

        def recall(br):
            out = sim.ivfpq_topk(
                emb, q, cents, dim=64, m=8, ksub=16, k=5, nprobe=2,
                by_residual=br,
            ).collect()
            return sum(
                1 for r in out if (r["query_id"], r["neighbor_id"]) in exact
            ) / len(exact)

        r_glob, r_res = recall(False), recall(True)
        # measured 0.42 vs 0.64 on this fixture; pin the gap and a floor
        assert r_res > r_glob, (r_res, r_glob)
        assert r_res >= 0.55, r_res

    def test_residual_persisted_matches_inline(self, spark, setup, tmp_path):
        """A by_residual layout probed with by_residual=True must be
        invisible vs the inline residual path — the persistence contract
        extended to the r13 mode."""
        emb, cents, _, _ = setup
        res = sim._ivfpq_residuals(
            emb, cents, "vec_id", "embedding", "cluster_id", "centroid"
        )
        cb = sim.pq_codebooks(
            res, dim=64, m=8, ksub=16, vec_col="rv", pre_scaled=True
        ).localCheckpoint()
        path = str(tmp_path / "resid_lists")
        sim.persist_ivfpq_lists(
            emb, cents, cb, path, dim=64, m=8, by_residual=True
        )
        queries = emb.where(F.col("vec_id") < 10)
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["adc_d2"], r["rank"])
            for r in sim.ivfpq_topk_persisted(
                spark, path, queries, cents, cb, dim=64, m=8,
                k=5, nprobe=3, by_residual=True,
            ).collect()
        )
        want = sorted(
            (r["query_id"], r["neighbor_id"], r["adc_d2"], r["rank"])
            for r in sim.ivfpq_topk(
                emb, queries, cents, dim=64, m=8, ksub=16,
                k=5, nprobe=3, by_residual=True,
            ).collect()
        )
        assert got == want and got

    def test_corpus_lists_shared_residuals_match_internal(
        self, spark, setup
    ):
        """r16 optimization contract: ivfpq_corpus_lists(residuals=...)
        — the pinned-frame reuse path ivfpq_topk(by_residual=True) now
        takes — must produce exactly the rows of the internal
        derivation (the parameter is a plan-sharing lever, never a
        semantic one)."""
        emb, cents, _, _ = setup
        res = sim._ivfpq_residuals(
            emb, cents, "vec_id", "embedding", "cluster_id", "centroid"
        ).localCheckpoint()
        cb = sim.pq_codebooks(
            res, dim=64, m=8, ksub=16, vec_col="rv", pre_scaled=True
        ).localCheckpoint()

        def rows(residuals):
            return sorted(
                (r["vec_id"], r["list_id"], tuple(r["codes"]))
                for r in sim.ivfpq_corpus_lists(
                    emb, cents, cb, dim=64, m=8, by_residual=True,
                    residuals=residuals,
                ).collect()
            )

        shared, internal = rows(res), rows(None)
        assert shared == internal and shared

    def test_gate_recall_floor(self, spark):
        """The driver gate's per-row `hit` column (membership in the
        exact L2 top-5) must clear the IVF-pruning-bounded floor —
        ~0.5 measured at both test SFs with nprobe=3/shortlist=50."""
        import __spark_entry__ as e

        rows = e.queries()["ivfpq_topk"](
            spark, f"{TESTDATA}/sf0.001"
        ).collect()
        assert len(rows) == 50
        recall = sum(1 for r in rows if r["hit"]) / len(rows)
        assert recall >= 0.4, recall


def test_dedup_lines_ccnet_boilerplate(spark):
    """r11: cross-document line dedup — exact boilerplate, digit-variant
    boilerplate (normalized key), per-doc unique lines, below-min_chars
    lines, and ordered reassembly with original line text."""
    from bigdata_lab02_spark.operators.dedup import dedup_lines

    rows = [
        (1, "Subscribe now\nUnique prose one.\nVisitor count 123\n42"),
        (2, "Subscribe now\nDifferent unique text.\nVisitor count 99\n17"),
        (3, "All alone here.\nVisitor count 5"),
        (4, "Unique prose one.\nnothing shared otherwise"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    # exact + digit-normalized boilerplate removed everywhere
    # doc 1: banner + visitor-count + cross-doc 'Unique prose one.'
    # all removed; the digits-only '42' is never a dup key
    assert out[1]["text"] == "42"
    # doc 2's content line is genuinely unique -> survives in order
    assert out[2]["text"] == "Different unique text.\n17"
    assert out[3]["text"] == "All alone here."
    # 'Unique prose one.' occurs in docs 1 and 4 -> removed from both
    assert out[4]["text"] == "nothing shared otherwise"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 3
    assert out[3]["n_removed"] == 1   # its Visitor-count line
    # min_docs above the corpus max: nothing removed, text verbatim
    untouched = {
        r["doc_id"]: r for r in dedup_lines(df, min_docs=9).collect()
    }
    assert untouched[1]["text"] == rows[0][1]
    assert untouched[1]["n_removed"] == 0


def test_pq_topk_recall_and_compression(spark):
    """r12: product quantization — codebook shapes, m-byte codes, and
    ADC ranking quality: recall@5 vs the exact L2 brute force must
    clear a floor PQ comfortably achieves at these sizes, and a
    vector's OWN code must reconstruct closer to it than a random
    other vector's code (the compression actually preserves
    locality)."""
    import bigdata_lab02_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = sim.pq_codebooks(emb, dim=64, m=8, ksub=16)
    rows = cb.collect()
    assert len(rows) == 8 * 16
    assert all(len(r["cent"]) == 8 for r in rows)
    codes = sim.pq_encode(emb, cb, dim=64, m=8)
    crows = codes.collect()
    assert all(len(r["codes"]) == 8 for r in crows)
    assert all(0 <= c < 16 for r in crows for c in r["codes"])
    queries = emb.where(F.col("vec_id") < 10)
    # the deployed pattern: ADC shortlist + exact re-rank (plain ADC
    # top-5 recall is ~0.2 on this near-random corpus — quantization
    # noise, the reason re-ranking exists; shortlist-50 recovers it)
    approx = sim.pq_topk_rerank(
        emb, queries, dim=64, m=8, ksub=16, k=5, shortlist=50
    )
    got = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # exact L2 top-5 (micro-unit integer distances, same metric)
    from pyspark.sql import Window

    mu = sim._mu_array(F.col("embedding"))
    e = emb.select(F.col("vec_id"), mu.alias("v"))
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = sim._sq_dist_mu(F.col("v"), F.col("qv"))
    exact = (
        e.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
            ),
        )
        .where(F.col("rn") <= 5)
    )
    want = {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(got[qid] & want[qid]) / 5 for qid in want
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    # re-ranked distances are EXACT: the reranked top-1 per query must
    # be the true exact top-1 whenever the shortlist contains it
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in approx.collect()
        if r["rank"] == 1
    }
    exact1 = {
        r["query_id"]: r["neighbor_id"]
        for r in exact.collect()
        if r["rn"] == 1
    }
    agree = sum(top1[qid] == exact1[qid] for qid in exact1)
    assert agree >= 7, (top1, exact1)


class TestSemanticDedupIncremental:
    """r14 vector-tier increment: shard absorbed against the fixed
    quantizer + assignment table must equal a full rebuild — including
    the dropped-member suppression case (a new near-copy of a DROPPED
    old member must still be dropped)."""

    def _cents(self, spark):
        return spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
            "cluster_id int, centroid array<float>",
        )

    def test_increment_equals_rebuild(self, spark):
        old = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),     # cluster 0 survivor
                (1, [0.99, 0.14, 0.0]),   # near-dup of 0 -> DROPPED
                (2, [0.0, 1.0, 0.0]),     # cluster 1 survivor
            ],
            "vec_id long, embedding array<float>",
        )
        new = spark.createDataFrame(
            [
                (10, [0.99, 0.13, 0.0]),  # near 0 AND near dropped 1
                (11, [0.0, 0.98, 0.2]),   # near 2
                (12, [0.1, 0.0, 0.99]),   # assigned somewhere, unique
            ],
            "vec_id long, embedding array<float>",
        )
        cents = self._cents(spark)
        base = sim.semantic_dedup(old, cents, threshold=0.9)
        indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
        inc = sim.semantic_dedup_incremental(
            new, cents, indexed, threshold=0.9
        )
        got = {
            (r.vec_id, r.cluster_id, r.keep)
            for r in base.unionByName(inc).collect()
        }
        full = {
            (r.vec_id, r.cluster_id, r.keep)
            for r in sim.semantic_dedup(
                old.unionByName(new), cents, threshold=0.9
            ).collect()
        }
        assert got == full
        by_id = {v: k for v, _, k in got}
        assert by_id[1] is False and by_id[10] is False  # dropped-member
        assert by_id[11] is False and by_id[12] is True

    def test_dropped_member_still_suppresses(self, spark):
        # the reason `indexed` must carry dropped rows: 20 is near the
        # DROPPED 1 but farther from the survivor 0 — rebuild drops it,
        # and so must the increment
        old = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.436, 0.0])],
            "vec_id long, embedding array<float>",
        )
        new = spark.createDataFrame(
            [(20, [0.9, 0.44, 0.0])],
            "vec_id long, embedding array<float>",
        )
        cents = self._cents(spark)
        base = sim.semantic_dedup(old, cents, threshold=0.95)
        indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
        inc = sim.semantic_dedup_incremental(
            new, cents, indexed, threshold=0.95
        )
        (row,) = inc.collect()
        full = {
            r.vec_id: r.keep
            for r in sim.semantic_dedup(
                old.unionByName(new), cents, threshold=0.95
            ).collect()
        }
        assert row.keep == full[20] == False  # noqa: E712

    def test_empty_shard(self, spark):
        old = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
        new = spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
        cents = self._cents(spark)
        base = sim.semantic_dedup(old, cents, threshold=0.9)
        indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
        assert sim.semantic_dedup_incremental(
            new, cents, indexed, threshold=0.9
        ).count() == 0

    def test_persisted_layout_guard_and_equivalence(self, spark, tmp_path):
        # r15 (VERDICT r14 item 6): the persisted assignment layout
        # makes the append-only contract LOUD — an out-of-order shard
        # raises instead of silently diverging from a rebuild.
        path = str(tmp_path / "semidx")
        old = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),
                (1, [0.99, 0.14, 0.0]),   # dropped near-dup of 0
                (2, [0.0, 1.0, 0.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        new = spark.createDataFrame(
            [(10, [0.99, 0.13, 0.0]), (11, [0.0, 0.98, 0.2])],
            "vec_id long, embedding array<float>",
        )
        cents = self._cents(spark)
        base = sim.semantic_dedup(old, cents, threshold=0.9)
        indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
        sim.persist_semantic_assignments(indexed, path)
        st = sim.check_semantic_assignments(spark, path)
        assert st == {"journal": "committed", "max_id": 2, "n_rows": 3}

        inc = sim.update_semantic_assignments(
            new, cents, path, threshold=0.9
        )
        got = {
            (r.vec_id, r.cluster_id, r.keep)
            for r in base.unionByName(inc).collect()
        }
        full = {
            (r.vec_id, r.cluster_id, r.keep)
            for r in sim.semantic_dedup(
                old.unionByName(new), cents, threshold=0.9
            ).collect()
        }
        assert got == full
        st = sim.check_semantic_assignments(spark, path)
        assert st == {"journal": "committed", "max_id": 11, "n_rows": 5}

        # out-of-order shard: id 5 <= indexed max_id 11 -> loud failure
        stale = spark.createDataFrame(
            [(5, [0.5, 0.5, 0.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(Exception, match="append-only"):
            sim.update_semantic_assignments(
                stale, cents, path, threshold=0.9
            ).collect()
        # the failed update never journalled 'pending' (the guard fires
        # during the pre-append read) — layout still committed
        assert sim.check_semantic_assignments(spark, path)["n_rows"] == 5

    def test_persisted_layout_nondefault_columns(self, spark, tmp_path):
        # r16 (ADVICE): a layout persisted with non-default
        # cluster_col/vec_col is canonicalized on disk (cluster_id/v),
        # so update works regardless of the input column names.
        path = str(tmp_path / "semidx_cols")
        old = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),
                (1, [0.99, 0.14, 0.0]),
                (2, [0.0, 1.0, 0.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        cents = self._cents(spark)
        base = sim.semantic_dedup(old, cents, threshold=0.9)
        indexed = (
            base.select("vec_id", "cluster_id")
            .join(old, "vec_id")
            .withColumnRenamed("cluster_id", "grp")
            .withColumnRenamed("embedding", "emb")
        )
        sim.persist_semantic_assignments(
            indexed, path, cluster_col="grp", vec_col="emb"
        )
        new = spark.createDataFrame(
            [(10, [0.99, 0.13, 0.0])],
            "vec_id long, embedding array<float>",
        )
        inc = sim.update_semantic_assignments(new, cents, path, threshold=0.9)
        assert {r.vec_id for r in inc.collect()} == {10}
        assert sim.check_semantic_assignments(spark, path)["n_rows"] == 4

    def test_persisted_layout_empty_input(self, spark, tmp_path):
        # r16 (ADVICE): an empty persist writes max_id = -1 (not NULL),
        # and the first real shard absorbs cleanly through the guard.
        path = str(tmp_path / "semidx_empty")
        empty = spark.createDataFrame(
            [], "vec_id long, cluster_id long, embedding array<float>"
        )
        sim.persist_semantic_assignments(empty, path)
        st = sim.check_semantic_assignments(spark, path)
        assert st == {"journal": "committed", "max_id": -1, "n_rows": 0}
        cents = self._cents(spark)
        new = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
        inc = sim.update_semantic_assignments(new, cents, path, threshold=0.9)
        assert [(r.vec_id, r.keep) for r in inc.collect()] == [(0, True)]
        st = sim.check_semantic_assignments(spark, path)
        assert st == {"journal": "committed", "max_id": 0, "n_rows": 1}


def test_semantic_update_crash_leaves_pending(spark, tmp_path, monkeypatch):
    # r16: the semantic layout's crash window — a failure between the
    # assignments append and the journal flip reads as crashed.
    old = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cluster_id int, centroid array<float>",
    )
    path = str(tmp_path / "semidx_crash")
    base = sim.semantic_dedup(old, cents, threshold=0.9)
    indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
    sim.persist_semantic_assignments(indexed, path)
    assert sim.check_semantic_assignments(spark, path)["journal"] == "committed"

    new = spark.createDataFrame(
        [(7, [0.0, 0.99, 0.1])], "vec_id long, embedding array<float>"
    )
    df_cls = type(old)
    real_write = df_cls.write.fget

    class _Boom(Exception):
        pass

    calls = {"n": 0}

    def crashing_write(self):
        calls["n"] += 1
        if calls["n"] >= 2:  # pending journal is call 1; append is 2
            raise _Boom()
        return real_write(self)

    monkeypatch.setattr(df_cls, "write", property(crashing_write))
    with pytest.raises(_Boom):
        sim.update_semantic_assignments(new, cents, path, threshold=0.9)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="crashed mid-flight"):
        sim.check_semantic_assignments(spark, path)


def test_semantic_check_deep_catches_stats_skew(spark, tmp_path):
    # r16: deep probe recounts assignments/ vs the stats row.
    old = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cluster_id int, centroid array<float>",
    )
    path = str(tmp_path / "semidx_deep")
    base = sim.semantic_dedup(old, cents, threshold=0.9)
    indexed = base.select("vec_id", "cluster_id").join(old, "vec_id")
    sim.persist_semantic_assignments(indexed, path)
    st = sim.check_semantic_assignments(spark, path, deep=True)
    assert st["n_rows"] == 2
    # corrupt the stats row; only the deep probe can see it
    spark.range(1).select(
        F.lit(99).cast("long").alias("max_id"),
        F.lit(7).cast("long").alias("n_rows"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    sim.check_semantic_assignments(spark, path)  # journal-only: passes
    with pytest.raises(ValueError, match="corrupted"):
        sim.check_semantic_assignments(spark, path, deep=True)


def test_semantic_inc_shard_assignment_pinned(spark):
    """r17: semantic_dedup_incremental's shard assignment feeds three
    consumers (a-side union, b-side pair join, final keep join), so the
    operator pins it once — the compiled plan must contain the pinned
    scan and must NOT re-derive the shard-side assign fold per consumer
    (repeated_scans was 12 unpinned, 7 pinned at sf0.01)."""
    from bigdata_lab02_spark.plans import plan_report

    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [2.0, 1.0])],
        "cluster_id int, centroid array<double>",
    )
    indexed = sim.semantic_dedup(
        vecs.where("vec_id < 4"), cents, threshold=0.9
    ).select("vec_id", "cluster_id").join(
        vecs.where("vec_id < 4"), "vec_id"
    )
    out = sim.semantic_dedup_incremental(
        vecs.where("vec_id >= 4"), cents, indexed, threshold=0.9
    )
    r = plan_report(out)
    assert "Scan ExistingRDD" in r.raw, "shard assignment no longer pinned"


def test_minhash_shingled_reuse_seam_equivalent(spark):
    """r17: the shingled= reuse seam (one pinned shingle_stream shared
    by minhash_signatures and minhash_dedup_pairs, the pretrain layout
    build's shape) must reproduce the default path bit-for-bit."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "alpha beta gamma epsilon"), (4, "wholly different text here")],
        "doc_id long, text string",
    )
    shingled = dd.shingle_stream(docs).localCheckpoint()
    sig_a = dd.minhash_signatures(docs).collect()
    sig_b = dd.minhash_signatures(docs, shingled=shingled).collect()
    assert sorted(map(tuple, sig_a)) == sorted(map(tuple, sig_b))
    pairs_a = dd.minhash_dedup_pairs(docs, threshold=0.5).collect()
    pairs_b = dd.minhash_dedup_pairs(
        docs, threshold=0.5, shingled=shingled
    ).collect()
    assert sorted(map(tuple, pairs_a)) == sorted(map(tuple, pairs_b))
