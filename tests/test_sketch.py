"""Portable Count-Min / HyperLogLog sketch semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators import sketch as sk


class TestCountMin:
    def test_estimate_never_undercounts_and_heavy_hitters_rank(self, spark):
        rows = [(i, "alpha " * 50 + "beta " * 10 + f"rare{i}") for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("item"))
        out = sk.cms_heavy_hitters(toks, k=5).collect()
        assert out[0]["item"] == "alpha" and out[0]["exact"] == 1000
        by_item = {r["item"]: r for r in out}
        assert by_item["beta"]["exact"] == 200
        for r in out:
            assert r["est"] >= r["exact"], r

    def test_exact_when_width_exceeds_vocab(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string"
        )
        toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("item"))
        out = {r["item"]: r for r in
               sk.cms_heavy_hitters(toks, k=10, width=4096).collect()}
        # essentially collision-free -> estimates equal exact counts
        assert out["a"]["est"] == out["a"]["exact"] == 3
        assert out["b"]["est"] == 2 and out["c"]["est"] == 1

    def test_candidate_mode_matches_exhaustive(self, spark):
        """Profiling-scale candidate point-querying (r6): when the
        candidate set contains the true top-k, the result is identical to
        the exhaustive pass — same items, same est, same exact."""
        rows = [(i, "alpha " * 30 + "beta " * 10 + "gamma " * 5 + f"rare{i}")
                for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("item"))
        full = sk.cms_heavy_hitters(toks, k=3).collect()
        cand = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",), ("rare0",), ("rare7",)],
            "item string",
        )
        scoped = sk.cms_heavy_hitters(toks, k=3, candidates=cand).collect()
        assert [tuple(r) for r in scoped] == [tuple(r) for r in full]
        # a candidate set missing the top item honestly reports only its own
        nope = sk.cms_heavy_hitters(
            toks, k=3,
            candidates=spark.createDataFrame([("beta",)], "item string"),
        ).collect()
        assert [r["item"] for r in nope] == ["beta"]

    def test_sketch_size_bounded(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2}") for i in range(200)],
            "doc_id long, text string",
        )
        toks = docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("item")
        )
        assert sk.cms_sketch(toks, depth=4, width=64).count() <= 4 * 64


class TestHyperLogLog:
    def test_estimate_within_standard_error(self, spark):
        n = 5000
        items = spark.range(n).select(
            F.concat(F.lit("item-"), F.col("id")).alias("item")
        )
        est = sk.hll_distinct(items, p=9).collect()[0]
        # standard error ~1.04/sqrt(512) = 4.6%; allow 4 sigma
        assert abs(est["estimate"] - n) / n < 0.2
        assert est["m"] == 512

    def test_small_range_linear_counting(self, spark):
        items = spark.range(30).select(
            F.concat(F.lit("x"), F.col("id")).alias("item")
        )
        est = sk.hll_distinct(items, p=9).collect()[0]
        # linear counting regime: near-exact for tiny cardinalities
        assert abs(est["estimate"] - 30) <= 2
        assert est["n_used_buckets"] <= 30

    def test_deterministic_and_duplicate_insensitive(self, spark):
        a = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("item"))
        dup = a.union(a).union(a)
        ea = sk.hll_distinct(a, p=9).collect()[0]["estimate"]
        ed = sk.hll_distinct(dup, p=9).collect()[0]["estimate"]
        assert ea == ed

    def test_p_validated(self, spark):
        items = spark.range(3).select(F.col("id").cast("string").alias("item"))
        with pytest.raises(ValueError):
            sk.hll_distinct(items, p=4)

    def test_empty_stream_estimates_zero(self, spark):
        """ADVICE r5: zero registers must linear-count to 0.0, not NULL."""
        items = spark.range(0).select(F.col("id").cast("string").alias("item"))
        est = sk.hll_distinct(items, p=9).collect()[0]
        assert est["estimate"] == 0.0
        assert est["n_used_buckets"] == 0
