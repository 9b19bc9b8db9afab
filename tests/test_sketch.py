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


# ------------------------------------------------- quantile registers


class TestQuantileRegisters:
    def _vals(self, spark, pairs):
        return spark.createDataFrame(pairs, "id long, value long")

    def test_masses_are_exact_counts(self, spark):
        df = self._vals(spark, [(i, (i * 37) % 500) for i in range(3000)])
        regs = sk.quantile_registers(df, n_buckets=8, k=16)
        assert regs.agg(F.sum("mass")).first()[0] == 3000
        # per bucket too: masses partition the bucket's rows exactly
        per = {r.bucket: r.s for r in
               regs.groupBy("bucket").agg(F.sum("mass").alias("s")).collect()}
        from pyspark.sql.functions import conv, substring, md5, col
        true = {r.bucket: r.c for r in df.select(
            (conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
             .cast("long") % 8).alias("bucket")
        ).groupBy("bucket").agg(F.count("*").alias("c")).collect()}
        assert per == true

    def test_rank_error_within_bound(self, spark):
        k = 32
        vals = [(i, (i * i * 131) % 100000) for i in range(8000)]
        df = self._vals(spark, vals)
        regs = sk.quantile_registers(df, n_buckets=8, k=k)
        qs = [0.1, 0.5, 0.9, 0.99, 1.0]
        est = {r.q_mu: r.est for r in
               sk.quantile_estimate(regs, qs).collect()}
        svals = sorted(v for _, v in vals)
        n = len(svals)
        import bisect
        for q in qs:
            e = est[int(round(q * 1e6))]
            lo = bisect.bisect_left(svals, e)
            hi = bisect.bisect_right(svals, e)
            err = min(abs(q * n - lo), abs(q * n - hi))
            assert err <= n / k + 1, (q, e, err, n / k)

    def test_merge_equals_rebuild_bound_and_mass(self, spark):
        k = 32
        vals = [(i, (i * 7919) % 1000) for i in range(4000)]
        df = self._vals(spark, vals)
        a = sk.quantile_registers(
            df.where(F.col("id") % 2 == 0), n_buckets=8, k=k)
        b = sk.quantile_registers(
            df.where(F.col("id") % 2 == 1), n_buckets=8, k=k)
        m = sk.merge_quantile_registers(a, b, k=k)
        assert m.agg(F.sum("mass")).first()[0] == 4000
        est = {r.q_mu: r.est for r in
               sk.quantile_estimate(m, [0.5, 0.9]).collect()}
        svals = sorted(v for _, v in vals)
        n = len(svals)
        import bisect
        for q in (0.5, 0.9):
            e = est[int(q * 1e6)]
            lo = bisect.bisect_left(svals, e)
            hi = bisect.bisect_right(svals, e)
            err = min(abs(q * n - lo), abs(q * n - hi))
            assert err <= 2 * n / k + 1, (q, e, err)  # one merge: 2/k

    def test_small_buckets_keep_every_row(self, spark):
        # n_b <= k: the registers ARE the data; estimates are exact
        df = self._vals(spark, [(i, i * 10) for i in range(20)])
        regs = sk.quantile_registers(df, n_buckets=4, k=64)
        assert regs.count() == 20
        assert {r.mass for r in regs.collect()} == {1}
        est = {r.q_mu: r.est for r in
               sk.quantile_estimate(regs, [0.5, 1.0]).collect()}
        assert est[1000000] == 190      # max
        assert est[500000] == 90        # exact median (rank 10 of 20)

    def test_deterministic_across_runs(self, spark):
        df = self._vals(spark, [(i, (i * 13) % 97) for i in range(500)])
        r1 = sorted(map(tuple, sk.quantile_registers(df, n_buckets=8, k=8)
                        .collect()))
        r2 = sorted(map(tuple, sk.quantile_registers(
            df.repartition(13), n_buckets=8, k=8).collect()))
        assert r1 == r2  # registers are a pure function of the data

    def test_validation(self, spark):
        df = self._vals(spark, [(1, 1)])
        with pytest.raises(ValueError, match="positive"):
            sk.quantile_registers(df, n_buckets=0)
        regs = sk.quantile_registers(df)
        with pytest.raises(ValueError, match="qs must be"):
            sk.quantile_estimate(regs, [0.0, 0.5])
        with pytest.raises(ValueError, match="fanout"):
            sk.quantile_registers_twolevel(df, fanout=0)

    def test_twolevel_bucket_space_and_mass(self, spark):
        # r15 scale seam: the two-level build must keep the DIRECT
        # scheme's bucket space (sub mod n_buckets == md5 mod n_buckets)
        # and partition every bucket's rows exactly.
        df = self._vals(spark, [(i, (i * 37) % 500) for i in range(3000)])
        direct = sk.quantile_registers(df, n_buckets=8, k=16)
        two = sk.quantile_registers_twolevel(df, n_buckets=8, k=16, fanout=4)
        d_mass = {r.bucket: r.s for r in direct.groupBy("bucket")
                  .agg(F.sum("mass").alias("s")).collect()}
        t_mass = {r.bucket: r.s for r in two.groupBy("bucket")
                  .agg(F.sum("mass").alias("s")).collect()}
        assert d_mass == t_mass
        assert two.agg(F.sum("mass")).first()[0] == 3000

    def test_twolevel_rank_error_within_2k_bound(self, spark):
        k = 32
        vals = [(i, (i * i * 131) % 100000) for i in range(8000)]
        df = self._vals(spark, vals)
        regs = sk.quantile_registers_twolevel(
            df, n_buckets=8, k=k, fanout=8)
        qs = [0.1, 0.5, 0.9, 1.0]
        est = {r.q_mu: r.est for r in
               sk.quantile_estimate(regs, qs).collect()}
        svals = sorted(v for _, v in vals)
        n = len(svals)
        import bisect
        for q in qs:
            e = est[int(round(q * 1e6))]
            lo = bisect.bisect_left(svals, e)
            hi = bisect.bisect_right(svals, e)
            err = min(abs(q * n - lo), abs(q * n - hi))
            assert err <= 2 * n / k + 1, (q, e, err)  # two levels: 2/k

    def test_twolevel_deterministic(self, spark):
        df = self._vals(spark, [(i, (i * 13) % 97) for i in range(500)])
        r1 = sorted(map(tuple, sk.quantile_registers_twolevel(
            df, n_buckets=8, k=8, fanout=4).collect()))
        r2 = sorted(map(tuple, sk.quantile_registers_twolevel(
            df.repartition(13), n_buckets=8, k=8, fanout=4).collect()))
        assert r1 == r2
