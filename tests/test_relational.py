"""Relational-suite scale-mode tests (VERDICT r6 item 1).

The exact ``percentile`` aggregate is the gate/oracle form; the
``percentile_approx`` flag is the 100 TB form. These tests pin the two
modes together at gate scale so the scale path can't silently drift.
"""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


class TestPricePercentileModes:
    def test_approx_mode_agrees_at_gate_scale(self, spark):
        """percentile_approx at accuracy 10000 is rank-exact at sf0.001
        (lineitem ≪ 10000 rows per flag group after compression), but it
        returns a data value while exact interpolates — so each approx
        percentile must land within one inter-value gap of the exact
        one. We assert relative error < 0.5% per (flag, percentile)."""
        exact = {
            r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
            for r in entry.q_price_percentiles(spark, SF).collect()
        }
        approx = {
            r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
            for r in entry.q_price_percentiles(spark, SF, approx=True).collect()
        }
        assert set(exact) == set(approx)
        for flag in exact:
            for e, a in zip(exact[flag], approx[flag]):
                assert abs(a - e) <= 0.005 * abs(e), (flag, e, a)

    def test_approx_mode_is_data_valued(self, spark):
        """The approx path must actually be percentile_approx (returns an
        element of the input), not a renamed exact percentile: every
        approx output value must be an actual l_extendedprice value."""
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        prices = {round(r["l_extendedprice"], 4) for r in li.select("l_extendedprice").collect()}
        for r in entry.q_price_percentiles(spark, SF, approx=True).collect():
            for c in ("p50", "p90", "p99"):
                assert r[c] in prices, (r["l_returnflag"], c, r[c])
