"""Operator-exact golden tests for P8-P13.

Strategy: the end-to-end pipeline can't match golden TFIDF bit-for-bit
because reference quirk Q1 (count inflation) shifts filter thresholds, doc
totals, dfs and N upstream. But feeding the reference's OWN intermediate
files (its filtered matrix / TFIDF vectors / dictionaries) through our
operators must reproduce its downstream outputs exactly — which isolates
formula parity from the upstream bug.

Verified formula (reverse-engineered from Output1_4, see commit history):
  tfidf(t,d) = (cnt_f(t,d) / Σ_t cnt_f(·,d)) · ln(N_f / df_f(t))
with every quantity computed on the count>=3 filtered matrix and
N_f = 2,224 (docs surviving the filter).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators import category as cat_ops
from bigdata_lab02_spark.operators import matrix
from bigdata_lab02_spark.sources.delimited import read_coo_matrix, read_dictionary
from tests.conftest import GOLDEN


@pytest.fixture(scope="module")
def golden_filtered(spark):
    return read_coo_matrix(spark, f"{GOLDEN}/Output1_2/task_1_2.mtx-r-00000")


@pytest.fixture(scope="module")
def golden_tfidf_cells(spark):
    raw = spark.read.csv(
        f"{GOLDEN}/Output1_4/TFIDF.mtx-r-00000", sep="\t", schema="doc_id int, s string"
    )
    return raw.select(
        "doc_id",
        F.explode(F.str_to_map(F.col("s"), F.lit(","), F.lit(":"))).alias("tid", "w"),
    ).select(
        "doc_id",
        F.col("tid").cast("int").alias("term_id"),
        F.col("w").cast("double").alias("gw"),
    )


def test_tfidf_exact_on_golden_input(golden_filtered, golden_tfidf_cells):
    # The reference chains TF → IDF → TFIDF through %.4f TEXT FILES
    # (task1_4_1.java:119, task1_4_2.java:103), so its golden product is
    # round(tf,4)·round(idf,4). The engine computes exact doubles; we apply
    # the same quantization at the comparison boundary. 14 of 25,843 cells
    # sit on a rounding-mode boundary (Java HALF_UP vs double repr) —
    # tolerated below.
    mine = matrix.tfidf_matrix(golden_filtered).select(
        "doc_id",
        "term_id",
        (F.round("tf", 4) * F.round("idf", 4)).alias("tfidf_q"),
    )
    j = mine.join(golden_tfidf_cells, ["doc_id", "term_id"], "full_outer")
    stats = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("tfidf_q").isNull() | F.col("gw").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.when(F.abs(F.round(F.col("tfidf_q"), 4) - F.col("gw")) > 5.1e-5, 1).otherwise(0)).alias("off"),
    ).collect()[0]
    assert stats["n"] == 25843
    assert stats["missing"] == 0
    assert stats["off"] <= 20


def test_sparse_vectors_shape_on_golden_input(golden_filtered):
    vecs = matrix.to_sparse_vectors(matrix.tfidf_matrix(golden_filtered))
    assert vecs.count() == 2224  # one of 2,225 docs loses all terms at count>=3


def _parse_golden_ctfidf5(path):
    """'business:\\trossignol:3.8536, vw:4.4038, ...' → {(cat, term): val}"""
    out = {}
    with open(path, encoding="utf-8") as f:
        for ln in f:
            if not ln.strip():
                continue
            cat, items = ln.split("\t")
            cat = cat.rstrip(":")
            for item in items.strip().split(", "):
                term, val = item.rsplit(":", 1)
                out[(cat, term)] = float(val)
    return out


def test_category_top5_exact_on_golden_input(spark, golden_tfidf_cells):
    doc_dict = read_dictionary(
        spark, f"{GOLDEN}/Output1_1_2/docid.mtx-r-00000", "doc", "doc_id"
    )
    term_dict = read_dictionary(
        spark, f"{GOLDEN}/Output1_1_1/termid.mtx-r-00000", "term", "term_id"
    )
    tfidf = golden_tfidf_cells.withColumnRenamed("gw", "tfidf")
    ct = cat_ops.category_tfidf(tfidf, doc_dict, term_dict)
    # golden Output1_5 depends on quirk Q2 (value-keyed TreeMap collapses
    # ties) — use the strict-reference mode for exact parity
    top5 = cat_ops.category_top_terms(ct, 5, collapse_value_ties=True)
    # compare raw doubles at half-%.4f-ulp tolerance (Java's %.4f is
    # HALF_UP; Python round() is half-even — don't re-round)
    got = {(r["category"], r["term"]): r["ctfidf"] for r in top5.collect()}
    want = _parse_golden_ctfidf5(f"{GOLDEN}/Output1_5/cTFIDF_5.mtx-r-00000")
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert abs(got[k] - v) <= 5.1e-5, (k, got[k], v)
