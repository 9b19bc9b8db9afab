"""Golden end-to-end tests: our pipeline vs the reference's checked-in
outputs on the real BBC corpus (SURVEY.md §5).

Parity policy (SURVEY.md appendix): we implement the CORRECT semantics and
bound the reference's known bug rather than replicate it. Quirk Q1
(task1_1.java:155-158: a failed dictionary lookup re-emits the previous key)
inflates some golden counts; measured delta at HEAD: +3,462 occurrences over
3,275 of 331,417 cells, golden never lower, identical nonzero structure.

Also corrected from SURVEY §3.1: golden Output1_3 (top-10) is computed from
the count>=3 FILTERED matrix (its values equal Output1_2 sums), not the raw
COO.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.pipeline import bbc_pipeline
from tests.conftest import BBC_INPUT, GOLDEN, STOPWORDS


@pytest.fixture(scope="module")
def bbc(spark):
    return bbc_pipeline(spark, BBC_INPUT, STOPWORDS)


def _golden_lines(path):
    with open(path, encoding="utf-8", errors="replace") as f:
        return [ln.rstrip("\n") for ln in f if ln.strip()]


def test_golden_doc_dict(bbc):
    golden = _golden_lines(f"{GOLDEN}/Output1_1_2/docid.mtx-r-00000")
    want = {tuple(ln.split("\t")) for ln in golden}
    got = {(r["doc"], str(r["doc_id"])) for r in bbc.doc_dict().collect()}
    assert got == want  # 2,225 docs, ids dense in sorted order


def test_golden_term_dict(bbc):
    golden = _golden_lines(f"{GOLDEN}/Output1_1_1/termid.mtx-r-00000")
    want = {tuple(ln.split("\t")) for ln in golden}
    got = {(r["term"], str(r["term_id"])) for r in bbc.term_dict().collect()}
    assert got == want  # 33,988 terms


def test_golden_coo_structure_and_q1_bound(bbc, spark):
    golden = spark.read.csv(
        f"{GOLDEN}/Output1_1/task_1_1.mtx-r-00000",
        sep="\t",
        schema="doc_id int, term_id int, gcount long",
    )
    mine = bbc.doc_term_matrix()
    j = mine.join(golden, ["doc_id", "term_id"], "full_outer")
    stats = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("count").isNull() | F.col("gcount").isNull(), 1).otherwise(0)).alias("structure_diff"),
        F.sum(F.when(F.col("gcount") < F.col("count"), 1).otherwise(0)).alias("golden_lower"),
        F.sum(F.col("gcount") - F.col("count")).alias("inflation"),
    ).collect()[0]
    assert stats["n"] == 331417
    assert stats["structure_diff"] == 0  # identical nonzero structure
    assert stats["golden_lower"] == 0  # Q1 only ever inflates golden
    assert 0 <= stats["inflation"] <= 4000  # measured 3,462


def test_golden_coo_exact_strict_mode(bbc, spark):
    """Strict-reference Q1 mode (encode.doc_term_counts_strict) reproduces
    golden Output1_1 EXACTLY — every one of the 331,417 cells, including
    the +3,462 stale-key inflation the default mode corrects."""
    from bigdata_lab02_spark.operators import encode
    from bigdata_lab02_spark.pipeline import load_stopwords
    from bigdata_lab02_spark.sources.corpus import read_corpus_whole

    corpus = read_corpus_whole(spark, BBC_INPUT)
    sw = load_stopwords(spark, STOPWORDS)
    mine = encode.doc_term_counts_strict(corpus, sw, bbc.term_dict(), bbc.doc_dict())
    golden = spark.read.csv(
        f"{GOLDEN}/Output1_1/task_1_1.mtx-r-00000",
        sep="\t",
        schema="doc_id int, term_id int, gcount long",
    )
    j = mine.join(golden, ["doc_id", "term_id"], "full_outer")
    bad = j.where(
        F.col("count").isNull()
        | F.col("gcount").isNull()
        | (F.col("count") != F.col("gcount"))
    ).count()
    assert bad == 0
    assert mine.count() == 331417


def test_golden_top10_terms(bbc):
    golden = [
        tuple(map(int, ln.split("\t")))
        for ln in _golden_lines(f"{GOLDEN}/Output1_3/task_1_3.mtx-r-00000")
    ]
    got = [(r["term_id"], r["total"]) for r in bbc.top_terms(10).collect()]
    got_ids = {t for t, _ in got}
    golden_ids = {t for t, _ in golden}
    # Q1 inflation can reorder the tail; require >=8/10 overlap and the
    # same #1 term, and every count within the inflation bound.
    assert len(got_ids & golden_ids) >= 8
    assert got[0][0] == max(golden, key=lambda x: x[1])[0]
    gmap = dict(golden)
    for tid, total in got:
        if tid in gmap:
            assert 0 <= gmap[tid] - total <= 60
