"""P6-P11 unit tests on a hand-computed COO fixture (FIXTURES.md §2.2)."""

import math

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators import matrix

# docs: 1..3; terms: 1..4. Hand-checkable.
COO = [
    (1, 1, 4), (1, 2, 1), (1, 3, 5),
    (2, 1, 2), (2, 2, 8),
    (3, 3, 3), (3, 4, 7),
]


@pytest.fixture(scope="module")
def coo(spark):
    return spark.createDataFrame(COO, "doc_id int, term_id int, count long")


def test_frequency_filter(coo):
    kept = matrix.frequency_filter(coo, 3).collect()
    assert {(r["doc_id"], r["term_id"]) for r in kept} == {(1, 1), (1, 3), (2, 2), (3, 3), (3, 4)}


def test_top_terms(coo):
    top = matrix.top_terms(coo, 2).collect()
    assert [(r["term_id"], r["total"]) for r in top] == [(2, 9), (3, 8)]


def test_top_terms_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (1, 11, 5), (1, 12, 5)], "doc_id int, term_id int, count long"
    )
    top = matrix.top_terms(df, 2).collect()
    assert [r["term_id"] for r in top] == [10, 11]  # ties kept, id-ordered


def test_tf_sums_to_one_per_doc(coo):
    tf = matrix.term_frequency(coo)
    sums = tf.groupBy("doc_id").agg(F.sum("tf").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-12
    vals = {(r["doc_id"], r["term_id"]): r["tf"] for r in tf.collect()}
    assert vals[(1, 1)] == 4 / 10
    assert vals[(2, 2)] == 8 / 10


def test_idf(coo):
    idf = matrix.inverse_doc_frequency(coo)  # N = 3 docs
    vals = {r["term_id"]: (r["df"], r["idf"]) for r in idf.collect()}
    assert vals[1][0] == 2 and abs(vals[1][1] - math.log(3 / 2)) < 1e-12
    assert vals[4][0] == 1 and abs(vals[4][1] - math.log(3)) < 1e-12
    assert all(v[1] >= 0 for v in vals.values())  # idf >= 0 always (df <= N)


def test_tfidf_product(coo):
    out = matrix.tfidf_matrix(coo)
    vals = {(r["doc_id"], r["term_id"]): r["tfidf"] for r in out.collect()}
    assert abs(vals[(1, 1)] - (4 / 10) * math.log(3 / 2)) < 1e-12
    # term 3 appears in docs 1 and 3 → idf = ln(3/2)
    assert abs(vals[(3, 3)] - (3 / 10) * math.log(3 / 2)) < 1e-12


def test_to_sparse_vectors(coo):
    vecs = matrix.to_sparse_vectors(matrix.tfidf_matrix(coo)).collect()
    assert len(vecs) == 3
    by_doc = {r["doc_id"]: r["vec"] for r in vecs}
    assert set(by_doc[1].keys()) == {1, 2, 3}
    assert abs(by_doc[2][2] - (8 / 10) * math.log(3 / 2)) < 1e-12
