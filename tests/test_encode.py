"""P2-P5 unit tests: stopword filter, dense-id dictionaries, doc-term counts."""

from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokenize
from bigdata_lab02_spark.operators import encode
from tests.conftest import TINY_STOPWORDS


def _tokens(tiny_corpus):
    return encode.stopword_filter(tokenize(tiny_corpus), TINY_STOPWORDS)


def test_stopword_filter(tiny_corpus):
    toks = _tokens(tiny_corpus)
    present = {r["token"] for r in toks.select("token").distinct().collect()}
    assert present.isdisjoint(set(TINY_STOPWORDS))
    assert "spark" in present


def test_dense_ids_sorted_dense(tiny_corpus):
    toks = _tokens(tiny_corpus)
    d = encode.build_term_dict(toks).collect()
    terms = sorted({r["token"] for r in toks.collect()})
    got = {r["term"]: r["term_id"] for r in d}
    assert got == {t: i + 1 for i, t in enumerate(terms)}  # dense, 1-based, sorted


def test_dense_ids_scalable_matches_window(tiny_corpus):
    toks = _tokens(tiny_corpus)
    a = {(r["term"], r["term_id"]) for r in encode.build_term_dict(toks).collect()}
    b = {
        (r["term"], r["term_id"])
        for r in encode.build_term_dict(toks, scalable=True).collect()
    }
    assert a == b


def test_doc_term_counts(tiny_corpus):
    toks = _tokens(tiny_corpus)
    td, dd = encode.build_term_dict(toks), encode.build_doc_dict(tiny_corpus)
    coo = encode.doc_term_counts(toks, td, dd)
    tid = {r["term"]: r["term_id"] for r in td.collect()}
    did = {r["doc"]: r["doc_id"] for r in dd.collect()}
    cells = {(r["doc_id"], r["term_id"]): r["count"] for r in coo.collect()}
    assert cells[(did["biz.d3"], tid["spark"])] == 3
    assert cells[(did["biz.d1"], tid["money"])] == 3  # case-folded + punct-stripped
    assert cells[(did["tech.d1"], tid["fast"])] == 2
    # every doc contains 'spark' exactly once except biz.d3 (3x)
    spark_cells = {k: v for k, v in cells.items() if k[1] == tid["spark"]}
    assert len(spark_cells) == 6 and sum(spark_cells.values()) == 8
