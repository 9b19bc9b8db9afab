"""textstats operator tests (language id, quality, token stats, fingerprint)."""

from pyspark.sql import functions as F

from bigdata_lab02_spark.operators import textstats as ts


def _docs(spark):
    rows = [
        (1, "The cat and the dog played in the garden, and it was sunny."),
        (2, "el gato y el perro en la casa de los abuelos que viven lejos"),
        (3, "x" * 5 + "!!! ??? ###"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_language_id(spark):
    out = {r["doc_id"]: r["pred_lang"] for r in ts.language_id(_docs(spark)).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[4] == "und"  # empty text → undetermined


def test_quality_score_bounds_and_ordering(spark):
    out = {r["doc_id"]: r["quality_score"] for r in ts.quality_score(_docs(spark)).collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    # prose beats punctuation soup beats empty
    assert out[1] > out[3] >= out[4]


def test_token_stats(spark):
    out = {r["doc_id"]: r for r in ts.token_stats(_docs(spark)).collect()}
    assert out[1]["n_tokens"] == 13
    assert out[1]["n_distinct_tokens"] < out[1]["n_tokens"]  # 'the'/'and' repeat
    assert out[4]["n_tokens"] == 0 and out[4]["mean_token_len"] == 0.0
    assert out[1]["n_bpe_tokens"] >= out[1]["n_ws_tokens"]  # punct splits add pieces


def test_fingerprint_deterministic_and_discriminative(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["fingerprint"] for r in ts.fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in ts.fingerprint(docs).collect()}
    assert a == b
    assert a[1] != a[2]  # different content → different fingerprints
