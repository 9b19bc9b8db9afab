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


def test_language_id_stopword(spark):
    out = {r["doc_id"]: r["pred_lang"]
           for r in ts.language_id_stopword(_docs(spark)).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[4] == "und"  # empty text → undetermined


def test_language_id_trigram_heldout_floor(spark):
    """The real classifier (hashed char-trigram NB, VERDICT r6 item 5):
    train on the labeled 3/4 seed split of the gate's 5-language
    multi-script fixture, measure accuracy on the HELD-OUT quarter
    (docs the model never saw). Wordlists are fully disjoint between
    languages, so the floor is strict."""
    import __spark_entry__ as e

    corpus = e._lid_corpus(spark)
    seed = corpus.where(F.col("doc_id") % 4 != 0)
    pred = ts.language_id(corpus, seed, n_buckets=4096)
    rows = (
        corpus.where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "lang")
        .join(pred, "doc_id")
        .collect()
    )
    assert len(rows) == e._LID_N // 4
    acc = sum(r["lang"] == r["pred_lang"] for r in rows) / len(rows)
    assert acc >= 0.9, acc


def test_language_id_trigram_deterministic_and_scored(spark):
    """Same seed → identical predictions and integer scores; every doc
    gets exactly one row."""
    import __spark_entry__ as e

    corpus = e._lid_corpus(spark)
    seed = corpus.where(F.col("doc_id") % 4 != 0)
    a = sorted(map(tuple, ts.language_id(corpus, seed).collect()))
    b = sorted(map(tuple, ts.language_id(corpus, seed).collect()))
    assert a == b
    assert len(a) == e._LID_N
    assert all(isinstance(t[2], int) for t in a)  # micro-unit long scores


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
