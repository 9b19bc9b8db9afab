"""textstats operator tests (language id, quality, token stats, fingerprint)."""

import pytest
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


def test_fingerprint_hash_modes_agree(spark):
    """A/B binding the xxhash64 fast path to the gated md5 default
    (VERDICT r7 item 2, the dedup_spans discipline). Equality
    PARTITIONS can't be compared directly across modes — the
    fingerprint is 1-permutation MinHash, so which near-dup pairs
    collide depends on the hash function (only P[collide] = Jaccard is
    invariant). What IS invariant, and what we bind:

    1. both modes equal an INDEPENDENT restatement of the definition
       (explode shingles → hash → per-doc min via groupBy), on the real
       sf0.001 documents corpus;
    2. docs with identical shingle sets share a fingerprint in BOTH
       modes (the exact-dup contract)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    from bigdata_lab02_spark.operators.dedup import shingles

    for mode, digest in (("md5", F.md5), ("xxhash64", F.xxhash64)):
        got = {r["doc_id"]: r["fingerprint"]
               for r in ts.fingerprint(docs, hash_mode=mode).collect()}
        want = {
            r["doc_id"]: r["fp"]
            for r in docs.select(
                "doc_id", F.explode(shingles(F.col("text"), 5)).alias("sh")
            )
            .groupBy("doc_id")
            .agg(F.min(digest(F.col("sh"))).alias("fp"))
            .collect()
        }
        assert got == want, mode
        # exact-dup contract: same text → same fingerprint, either mode
        sets = {r["doc_id"]: r["text"] for r in docs.collect()}
        by_text = {}
        for d, t in sets.items():
            by_text.setdefault(t, []).append(d)
        for same in by_text.values():
            assert len({got[d] for d in same}) == 1

    import pytest

    with pytest.raises(ValueError):
        ts.fingerprint(docs, hash_mode="sha1")


# ------------------------------------------------- Gopher rule verdicts (r8)


def test_gopher_rules_hand_computed(spark):
    from bigdata_lab02_spark.operators.textstats import gopher_rules

    good = "the quick brown fox jumps over that lazy dog and then it " * 5
    rows = [
        (1, good),                                   # passes everything
        (2, "short doc of the and"),                 # word count < 50
        (3, good + " " + "# " * 20),                 # symbol spam
        (4, ("- b\n" * 19) + good),                  # 19/20 bullet lines
        (5, good + ("\nread more..." * 9)),          # 9/10 ellipsis lines
        (6, ("42 " * 300) + good),                   # numeric flood
        (7, ""),                                     # degenerate empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}

    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 60
    assert out[1]["n_stop_hits"] >= 2

    assert out[2]["rule_word_count"] is False and out[2]["keep"] is False
    assert out[2]["n_words"] == 5

    assert out[3]["rule_symbol_ratio"] is False
    assert out[3]["symbol_ratio"] == pytest.approx(20 / 80)

    assert out[4]["rule_bullet_lines"] is False
    assert out[4]["bullet_line_frac"] == pytest.approx(19 / 20)

    assert out[5]["rule_ellipsis_lines"] is False
    assert out[5]["ellipsis_line_frac"] == pytest.approx(9 / 10)

    assert out[6]["rule_alpha_words"] is False
    assert out[6]["alpha_word_frac"] == pytest.approx(60 / 360)

    assert out[7]["n_words"] == 0 and out[7]["keep"] is False
    assert out[7]["mean_word_len"] == 0.0


def test_gopher_rules_mean_word_len_bounds(spark):
    from bigdata_lab02_spark.operators.textstats import gopher_rules

    # 60 one-char words -> mean 1.0 < 3; 60 twelve-char words -> mean 12 > 10
    tiny = ("a " * 60).strip()
    huge = ("abcdefghijkl " * 60).strip()
    df = spark.createDataFrame(
        [(1, tiny), (2, huge)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["mean_word_len"] == 1.0
    assert out[1]["rule_mean_word_len"] is False
    assert out[2]["mean_word_len"] == 12.0
    assert out[2]["rule_mean_word_len"] is False
