"""operators/bpe: corpus-trained BPE merges + tokenization."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_lab02_spark.operators import bpe


def _toy(spark):
    # the canonical Sennrich 2016 toy corpus
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_sennrich_toy_merges(spark):
    merges = bpe.train_bpe(_toy(spark), num_merges=5)
    assert merges == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]


def test_tie_break_is_lexicographic(spark):
    # after 5 merges, newest = n e w est</w>: pairs (n,e)/(e,w)/(w,est</w>)
    # all count 6 — the deterministic winner is the lexicographically
    # smallest pair
    merges = bpe.train_bpe(_toy(spark), num_merges=6)
    assert merges[5] == ("e", "w", 6)


def test_tokenization_matches_hand_count(spark):
    df = _toy(spark)
    merges = bpe.train_bpe(df, num_merges=6)
    row = bpe.bpe_token_stats(df, merges).collect()[0]
    # low -> [low,</w>]x5 =10; lower -> [low,e,r,</w>]x2 =8;
    # newest -> [n,ew,est</w>]x6 =18; widest -> [w,i,d,est</w>]x3 =12
    assert row["n_tokens"] == 48


def test_merges_never_cross_word_boundaries(spark):
    # "ab ba" repeated: every candidate pair lives INSIDE a word. A
    # cross-boundary merge would pair a word-final symbol (ending in
    # </w>) with the NEXT word's first symbol — i.e. a LEFT side ending
    # in the marker. (</w> on the RIGHT is legitimate: word-final
    # merges like (a, </w>) are standard BPE.)
    df = spark.createDataFrame([(1, "ab ba " * 10)], "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=4)
    assert merges == [
        ("a", "</w>", 10),   # ties at 10 break lexicographically
        ("a", "b", 10),
        ("ab", "</w>", 10),
        ("b", "a</w>", 10),
    ]
    for left, _, _ in merges:
        assert not left.endswith("</w>")  # nothing merged ACROSS words


def test_repeated_symbol_greedy_left(spark):
    # "aaa": (a,a) appears twice overlapping; greedy left-to-right
    # merges positions 1-2 leaving the third alone: [aa, a, </w>]
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=1)
    assert merges[0][:2] == ("a", "a")
    row = bpe.bpe_token_stats(df, merges).collect()[0]
    assert row["n_tokens"] == 3


def test_determinism_across_runs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = bpe.train_bpe(docs, num_merges=8)
    b = bpe.train_bpe(docs, num_merges=8)
    assert a == b and len(a) == 8
    sa = sorted(map(tuple, bpe.bpe_token_stats(docs, a).collect()))
    sb = sorted(map(tuple, bpe.bpe_token_stats(docs, b).collect()))
    assert sa == sb


def test_tokenization_zero_shuffle(spark):
    from bigdata_lab02_spark.plans import plan_report

    df = _toy(spark)
    merges = bpe.train_bpe(df, num_merges=4)
    r = plan_report(bpe.bpe_token_stats(df, merges))
    assert r.n_exchanges == 0, r.raw


def test_more_merges_never_increase_tokens(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m12 = bpe.train_bpe(docs, num_merges=12)
    short = (
        bpe.bpe_token_stats(docs, m12[:4])
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    full = (
        bpe.bpe_token_stats(docs, m12)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert full < short


def test_tokenization_is_lossless(spark):
    """BPE is a segmentation, never a rewrite: stripping the </w>
    markers and concatenating the tokens must reproduce the
    whitespace-normalized text exactly, at every merge depth."""
    from bigdata_lab02_spark.operators.bpe import (
        apply_merges,
        text_symbols,
        train_bpe,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aaa aa a  aaa"),
        (3, "punct, here! and?  spaced   out"),
        (4, "unicode ¡café über déjà-vu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=12)
    sym = apply_merges(text_symbols(F.col("text")), merges)
    toks = F.split(F.trim(sym), "  +")
    rebuilt = F.replace(
        F.array_join(toks, ""), F.lit("</w>"), F.lit(" ")
    )
    out = df.select(
        "doc_id",
        F.rtrim(rebuilt).alias("rebuilt"),
        F.regexp_replace(F.trim(F.col("text")), r"\s+", " ").alias("want"),
    ).collect()
    for r in out:
        assert r["rebuilt"] == r["want"], r


def test_empty_doc_counts_zero_tokens(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, num_merges=1)
    rows = {r["doc_id"]: r for r in bpe.bpe_token_stats(df, merges).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[2]["n_tokens"] == 0
    assert rows[1]["tokens_md5"] == rows[2]["tokens_md5"]
    assert rows[3]["n_tokens"] >= 1


def test_local_training_equals_distributed(spark):
    """train_bpe_local (one distributed word-count aggregation + driver-
    memory merge loop, the production-merge-count path, VERDICT r9 item
    2) returns the IDENTICAL merge table — same pair counts, same
    count-DESC/(left,right)-ASC tie-breaks, same greedy left-to-right
    in-word application — on the Sennrich toy, the overlap corpus, and
    the real sf0.001 documents table."""
    toy = _toy(spark)
    assert bpe.train_bpe_local(toy, num_merges=6) == bpe.train_bpe(
        toy, num_merges=6
    )
    overlap = spark.createDataFrame(
        [(1, "aaa aa a ab ba " * 3)], "doc_id long, text string"
    )
    assert bpe.train_bpe_local(overlap, num_merges=6) == bpe.train_bpe(
        overlap, num_merges=6
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert bpe.train_bpe_local(docs, num_merges=16) == bpe.train_bpe(
        docs, num_merges=16
    )


def test_local_training_top_v_prunes_tail(spark):
    """top_v bounds driver memory by dropping tail words from the vote;
    with top_v >= vocab it is exact."""
    toy = _toy(spark)
    vocab = 4  # low lower newest widest
    assert bpe.train_bpe_local(toy, num_merges=5, top_v=vocab) == bpe.train_bpe(
        toy, num_merges=5
    )
    # pruning to the 2 most frequent words (newest x6, low x5) drops
    # lower/widest: the first merges still come from est</w> but counts
    # now exclude widest's contribution
    pruned = bpe.train_bpe_local(toy, num_merges=1, top_v=2)
    assert pruned == [("e", "s", 6)]


def test_local_training_raises_when_exhausted(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # only merges available: (a,</w>) and (b,</w>) — 2 total
    with _pytest.raises(ValueError, match="exhausted"):
        bpe.train_bpe_local(df, num_merges=5)
    with _pytest.raises(ValueError, match="exhausted"):
        bpe.train_bpe(df, num_merges=5)


def test_pandas_path_equals_expression_path(spark):
    """The Arrow-batched scale path (production merge tables) matches
    the replace-chain expression path bit-for-bit — same rank-order,
    left-to-right merge semantics."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.train_bpe(docs, num_merges=12)
    a = sorted(map(tuple, bpe.bpe_token_stats(docs, merges).collect()))
    b = sorted(map(tuple, bpe.bpe_tokenize_pandas(docs, merges).collect()))
    assert a == b and len(a) == docs.count()
