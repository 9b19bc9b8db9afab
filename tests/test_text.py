"""P1 tokenize + normalization unit tests (reference: task1_1.java:137-149)."""

from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokenize, tokens_column


def test_tokens_column_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello, World! don't U.S. 42 foo_bar",)], "line string"
    )
    [row] = df.select(tokens_column(F.col("line")).alias("t")).collect()
    assert row["t"] == ["hello", "world", "dont", "us", "42", "foo_bar"]


def test_tokens_drop_empty_after_cleaning(spark):
    # '!!' and '--' clean to empty and must vanish (task1_1_1.java:111)
    df = spark.createDataFrame([("ok !! -- %% fine",)], "line string")
    [row] = df.select(tokens_column(F.col("line")).alias("t")).collect()
    assert row["t"] == ["ok", "fine"]


def test_tokenize_explodes_and_keeps_identity(tiny_corpus):
    toks = tokenize(tiny_corpus, line_col="line")
    assert toks.columns == ["category", "doc", "token"]
    d3 = [r["token"] for r in toks.where(F.col("doc") == "biz.d3").collect()]
    assert d3 == ["spark", "spark", "spark", "profit"]  # '!!' dropped


def test_tokenize_idempotent_on_clean_tokens(spark):
    # normalizing an already-normal token is identity (property from SURVEY §5)
    df = spark.createDataFrame([("already clean tokens_42",)], "line string")
    once = df.select(F.explode(tokens_column(F.col("line"))).alias("t"))
    twice = once.select(F.explode(tokens_column(F.col("t"))).alias("t"))
    assert [r["t"] for r in once.collect()] == [r["t"] for r in twice.collect()]
