"""SQL surface (SURVEY §7 M5): every capability is reachable from
spark.sql over temp views — same Catalyst plans as the DataFrame API."""

from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.registry import SQL_IDIOMS
from bigdata_lab02_spark.functions.text import tokenize
from tests.conftest import TINY_STOPWORDS


def test_sql_idioms_all_valid(spark):
    """Each documented idiom parses and runs in Spark SQL."""
    samples = {
        "s": "'Hello, World!'",
        "x": "2.5d",
        "a": "array(1.0d, 2.0d)",
        "b": "array(3.0d, 4.0d)",
    }
    for name, template in SQL_IDIOMS.items():
        expr = template
        for k, v in samples.items():
            expr = expr.replace("{" + k + "}", v)
        row = spark.sql(f"SELECT {expr} AS v").collect()[0]
        assert row is not None, name


def test_tfidf_pipeline_in_pure_sql(spark, tiny_corpus):
    """The reference's whole P1→P10 DAG as ONE SQL statement."""
    tiny_corpus.createOrReplaceTempView("corpus_v")
    sw = ", ".join(f"'{w}'" for w in TINY_STOPWORDS)
    sql_result = spark.sql(
        f"""
        WITH toks AS (
          SELECT doc, explode(filter(
            transform(split(line, '\\\\s+'),
                      t -> regexp_replace(lower(t), '[^\\\\w\\\\s]', '')),
            t -> t != '' AND t NOT IN ({sw}))) AS token
          FROM corpus_v),
        coo AS (
          SELECT doc, token, count(*) AS cnt FROM toks GROUP BY doc, token),
        tf AS (
          SELECT doc, token, cnt / sum(cnt) OVER (PARTITION BY doc) AS tf
          FROM coo),
        idf AS (
          SELECT token,
                 ln((SELECT count(DISTINCT doc) FROM coo) / count(*)) AS idf
          FROM coo GROUP BY token)
        SELECT doc, token, round(tf * idf, 9) AS tfidf
        FROM tf JOIN idf USING (token)
        """
    )
    # DataFrame-API twin over the same corpus
    from bigdata_lab02_spark.operators import encode, matrix

    toks = encode.stopword_filter(tokenize(tiny_corpus), TINY_STOPWORDS)
    coo = toks.groupBy("doc", F.col("token")).agg(F.count("*").alias("count"))
    coo = coo.withColumnRenamed("token", "term_id").withColumnRenamed("doc", "doc_id")
    df_result = matrix.tfidf_matrix(coo).select(
        F.col("doc_id").alias("doc"),
        F.col("term_id").alias("token"),
        F.round("tfidf", 9).alias("tfidf"),
    )
    a = sorted(map(tuple, sql_result.collect()))
    b = sorted(map(tuple, df_result.collect()))
    assert a == b


# ------------------------- r9: SQL surface for the r8 operator families


def test_html_extract_in_pure_sql(spark):
    """registry.html_extract_sql over a view equals extract_html —
    including the r9 adversarial shapes (quoted '>', <article>, hidden
    anchors)."""
    from bigdata_lab02_spark.functions.registry import html_extract_sql
    from bigdata_lab02_spark.operators.html import extract_html

    rows = [
        (1, '<p>Hello &amp; bye</p><a href="/x">link</a>'),
        (2, '<a href="/q?a>b" title="x>y">deep</a> tail.'),
        (3, "<article><p>Prose here.</p></article><a>tiny</a>"),
        (4, '<!-- <a href="/ghost">ghost</a> --><script>var a=1;</script>ok'),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    df.createOrReplaceTempView("pages_v")
    a = sorted(map(tuple, spark.sql(html_extract_sql("pages_v")).collect()))
    b = sorted(map(tuple, extract_html(df).collect()))
    assert a == b


def test_c4_filters_in_pure_sql(spark):
    from bigdata_lab02_spark.functions.registry import c4_filters_sql
    from bigdata_lab02_spark.operators.curation import c4_filters

    rows = [
        (1, "This is a fine sentence with many words today.\n" * 4),
        (2, "tiny line.\nFour words sit here.\nExactly five words sit here."),
        (3, "Please enable javascript to view this page today.\nlorem ipsum"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("c4_docs_v")
    a = sorted(map(tuple, spark.sql(c4_filters_sql("c4_docs_v")).collect()))
    b = sorted(map(tuple, c4_filters(df).collect()))
    assert a == b


def test_gopher_rules_in_pure_sql(spark):
    from bigdata_lab02_spark.functions.registry import gopher_rules_sql
    from bigdata_lab02_spark.operators.textstats import gopher_rules

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "# " * 30 + "words to have and the be of it"),
        (3, "- bullet\n- bullet\nplain line with the words to be had"),
        (4, "teaser line ends this way...\n" * 3 + "the rest is to be fine"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("gopher_docs_v")
    cols = [
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_stop_hits", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_bullet_lines", "rule_ellipsis_lines",
        "rule_alpha_words", "rule_stopwords", "keep",
    ]
    a = sorted(
        map(tuple, spark.sql(gopher_rules_sql("gopher_docs_v")).select(*cols).collect())
    )
    b = sorted(map(tuple, gopher_rules(df).select(*cols).collect()))
    assert a == b


def test_range_join_in_pure_sql(spark):
    from bigdata_lab02_spark.functions.registry import range_join_sql
    from bigdata_lab02_spark.operators.temporal import range_join
    from tests.conftest import TESTDATA

    ev = spark.read.parquet(f"{TESTDATA}/sf0.001/events.parquet").select(
        "event_id", "ts", "value"
    )
    iv = (
        ev.where(F.col("event_id") % 17 == 0)
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("t_lo"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("t_hi"),
        )
    )
    ev.createOrReplaceTempView("rj_points_v")
    iv.createOrReplaceTempView("rj_intervals_v")
    sql = range_join_sql(
        "rj_points_v", "rj_intervals_v", bin_seconds=3600
    )
    a = sorted(map(tuple, spark.sql(sql).collect()))
    b = sorted(
        map(tuple, range_join(ev, iv, bin_seconds=3600).collect())
    )
    assert a == b and a


def test_bpe_tokenize_in_pure_sql(spark):
    from bigdata_lab02_spark.functions.registry import bpe_tokenize_sql
    from bigdata_lab02_spark.operators import bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame(
        [(1, text), (2, "the low bar"), (3, "")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, num_merges=6)
    df.createOrReplaceTempView("bpe_docs_v")
    a = sorted(map(tuple, spark.sql(bpe_tokenize_sql("bpe_docs_v", merges)).collect()))
    b = sorted(map(tuple, bpe.bpe_token_stats(df, merges).collect()))
    assert a == b


def test_url_filters_in_pure_sql(spark):
    """r10: the URL tier reachable as one SQL statement — parity with
    the DataFrame builder on every column, including the dedup window."""
    from bigdata_lab02_spark.functions.registry import url_filters_sql
    from bigdata_lab02_spark.operators.url import url_filters

    rows = [
        (1, "HTTP://User:pw@WWW.Example.COM:80/p%7E?utm_source=x&q=1#f"),
        (2, "http://www.example.com/p~?q=1"),
        (3, "https://spam.tracker.net:443/x"),
        (4, "https://news.bbc.co.uk"),
        (5, "ftp://files.example.org/a"),
        (6, "just text"),
        (7, "http://198.51.100.9:8080/ip"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    df.createOrReplaceTempView("v_urls")
    sfx = ["com", "net", "org", "io", "uk", "co.uk", "ac.uk"]
    blk = ["tracker.net"]
    got = sorted(
        map(tuple, spark.sql(url_filters_sql("v_urls", sfx, blk)).collect())
    )
    sfx_df = spark.createDataFrame([(s,) for s in sfx], "suffix string")
    blk_df = spark.createDataFrame([(d,) for d in blk], "domain string")
    want = sorted(map(tuple, url_filters(df, sfx_df, blk_df).collect()))
    assert got == want and len(got) == 7
