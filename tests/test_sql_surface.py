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
