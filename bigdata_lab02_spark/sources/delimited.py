"""S2 — delimited-text interchange readers.

The reference chains MapReduce jobs through whitespace/tab-delimited text
files on HDFS; these readers parse those formats into typed DataFrames so
our engine can (a) consume the reference's golden files in tests and
(b) interoperate with any pipeline still producing them.

Formats (SURVEY.md §1.1):
- COO matrix        ``docid \t termid \t count``      (task1_1.java:155-158)
- dictionary        ``key \t id``                     (task1_1_1.java:121-135)
- sparse vector     ``docid \t t:w,t:w,...``          (task2_2.java:131-146)
- 2-D point         ``x y``                           (task2_1.java:203-206)
- weighted vector   ``t:w,... \t weight``             (task2_3.java:686-689)

All parsing is built-in-function only (split / str_to_map / casts) —
JVM-side, codegen'd, no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPARSE_VECTOR_TYPE = T.MapType(T.IntegerType(), T.DoubleType())


def read_coo_matrix(spark: SparkSession, path: str) -> DataFrame:
    """``doc_id \\t term_id \\t count`` → (doc_id int, term_id int, count long)."""
    schema = "doc_id int, term_id int, count long"
    return spark.read.csv(path, sep="\t", schema=schema)


def read_dictionary(spark: SparkSession, path: str, key_name: str = "term", id_name: str = "term_id") -> DataFrame:
    """``key \\t id`` → (key string, id int)."""
    return (
        spark.read.csv(path, sep="\t", schema=f"`{key_name}` string, `{id_name}` int")
    )


def _parse_sparse(col):
    """``"t:w,t:w"`` string → map<int,double> via built-ins only."""
    m = F.str_to_map(col, F.lit(","), F.lit(":"))
    return F.map_from_arrays(
        F.transform(F.map_keys(m), lambda k: k.cast("int")),
        F.transform(F.map_values(m), lambda v: v.cast("double")),
    )


def read_sparse_vectors(spark: SparkSession, path: str) -> DataFrame:
    """``docid \\t t:w,t:w,...`` → (doc_id int, vec map<int,double>).

    Parses the reference's TFIDF.txt interchange format
    (``KMeans/task2_2.java:131-146``).
    """
    raw = spark.read.csv(path, sep="\t", schema="doc_id int, vec_str string")
    return raw.select("doc_id", _parse_sparse(F.col("vec_str")).alias("vec"))


def read_points2d(spark: SparkSession, path: str) -> DataFrame:
    """``x y`` per line → (x double, y double) (task2_1.java:203-206)."""
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return raw.select(
        parts.getItem(0).cast("double").alias("x"),
        parts.getItem(1).cast("double").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())


def read_weighted_vectors(spark: SparkSession, path: str) -> DataFrame:
    """``t:w,... \\t weight`` → (vec map<int,double>, weight double)
    (task2_3.java:686-689)."""
    raw = spark.read.csv(path, sep="\t", schema="vec_str string, weight double")
    return raw.select(_parse_sparse(F.col("vec_str")).alias("vec"), "weight")


def sparse_vector_str(vec) -> "F.Column":
    """map<int,double> → the reference's ``t:w,t:w,...`` string
    (task2_2.java:131-146), entries sorted by term id so the emitted text
    is deterministic across runs and partitionings. Double weights format
    with Java's shortest-roundtrip repr, so read→parse→cast restores the
    exact same double."""
    entries = F.array_sort(F.map_entries(vec))
    return F.array_join(
        F.transform(
            entries,
            lambda e: F.concat_ws(":", e["key"].cast("string"), e["value"].cast("string")),
        ),
        ",",
    )


def write_sparse_vectors(df: DataFrame, path: str, id_col: str = "doc_id",
                         vec_col: str = "vec", mode: str = "overwrite") -> None:
    """Write (id, map<int,double>) as the reference's TFIDF.txt interchange
    format: ``docid \\t t:w,t:w,...`` — the inverse of
    ``read_sparse_vectors``."""
    df.select(
        F.concat_ws(
            "\t", F.col(id_col).cast("string"), sparse_vector_str(F.col(vec_col))
        ).alias("value")
    ).write.mode(mode).text(path)
