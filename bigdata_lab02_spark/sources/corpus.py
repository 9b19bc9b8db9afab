"""S1 — recursive text-directory corpus source.

Reference semantics (``DataProcessing/task1_1.java:119-135,188-189``): the
corpus is a directory tree ``<root>/<category>/<file>.txt``; each document's
identity is ``category.filename`` (extension stripped) with *category* = the
parent folder name; records are text lines.

Spark-first expression: one ``spark.read.text`` scan with
``recursiveFileLookup`` and ``input_file_name()``; identity is derived
declaratively with ``regexp_extract`` so the whole thing stays inside
whole-stage codegen. At cluster scale this is a single distributed file scan
— no per-file driver loop, and Spark's file-source packs many small files
into each task (``maxPartitionBytes`` / file coalescing), which is exactly
what a 2,225-small-file corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <root>/<category>/<name>.<ext>  →  capture category and bare name
_CATEGORY_RE = r".*/([^/]+)/[^/]+$"
_NAME_RE = r".*/([^/]+?)(?:\.[^./]*)?$"


def read_corpus(spark: SparkSession, root: str) -> DataFrame:
    """Read a ``<root>/<category>/<doc>.txt`` tree → ``(category, doc, line)``.

    ``doc`` follows the reference's ``folder.filename`` convention
    (``task1_1.java:131``: ``folderName + "." + fileName`` minus extension).
    """
    raw = spark.read.option("recursiveFileLookup", "true").text(root)
    path = F.input_file_name()
    category = F.regexp_extract(path, _CATEGORY_RE, 1)
    name = F.regexp_extract(path, _NAME_RE, 1)
    return raw.select(
        category.alias("category"),
        F.concat_ws(".", category, name).alias("doc"),
        F.col("value").alias("line"),
    )


def read_corpus_whole(spark: SparkSession, root: str) -> DataFrame:
    """Read a ``<root>/<category>/<doc>.txt`` tree → ``(category, doc,
    text)`` with ONE ROW PER FILE (``wholetext``), preserving the full
    in-file token order. Used by operators whose semantics depend on token
    order across lines — e.g. the strict-reference Q1 mode
    (``encode.doc_term_counts_strict``), where a stale key carries across
    line boundaries within a file but never across files."""
    # NB: wholetext must go through the .text() kwarg — a reader
    # .option("wholetext", "true") is silently ignored by the text source
    raw = spark.read.option("recursiveFileLookup", "true").text(
        root, wholetext=True
    )
    path = F.input_file_name()
    category = F.regexp_extract(path, _CATEGORY_RE, 1)
    name = F.regexp_extract(path, _NAME_RE, 1)
    return raw.select(
        category.alias("category"),
        F.concat_ws(".", category, name).alias("doc"),
        F.col("value").alias("text"),
    )


def corpus_from_table(df: DataFrame, doc_col: str = "doc_id", text_col: str = "text", category_col: str | None = None) -> DataFrame:
    """Adapt any (id, text[, category]) table — e.g. the synthetic
    ``documents`` parquet — to the corpus shape ``(category, doc, line)``
    consumed by the text pipeline. Documents are single-line here; the
    pipeline never relies on line granularity."""
    cat = F.col(category_col) if category_col else F.lit("all")
    return df.select(
        cat.cast("string").alias("category"),
        F.col(doc_col).cast("string").alias("doc"),
        F.col(text_col).alias("line"),
    )
