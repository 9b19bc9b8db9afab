"""Category analytics: P12 cTFIDF + P13 grouped top-k (SURVEY.md §2).

Reference (``task1_5_1.java``, ``task1_5_2.java``): decode ids back to
names via inverted dictionaries, key by ``category:term`` (category = the
doc-name prefix before the first '.'), take the MEAN tfidf over the docs
that contain the term (quirk Q5 — divisor is #docs-containing-term, not
category size), then keep the top-5 terms per category.

Spark expression: the TERM dictionary joins broadcast (vocabulary-sized,
sublinear in the corpus); the DOC dictionary joins un-hinted (one row PER
DOCUMENT — at 100 TB that is billions of rows, so forcing a broadcast
build is an OOM by construction; the engine/AQE size-gates it instead,
broadcasting while it fits and falling back to a shuffle join on doc_id
when it doesn't). The big side then shuffles once, on (category, term).
The reference's DistributedCache precedent covers the term dict only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators.topk import grouped_top_k


def category_tfidf(
    tfidf: DataFrame,
    doc_dict: DataFrame,
    term_dict: DataFrame | None = None,
    category_col: str | None = None,
    broadcast_docs: bool = False,
) -> DataFrame:
    """P12: mean tfidf per (category, term) over docs containing the term.

    ``category`` comes from the doc name's ``category.filename`` prefix
    (task1_5_1.java:125-126) unless the doc dictionary carries an explicit
    ``category_col``. ``term_dict`` (optional) decodes term ids to names,
    as the reference does for its final output.

    ``broadcast_docs`` (default False) leaves the doc-dictionary join
    strategy to the engine: the doc side is O(n_docs), so a hard broadcast
    hint dies at scale (the r9 weak finding). AQE /
    ``autoBroadcastJoinThreshold`` still broadcasts it whenever it is
    actually small; pass True only when the caller KNOWS the doc dim is
    bounded (e.g. a fixed evaluation set).
    """
    doc_side = F.broadcast(doc_dict) if broadcast_docs else doc_dict
    joined = tfidf.join(doc_side, "doc_id")
    cat = (
        F.col(category_col)
        if category_col
        else F.substring_index(F.col("doc"), ".", 1)
    )
    joined = joined.withColumn("category", cat)
    if term_dict is not None:
        joined = joined.join(F.broadcast(term_dict), "term_id").withColumnRenamed(
            "term", "term_name"
        )
        term_key = "term_name"
    else:
        term_key = "term_id"
    return (
        joined.groupBy("category", F.col(term_key).alias("term"))
        .agg(F.avg("tfidf").alias("ctfidf"))
    )


def category_top_terms(
    ctfidf: DataFrame, k: int = 5, collapse_value_ties: bool = False
) -> DataFrame:
    """P13: top-k terms per category by ctfidf (task1_5_2.java:73-102),
    deterministic tiebreak on term.

    ``collapse_value_ties=True`` reproduces reference quirk Q2: the
    reference's bounded ``TreeMap<value, term>`` keys by the VALUE, so terms
    with equal ctfidf overwrite each other and only one survives — the
    alphabetically greatest (reducer iterates ``category:term`` keys
    ascending; last ``put`` wins). Golden ``Output1_5`` depends on this
    (e.g. sport has ≥5 terms tied at 7.7071 and keeps only ``tulu``).
    Default is the correct semantics: ties kept, term-ascending tiebreak.
    """
    if collapse_value_ties:
        ctfidf = ctfidf.groupBy("category", "ctfidf").agg(
            F.max("term").alias("term")
        )
    return grouped_top_k(
        ctfidf,
        ["category"],
        [F.desc("ctfidf"), F.asc("term")],
        k,
    )
