"""Doc-term matrix operators: P6-P11 (SURVEY.md §2).

Input convention: the COO matrix ``(doc_id, term_id, count)`` produced by
``operators.encode.doc_term_counts`` (reference interchange format
``task_1_1.mtx``).

Scale notes per operator:
- P6  frequency filter — narrow ``where``; pushes to the parquet scan when
  the matrix is read from disk.
- P7  global top-k — ``orderBy().limit()`` compiles to
  ``TakeOrderedAndProject``: per-partition bounded heaps + driver merge of
  k·partitions rows, never a global sort. Identical shape to the
  reference's bounded-TreeMap reducer (``task1_3.java:86-92``) but
  distributed.
- P8  TF — a window-sum over ``doc_id`` partitions; one hash exchange on
  doc_id, reused by anything downstream already partitioned on doc_id.
- P9  IDF — ``count(*)`` per term over doc-distinct triples + a broadcast
  scalar N. The reference needed a single reducer for N (quirk Q3 — its N
  was per-reducer and only correct with 1 reducer); we compute N globally
  and broadcast it.
- P10 TF-IDF — broadcast join of the term-level IDF table onto TF.
- P11 pivot to sparse vectors — ``map_from_entries(collect_list(...))`` per
  doc; the map's key order is unspecified, matching the reference's
  shuffle-arrival order (SURVEY §2 P11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequency_filter(coo: DataFrame, min_count: int = 3) -> DataFrame:
    """P6: keep triples with count >= min_count (task1_2.java:53-55)."""
    return coo.where(F.col("count") >= min_count)


def top_terms(coo: DataFrame, k: int = 10) -> DataFrame:
    """P7: global top-k terms by summed count → (term_id, total)
    (task1_3.java:77-104). Ties broken by term_id ascending so results are
    deterministic (reference quirk Q2 collapses ties; golden file has none).
    """
    totals = coo.groupBy("term_id").agg(F.sum("count").alias("total"))
    return totals.orderBy(F.desc("total"), F.asc("term_id")).limit(k)


def term_frequency(coo: DataFrame) -> DataFrame:
    """P8: tf(t,d) = count / Σ_t count over the doc → adds ``tf``
    (task1_4_1.java:92-123)."""
    w = Window.partitionBy("doc_id")
    return coo.withColumn("tf", F.col("count") / F.sum("count").over(w))


def inverse_doc_frequency(coo: DataFrame, n_docs: int | None = None) -> DataFrame:
    """P9: idf(t) = ln(N / df(t)) → (term_id, df, idf)
    (task1_4_2.java:81-106).

    ``df(t)`` is a plain count because COO triples are already distinct per
    (doc, term). N defaults to the global distinct doc count — computed
    once and folded in as a literal (broadcast scalar), never a coalesce(1).
    """
    if n_docs is None:
        n_docs = coo.select("doc_id").distinct().count()
    dfreq = coo.groupBy("term_id").agg(F.count("*").alias("df"))
    return dfreq.withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))


def tf_idf(tf: DataFrame, idf: DataFrame) -> DataFrame:
    """P10: tfidf = tf * idf via broadcast join on term_id
    (task1_4_3.java:84-94)."""
    return tf.join(F.broadcast(idf.select("term_id", "idf")), "term_id").withColumn(
        "tfidf", F.col("tf") * F.col("idf")
    )


def tfidf_matrix(coo: DataFrame, min_count: int | None = None) -> DataFrame:
    """Fused P6→P8→P9→P10: (doc_id, term_id, count) → + tf, idf, tfidf.

    One logical plan — Catalyst shares the scan, pushes the frequency filter
    below both aggregations, and the IDF side (term-level, small) broadcasts.
    NOTE (parity): the reference computes IDF from the *unfiltered* matrix
    but TF from the filtered one only because of job wiring; we follow its
    actual dataflow (both from the same input it was given).

    The input matrix is PINNED (localCheckpoint — eager, like the n_docs
    count this function has always run at construction) because it is
    consumed three times: the n_docs scalar action, the TF window side
    and the IDF aggregate side — without the pin the caller's upstream
    tokenize→aggregate→dictionary chain re-derives per consumer. The
    pinned rows are the (doc, term, count) triples the three consumers
    need anyway; reuse justifies the materialization and the lineage
    truncation (interleaved sf0.1 A/B, both arm orders: p10 warm pairs
    off 3.4-4.4 s vs pinned 2.2-3.0 s, p13 off 3.1-4.0 s vs pinned
    2.1-2.9 s, 12/12 pairs).
    """
    if min_count is not None:
        coo = frequency_filter(coo, min_count)
    coo = coo.localCheckpoint()
    tf = term_frequency(coo)
    idf = inverse_doc_frequency(coo)
    return tf_idf(tf, idf)


def to_sparse_vectors(tfidf: DataFrame, value_col: str = "tfidf") -> DataFrame:
    """P11: pivot (doc_id, term_id, w) → (doc_id, vec map<int,double>)
    (task1_4_3_2.java:102-116)."""
    return tfidf.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("term_id"), F.col(value_col)))
        ).alias("vec")
    )
