"""Composed crawl-curation pipeline: raw HTML → training-ready verdicts.

The production shape of the text-curation tier (cf. C4, Raffel et al.
2020; Gopher, Rae et al. 2021 App. A; RefinedWeb, Penedo et al. 2023):

    crawl pages
      → ``extract_html``     (WET-style markup → prose + link features)
      → ``c4_filters``       (line-level cleaning over the EXTRACTED text)
      → ``gopher_rules``     (quality verdicts over the C4-cleaned text)
      → ``gopher_repetition``(repetition verdicts over the same)
      → one ``keep`` conjunction.

Each stage is individually oracle-gated; this module gates the
COMPOSITION — html's extracted ``text`` (block breaks → newlines) feeds
C4's line split, and C4's ``clean_text`` feeds Gopher's word/line splits.
Stage interactions are real: e.g. ``<style>`` bodies carry ``{`` which is
a C4 bad-document marker, so a broken style-strip would veto every page.

Scale design: every stage is a generated projection (no explode, no
shuffle), and the stages chain through column ``passthrough`` rather
than re-joining on doc_id — the WHOLE pipeline is ONE fused map over the
crawl, zero exchanges at any corpus size (plan-asserted in
tests/test_crawl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators.curation import (
    c4_filters,
    gopher_repetition,
)
from bigdata_lab02_spark.operators.html import extract_html
from bigdata_lab02_spark.operators.textstats import gopher_rules

# Per-stage feature columns carried through the chain (the composed gate
# hashes one representative set from every stage).
_HTML_FEATURES = ["n_tags", "n_links", "link_text_frac", "markup_frac"]
_C4_FEATURES = ["n_lines", "n_kept_lines", "n_sentences", "bad_doc_marker"]
_GOPHER_FEATURES = [
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "alpha_word_frac",
    "n_stop_hits",
]


def crawl_curation(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    min_words: int = 50,
    url_col: str | None = None,
    suffixes: DataFrame | None = None,
    blocklist: DataFrame | None = None,
    lid: bool = False,
    keep_langs: list[str] | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """The full crawl → curation chain as one zero-shuffle projection.

    Returns per page: the html features, the C4 counters and ``c4_keep``,
    the Gopher quality features and ``quality_keep``, two representative
    repetition fractions and ``rep_keep``, the surviving ``clean_text``,
    and ``keep`` = c4 ∧ quality ∧ repetition. A non-default ``id_col``
    is carried through by renaming to the stage operators' ``doc_id``
    internally and back on the way out.

    ``url_col`` (r10, VERDICT r9 item 3) prepends the URL/domain tier
    (``operators.url.url_filters`` with ``suffixes`` and optional
    ``blocklist``) AHEAD of the HTML stage — the production order:
    normalization, blocklist, and recrawl dedup are the cheapest,
    highest-yield filters, so pages failing them never pay for HTML
    extraction or anything after it. Rows are FILTERED to the
    ``url_keep`` survivors and ``norm_url``/``registered_domain`` ride
    the chain as passthrough columns. This stage adds the tier's one
    exchange (the norm_url dedup shuffle) before the otherwise fused
    projection; without ``url_col`` the chain stays zero-exchange.

    ``lid=True`` (r10) runs the CHEAP stopword language prefilter
    (``textstats.language_id_stopword`` — a pure projection, so the
    chain's plan shape is unchanged) over the C4 ``clean_text`` and
    emits ``pred_lang`` + ``lang_keep``; with ``keep_langs`` given,
    ``lang_keep = pred_lang ∈ keep_langs`` joins the final ``keep``
    conjunction (the CCNet/RefinedWeb stage order: extract → clean →
    language-select → quality). The real trigram NB classifier
    (``textstats.language_id``) stays the second-stage operator for
    the docs the prefilter can't call — at 100 TB you run the
    projection first and the model join only on the residue.

    ``passthrough`` (r11) threads extra input columns through every
    stage into the output (right after ``doc_id``) — e.g. the WARC
    decode's ``charset`` in the warc→url→crawl composition."""
    if id_col != "doc_id":
        if "doc_id" in pages.columns:
            raise ValueError(
                "pages already has a doc_id column; drop or rename it "
                f"before using id_col={id_col!r}"
            )
        pages = pages.withColumnRenamed(id_col, "doc_id")
    extra = list(passthrough or [])
    url_features: list[str] = []
    if url_col is not None:
        if suffixes is None:
            raise ValueError("url_col requires a suffixes DataFrame")
        from bigdata_lab02_spark.operators.url import url_filters

        uf = url_filters(
            pages,
            suffixes,
            blocklist,
            url_col=url_col,
            id_col="doc_id",
            passthrough=[html_col, *extra],
        )
        url_features = ["norm_url", "registered_domain"]
        pages = uf.where(F.col("url_keep")).select(
            "doc_id", html_col, *extra, *url_features
        )
    ext = extract_html(
        pages, html_col=html_col, id_col="doc_id",
        passthrough=extra + url_features,
    )
    c4 = c4_filters(
        ext,
        min_words_per_line=min_words_per_line,
        min_sentences=min_sentences,
        passthrough=extra + url_features + _HTML_FEATURES,
    ).withColumnRenamed("keep", "c4_keep")
    quality = gopher_rules(
        c4, text_col="clean_text", min_words=min_words
    ).withColumnRenamed("keep", "quality_keep")
    rep = gopher_repetition(
        quality,
        text_col="clean_text",
        passthrough=(
            extra
            + url_features
            + _HTML_FEATURES
            + _C4_FEATURES
            + ["c4_keep", "clean_text"]
            + _GOPHER_FEATURES
            + ["quality_keep"]
        ),
    ).withColumnRenamed("keep", "rep_keep")
    lid_cols: list[str] = []
    keep_expr = F.col("c4_keep") & F.col("quality_keep") & F.col("rep_keep")
    if lid:
        from bigdata_lab02_spark.operators.textstats import (
            language_id_stopword,
        )

        rep = language_id_stopword(rep, text_col="clean_text")
        lang_keep = (
            F.col("pred_lang").isin(keep_langs)
            if keep_langs is not None
            else F.lit(True)
        )
        rep = rep.withColumn("lang_keep", lang_keep)
        lid_cols = ["pred_lang", "lang_keep"]
        keep_expr = keep_expr & F.col("lang_keep")
    out = rep.select(
        "doc_id",
        *extra,
        *url_features,
        *_HTML_FEATURES,
        *_C4_FEATURES,
        "c4_keep",
        *_GOPHER_FEATURES,
        "quality_keep",
        "dup_line_frac",
        "top_2gram_char_frac",
        "rep_keep",
        *lid_cols,
        "clean_text",
        keep_expr.alias("keep"),
    )
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out
