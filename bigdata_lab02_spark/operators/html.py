"""HTML → text extraction (WET-style) for crawl-curation pipelines.

A web crawl arrives as markup; the first curation stage strips it to
prose plus markup-shape features (cf. CommonCrawl's WET extraction and
the boilerplate-removal line of work behind CCNet, Wenzek et al. 2020,
and RefinedWeb, Penedo et al. 2023). This is the regex tier of that
stage: block-element removal (script/style/comments), block-break →
newline mapping, tag stripping, a small entity decode, whitespace
collapse — plus the features downstream quality filters key on (tag
density, link-text fraction, markup fraction; link-farm pages score
high on the latter two).

Profile (honest limits, like the codec modules): tags are matched with
``<[^>]*>``, so a literal ``>`` inside a quoted attribute value ends the
tag early; CDATA sections and conditional comments are treated as plain
comments/tags. That covers the overwhelming majority of crawl HTML and
keeps every pattern meaning the same thing in Java regex (Spark) and
RE2 (DuckDB): character classes + lazy quantifiers + inline ``(?is)``
only — no backrefs, no lookaround, so the oracle replays the extraction
byte-for-byte.

All pure DataFrame expressions — no Python in the row path; the whole
extraction is one generated projection that codegen fuses with the scan
(zero shuffles at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dialect-portable patterns (Java regex == RE2 semantics for all of these).
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
COMMENT_RE = r"(?s)<!--.*?-->"
# Closing block elements and <br> become newlines so prose keeps its
# line structure (what line-level dedup and the Gopher line rules need).
BLOCK_BREAK_RE = r"(?i)<(?:br|/p|/li|/h[1-6]|/div|/tr|/title)[^>]*>"
TAG_RE = r"(?s)<[^>]*>"
ANCHOR_RE = r"(?is)<a[^>]*>.*?</a>"
OPEN_TAG_RE = r"(?s)<[A-Za-z][^>]*>"

# Minimal entity set; ``&amp;`` is decoded LAST so ``&amp;lt;`` yields the
# literal text ``&lt;`` (single-pass decode, never a double decode).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _decode_entities(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def strip_html(html: Column) -> Column:
    """Markup → prose, as a single fused column expression.

    Order matters: script/style bodies and comments go first (their
    contents are not prose and may contain ``<``/``>``), block breaks
    become newlines before generic tags vanish, entities decode after
    no tag can be re-formed, and whitespace collapses last (horizontal
    runs → one space, blank-line runs → one newline)."""
    out = F.regexp_replace(html, SCRIPT_RE, "")
    out = F.regexp_replace(out, STYLE_RE, "")
    out = F.regexp_replace(out, COMMENT_RE, "")
    out = F.regexp_replace(out, BLOCK_BREAK_RE, "\n")
    out = F.regexp_replace(out, TAG_RE, " ")
    out = _decode_entities(out)
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n+", "\n")
    return F.btrim(out, F.lit(" \n"))


def extract_html(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text, n_tags, n_links, link_text_frac, markup_frac): WET-style
    extracted prose plus the markup-shape quality features.

    - ``n_tags``: opening-tag count (markup density numerator),
    - ``n_links``: anchor count,
    - ``link_text_frac``: extracted chars that sit inside ``<a>…</a>``
      over all extracted chars — the classic link-farm / nav-boilerplate
      signal (RefinedWeb drops pages dominated by anchor text),
    - ``markup_frac``: 1 − extracted/raw length — how much of the page
      is markup rather than prose.

    One projection over the corpus: the anchor-text length is a linear
    fold over the anchor spans (each span re-stripped with the same
    kernel), not an explode — zero shuffles."""
    html = F.col(html_col)
    text = strip_html(html)
    anchors = F.regexp_extract_all(html, F.lit(ANCHOR_RE), 0)
    link_chars = F.aggregate(
        anchors, F.lit(0), lambda acc, s: acc + F.length(strip_html(s))
    )
    n_text = F.length(text)
    n_html = F.length(html)
    return docs.select(
        id_col,
        text.alias("text"),
        F.size(F.regexp_extract_all(html, F.lit(OPEN_TAG_RE), 0)).alias(
            "n_tags"
        ),
        F.size(anchors).alias("n_links"),
        F.when(n_text > 0, link_chars / n_text).otherwise(0.0).alias(
            "link_text_frac"
        ),
        F.when(n_html > 0, 1.0 - n_text / n_html).otherwise(0.0).alias(
            "markup_frac"
        ),
    )
