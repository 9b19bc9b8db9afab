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
a quoted-attribute-aware pattern ``<(?:[^>"']|"[^"]*"|'[^']*')*>``, so a
literal ``>`` inside a quoted attribute value (onclick handlers,
data-URIs, ``href="x?a>b"``) stays inside the tag; an UNTERMINATED
quote inside a tag is the remaining limit (the ``<`` then never matches
and the fragment survives as text — fail-open, never over-deletes).
CDATA sections and conditional comments are treated as plain
comments/tags. That covers the overwhelming majority of crawl HTML and
keeps every pattern meaning the same thing in Java regex (Spark) and
RE2 (DuckDB): character classes + alternation + lazy quantifiers +
inline ``(?is)`` only — no backrefs, no lookaround, so the oracle
replays the extraction byte-for-byte.

All pure DataFrame expressions — no Python in the row path; the whole
extraction is one generated projection that codegen fuses with the scan
(zero shuffles at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dialect-portable patterns (Java regex == RE2 semantics for all of these).
# _ATTRS is the quoted-attribute-aware tag body: plain chars, or a full
# double-/single-quoted attribute value (which may contain ``>``).
_ATTRS = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
SCRIPT_RE = rf"(?is)<script(?:\s{_ATTRS})?>.*?</script>"
STYLE_RE = rf"(?is)<style(?:\s{_ATTRS})?>.*?</style>"
COMMENT_RE = r"(?s)<!--.*?-->"
# CDATA sections are removed whole (r9). Unwrapping would be wrong at
# the regex tier: CDATA exists precisely to carry raw '<'/'&', so the
# unwrapped content would immediately be re-eaten by the tag strip. In
# HTML5 crawl pages CDATA appears almost only inside script/SVG blocks;
# dropping it loses no prose while keeping the kernel a pure
# replace/strip chain both engines replay.
CDATA_RE = r"(?s)<!\[CDATA\[.*?\]\]>"
# Closing block elements and <br> become newlines so prose keeps its
# line structure (what line-level dedup and the Gopher line rules need).
# The tag NAME is boundary-anchored (immediately ``>``, or whitespace/``/``
# then attributes): ``/p`` must not swallow ``</pre>``, ``/li`` not
# ``</link>``, ``br`` not ``<broken>``.
BLOCK_BREAK_RE = rf"(?i)<(?:br|/p|/li|/h[1-6]|/div|/tr|/title)(?:[\s/]{_ATTRS})?>"
TAG_RE = rf"(?s)<{_ATTRS}>"
# Anchor tag name is boundary-anchored too: ``<a>`` or ``<a␣attrs…>``,
# never ``<article>``/``<abbr>``/``<aside>``/``<audio>``.
ANCHOR_RE = rf"(?is)<a(?:\s{_ATTRS})?>.*?</a>"
OPEN_TAG_RE = rf"(?s)<[A-Za-z]{_ATTRS}>"

# Named-entity set (r9: extended beyond the structural six to the
# typographic/symbol names common in crawl prose; r10: plus the top
# NUMERIC character references CMS escaping emits — the decimal forms of
# the same typographic set, e.g. ``&#8217;`` for the right single quote,
# which WordPress-era escaping scatters through real crawl text).
# ``&amp;`` is decoded LAST so ``&amp;lt;`` yields the literal text
# ``&lt;`` (single-pass decode, never a double decode), and its numeric
# twin ``&#38;`` decodes after it for the same reason. The one
# irreducible replace-chain limit: two entities both producing ``&``
# cannot BOTH be single-pass against each other (``&amp;#38;``
# double-decodes) — ``decode_entities_pandas`` below is the
# full-generality Arrow twin without that limit. GENERAL ``&#NNN;`` /
# ``&#xHH;`` beyond this finite list stays out of the expression tier
# (per-match code-point arithmetic would break the pure replace-chain
# form both engines replay); the twin covers it.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&deg;", "°"),
    ("&middot;", "·"),
    # r10 numeric forms (decimal — what CMS escaping actually emits)
    ("&#160;", " "),     # nbsp
    ("&#8211;", "–"),
    ("&#8212;", "—"),
    ("&#8216;", "‘"),
    ("&#8217;", "’"),
    ("&#8220;", "“"),
    ("&#8221;", "”"),
    ("&#8230;", "…"),
    ("&#169;", "©"),
    ("&#174;", "®"),
    ("&#8482;", "™"),
    ("&#176;", "°"),
    ("&#183;", "·"),
    ("&amp;", "&"),
    ("&#38;", "&"),
]


def _decode_entities(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def decode_entities_pandas(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Full-generality character-reference decode — the Arrow-batched
    twin of ``_decode_entities`` (the BPE twin pattern: expression tier
    for the oracle-gated bounded set, Python only where expressions
    genuinely can't carry the semantics). Handles EVERY ``&#NNN;`` /
    ``&#xHH;`` numeric reference (per-match code-point arithmetic) and
    the complete HTML5 named-entity table via the stdlib
    ``html.unescape`` — truly single-pass, so it also decodes
    pathological inputs like ``&amp;#38;`` once (to ``&#38;``), where
    any finite replace chain must double-decode one of the two
    ``&``-producing forms. On the bounded ``_ENTITIES`` set the two
    tiers agree byte-for-byte (equivalence-tested in tests/test_html.py);
    beyond it the twin is strictly more complete (that asymmetry is the
    point). One engine convention is applied on top of the stdlib
    decode: U+00A0 normalizes to a plain space, matching the expression
    tier's ``&nbsp;``/``&#160;`` → " " mapping (downstream whitespace
    collapse and word splits treat only ASCII space as a separator).
    Zero-shuffle: one ``mapInPandas`` projection."""
    from typing import Iterator

    import pandas as pd

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import html as _html

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: [
                        _html.unescape(t).replace("\u00a0", " ")
                        if t is not None
                        else None
                        for t in pdf[text_col]
                    ],
                }
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        op, f"{id_col} {id_type}, {text_col} string"
    )


def remove_nonprose(html: Column) -> Column:
    """Script/style bodies and comments removed — the shared first pass:
    both the prose kernel AND the anchor-feature extraction run on this
    (anchors hiding in commented-out or scripted markup are not links)."""
    out = F.regexp_replace(html, SCRIPT_RE, "")
    out = F.regexp_replace(out, STYLE_RE, "")
    out = F.regexp_replace(out, COMMENT_RE, "")
    return F.regexp_replace(out, CDATA_RE, "")


def strip_html(html: Column) -> Column:
    """Markup → prose, as a single fused column expression.

    Order matters: script/style bodies and comments go first (their
    contents are not prose and may contain ``<``/``>``), block breaks
    become newlines before generic tags vanish, entities decode after
    no tag can be re-formed, and whitespace collapses last (horizontal
    runs → one space, blank-line runs → one newline)."""
    out = remove_nonprose(html)
    out = F.regexp_replace(out, BLOCK_BREAK_RE, "\n")
    out = F.regexp_replace(out, TAG_RE, " ")
    out = _decode_entities(out)
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n+", "\n")
    return F.btrim(out, F.lit(" \n"))


def extract_html(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(id, [passthrough...], text, n_tags, n_links, link_text_frac,
    markup_frac): WET-style extracted prose plus the markup-shape
    quality features. ``passthrough`` columns are carried through
    unchanged (the r10 URL tier threads norm_url/registered_domain this
    way — column passthrough, never a re-join, keeps the chain fused).

    - ``n_tags``: opening-tag count over the RAW markup (markup density
      numerator — a tag hiding in a comment is still markup),
    - ``n_links``: anchor count over the PROSE-BEARING markup (script/
      style/comment bodies removed first — a commented-out or scripted
      anchor contributes no visible link),
    - ``link_text_frac``: extracted chars that sit inside ``<a>…</a>``
      over all extracted chars, clamped to 1.0 — the classic link-farm /
      nav-boilerplate signal (RefinedWeb drops pages dominated by anchor
      text). Clamped because nested/odd markup can make the re-stripped
      span sum exceed the whole-page extraction length.
    - ``markup_frac``: 1 − extracted/raw length — how much of the page
      is markup rather than prose.

    One projection over the corpus: the anchor-text length is a linear
    fold over the anchor spans (each span re-stripped with the same
    kernel), not an explode — zero shuffles."""
    html = F.col(html_col)
    prose_html = remove_nonprose(html)
    text = strip_html(html)
    anchors = F.regexp_extract_all(prose_html, F.lit(ANCHOR_RE), 0)
    link_chars = F.aggregate(
        anchors, F.lit(0), lambda acc, s: acc + F.length(strip_html(s))
    )
    n_text = F.length(text)
    n_html = F.length(html)
    return docs.select(
        id_col,
        *(passthrough or []),
        text.alias("text"),
        F.size(F.regexp_extract_all(html, F.lit(OPEN_TAG_RE), 0)).alias(
            "n_tags"
        ),
        F.size(anchors).alias("n_links"),
        F.when(n_text > 0, F.least(link_chars / n_text, F.lit(1.0)))
        .otherwise(0.0)
        .alias("link_text_frac"),
        F.when(n_html > 0, 1.0 - n_text / n_html).otherwise(0.0).alias(
            "markup_frac"
        ),
    )


# ---------------------------------------------- link extraction (r13)

# Anchor OPEN tag (the href carrier), same hardened attribute body as
# ANCHOR_RE: a quoted '>' stays inside the tag.
ANCHOR_OPEN_RE = rf"(?is)<a\s{_ATTRS}>"
# href value forms, tried in order: double-quoted, single-quoted,
# unquoted (up to the first whitespace / '>' / quote — a URL with a
# literal space is invalid anyway). Case-insensitive attribute name;
# the lookbehind rejects 'data-href='/'xhref=' ('-' is a non-word
# char, so a plain \b WOULD match between 'data-' and 'href') and
# '.href' ('location.href=…' inside an unquoted event-handler value).
# Each pattern is anchored at the tag start behind a lazy prefix that
# consumes quoted attribute VALUES atomically ("…" / '…' whole or not
# at all — [^>"'] can't touch a quote char), so the href match can
# never land inside another attribute's value: in
# <a onclick="location.href='x'" href='real'> the onclick value is one
# opaque atom and only the real href is visible to the scan. Known
# cost of atomicity on malformed markup: a stray UNMATCHED quote
# earlier in the tag (<a title=it's href="x">) opens a quote atom that
# never closes, so the prefix can't reach the attribute and extraction
# returns '' — a small recall loss on broken real-crawl tags, traded
# deliberately for never reading a shadowed value as real.
def _attr_res(name: str) -> tuple[str, str, str]:
    """The (double-quoted, single-quoted, unquoted) value patterns for
    one attribute ``name`` under the quote-atom prefix walk above."""
    prefix = (
        rf"""(?:"[^"]*"|'[^']*'|[^>"'])*?(?<![\w.-]){name}\s*=\s*"""
    )
    return (
        rf'(?is)^{prefix}"([^"]*)"',
        rf"(?is)^{prefix}'([^']*)'",
        rf"""(?is)^{prefix}([^\s>"']+)""",
    )


_HREF_DQ, _HREF_SQ, _HREF_UQ = _attr_res("href")
# RFC 3986 scheme prefix — present means the href is absolute.
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def _attr_of(tag: Column, res: tuple[str, str, str]) -> Column:
    """One attribute's value out of a FULL open-tag string starting at
    its '<' ('' when absent) — the patterns are ^-anchored so the
    quote-atom prefix walk gets correct quote context from the first
    byte; ``res`` comes from ``_attr_res``."""
    dq = F.regexp_extract(tag, res[0], 1)
    sq = F.regexp_extract(tag, res[1], 1)
    uq = F.regexp_extract(tag, res[2], 1)
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)


def _href_of(tag: Column) -> Column:
    """href attribute value of one anchor-open-tag string ('' when the
    anchor carries none)."""
    return _attr_of(tag, (_HREF_DQ, _HREF_SQ, _HREF_UQ))


def _resolve_ref(ref: Column, scheme: Column, host: Column) -> Column:
    """RFC 3986 §5 subset shared by link and image extraction (see
    ``extract_links`` for the rule table): absolute http(s) passes,
    protocol-relative takes the base scheme, root-relative takes
    scheme://host, everything else NULL; fragments stripped."""
    has_base = (scheme != "") & (host != "")
    resolved = (
        F.when(F.regexp_like(ref, F.lit(r"(?i)^https?://")), ref)
        .when(
            ref.startswith("//") & has_base,
            F.concat(scheme, F.lit(":"), ref),
        )
        .when(
            ref.startswith("/") & ~ref.startswith("//") & has_base,
            F.concat(scheme, F.lit("://"), host, ref),
        )
    )
    return F.regexp_replace(resolved, r"#.*$", "")


def extract_links(
    docs: DataFrame,
    base_url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    with_text: bool = False,
) -> DataFrame:
    """(id, base url, href, link_url): one row per href-bearing
    anchor in the prose-bearing markup — the crawl frontier /
    link-graph source (the base url column passes through so the
    output is directly a (source url, target url) pair table).

    ``with_text=True`` appends ``anchor_text``: the anchor's visible
    inner text (the full ``strip_html`` kernel over the span — nested
    tags stripped, entities decoded, whitespace collapsed). Anchor
    text paired with the resolved target is the classic
    weak-supervision corpus for retrieval training (anchor → page).
    In this mode only CLOSED anchors (``<a …>…</a>``) yield rows —
    an unterminated anchor has no delimitable text; the default mode
    keeps every href-bearing OPEN tag.

    Anchors are taken from the script/style/comment/CDATA-stripped
    markup (``remove_nonprose`` — a link inside commented-out or
    scripted markup is not a link, the same rule ``n_links`` uses).
    ``href`` is the raw attribute value; ``link_url`` is the resolved
    absolute target under the documented subset of RFC 3986 §5 that
    covers crawl link graphs:

    - absolute ``http://``/``https://`` hrefs pass through;
    - protocol-relative ``//host/path`` takes the base URL's scheme;
    - root-relative ``/path`` takes the base URL's ``scheme://host``;
    - everything else is NULL — other schemes (``mailto:``,
      ``javascript:``, ``ftp:``, ``data:``), bare fragments, empty
      hrefs, and RELATIVE paths (full dot-segment base-path merging is
      out of scope; absolute + root-relative dominate real link
      graphs, and a NULL is an honest "not followed", not a bad URL);
    - any fragment is stripped from the resolved target (RFC 3986 §3.5
      — the fragment never reaches the server).

    One projection + one explode — no shuffle, no UDF; downstream
    graph building does the keyed work. Base URLs that don't parse as
    ``scheme://host...`` resolve only absolute hrefs (relative forms
    need a base and get NULL)."""
    from .url import hostname_of, url_parts

    base = F.col(base_url_col)
    scheme, _, _ = url_parts(base)
    host = hostname_of(base)
    prose = remove_nonprose(F.col(html_col))
    text_cols = []
    if with_text:
        spans = F.regexp_extract_all(prose, F.lit(ANCHOR_RE), 0)
        # href comes from the span's OPEN tag only (anchored at ^), so
        # literal 'href=' inside the anchor's TEXT can never shadow it
        open_tag = rf"(?is)^<a(?:\s{_ATTRS})?>"
        pairs = F.transform(
            spans,
            lambda s: F.struct(
                _href_of(F.regexp_extract(s, open_tag, 0)).alias("href"),
                strip_html(s).alias("anchor_text"),
            ),
        )
        exploded = F.explode(pairs).alias("__a")
        href_col = F.col("__a.href").alias("href")
        text_cols = [F.col("__a.anchor_text").alias("anchor_text")]
    else:
        tags = F.regexp_extract_all(prose, F.lit(ANCHOR_OPEN_RE), 0)
        exploded = F.explode(F.transform(tags, _href_of)).alias("href")
        href_col = F.col("href")
    out = docs.select(
        id_col,
        base_url_col,
        F.lower(scheme).alias("__scheme"),
        host.alias("__host"),
        exploded,
    )
    if with_text:
        out = out.select(
            id_col, base_url_col, "__scheme", "__host", href_col, *text_cols
        )
    out = out.where(F.col("href") != "")
    resolved = _resolve_ref(
        F.col("href"), F.col("__scheme"), F.col("__host")
    )
    return out.select(
        id_col,
        base_url_col,
        "href",
        resolved.alias("link_url"),
        *(["anchor_text"] if with_text else []),
    )


# ----------------------------------------- image/caption extraction (r14)

# <img> is a VOID element: the open tag IS the element (optional XHTML
# '/>' close); same hardened quoted-attribute body as the anchor
# patterns, so a quoted '>' stays inside the tag.
IMG_TAG_RE = rf"(?is)<img(?:\s{_ATTRS})?/?>"
_SRC_RES = _attr_res("src")
_ALT_RES = _attr_res("alt")


def _clean_attr_text(v: Column) -> Column:
    """Attribute value → prose: entity decode + whitespace collapse +
    trim (the strip_html tail without the tag passes — an attribute
    value cannot contain markup)."""
    out = _decode_entities(v)
    out = F.regexp_replace(out, r"\s+", " ")
    return F.btrim(out, F.lit(" "))


def extract_images(
    docs: DataFrame,
    base_url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, base url, src, image_url, alt): one row per src-bearing
    ``<img>`` in the prose-bearing markup — the multimodal analog of
    ``extract_links`` (r14, VERDICT r13 item 3): image references plus
    their alt text are the raw material for image-caption training
    pairs (the LAION-style alt-text corpus), exactly as anchors plus
    anchor text are for retrieval pairs.

    ``src`` is the raw attribute value under the same quote-context-
    safe extraction as href (an earlier attribute value containing
    'src=' can never shadow the real attribute); ``image_url`` resolves
    under the identical RFC 3986 §5 subset as ``extract_links``
    (absolute http(s) / protocol-relative / root-relative; data: URIs,
    other schemes and relative paths → NULL — a data: image is inline
    bytes, not a fetchable target). ``alt`` is the entity-decoded,
    whitespace-collapsed attribute value ('' when the img carries no
    alt — still a row: the reference itself is signal for dedup and
    popularity even uncaptioned).

    Images are taken from the script/style/comment-stripped markup
    (``remove_nonprose``) — an <img> inside commented-out or scripted
    markup is not a rendered image, the same rule the anchor tier
    uses. One projection + one explode — no shuffle, no UDF."""
    from .url import hostname_of, url_parts

    base = F.col(base_url_col)
    scheme, _, _ = url_parts(base)
    host = hostname_of(base)
    prose = remove_nonprose(F.col(html_col))
    tags = F.regexp_extract_all(prose, F.lit(IMG_TAG_RE), 0)
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            _attr_of(t, _SRC_RES).alias("src"),
            _clean_attr_text(_attr_of(t, _ALT_RES)).alias("alt"),
        ),
    )
    out = docs.select(
        id_col,
        base_url_col,
        F.lower(scheme).alias("__scheme"),
        host.alias("__host"),
        F.explode(pairs).alias("__i"),
    ).select(
        id_col,
        base_url_col,
        F.col("__i.src").alias("src"),
        "__scheme",
        "__host",
        F.col("__i.alt").alias("alt"),
    )
    out = out.where(F.col("src") != "")
    resolved = _resolve_ref(
        F.col("src"), F.col("__scheme"), F.col("__host")
    )
    return out.select(
        id_col,
        base_url_col,
        "src",
        resolved.alias("image_url"),
        "alt",
    )
