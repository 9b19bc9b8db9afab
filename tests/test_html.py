"""operators/html: WET-style markup → text extraction (hand-computed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators.html import extract_html, strip_html

# Exercises every kernel step: script/style bodies (with markup-ish
# content), a comment hiding real tags, block breaks, entity decode
# (including &lt;b&gt; surviving AS TEXT because entities decode after
# tag stripping), and whitespace collapse.
_H = (
    "<html><head><title>T &amp; U</title><script>var x=1;</script>"
    "<style>.a{}</style></head><body>"
    "<p>Hello &lt;b&gt; world</p>"
    '<a href="/x">link one</a>'
    "<!-- hidden <i>tag</i> -->"
    "<ul><li>alpha</li><li>beta</li></ul>tail</body></html>"
)
_EXPECTED_TEXT = "T & U\nHello <b> world\nlink one alpha\nbeta\ntail"


def test_strip_html_hand_computed(spark):
    df = spark.createDataFrame([(_H,)], "html string")
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == _EXPECTED_TEXT


def test_extract_html_features(spark):
    df = spark.createDataFrame([(1, _H)], "doc_id long, html string")
    row = extract_html(df).collect()[0]
    assert row["text"] == _EXPECTED_TEXT
    # opening tags in the RAW markup, including the one hiding in the
    # comment: html head title script style body p a i ul li li
    assert row["n_tags"] == 12
    assert row["n_links"] == 1
    # "link one" (8 chars of anchor text) over the 46 extracted chars
    assert row["link_text_frac"] == pytest.approx(8 / len(_EXPECTED_TEXT))
    assert row["markup_frac"] == pytest.approx(1 - len(_EXPECTED_TEXT) / len(_H))


def test_extract_html_degenerate_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "<p></p>"), (3, "no markup at all")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in extract_html(df).collect()}
    assert rows[1]["text"] == "" and rows[1]["link_text_frac"] == 0.0
    assert rows[2]["text"] == "" and rows[2]["n_tags"] == 1
    assert rows[3]["text"] == "no markup at all"
    assert rows[3]["markup_frac"] == 0.0 and rows[3]["n_tags"] == 0


def test_entity_decode_single_pass(spark):
    # &amp;lt; must yield the literal text "&lt;", never a double-decoded "<"
    df = spark.createDataFrame([("x &amp;lt; y",)], "html string")
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "x &lt; y"


# --------------------------- r9 hardening: quoted '>' + name boundaries


def test_quoted_gt_stays_inside_tag(spark):
    # a literal '>' inside a quoted attribute value must not end the tag
    h = (
        '<a href="/q?a>b" title="x>y">deep</a> '
        "<img title='1 > 0'> plain tail."
    )
    df = spark.createDataFrame([(1, h)], "doc_id long, html string")
    row = extract_html(df).collect()[0]
    assert row["text"] == "deep plain tail."
    assert row["n_links"] == 1
    # anchor text "deep" = 4 chars of the 16 extracted
    assert row["link_text_frac"] == pytest.approx(4 / 16)


def test_anchor_name_boundary(spark):
    # <article>/<abbr>/<aside> must NOT open an anchor span: an
    # unanchored '<a[^>]*>' would run from <article> to the next </a>
    # and swallow the whole body as link text.
    h = (
        "<article><p>Long article prose sits here.</p></article>"
        '<a href="/x">tiny link</a>'
    )
    df = spark.createDataFrame([(1, h)], "doc_id long, html string")
    row = extract_html(df).collect()[0]
    assert row["n_links"] == 1
    assert row["link_text_frac"] < 0.5  # only "tiny link", not the article


def test_hidden_anchors_not_links(spark):
    # anchors inside comments or script bodies are not visible links
    h = (
        '<!-- <a href="/ghost">ghost</a> -->'
        '<script>document.write("<a href=/y>sneaky</a>")</script>'
        "<p>Real prose here.</p>"
    )
    df = spark.createDataFrame([(1, h)], "doc_id long, html string")
    row = extract_html(df).collect()[0]
    assert row["n_links"] == 0
    assert row["link_text_frac"] == 0.0
    assert row["text"] == "Real prose here."


def test_block_break_name_boundary(spark):
    # </pre> must not match the '/p' block-break rule (no newline), and
    # </link> must not match '/li'
    h = "<pre>code</pre> tail<link rel='x'></link>end."
    df = spark.createDataFrame([(h,)], "html string")
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert "\n" not in out
    assert out == "code tail end."


def test_extended_entity_decode(spark):
    # r9: typographic/symbol names decode; &amp; still last (no double
    # decode); unknown names and out-of-list numeric refs pass through
    # untouched (r10: &#160; moved INTO the list — see the numeric test)
    h = "A&mdash;B &hellip; &copy;2024 &rsquo;q&rsquo; &amp;copy; &#9999; &bogus;"
    df = spark.createDataFrame([(h,)], "html string")
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "A—B … ©2024 ’q’ &copy; &#9999; &bogus;"


def test_numeric_entity_decode(spark):
    # r10 (VERDICT r9 item 6): the common CMS decimal references decode;
    # &#38; (numeric amp) decodes LAST so &#38;quot; yields the literal
    # text &quot; — single-pass semantics extend to the numeric tier
    h = (
        "It&#8217;s &#8211; em&#8212;dash&#8230; a&#160;b "
        "&#8220;q&#8221; &#169; &#38;quot; &#38; fin"
    )
    df = spark.createDataFrame([(h,)], "html string")
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "It’s – em—dash… a b “q” © &quot; & fin"


def test_pandas_entity_twin_matches_and_generalizes(spark):
    # the Arrow twin agrees byte-for-byte with the expression tier on the
    # bounded entity set, and ALSO decodes what the replace chain
    # honestly leaves alone (general numeric/hex refs, long-tail names)
    from bigdata_lab02_spark.operators.html import (
        _ENTITIES,
        decode_entities_pandas,
        _decode_entities,
    )

    bounded = " ".join(ent for ent, _ in _ENTITIES if ent != "&#38;")
    rows = [(1, bounded), (2, "plain text"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = df.select(
        "doc_id", _decode_entities(F.col("text")).alias("text")
    )
    a = {r["doc_id"]: r["text"] for r in expr.collect()}
    b = {r["doc_id"]: r["text"] for r in decode_entities_pandas(df).collect()}
    assert a == b
    # strictly-more-complete cases
    g = spark.createDataFrame(
        [(1, "&#8364;uro &#x2019;hex&#X2026; &eacute;")], "doc_id long, text string"
    )
    out = decode_entities_pandas(g).collect()[0]["text"]
    assert out == "€uro ’hex… é"


def test_cdata_removed_whole(spark):
    # r9: CDATA sections drop entirely — unwrapping would feed raw '<'
    # back into the tag strip (documented limit); anchors inside CDATA
    # are not links
    h = '<p>before</p><![CDATA[ x < y <a href="/c">ghost</a> ]]>after.'
    df = spark.createDataFrame([(1, h)], "doc_id long, html string")
    row = extract_html(df).collect()[0]
    assert row["text"] == "before\nafter."
    assert row["n_links"] == 0


def test_link_text_frac_clamped(spark):
    # nested anchors can make span sums exceed the page extraction; the
    # fraction is clamped to 1.0
    h = '<a href="/o"><a href="/i">word</a></a>'
    df = spark.createDataFrame([(1, h)], "doc_id long, html string")
    row = extract_html(df).collect()[0]
    assert row["link_text_frac"] <= 1.0


# --------------------------------------------- image extraction (r14)


def test_extract_images_forms_and_resolution(spark):
    from bigdata_lab02_spark.operators.html import extract_images

    h = (
        '<p><img src="https://img.ex.com/a.png" alt="A &amp; B  photo">'
        "<img src='//cdn.ex.com/b.jpg' alt='b pic'/>"
        '<img src="/m/3.png">'
        '<img src="data:image/png;base64,AAAA" alt="inline">'
        '<img alt="no src">'
        '<img src=unquoted.example.png alt=word>'
        '<img SRC="https://caps.ex.com/c.png" ALT="caps attrs">'
        '<img data-src="https://no.ex.com/n.png" alt="data-src decoy">'
        "</p>"
    )
    df = spark.createDataFrame(
        [(1, "https://www.host.com/page", h)],
        "doc_id long, url string, html string",
    )
    got = [
        (r.src, r.image_url, r.alt) for r in extract_images(df).collect()
    ]
    assert got == [
        # entity decoded, double-space collapsed
        ("https://img.ex.com/a.png", "https://img.ex.com/a.png",
         "A & B photo"),
        ("//cdn.ex.com/b.jpg", "https://cdn.ex.com/b.jpg", "b pic"),
        ("/m/3.png", "https://www.host.com/m/3.png", ""),
        ("data:image/png;base64,AAAA", None, "inline"),
        ("unquoted.example.png", None, "word"),
        ("https://caps.ex.com/c.png", "https://caps.ex.com/c.png",
         "caps attrs"),
    ]


def test_extract_images_attribute_shadowing_and_nonprose(spark):
    from bigdata_lab02_spark.operators.html import extract_images

    h = (
        "<img onclick=\"this.src='https://evil.com/x.png'\""
        ' src="https://real.com/r.png" alt="decoy">'
        '<!-- <img src="https://ghost.com/g.png" alt="ghost"> -->'
        '<script>x = \'<img src="https://js.com/j.png">\'</script>'
        '<img src="https://ok.com/q.png" alt="x > y quoted gt">'
    )
    df = spark.createDataFrame(
        [(1, "https://h.com/p", h)], "doc_id long, url string, html string"
    )
    got = [(r.src, r.alt) for r in extract_images(df).collect()]
    assert got == [
        ("https://real.com/r.png", "decoy"),
        ("https://ok.com/q.png", "x > y quoted gt"),
    ]


def test_image_caption_table_aggregation(spark):
    from bigdata_lab02_spark.operators.graph import image_caption_table
    from bigdata_lab02_spark.operators.html import extract_images

    rows = [
        (1, "https://a.com/1",
         '<img src="https://i.com/x.png" alt="zebra">'
         '<img src="https://i.com/x.png" alt="aard">'),
        (2, "https://b.com/2",
         '<img src="https://i.com/x.png" alt="zebra">'
         '<img src="https://i.com/y.png">'
         '<img src="rel.png" alt="unresolved dropped">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {
        r.image_url: (r.n_refs, r.n_sources, r.captions)
        for r in image_caption_table(extract_images(df)).collect()
    }
    assert got == {
        # distinct sorted captions; 3 refs from 2 sources
        "https://i.com/x.png": (3, 2, "aard|zebra"),
        # alt-less ref counted, captions empty
        "https://i.com/y.png": (1, 1, ""),
    }
