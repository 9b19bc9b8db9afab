"""operators/crawl: the composed html → C4 → Gopher curation chain."""

from __future__ import annotations

from bigdata_lab02_spark.operators.crawl import crawl_curation

# A page that should survive every stage: enough long terminal-punctuated
# lines, > 50 words, stopwords present, and VARIED prose (a shared
# sentence template would trip the dup-n-gram repetition rules).
_SENTS = [
    "The quick study of maps shows that rivers bend softly.",
    "Nine planets were counted with a careful telescope at dusk.",
    "Bread rises when the yeast has warmth and patient time.",
    "Old engines hum with a rhythm that mechanics learn to trust.",
    "Cities grow along harbors because trade favors deep water.",
    "A library keeps quiet hours so readers can think clearly.",
    "Winter light falls at a low angle across the open fields.",
    "Good code reads like prose that explains its own intent.",
]
_GOOD_BODY = "".join(f"<p>{s}</p>" for s in _SENTS)
_GOOD = f"<html><head><style>.x {{ color: red }}</style></head><body>{_GOOD_BODY}</body></html>"

# A link-farm page: anchors dominate; C4 still keeps the lines but the
# composed features expose it.
_FARM = (
    "<html><body>"
    + "".join(f'<p><a href="/l{i}">The offer {i} is sold to be had now.</a></p>' for i in range(10))
    + "</body></html>"
)

# A page whose prose repeats one line — rep_keep must veto it even though
# C4 and the quality rules pass.
_REPEAT = (
    "<html><body>"
    + "<p>The same sentence is written here to be read again today.</p>" * 12
    + "</body></html>"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    return {r["doc_id"]: r for r in crawl_curation(df).collect()}


def test_composed_keep_verdicts(spark):
    out = _run(spark, [(1, _GOOD), (2, _REPEAT)])

    good = out[1]
    assert good["c4_keep"] is True
    assert good["quality_keep"] is True
    assert good["rep_keep"] is True
    assert good["keep"] is True
    # the style body's '{' and '#' must have been stripped BEFORE the C4
    # marker scan and Gopher symbol ratio saw the text
    assert good["bad_doc_marker"] is False
    assert good["symbol_ratio"] == 0.0

    rep = out[2]
    assert rep["c4_keep"] is True and rep["quality_keep"] is True
    assert rep["rep_keep"] is False  # dup_line_frac = 11/12 > 0.30
    assert rep["dup_line_frac"] > 0.9
    assert rep["keep"] is False


def test_stage_handoffs(spark):
    # block breaks (</p>) become newlines, so C4 sees one line per <p>
    out = _run(spark, [(1, _GOOD)])
    assert out[1]["n_lines"] == 8
    assert out[1]["n_kept_lines"] == 8
    assert out[1]["n_sentences"] == 8
    # Gopher word split runs over the C4-kept text
    assert out[1]["n_words"] >= 50


def test_link_farm_features_surface(spark):
    out = _run(spark, [(1, _FARM)])
    assert out[1]["n_links"] == 10
    # all prose is anchor text (the joining newlines are the only
    # non-anchor extracted chars)
    assert out[1]["link_text_frac"] > 0.9


def test_broken_style_strip_would_veto(spark):
    # the composition interaction the gate exists for: if style bodies
    # leaked into the text, '{' would mark every page bad. Feed a page
    # whose UNQUOTED prose carries a brace to prove the marker path
    # itself still works end-to-end.
    brace = (
        "<html><body><p>A code sample shows f() { return 1; } to all.</p>"
        + _GOOD_BODY
        + "</body></html>"
    )
    out = _run(spark, [(1, brace)])
    assert out[1]["bad_doc_marker"] is True
    assert out[1]["c4_keep"] is False and out[1]["keep"] is False


def test_zero_exchanges_whole_chain(spark):
    from bigdata_lab02_spark.plans import plan_report

    df = spark.createDataFrame([(1, _GOOD)], "doc_id long, html string")
    r = plan_report(crawl_curation(df))
    assert r.n_exchanges == 0, r.raw


def test_crawl_curation_runs_on_a_stream(spark, tmp_path):
    """The whole composed chain is a stateless projection, so it runs
    UNCHANGED on a file stream (append mode, no watermark, no state
    store) and the replay equals the batch result — the 100 TB
    continuous-ingest shape of the curation tier."""
    from bigdata_lab02_spark.streaming import run_stream_to_memory

    rows = [(1, _GOOD), (2, _REPEAT), (3, _FARM)]
    batch = spark.createDataFrame(rows, "doc_id long, html string")
    src = str(tmp_path / "pages_stream")
    batch.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, html string").parquet(src)
    out = run_stream_to_memory(
        spark, crawl_curation(stream), "t_crawl_stream", mode="append"
    )
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, crawl_curation(batch).collect()))
    assert got == want and len(got) == 3


def test_custom_id_column(spark):
    # id_col is threaded through the whole chain by internal rename
    df = spark.createDataFrame([(7, _GOOD)], "page_id long, html string")
    out = crawl_curation(df, id_col="page_id").collect()[0]
    assert out["page_id"] == 7 and out["keep"] is True
    import pytest as _pt

    clash = spark.createDataFrame(
        [(7, 1, _GOOD)], "page_id long, doc_id long, html string"
    )
    with _pt.raises(ValueError, match="doc_id"):
        crawl_curation(clash, id_col="page_id")


def test_lid_stage_composes_zero_shuffle(spark):
    """r10: lid=True adds the stopword language prefilter as one more
    projection — plan still zero-exchange, pred_lang/lang_keep emitted,
    and keep_langs joins the final conjunction."""
    from bigdata_lab02_spark.plans import plan_report

    es_body = (
        "<p>"
        + "el barco la casa de que los ninos corren y el dia es claro. " * 12
        + "</p>"
    )
    rows = [(1, _GOOD), (2, f"<html><body>{es_body}</body></html>")]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = crawl_curation(df, lid=True, keep_langs=["en"])
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["pred_lang"] == "en" and got[1]["lang_keep"]
    assert got[1]["keep"]
    assert got[2]["pred_lang"] == "es" and not got[2]["lang_keep"]
    assert not got[2]["keep"]
    r = plan_report(crawl_curation(df, lid=True, keep_langs=["en"]))
    assert r.n_exchanges == 0, r.raw
