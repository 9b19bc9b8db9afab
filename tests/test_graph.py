"""Link extraction (html.extract_links), domain graph construction and
integer micro-unit PageRank (operators/graph.py): pure-python contract
replays, hand graphs, and resolution edge cases."""

from __future__ import annotations

import pytest

from bigdata_lab02_spark.operators.graph import domain_link_graph, pagerank
from bigdata_lab02_spark.operators.html import extract_links

TOTAL = 10**12


def _pr_replay(edges, iters, d=85, total=TOTAL):
    """The module's integer contract, replayed in pure python."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    share = total // n
    base = ((100 - d) * share) // 100
    wout: dict = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    r = {v: share for v in nodes}
    for _ in range(iters):
        inm = {v: 0 for v in nodes}
        for s, t, w in edges:
            inm[t] += (r[s] * w) // wout[s]
        dang = sum(r[v] for v in nodes if v not in wout)
        ds = dang // n
        r = {v: base + (d * (inm[v] + ds)) // 100 for v in nodes}
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(
        edges, "src_domain string, dst_domain string, weight long"
    )


def test_pagerank_matches_replay_exactly(spark):
    # triangle + a dangling sink: every contract branch exercised
    edges = [
        ("a.com", "b.com", 2),
        ("b.com", "c.com", 1),
        ("c.com", "a.com", 1),
        ("a.com", "sink.net", 1),
    ]
    got = {
        r.node: r.rank_mu
        for r in pagerank(_edges_df(spark, edges), iters=4).collect()
    }
    assert got == _pr_replay(edges, iters=4)


def test_pagerank_hub_outranks_spokes(spark):
    # hub spreads its mass back over ALL spokes (a single return edge
    # would make that one spoke accumulate hub's whole rank and win)
    edges = [(f"s{i}.com", "hub.com", 1) for i in range(6)] + [
        ("hub.com", f"s{i}.com", 1) for i in range(6)
    ]
    got = {
        r.node: r.rank_mu
        for r in pagerank(_edges_df(spark, edges), iters=6).collect()
    }
    assert got["hub.com"] == max(got.values())
    assert got == _pr_replay(edges, iters=6)


def test_pagerank_mass_is_conserved_up_to_truncation(spark):
    edges = [
        ("a.com", "b.com", 3),
        ("b.com", "a.com", 1),
        ("b.com", "c.com", 1),
    ]
    iters = 5
    got = pagerank(_edges_df(spark, edges), iters=iters).collect()
    total = sum(r.rank_mu for r in got)
    # each div truncates < 1 unit per (edge + node + dangling) per round
    dust = iters * (len(edges) + 3 + 2) * 2
    assert TOTAL - dust <= total <= TOTAL


def test_pagerank_tol_early_stop_equals_one_round(spark):
    edges = [("a.com", "b.com", 1), ("b.com", "a.com", 1)]
    # symmetric 2-cycle: ranks never move after round 1 -> a huge tol
    # stops after the first round, equal to the fixed-1-iter run
    got = {
        r.node: r.rank_mu
        for r in pagerank(
            _edges_df(spark, edges), iters=50, tol_mu=TOTAL
        ).collect()
    }
    assert got == _pr_replay(edges, iters=1)


def test_pagerank_contract_errors(spark):
    e = _edges_df(spark, [("a.com", "b.com", 1)])
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping_pct=101)
    empty = _edges_df(spark, []).where("weight > 0")
    with pytest.raises(ValueError, match="empty graph"):
        pagerank(empty)


def test_domain_link_graph_weights_and_self_loops(spark):
    sfx = spark.createDataFrame([("com",), ("net",)], "suffix string")
    links = spark.createDataFrame(
        [
            # two links a->b (weight 2), one b->a
            ("https://www.a.com/1", "https://x.b.com/p"),
            ("https://www.a.com/2", "https://y.b.com/q"),
            ("https://b.com/3", "https://a.com/r"),
            # intra-domain: dropped by default
            ("https://www.a.com/4", "https://cdn.a.com/s"),
            # endpoint with no registrable domain: dropped
            ("https://www.a.com/5", "https://com/t"),
        ],
        "url string, link_url string",
    )
    got = {
        (r.src_domain, r.dst_domain): r.weight
        for r in domain_link_graph(links, sfx).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}
    kept = domain_link_graph(links, sfx, keep_self_loops=True).collect()
    assert {
        (r.src_domain, r.dst_domain): r.weight for r in kept
    } == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1, ("a.com", "a.com"): 1}


def _links(spark, url, html):
    df = spark.createDataFrame(
        [(1, url, html)], "doc_id long, url string, html string"
    )
    return [
        (r.href, r.link_url) for r in extract_links(df).collect()
    ]


BASE = "https://www.ex.com/dir/page?x=1"


def test_extract_links_resolution_rules(spark):
    html = (
        '<p><a href="https://abs.com/a#frag">abs</a>'
        "<a href='//pr.com/b'>proto-rel</a>"
        '<a href="/root/c">root-rel</a>'
        '<a href="rel/d">relative</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="#sec">frag</a>'
        '<a href="">empty</a>'
        "<a>bare</a></p>"
    )
    got = _links(spark, BASE, html)
    assert got == [
        ("https://abs.com/a#frag", "https://abs.com/a"),
        ("//pr.com/b", "https://pr.com/b"),
        ("/root/c", "https://www.ex.com/root/c"),
        ("rel/d", None),
        ("mailto:x@y.z", None),
        ("javascript:void(0)", None),
        ("#sec", None),
    ]


def test_extract_links_hardened_attribute_forms(spark):
    html = (
        '<a class="x" href="https://q.com/x?a>b&c=1">quoted-gt</a>'
        "<a href=https://u.com/u rel=nofollow>unquoted</a>"
        '<a HREF="https://up.com/U">caps-attr</a>'
        '<a data-href="https://no.com/n">not-href</a>'
    )
    got = _links(spark, BASE, html)
    assert got == [
        ("https://q.com/x?a>b&c=1", "https://q.com/x?a>b&c=1"),
        ("https://u.com/u", "https://u.com/u"),
        ("https://up.com/U", "https://up.com/U"),
    ]


def test_extract_links_attribute_value_shadowing(spark):
    # r13 ADVICE: an earlier attribute VALUE containing an href
    # assignment must not shadow the real attribute — the quote-atom
    # prefix walk keeps the scan outside quoted values, and the
    # '.'-rejecting lookbehind kills unquoted location.href.
    html = (
        "<a onclick=\"location.href='https://evil.com/a'\""
        ' href="https://real.com/a">dq-in-sq</a>'
        "<a onclick='location.href=\"https://evil.com/b\"'"
        " href='https://real.com/b'>sq-in-dq</a>"
        '<a onclick=location.href=https://evil.com/c'
        ' href="https://real.com/c">unq-handler</a>'
        "<a onclick=\"location.href='https://evil.com/d'\">no-href</a>"
        '<a title="href=https://evil.com/e">title-decoy</a>'
    )
    got = _links(spark, BASE, html)
    assert got == [
        ("https://real.com/a", "https://real.com/a"),
        ("https://real.com/b", "https://real.com/b"),
        ("https://real.com/c", "https://real.com/c"),
    ]


def test_extract_links_ignores_nonprose_markup(spark):
    html = (
        '<!-- <a href="https://evil.com/x">hidden</a> -->'
        '<script>document.write(\'<a href="https://js.com/y">j</a>\')'
        "</script>"
        '<a href="https://ok.com/z">visible</a>'
    )
    got = _links(spark, BASE, html)
    assert got == [("https://ok.com/z", "https://ok.com/z")]


def test_extract_links_without_parseable_base(spark):
    html = '<a href="https://abs.com/a">x</a><a href="/rel">y</a>'
    got = _links(spark, "not a url", html)
    # absolute still resolves; root-relative has no base -> NULL
    assert got == [
        ("https://abs.com/a", "https://abs.com/a"),
        ("/rel", None),
    ]


def test_rank_prioritized_select(spark):
    from bigdata_lab02_spark.operators.graph import rank_prioritized_select

    sfx = spark.createDataFrame([("com",), ("net",)], "suffix string")
    ranks = spark.createDataFrame(
        [("top.com", 900), ("mid.com", 500)], "node string, rank_mu long"
    )
    pages = spark.createDataFrame(
        [
            (1, "https://www.top.com/a", "one two three"),       # 3 tok
            (2, "https://x.mid.com/b", "one two three four"),    # 4 tok
            (3, "https://y.top.com/c", "one two"),                # 2 tok
            (4, "https://unranked.net/d", "one two three"),       # 3 tok
        ],
        "doc_id long, url string, text string",
    )
    got = sorted(
        rank_prioritized_select(pages, ranks, sfx, 7).collect(),
        key=lambda r: r.cum_tokens,
    )
    # order: top.com docs (1 then 3 by id), then mid.com, then rank 0;
    # budget 7 admits doc 1 (cum 3) and doc 3 (cum 5); doc 2 (cum 9)
    # and doc 4 are cut
    assert [(r.doc_id, r.rank_mu, r.cum_tokens) for r in got] == [
        (1, 900, 3),
        (3, 900, 5),
    ]
    # unranked domain is rank 0, admissible under a bigger budget
    big = {r.doc_id: r.rank_mu for r in
           rank_prioritized_select(pages, ranks, sfx, 100).collect()}
    assert big[4] == 0 and len(big) == 4


def test_pagerank_overweight_edge_fails_loud(spark):
    cap = (2**63 - 1) // 10**12
    e = _edges_df(spark, [("a.com", "b.com", cap + 1)])
    with pytest.raises(ValueError, match="int64-safe cap"):
        pagerank(e)


def test_extract_links_with_anchor_text(spark):
    html = (
        '<a href="https://a.com/x">Read <b>more&amp;more</b> here</a>'
        '<a href="/y">  spaced   text </a>'
        '<a href="https://c.com/z">literal href="fake" inside</a>'
        '<a href="https://open.com/u">unterminated anchor'
    )
    df = spark.createDataFrame(
        [(1, BASE, html)], "doc_id long, url string, html string"
    )
    got = [
        (r.link_url, r.anchor_text)
        for r in extract_links(df, with_text=True).collect()
    ]
    # closed anchors only; nested tags stripped, entities decoded,
    # whitespace collapsed; text-side 'href=' never shadows the real one
    assert got == [
        ("https://a.com/x", "Read more&more here"),
        ("https://www.ex.com/y", "spaced text"),
        ("https://c.com/z", 'literal href="fake" inside'),
    ]
    # default mode still sees the unterminated anchor's open tag
    default = {r.link_url for r in extract_links(df).collect()}
    assert "https://open.com/u" in default


def test_anchor_text_table(spark):
    from bigdata_lab02_spark.operators.graph import anchor_text_table

    links = spark.createDataFrame(
        [
            # two sources, three anchors onto one target (doc 1 twice:
            # n_anchors=3 > n_sources=2); duplicate text collapses
            (1, "https://a.com/1", "/x", "https://t.com/p", "read this"),
            (1, "https://a.com/1", "/y", "https://t.com/p", "click"),
            (2, "https://b.com/2", "/z", "https://t.com/p", "click"),
            # empty text counts as an anchor but not as a text
            (3, "https://c.com/3", "/i", "https://img.com/q", ""),
            # unresolved target: dropped entirely
            (4, "https://d.com/4", "rel", None, "nope"),
        ],
        "doc_id long, url string, href string, link_url string,"
        " anchor_text string",
    )
    got = {
        r.link_url: (r.n_anchors, r.n_sources, r.texts)
        for r in anchor_text_table(links).collect()
    }
    assert got == {
        "https://t.com/p": (3, 2, "click|read this"),
        "https://img.com/q": (1, 1, ""),
    }
