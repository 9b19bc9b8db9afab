"""Link-graph construction and PageRank domain centrality (r13).

Real crawl curation ranks domains by link structure before it ranks
pages by content: Common Crawl publishes per-domain centrality ranks
computed over its host web graph, and selection pipelines join them in
as a quality prior next to the content rules (Gopher/C4) and trained
scorers this repo already carries. This module adds that signal:
`domain_link_graph` collapses the page-level links that
`html.extract_links` emits into a weighted registered-domain graph
(the same PSL machinery as the URL tier), and `pagerank` runs the
power iteration (Page et al. 1999, "The PageRank Citation Ranking")
over it.

Cross-engine exactness: PageRank is real-valued, so the contract fixes
it in integer micro-units (the lm_perplexity / kmeans discipline —
every arithmetic step below is exact int64 math both engines replay
bit-for-bit):

  n        = |nodes|,  TOTAL = total_mu (default 1e12)
  r0[v]    = TOTAL div n
  per iteration:
    contrib[e]   = (r[src] * w[e]) div wout[src]     -- per edge
    in[v]        = sum of contrib over e: dst = v
    dang         = sum of r over nodes with no out-edge
    r'[v]        = ((100-d) * (TOTAL div n)) div 100
                 + (d * (in[v] + dang div n)) div 100
  with d = damping_pct (default 85). All quantities are non-negative,
  so div (truncate) and floor agree; mass leaks a few units per
  division by design — the contract is the fixed-point of THIS integer
  map, not of the real-valued one, which is what makes the oracle
  replay exact.

Scale shape: the edge table joins the rank vector on src (one keyed
exchange), aggregates contributions on dst (second keyed exchange),
and left-joins back to the node set (third) — the standard distributed
PageRank round, O(iters) passes over edges, never anything quadratic.
The out-weight table is joined into the edges ONCE and the result
pinned (`localCheckpoint` — the repo's fan-out idiom), so the static
edge side is not recomputed per iteration; the per-iteration rank
frame is pinned too, keeping the lineage O(1) instead of O(iters)
(the kmeans driver-loop discipline). The dangling-node set is
precomputed once; its per-iteration mass is one bounded scalar
aggregate (a single row to the driver, like the kmeans convergence
test).

int64 headroom: rank_mu <= TOTAL = 1e12 and the widest product is
rank_mu * w — safe while a single (src domain -> dst domain) edge
weight stays under ~9e6; weigh edges as link counts, not byte counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .url import hostname_of, with_registered_domain


def domain_link_graph(
    links: DataFrame,
    suffixes: DataFrame,
    src_url_col: str = "url",
    dst_url_col: str = "link_url",
    keep_self_loops: bool = False,
) -> DataFrame:
    """(src_domain, dst_domain, weight): the registered-domain link
    graph of a page-level link table (`html.extract_links` output or
    any (source url, target url) pairs).

    Both endpoints map to their registrable domain under the REAL
    public-suffix rules (`url.with_registered_domain` — broadcast PSL
    joins, the corpus never shuffles for the mapping); rows whose
    either endpoint has no registrable domain (unparseable URL, bare
    suffix) are dropped, as are intra-domain links unless
    ``keep_self_loops`` — site-internal navigation says nothing about
    cross-domain endorsement, which is what PageRank measures.
    ``weight`` = number of links (count, not distinct pages), the
    standard weighted-graph form. One (src, dst) groupBy exchange."""
    hosts = links.select(
        hostname_of(F.col(src_url_col)).alias("__shost"),
        hostname_of(F.col(dst_url_col)).alias("__dhost"),
    ).where((F.col("__shost") != "") & (F.col("__dhost") != ""))
    src_dom = with_registered_domain(
        hosts, suffixes, host_col="__shost", out_col="src_domain"
    )
    both = with_registered_domain(
        src_dom, suffixes, host_col="__dhost", out_col="dst_domain"
    ).where(
        F.col("src_domain").isNotNull() & F.col("dst_domain").isNotNull()
    )
    if not keep_self_loops:
        both = both.where(F.col("src_domain") != F.col("dst_domain"))
    return both.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("weight")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    weight_col: str | None = "weight",
    iters: int = 5,
    damping_pct: int = 85,
    total_mu: int = 10**12,
    tol_mu: int | None = None,
) -> DataFrame:
    """(node, rank_mu): integer micro-unit PageRank over a weighted
    edge table, per the module-docstring contract.

    ``iters`` fixed rounds (the replayable form the oracle unrolls);
    ``tol_mu`` additionally stops early once ``max |r' - r|`` over all
    nodes drops to ``tol_mu`` or below — the convergence test is one
    bounded scalar per round, exactly the kmeans driver loop. Ranks
    sum to ~total_mu (minus deterministic truncation dust), so values
    are comparable across corpora regardless of node count."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in 0..100")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w.alias("w"),
    ).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull() & (w > 0)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()  # consumed every iteration + by the anti join
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty graph")
    # loud guard (the warc shard-guard convention): the per-edge product
    # rank_mu * w must stay in int64 with rank_mu <= total_mu; a single
    # overweight edge would silently wrap the contribution sums
    max_w = e.agg(F.max("w")).first()[0] or 0
    w_cap = (2**63 - 1) // total_mu
    if max_w > w_cap:
        raise ValueError(
            f"edge weight {max_w} exceeds the int64-safe cap {w_cap} "
            f"for total_mu={total_mu}; weigh edges as link counts or "
            f"pre-scale the weights"
        )
    share = total_mu // n
    base_mu = ((100 - damping_pct) * share) // 100
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    # static across iterations: pin so the (edges x out-weight) join
    # runs once, not once per round
    ew = e.join(outw, "src").localCheckpoint()
    dang_nodes = nodes.join(
        outw.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint()

    r = nodes.select("node", F.lit(share).cast("long").alias("rank_mu"))
    r = r.localCheckpoint()
    for _ in range(iters):
        contrib = (
            ew.join(r, ew["src"] == r["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_mu * w) div wout").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mu"))
        )
        # bounded scalar: the dangling mass this round (one row — the
        # kmeans model-state seam). A/B'd against folding this into the
        # round's plan as a broadcast one-row cross join: the broadcast
        # variant measured SLOWER at sf0.1 (17-25 s vs 13.6-14.3 s for
        # the 5-round gate — the per-round broadcast build costs more
        # than the driver visit it replaces), so per the measure-first
        # rule the explicit collect stays.
        dang = (
            dang_nodes.join(r, "node")
            .agg(F.coalesce(F.sum("rank_mu"), F.lit(0)))
            .first()[0]
        )
        dshare = int(dang) // n
        r_new = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base_mu)
                    + F.expr(
                        f"({damping_pct} * (coalesce(in_mu, 0) "
                        f"+ {dshare})) div 100"
                    )
                )
                .cast("long")
                .alias("rank_mu"),
            )
            .localCheckpoint()
        )
        if tol_mu is not None:
            # bounded scalar: max rank movement this round (one row)
            delta = (
                r_new.join(r.withColumnRenamed("rank_mu", "prev"), "node")
                .agg(F.max(F.abs(F.col("rank_mu") - F.col("prev"))))
                .first()[0]
            )
            r = r_new
            if delta is not None and delta <= tol_mu:
                break
        else:
            r = r_new
    return r


def rank_prioritized_select(
    pages: DataFrame,
    ranks: DataFrame,
    suffixes: DataFrame,
    token_budget: int,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Centrality-prioritized selection: admit pages under a global
    token budget in order of their registered domain's PageRank — the
    composition a CommonCrawl-style pipeline runs once it HAS a domain
    rank (pages from well-linked domains fill the budget first; the
    content filters upstream decide admissibility, this stage decides
    priority). Page domains come from the same PSL machinery as the
    graph; pages whose domain has no rank (not in the graph) rank 0 —
    still admissible, last in line, never silently dropped.

    Selection is the shared `_budget_admit` kernel keyed by rank_mu
    (ties broken by ascending id, the repo-wide rule): one range
    repartition + bounded driver visit + local prefix windows — a
    hot rank value never funnels into one sort task.

    Returns admitted (id, domain, rank_mu, n_tokens, cum_tokens)."""
    from ..functions.text import tokens_column
    from .curation import _budget_admit

    host = hostname_of(F.col(url_col))
    keyed = with_registered_domain(
        pages.select(
            F.col(id_col),
            host.alias("__host"),
            F.size(tokens_column(F.col(text_col))).alias("n_tokens"),
        ),
        suffixes,
        host_col="__host",
        out_col="domain",
    ).join(
        # no broadcast hint (r14, ADVICE): at CommonCrawl scale the
        # rank vector is tens of millions of registered domains —
        # force-broadcasting it risks driver/executor OOM. Let the
        # planner choose: below autoBroadcastJoinThreshold it still
        # broadcasts; above it the join degrades to a shuffle on the
        # domain key, which is the correct shape, not a failure.
        ranks.withColumnRenamed("node", "domain"),
        "domain",
        "left",
    ).select(
        id_col,
        "domain",
        F.coalesce(F.col("rank_mu"), F.lit(0)).cast("long").alias("rank_mu"),
        "n_tokens",
    )
    return _budget_admit(
        keyed, token_budget, id_col, "rank_mu", num_partitions
    ).select(
        id_col,
        "domain",
        "rank_mu",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def anchor_text_table(
    links: DataFrame,
    dst_url_col: str = "link_url",
    text_col: str = "anchor_text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-target anchor-text corpus over an
    ``extract_links(with_text=True)`` table — the aggregation behind
    anchor-based weak supervision (every page's incoming link texts
    collected as queries that "point at" it; the MS MARCO / anchor-
    pretraining data shape).

    Returns one row per resolved target:
    (link_url, n_anchors, n_sources, texts) — ``n_anchors`` counts
    every href-bearing anchor (empty-text anchors included: an image
    link still endorses the target), ``n_sources`` the distinct source
    documents, and ``texts`` the DISTINCT non-empty anchor texts,
    sorted and '|'-joined (deterministic, hash-comparable — the
    engine's portable set representation). Unresolved targets (NULL
    link_url) are dropped — no target to attribute the text to.

    One groupBy exchange on the target url; at corpus scale that key
    is the natural shard (popular targets are exactly the rows worth
    having, and the DISTINCT-text set bounds hot-row width by text
    variety, not in-degree)."""
    return (
        links.where(F.col(dst_url_col).isNotNull())
        .groupBy(F.col(dst_url_col).alias("link_url"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.count_distinct(F.col(id_col)).cast("long").alias(
                "n_sources"
            ),
            F.array_join(
                F.array_sort(
                    F.collect_set(
                        F.when(F.col(text_col) != "", F.col(text_col))
                    )
                ),
                "|",
            ).alias("texts"),
        )
    )


def image_caption_table(
    images: DataFrame,
    dst_url_col: str = "image_url",
    text_col: str = "alt",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-image caption corpus over an ``html.extract_images`` table —
    the multimodal analog of ``anchor_text_table`` (r14, VERDICT r13
    item 3): every page's alt texts for a given image collected as its
    caption candidates — the LAION-style image–text pair shape a VLM
    data pipeline trains on (join it to the media-dedup survivors and
    each surviving image carries its crawl-harvested captions).

    Returns one row per resolved image target:
    (image_url, n_refs, n_sources, captions) — ``n_refs`` counts every
    src-bearing <img> (alt-less refs included: a reference endorses
    the image even uncaptioned), ``n_sources`` the distinct referring
    documents, ``captions`` the DISTINCT non-empty alt texts, sorted
    and '|'-joined (the engine's portable set representation).
    Unresolved targets (NULL image_url — data: URIs, relative paths)
    are dropped.

    One groupBy exchange on the image url; popular images are the
    natural hot keys and the DISTINCT-caption set bounds hot-row width
    by caption variety, not reference count — the exact
    ``anchor_text_table`` scale argument."""
    return (
        images.where(F.col(dst_url_col).isNotNull())
        .groupBy(F.col(dst_url_col).alias("image_url"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_refs"),
            F.count_distinct(F.col(id_col)).cast("long").alias(
                "n_sources"
            ),
            F.array_join(
                F.array_sort(
                    F.collect_set(
                        F.when(F.col(text_col) != "", F.col(text_col))
                    )
                ),
                "|",
            ).alias("captions"),
        )
    )
