"""URL/domain filtering: the stage a crawl-curation pipeline runs FIRST.

C4/RefinedWeb-style pipelines filter on the URL before touching page
bytes (Raffel et al. 2020 §2.2 blocklist filtering; Penedo et al. 2023
§3.1 "URL filtering ... before any expensive computation") — it is the
cheapest, highest-yield filter: normalization collapses recrawl
variants, the registered domain keys blocklist and per-site policies,
and URL-level dedup drops refetches before HTML extraction pays for
them. This module is that tier, Spark-first:

- ``normalize_url`` — pure expression kernel (RFC 3986 §6 syntax-based
  normalization subset): scheme/host lowercased, userinfo dropped,
  default port stripped (``:80`` http / ``:443`` https), fragment
  stripped, tracking query parameters removed (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``mc_eid``), empty path → ``/``, and a finite
  percent-decode of the unreserved escapes ``%7E``/``%2D``/``%5F``
  (RFC 3986 §2.3 says decoding unreserved characters never changes the
  resource; the general %XX decode needs per-match hex arithmetic and
  stays out of the expression tier — the honest-limit discipline of
  operators/html.py). Every pattern is Java-regex == RE2 portable, so
  the DuckDB oracle replays the kernel byte-for-byte.
- ``registered_domain`` — public-suffix-style extraction: the host's
  longest suffix present in a suffix table (depth ≤ 3 labels, covering
  ``com`` through ``ac.uk``-shaped entries) plus ONE label. Expressed
  as three broadcast left joins against the (bounded, PSL-sized) suffix
  dim — no explode, no shuffle.
- ``url_filters`` — the composed tier: normalize → domain → blocklist
  anti-join (broadcast; a blocklist is domain-count-sized, independent
  of corpus size — unlike the r9 doc-side dimension this dim does NOT
  grow with the data) → URL-level dedup (ONE hash shuffle keyed by the
  normalized URL, keep-lowest-id survivor — the only exchange in the
  tier, and the unavoidable one: recrawl dedup is a global group-by on
  the URL key at any scale).

``crawl_curation`` composes this tier AHEAD of the HTML stage (cheapest
filter first), and the whole tier is oracle-gated in
``__spark_entry__.q_url_filters``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
# tracking parameters removed by normalization (lowercase convention —
# the forms CMS/analytics stacks actually emit)
TRACKING_PARAMS_RE = r"(?:utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid)"
# finite unreserved percent-decode (RFC 3986 §2.3 / §6.2.2.2)
PERCENT_UNRESERVED = [
    ("%7E", "~"), ("%7e", "~"),
    ("%2D", "-"), ("%2d", "-"),
    ("%5F", "_"), ("%5f", "_"),
]


def url_parts(url: Column) -> tuple[Column, Column, Column]:
    """(scheme, hostport, rest): lowercased scheme and authority (with
    userinfo dropped), and the raw path?query#fragment remainder.
    Unparseable URLs (no ``scheme://``) yield scheme = '' — callers
    treat that as not-a-URL."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    after = F.regexp_replace(url, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    hostport = F.regexp_replace(hostport, r"^[^/?#@]*@", "")
    rest = F.regexp_replace(after, r"^[^/?#]*", "")
    return scheme, hostport, rest


def _strip_default_port(scheme: Column, hostport: Column) -> Column:
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )


def _normalize_rest(rest: Column) -> Column:
    """Fragment off, tracking params out (mid-list, then leading-
    followed, then lone), unreserved escapes decoded, empty path → /."""
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, rf"&{TRACKING_PARAMS_RE}=[^&]*", "")
    rest = F.regexp_replace(rest, rf"\?{TRACKING_PARAMS_RE}=[^&]*&", "?")
    rest = F.regexp_replace(rest, rf"\?{TRACKING_PARAMS_RE}=[^&]*$", "")
    for pe, ch in PERCENT_UNRESERVED:
        rest = F.replace(rest, F.lit(pe), F.lit(ch))
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(
        rest.startswith("?"), F.concat(F.lit("/"), rest)
    ).otherwise(rest)


def normalize_url(url: Column) -> Column:
    """The normalized URL string, or NULL when the input doesn't parse
    as ``scheme://host...``. One fused projection — no UDF, no shuffle."""
    scheme, hostport, rest = url_parts(url)
    host = _strip_default_port(scheme, hostport)
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, _normalize_rest(rest)),
    )


def hostname_of(url: Column) -> Column:
    """Lowercased host with userinfo and any port dropped ('' when the
    URL doesn't parse)."""
    _, hostport, _ = url_parts(url)
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def with_registered_domain(
    df: DataFrame,
    suffixes: DataFrame,
    host_col: str = "host",
    out_col: str = "registered_domain",
    max_suffix_labels: int = 3,
) -> DataFrame:
    """Adds ``out_col``: the public-suffix-style registered domain of
    ``host_col`` — the LONGEST suffix in ``suffixes`` (one ``suffix``
    string column, e.g. ``com`` / ``co.uk`` / ``ac.uk``) plus one label.
    NULL when no suffix matches or the host IS a bare suffix.

    Plan shape: ``max_suffix_labels`` broadcast left joins against the
    suffix dim (PSL-sized — ~10k rows for the real list — bounded and
    corpus-independent, so the broadcast is the right call here); the
    candidate last-k-label strings are plain column expressions, no
    explode, so the big side never shuffles."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    out = df.withColumn("__labels", labels).withColumn("__nl", n)
    matched: list[Column] = []
    for k in range(1, max_suffix_labels + 1):
        cand = F.when(
            F.col("__nl") >= k + 1,
            F.array_join(F.slice(F.col("__labels"), F.col("__nl") - k + 1, k), "."),
        )
        # dims are unique by contract (the PSL and blocklists are sets);
        # no .distinct() here — it would put a dim-sized exchange in
        # front of every broadcast build
        dim = F.broadcast(suffixes.select(F.col("suffix").alias(f"__sfx{k}")))
        out = out.withColumn(f"__cand{k}", cand).join(
            dim, F.col(f"__cand{k}") == F.col(f"__sfx{k}"), "left"
        )
        matched.append(F.col(f"__sfx{k}"))
    reg = None
    for k in range(max_suffix_labels, 0, -1):  # longest suffix wins
        take = F.array_join(
            F.slice(F.col("__labels"), F.col("__nl") - k, k + 1), "."
        )
        reg = (
            F.when(matched[k - 1].isNotNull(), take)
            if reg is None
            else reg.when(matched[k - 1].isNotNull(), take)
        )
    out = out.withColumn(out_col, reg)
    drop = ["__labels", "__nl"] + [
        c for k in range(1, max_suffix_labels + 1)
        for c in (f"__cand{k}", f"__sfx{k}")
    ]
    return out.drop(*drop)


def idna_ascii_hosts_pandas(
    df: DataFrame, host_col: str = "host", out_col: str = "host_idna"
) -> DataFrame:
    """IDNA ToASCII canonicalization — the Arrow-batched twin for the
    expression tier's documented non-ASCII limit (the BPE/entity twin
    pattern). A recrawl of ``münchen.example`` and of its punycode form
    ``xn--mnchen-3ya.example`` is the SAME site; URL dedup that keys on
    the raw host misses it. This twin adds ``out_col`` = the per-label
    ToASCII form (stdlib ``encodings.idna``, RFC 3490), so keying the
    dedup on it unifies both spellings. Already-ASCII hosts pass
    through byte-identical; labels ToASCII rejects (empty, over 63
    octets, bad code points) leave the ORIGINAL host in place —
    fail-open, the html.py discipline: canonicalization must never
    invent a new key for a host it can't encode. Zero-shuffle: one
    ``mapInPandas`` projection appended to the input columns."""
    from typing import Iterator

    cols = list(df.columns)
    if out_col in cols:
        raise ValueError(f"column {out_col!r} already exists")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def to_ascii(host) -> str | None:
        if host is None:
            return None
        try:
            return ".".join(
                lbl.encode("idna").decode("ascii") if lbl else lbl
                for lbl in str(host).split(".")
            )
        except UnicodeError:
            return str(host)

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [to_ascii(h) for h in pdf[host_col]]
            yield pdf

    return df.mapInPandas(op, f"{schema}, {out_col} string")


def url_filters(
    pages: DataFrame,
    suffixes: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
    passthrough: list[str] | None = None,
    dedup: bool = True,
    keep: str = "first",
) -> DataFrame:
    """The composed URL tier: per input row returns ``norm_url``,
    ``scheme``, ``host``, ``host_is_ip``, ``registered_domain``,
    ``blocked``, ``is_dup``, and ``url_keep`` (http/https, parseable
    host, not blocklisted, not a duplicate fetch of an earlier row's
    URL).

    - ``blocklist``: one ``domain`` string column of registered domains;
      matching rows are flagged (broadcast left join — the blocklist is
      bounded by the number of listed domains, never by corpus size).
    - ``host_is_ip``: IPv4-literal hosts — they have no registered
      domain by construction (flagged so a policy tier can treat them
      separately; many curation pipelines drop them outright).
    - dedup: one survivor per ``norm_url`` — the tier's single shuffle,
      keyed by the normalized URL. ``keep="first"`` (default, the
      oracle-gated semantics) keeps the lowest ``id_col``;
      ``keep="last"`` keeps the highest — the freshest-fetch policy
      when ids are fetch-ordered, which is what a recrawl pipeline
      usually wants. Unparseable rows (NULL ``norm_url``) are never
      marked dups; they fail ``url_keep`` on the scheme/host predicate
      instead.
    - ``dedup=False`` drops the dedup window (``is_dup`` becomes
      constant False): every remaining stage is a stateless projection
      plus broadcast joins, so the tier runs UNCHANGED on a stream
      (tested) — the continuous-ingest shape. Streaming URL dedup is a
      stateful operator: ``streaming.docs.url_dedup_stream`` composes
      this tier with ``dropDuplicatesWithinWatermark`` on ``norm_url``
      (bounded state — the horizon is the honest recrawl semantics)."""
    scheme, hostport, rest = url_parts(F.col(url_col))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    out = pages.select(
        id_col,
        *(passthrough or []),
        F.col(url_col).alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$").alias("host_is_ip"),
        normalize_url(F.col(url_col)).alias("norm_url"),
    )
    out = with_registered_domain(out, suffixes)
    if blocklist is not None:
        dim = F.broadcast(
            blocklist.select(F.col("domain").alias("__blocked_domain"))
        )
        out = out.join(
            dim, F.col("registered_domain") == F.col("__blocked_domain"), "left"
        ).withColumn(
            "blocked", F.col("__blocked_domain").isNotNull()
        ).drop("__blocked_domain")
    else:
        out = out.withColumn("blocked", F.lit(False))
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    if dedup:
        order = F.col(id_col) if keep == "first" else F.col(id_col).desc()
        w = Window.partitionBy("norm_url").orderBy(order)
        out = out.withColumn(
            "is_dup",
            F.when(
                F.col("norm_url").isNotNull(), F.row_number().over(w) > 1
            ).otherwise(F.lit(False)),
        )
    else:
        out = out.withColumn("is_dup", F.lit(False))
    return out.withColumn(
        "url_keep",
        F.col("scheme").isin("http", "https")
        & (F.col("host") != "")
        & ~F.col("blocked")
        & ~F.col("is_dup"),
    )
