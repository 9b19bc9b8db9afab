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
  default port stripped (``:80`` http / ``:443`` https — anchored to a
  well-formed single-port authority so normalization is a true fixed
  point), fragment stripped, tracking query parameters removed
  (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid`` — applied
  to the QUERY component only, never to a literal ``&utm_...`` inside
  a path segment), empty path → ``/``, and a finite percent-decode of
  the unreserved escapes ``%7E``/``%2D``/``%5F`` (RFC 3986 §2.3 says
  decoding unreserved characters never changes the resource; the
  general %XX decode needs per-match hex arithmetic and stays out of
  the expression tier — the honest-limit discipline of
  operators/html.py; ``normalize_url_full_pandas`` below is the
  Arrow-batched twin that finishes the job). Every pattern is
  Java-regex == RE2 portable, so the DuckDB oracle replays the kernel
  byte-for-byte.
- ``registered_domain`` — public-suffix extraction with the REAL PSL
  rule semantics (publicsuffix.org/list: longest matching rule
  prevails; ``*.`` wildcard rules match any label in the starred
  position; ``!`` exception rules beat wildcards and make the matched
  labels themselves the registrable domain), depth ≤ ``max_suffix_labels``
  (default 4 — the real list carries 4-label entries like
  ``pvt.k12.ma.us``). Expressed as per-(length, kind) broadcast left
  joins against filtered slices of the (bounded, PSL-sized) suffix
  dim — no explode, no shuffle, no dim-side aggregation.
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

import re

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
    # The pattern is anchored to a well-formed single-port authority
    # (host has no ':' of its own), so normalization is a true FIXED
    # POINT even on pathological 'h:80:80' inputs — those simply don't
    # match and pass through unchanged on every pass.
    return (
        F.when(
            scheme == "http", F.regexp_replace(hostport, r"^([^:]+):80$", "$1")
        )
        .when(
            scheme == "https",
            F.regexp_replace(hostport, r"^([^:]+):443$", "$1"),
        )
        .otherwise(hostport)
    )


def _normalize_rest(rest: Column) -> Column:
    """Fragment off, tracking params out of the QUERY component only
    (split at the first '?', so a literal '&utm_...' inside a path
    segment is never touched; the leading/lone patterns are '^'-anchored
    so single- vs global-replacement engines agree on every input),
    unreserved escapes decoded, empty path → /."""
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    query = F.regexp_replace(query, rf"&{TRACKING_PARAMS_RE}=[^&]*", "")
    query = F.regexp_replace(query, rf"^\?{TRACKING_PARAMS_RE}=[^&]*&", "?")
    query = F.regexp_replace(query, rf"^\?{TRACKING_PARAMS_RE}=[^&]*$", "")
    rest = F.concat(path, query)
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
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Adds ``out_col``: the registered (registrable) domain of
    ``host_col`` under the REAL public-suffix-list rule semantics
    (publicsuffix.org/list — the algorithm every browser ships):

    - plain rules (``com``, ``co.uk``, ``pvt.k12.ma.us``) match hosts
      ending in the rule's labels;
    - wildcard rules (``*.ck``) match with ``*`` standing for exactly
      one label (so ``*.ck`` is a 2-label rule matching ``shop.ck``);
    - exception rules (``!www.ck``) beat every other match and make the
      matched labels THEMSELVES the registrable domain;
    - among non-exception matches the LONGEST rule prevails, and the
      registrable domain is the prevailing suffix plus one label — NULL
      when the host IS the prevailing suffix (e.g. host ``co.uk`` with
      rule ``co.uk`` has no registrable domain, even if ``uk`` is also
      listed — the prevailing rule is the longest MATCH, full stop).

    Plan shape: one broadcast left join per (rule length, rule kind)
    against a filtered slice of the suffix dim (PSL-sized — ~10k rows
    for the real list — bounded and corpus-independent, so broadcasting
    is the right call); the candidate last-k-label strings are plain
    column expressions, no explode and no dim-side aggregation, so the
    big side never shuffles and the tier plan stays exchange-free."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    out = df.withColumn("__labels", labels).withColumn("__nl", n)
    nl = F.col("__nl")
    # dims are unique by contract (the PSL and blocklists are sets); the
    # per-kind slices are pure filters — no .distinct()/.groupBy(), which
    # would put a dim-sized exchange in front of every broadcast build
    sfx = suffixes.select("suffix")
    n_rule_labels = F.size(F.split(F.col("suffix"), r"\."))
    is_exc = F.col("suffix").startswith("!")
    is_wild = F.col("suffix").startswith("*.")

    def _cand(k: int) -> Column:
        return F.when(
            nl >= k,
            F.array_join(F.slice(F.col("__labels"), nl - k + 1, k), "."),
        )

    drop = ["__labels", "__nl"]
    exact_m: dict[int, Column] = {}
    wild_m: dict[int, Column] = {}
    exc_m: dict[int, Column] = {}
    for k in range(1, max_suffix_labels + 1):
        out = out.withColumn(f"__cand{k}", _cand(k))
        drop.append(f"__cand{k}")
        # plain rules of k labels
        dim = F.broadcast(
            sfx.where(~is_exc & ~is_wild & (n_rule_labels == k)).select(
                F.col("suffix").alias(f"__x{k}")
            )
        )
        out = out.join(dim, F.col(f"__cand{k}") == F.col(f"__x{k}"), "left")
        exact_m[k] = F.col(f"__x{k}").isNotNull()
        drop.append(f"__x{k}")
        # wildcard rules *.REM where REM has k labels (rule length k+1):
        # the starred label must exist, so the match needs nl >= k+1
        if k + 1 <= max_suffix_labels:
            dimw = F.broadcast(
                sfx.where(is_wild & (n_rule_labels == k + 1)).select(
                    F.expr("substring(suffix, 3)").alias(f"__w{k}")
                )
            )
            out = out.join(
                dimw, F.col(f"__cand{k}") == F.col(f"__w{k}"), "left"
            )
            wild_m[k] = F.col(f"__w{k}").isNotNull() & (nl >= k + 1)
            drop.append(f"__w{k}")
        # exception rules !DOM where DOM has k labels
        dime = F.broadcast(
            sfx.where(is_exc & (n_rule_labels == k)).select(
                F.expr("substring(suffix, 2)").alias(f"__e{k}")
            )
        )
        out = out.join(dime, F.col(f"__cand{k}") == F.col(f"__e{k}"), "left")
        exc_m[k] = F.col(f"__e{k}").isNotNull()
        drop.append(f"__e{k}")
    # effective prevailing-suffix length among non-exception matches:
    # a plain k-label match contributes k; a wildcard *.REM match (REM
    # of k labels) contributes k+1 (the starred label is part of the
    # suffix)
    contribs: list[Column] = [F.lit(0)]
    for k, m in exact_m.items():
        contribs.append(F.when(m, F.lit(k)).otherwise(F.lit(0)))
    for k, m in wild_m.items():
        contribs.append(F.when(m, F.lit(k + 1)).otherwise(F.lit(0)))
    eff = F.greatest(*contribs) if len(contribs) > 1 else contribs[0]
    reg = F.when(
        (eff > 0) & (nl >= eff + 1),
        F.array_join(F.slice(F.col("__labels"), nl - eff, eff + 1), "."),
    )
    # exception rules prevail over everything: the matched labels are
    # the registrable domain (wrapping ascending leaves the LONGEST
    # exception as the outermost — checked-first — branch)
    for k in range(1, max_suffix_labels + 1):
        reg = F.when(exc_m[k], F.col(f"__cand{k}")).otherwise(reg)
    out = out.withColumn(out_col, reg)
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
    ts_col: str | None = None,
    max_suffix_labels: int = 4,
    canonical: bool = False,
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
      keyed by the normalized URL. ``keep="first"`` (default) keeps the
      earliest row; ``keep="last"`` keeps the latest — the
      freshest-fetch recrawl policy. "Earliest/latest" is by ``ts_col``
      when given (the EXPLICIT fetch-time policy, tie-broken by
      ``id_col`` for determinism — r11, VERDICT r10 item 6) and by
      ``id_col`` alone otherwise (the conventional policy, which is
      only the fetch order if ids are fetch-ordered). A given
      ``ts_col`` is carried into the output. Unparseable rows (NULL
      ``norm_url``) are never marked dups; they fail ``url_keep`` on
      the scheme/host predicate instead.
    - ``dedup=False`` drops the dedup window (``is_dup`` becomes
      constant False): every remaining stage is a stateless projection
      plus broadcast joins, so the tier runs UNCHANGED on a stream
      (tested) — the continuous-ingest shape. Streaming URL dedup is a
      stateful operator: ``streaming.docs.url_dedup_stream`` composes
      this tier with ``dropDuplicatesWithinWatermark`` on ``norm_url``
      (bounded state — the horizon is the honest recrawl semantics).
    - ``canonical=True`` (r11) keys the dedup on ``canon_url`` — the
      fused-twin canonical key (IDNA host + full percent-decode over
      the expression tier's ``norm_url``), so recrawl variants the
      finite expression tier documents as out of reach
      (``%41``-escapes, UTF-8 percent sequences, unicode-vs-punycode
      hosts) collapse to ONE survivor. One extra zero-shuffle Arrow
      projection before the same single dedup exchange; ``canon_url``
      rides into the output. The expression tier stays the
      oracle-gated surface (default False)."""
    scheme, hostport, rest = url_parts(F.col(url_col))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    out = pages.select(
        id_col,
        *([ts_col] if ts_col else []),
        *(passthrough or []),
        F.col(url_col).alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$").alias("host_is_ip"),
        normalize_url(F.col(url_col)).alias("norm_url"),
    )
    if canonical:
        out = with_canonical_url(out)
    out = with_registered_domain(
        out, suffixes, max_suffix_labels=max_suffix_labels
    )
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
        key = "canon_url" if canonical else "norm_url"
        keys = ([F.col(ts_col)] if ts_col else []) + [F.col(id_col)]
        order = [c if keep == "first" else c.desc() for c in keys]
        w = Window.partitionBy(key).orderBy(*order)
        out = out.withColumn(
            "is_dup",
            F.when(
                F.col(key).isNotNull(), F.row_number().over(w) > 1
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


# ------------------------------------------------------------------
# Full percent-decode twin (r11, VERDICT r10 item 2): the expression
# tier decodes only the three unreserved escapes it can spell as finite
# replaces; this Arrow-batched twin finishes RFC 3986 §6.2.2.2 + §2.1
# for the dedup key — the IDNA-twin pattern (expression tier stays the
# oracle surface; the twin is equivalence- and property-tested).

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")


def percent_decode_full(s: str) -> str:
    """One URL string → its percent-normalized form:

    - ``%XX`` escapes of RFC 3986 UNRESERVED characters decode
      (``%41`` → ``A``, ``%7e`` → ``~``) — §2.3: never changes the
      resource;
    - runs of escapes that form a valid multi-byte UTF-8 sequence
      decode to their character (``%C3%BC`` → ``ü``) — the recrawl
      variants IRI-vs-URI spellings produce;
    - everything else stays ENCODED with uppercase hex digits
      (``%2f`` → ``%2F``, §6.2.2.1) — decoding a reserved character
      (``%2F`` → ``/``, ``%25`` → ``%``) WOULD change the resource,
      so it never happens, which also makes the function idempotent
      (no new ``%`` or decodable escape is ever introduced).

    Pure function (tested directly + via hypothesis); the Spark face
    is ``normalize_url_full_pandas``."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "%" or i + 2 >= n or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
            out.append(c)
            i += 1
            continue
        # collect the maximal run of %XX escapes
        run = bytearray()
        j = i
        while (
            j + 2 < n
            and s[j] == "%"
            and s[j + 1] in _HEX
            and s[j + 2] in _HEX
        ):
            run.append(int(s[j + 1 : j + 3], 16))
            j += 3
        # walk the byte run: unreserved ASCII decodes; a valid UTF-8
        # multi-byte sequence decodes; anything else re-encodes upper
        p, m = 0, len(run)
        while p < m:
            b = run[p]
            ch = chr(b)
            if ch in _UNRESERVED:
                out.append(ch)
                p += 1
                continue
            seq_len = (
                2 if 0xC2 <= b <= 0xDF
                else 3 if 0xE0 <= b <= 0xEF
                else 4 if 0xF0 <= b <= 0xF4
                else 0
            )
            if seq_len and p + seq_len <= m:
                try:
                    decoded = run[p : p + seq_len].decode("utf-8")
                except UnicodeDecodeError:
                    decoded = None
                if decoded is not None:
                    out.append(decoded)
                    p += seq_len
                    continue
            out.append(f"%{b:02X}")
            p += 1
        i = j
    return "".join(out)


def normalize_url_full_pandas(
    df: DataFrame, url_col: str = "norm_url", out_col: str = "norm_url_full"
) -> DataFrame:
    """Appends ``out_col`` = ``percent_decode_full(url_col)`` — the
    FULL-percent-decode dedup key. Keying recrawl dedup on it unifies
    ``/a%62c`` with ``/abc`` and ``/caf%C3%A9`` with ``/café``, which
    the finite expression tier documents as out of reach. NULL inputs
    pass through NULL. Zero-shuffle: one Arrow-batched ``mapInPandas``
    projection appended to the input columns (the IDNA-twin shape,
    ``idna_ascii_hosts_pandas`` above)."""
    from typing import Iterator

    import pandas as pd  # noqa: F811 — local for the pickled closure

    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    dec = percent_decode_full

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                dec(u) if u is not None else None for u in pdf[url_col]
            ]
            yield pdf

    return df.mapInPandas(op, f"{schema}, {out_col} string")


def canonical_url(url: str) -> str | None:
    """Driver/executor-side canonical DEDUP KEY for an
    already-normalized URL (the ``normalize_url`` output): IDNA-ToASCII
    the host (RFC 3490 — ``münchen.example`` and
    ``xn--mnchen-3ya.example`` become one key) and full
    percent-normalize the path/query (``percent_decode_full``). Pure
    function; the Spark face is ``with_canonical_url``. None in, None
    out; fail-open per label (the IDNA-twin contract: canonicalization
    must never invent a new key for a host it can't encode)."""
    if url is None:
        return None
    m = re.match(r"^([a-z][a-z0-9+.\-]*://)([^/?#]*)(.*)$", url)
    if not m:
        return percent_decode_full(url)
    scheme, hostport, rest = m.groups()
    host, colon, port = hostport.partition(":")
    try:
        host = ".".join(
            lbl.encode("idna").decode("ascii") if lbl else lbl
            for lbl in host.split(".")
        )
    except UnicodeError:
        pass
    return scheme + host + colon + port + percent_decode_full(rest)


def with_canonical_url(
    df: DataFrame, url_col: str = "norm_url", out_col: str = "canon_url"
) -> DataFrame:
    """Appends ``out_col`` = ``canonical_url(url_col)`` — the FUSED
    twin (IDNA host + full percent-decode in ONE Arrow pass, instead of
    chaining ``idna_ascii_hosts_pandas`` and
    ``normalize_url_full_pandas`` as two). Zero-shuffle projection."""
    from typing import Iterator

    import pandas as pd  # noqa: F811 — local for the pickled closure

    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    canon = canonical_url

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [canon(u) for u in pdf[url_col]]
            yield pdf

    return df.mapInPandas(op, f"{schema}, {out_col} string")


# regex metacharacters escaped when a robots.txt path pattern compiles
# to a match regex — backslash FIRST (it is the escape char), '*' NOT
# listed (it is the robots wildcard and becomes '.*').
_ROBOTS_META = ["\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$"]


def robots_rules(
    robots: DataFrame,
    domain_col: str = "registered_domain",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt texts into per-domain rule ARRAYS (RFC 9309 —
    the crawl-politeness stage a real URL tier needs next to the
    blocklist): one row ``(domain, rules)`` per input domain, where
    ``rules`` is an array of ``struct<rule_len, allow, path, re>``
    holding every Allow/Disallow line applicable to ``agent``.

    The RFC semantics implemented (each pinned by a gate stripe):
    lines are ``directive: value`` with ``#`` comments and unknown
    directives (Crawl-delay, Sitemap, …) ignored; CONTIGUOUS
    ``User-agent`` lines open one group and the rules that follow
    belong to it; a group applies to ``agent`` when one of its agent
    tokens matches case-insensitively — and if ANY group names the
    agent specifically, the ``*`` groups are ignored (the RFC's
    most-specific-group rule); rules from all applicable groups
    combine; an EMPTY pattern is a no-op; patterns are literal path
    prefixes with ``*`` matching any run and a trailing ``$``
    anchoring the end — each compiles to an anchored regex via a
    chained metacharacter escape (identical algorithm in the oracle,
    no dialect backrefs); ``rule_len`` is the pattern's octet count,
    the RFC's specificity measure.

    Scale shape: everything here runs on the ROBOTS DIM (one row per
    domain — bounded like the blocklist, independent of corpus size):
    one posexplode over lines, two dim-keyed windows (group ids,
    specific-group presence), one groupBy back to arrays. The corpus
    never appears."""
    lines = (
        robots.select(
            F.col(domain_col).alias("domain"),
            F.posexplode(F.split(F.col(txt_col), "\n")).alias(
                "__pos", "__line"
            ),
        )
        .withColumn(
            "__clean", F.trim(F.regexp_replace("__line", "#.*$", ""))
        )
        .withColumn(
            "__dir",
            F.lower(F.regexp_extract("__clean", r"^([A-Za-z-]+)\s*:", 1)),
        )
        .withColumn(
            "__val",
            F.trim(F.regexp_extract("__clean", r"^[A-Za-z-]+\s*:(.*)$", 1)),
        )
        .withColumn("__is_ua", F.col("__dir") == "user-agent")
        .withColumn(
            "__is_rule", F.col("__dir").isin("allow", "disallow")
        )
    )
    wseq = Window.partitionBy("domain").orderBy("__pos")
    grouped = lines.withColumn(
        "__grp",
        F.sum(
            F.when(
                F.col("__is_ua")
                & ~F.coalesce(F.lag("__is_ua").over(wseq), F.lit(False)),
                1,
            ).otherwise(0)
        ).over(wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    a = agent.lower()
    wgrp = Window.partitionBy("domain", "__grp")
    wdom = Window.partitionBy("domain")
    flagged = (
        grouped.withColumn(
            "__grp_specific",
            F.max(
                F.when(
                    F.col("__is_ua") & (F.lower("__val") == F.lit(a)), 1
                ).otherwise(0)
            ).over(wgrp),
        )
        .withColumn(
            "__grp_star",
            F.max(
                F.when(
                    F.col("__is_ua") & (F.col("__val") == "*"), 1
                ).otherwise(0)
            ).over(wgrp),
        )
        .withColumn(
            "__dom_specific", F.max("__grp_specific").over(wdom)
        )
        .withColumn(
            "__applies",
            F.when(F.col("__dom_specific") == 1, F.col("__grp_specific") == 1)
            .otherwise(F.col("__grp_star") == 1),
        )
    )
    rules = flagged.where(
        F.col("__is_rule")
        & F.col("__applies")
        & (F.col("__grp") > 0)
        & (F.length("__val") > 0)
    )
    anchored = F.col("__val").endswith("$")
    core = F.when(
        anchored, F.col("__val").substr(F.lit(1), F.length("__val") - 1)
    ).otherwise(F.col("__val"))
    esc = core
    for ch in _ROBOTS_META:
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    re_col = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return (
        rules.select(
            "domain",
            F.struct(
                F.length("__val").cast("int").alias("rule_len"),
                (F.col("__dir") == "allow").alias("allow"),
                F.col("__val").alias("path"),
                re_col.alias("re"),
            ).alias("__rule"),
        )
        .groupBy("domain")
        .agg(F.collect_list("__rule").alias("rules"))
    )


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "norm_url",
    domain_col: str = "registered_domain",
    agent: str = "*",
    default_allow: bool = True,
) -> DataFrame:
    """Apply robots.txt politeness to URL-tier survivors (r12): appends
    ``robots_rule`` (the matched pattern, NULL when no rule matches or
    the domain has no robots.txt) and ``robots_allow`` (the RFC 9309
    decision: among matching rules the LONGEST pattern wins, Allow
    beating Disallow on a length tie; no match → ``default_allow``).
    Matching runs against the URL's path+query (what the RFC's
    path-pattern addresses).

    Scale shape: the parsed rules aggregate to ONE array row per
    domain (a robots dim — bounded like the blocklist) and broadcast;
    the match + longest-rule decision is a per-row higher-order
    filter/array_max over that array, so the CORPUS never shuffles and
    gains zero exchanges — same discipline as the PSL joins."""
    rules = robots_rules(
        robots, domain_col=domain_col, agent=agent
    ).withColumnRenamed("domain", "__rdom")
    joined = pages.join(
        F.broadcast(rules),
        F.col(domain_col) == F.col("__rdom"),
        "left",
    ).drop("__rdom")
    path = F.regexp_replace(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", ""
    )
    # a URL with no path component ("https://example.com") strips to ""
    # — RFC 9309 §2.2.2 and real crawlers match the absent path as "/"
    # (else even "Disallow: /" would let the ROOT page through); r13,
    # ADVICE r12
    path = F.when(path == "", F.lit("/")).otherwise(path)
    joined = joined.withColumn("__path", path)
    # array_max over the matching rules: struct field order makes the
    # comparison (rule_len, allow, path) — longest wins, Allow beats
    # Disallow on a tie, path is the deterministic final tie-break
    best = F.array_max(
        F.filter(
            F.col("rules"),
            lambda r: F.regexp_like(F.col("__path"), r["re"]),
        )
    )
    return (
        joined.withColumn("__best", best)
        .withColumn("robots_rule", F.col("__best.path"))
        .withColumn(
            "robots_allow",
            F.coalesce(F.col("__best.allow"), F.lit(default_allow)),
        )
        .drop("rules", "__path", "__best")
    )


def domain_cap(
    pages: DataFrame,
    max_per_domain: int,
    domain_col: str = "registered_domain",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    keep: str = "first",
    fallback_col: str | None = "host",
    bounded: bool = False,
    salt_parts: int = 64,
) -> DataFrame:
    """Per-registered-domain document QUOTA — the anti-domination stage
    RefinedWeb/FineWeb-style pipelines run after URL dedup (a handful
    of template-heavy sites otherwise contribute a huge share of a
    crawl; capping per registrable domain bounds any single publisher's
    weight in the training mix). Appends ``domain_rank`` (1-based
    position within the domain, ordered like ``url_filters``' survivor
    policy: by ``ts_col`` when given then ``id_col``, ascending for
    ``keep="first"`` / descending for ``"last"``) and ``domain_keep``
    (rank ≤ ``max_per_domain``).

    Rows with a NULL ``domain_col`` group by ``fallback_col`` instead
    (per-host quotas for IP-literal and unlisted-suffix hosts); with
    ``fallback_col=None`` they are EXEMPT (rank NULL, keep TRUE) — a
    quota needs a grouping basis, and inventing one is worse than
    passing the policy decision downstream.

    Two scale modes (VERDICT r11 item 1):

    ``bounded=False`` (exact, the oracle/gate surface): ONE hash
    shuffle keyed by the domain, full rank window per domain. Every
    row gets its true global ``domain_rank``. The partition key is
    definitionally max-skew — the mega-domains being capped — so one
    task sorts the hottest domain's entire row set; fine at test SFs,
    a straggler/spill at 10⁸-rows-per-hot-domain corpus sizes.

    ``bounded=True`` (the 100 TB form): two-phase quota. Phase 1
    pre-ranks per SALT group — the window keys on ``(salt, domain)``
    with ``salt = xxhash64(order keys) mod salt_parts``, so the
    exchange spreads a hot domain across ``salt_parts`` groups and no
    task ever sorts more than ~1/salt_parts of it. The salt is a
    DETERMINISTIC function of the row (r13, ADVICE r12: the r12 form
    salted by ``spark_partition_id()``, whose value depends on runtime
    partition assignment — the kept and dropped branches both derive
    from the pre-rank frame, and without guaranteed exchange reuse a
    recomputation could assign a row to different groups per branch,
    landing it in both or neither; a hash salt recomputes identically
    every time, AND spreads the hot domain even when the input arrives
    in one partition). A row whose GLOBAL rank ≤ cap has in-group rank
    ≤ cap (its global predecessors are a superset of its in-group
    predecessors — true for ANY partition of the domain's rows into
    groups), so the ≤ cap·salt_parts pre-rank survivors contain every
    true survivor. Phase 2 runs the exact window only over that
    bounded candidate set. Candidate-set rank ≤ cap ⟺ global rank ≤
    cap (a non-candidate predecessor implies ≥ cap candidate
    predecessors from its own salt group), and for kept rows the
    candidate-set rank EQUALS the global rank — so ``domain_keep`` is
    exact in both modes and ``domain_rank`` agrees on every kept row.
    The one contract difference: dropped rows report ``domain_rank``
    NULL in bounded mode (their beyond-cap rank is the quantity whose
    computation is the skew bomb; equivalence is property-tested in
    test_url.py)."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    dom = F.col(domain_col)
    if fallback_col is not None:
        key = F.coalesce(
            dom, F.concat(F.lit("host:"), F.col(fallback_col))
        )
    else:
        key = dom
    order = ([F.col(ts_col)] if ts_col else []) + [F.col(id_col)]
    if keep == "last":
        order = [c.desc() for c in order]
    if not bounded:
        w = Window.partitionBy(key).orderBy(*order)
        rank = F.when(key.isNotNull(), F.row_number().over(w))
        out = pages.withColumn("domain_rank", rank.cast("int"))
        return out.withColumn(
            "domain_keep",
            F.when(
                F.col("domain_rank").isNotNull(),
                F.col("domain_rank") <= max_per_domain,
            ).otherwise(F.lit(True)),
        )
    cols = pages.columns
    keyed = pages.withColumn("__dkey", key)
    exempt = keyed.where(F.col("__dkey").isNull()).select(
        *cols,
        F.lit(None).cast("int").alias("domain_rank"),
        F.lit(True).alias("domain_keep"),
    )
    # deterministic salt over the ORDER keys (not spark_partition_id —
    # see docstring): recomputation of the pre-rank frame under either
    # union branch assigns every row the same group, whatever the
    # runtime partitioning did
    salt_cols = ([F.col(ts_col)] if ts_col else []) + [F.col(id_col)]
    pre = (
        keyed.where(F.col("__dkey").isNotNull())
        .withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_parts)))
    )
    wpre = Window.partitionBy("__salt", "__dkey").orderBy(*order)
    pre = pre.withColumn("__prerank", F.row_number().over(wpre))
    wex = Window.partitionBy("__dkey").orderBy(*order)
    ranked = (
        pre.where(F.col("__prerank") <= max_per_domain)
        .withColumn("__r", F.row_number().over(wex))
    )
    kept = ranked.select(
        *cols,
        F.when(F.col("__r") <= max_per_domain, F.col("__r"))
        .cast("int")
        .alias("domain_rank"),
        (F.col("__r") <= max_per_domain).alias("domain_keep"),
    )
    dropped = pre.where(F.col("__prerank") > max_per_domain).select(
        *cols,
        F.lit(None).cast("int").alias("domain_rank"),
        F.lit(False).alias("domain_keep"),
    )
    return kept.unionByName(dropped).unionByName(exempt)
