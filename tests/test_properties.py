"""Property-based tests (hypothesis) — SURVEY §5 test strategy item 4.

Strategy: generate small corpora/matrices driver-side, run the Spark
operators, check algebraic invariants. One shared SparkSession; examples
kept small so the suite stays fast.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokens_column
from bigdata_lab02_spark.operators import matrix
from bigdata_lab02_spark.operators.dedup import shingles

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=8,
)
lines = st.lists(words, min_size=0, max_size=12).map(" ".join)


@settings(**_SETTINGS)
@given(line=lines)
def test_tokenizer_idempotent(spark, line):
    df = spark.createDataFrame([(line,)], "line string")
    once = df.select(tokens_column(F.col("line")).alias("t")).collect()[0]["t"]
    twice = (
        df.select(F.concat_ws(" ", tokens_column(F.col("line"))).alias("line"))
        .select(tokens_column(F.col("line")).alias("t"))
        .collect()[0]["t"]
    )
    assert once == twice
    assert all(t == t.lower() and t != "" for t in once)


coo_cells = st.lists(
    st.tuples(
        st.integers(1, 5), st.integers(1, 8), st.integers(1, 50)
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda c: (c[0], c[1]),
)


@settings(**_SETTINGS)
@given(cells=coo_cells)
def test_tf_sums_to_one(spark, cells):
    coo = spark.createDataFrame(cells, "doc_id int, term_id int, count long")
    tf = matrix.term_frequency(coo)
    for r in tf.groupBy("doc_id").agg(F.sum("tf").alias("s")).collect():
        assert abs(r["s"] - 1.0) < 1e-9


@settings(**_SETTINGS)
@given(cells=coo_cells)
def test_idf_nonnegative_and_bounded(spark, cells):
    coo = spark.createDataFrame(cells, "doc_id int, term_id int, count long")
    n_docs = len({c[0] for c in cells})
    idf = matrix.inverse_doc_frequency(coo).collect()
    for r in idf:
        assert -1e-12 <= r["idf"] <= math.log(n_docs) + 1e-12


@settings(**_SETTINGS)
@given(cells=coo_cells, data=st.data())
def test_topk_permutation_invariant(spark, cells, data):
    perm = data.draw(st.permutations(cells))
    a = matrix.top_terms(
        spark.createDataFrame(cells, "doc_id int, term_id int, count long"), 5
    ).collect()
    b = matrix.top_terms(
        spark.createDataFrame(perm, "doc_id int, term_id int, count long"), 5
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


@settings(**_SETTINGS)
@given(line=lines)
def test_shingles_are_distinct_and_cover(spark, line):
    df = spark.createDataFrame([(line,)], "line string")
    row = df.select(
        shingles(F.col("line"), 3).alias("s"),
        tokens_column(F.col("line")).alias("t"),
    ).collect()[0]
    sh, toks = row["s"], row["t"]
    assert len(sh) == len(set(sh))  # distinct
    if len(toks) >= 3:
        assert len(set(sh)) <= len(toks) - 2  # at most n-2 distinct trigrams
        for g in sh:
            assert len(g.split(" ")) == 3


# ------------------------------------------------------------ codec props


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ct=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, ct, data):
    """decode(encode(px)) == px for arbitrary pixel bytes across all
    supported color types and dimensions (driver-side, no Spark)."""
    from bigdata_lab02_spark.operators.png import decode_png, encode_png

    ch = {0: 1, 2: 3, 6: 4}[ct]
    px = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch)
        )
    )
    assert decode_png(encode_png(w, h, px, ct)) == (w, h, ch, px)


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    sr=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples, sr):
    from bigdata_lab02_spark.operators.wav import decode_wav, encode_wav

    assert decode_wav(encode_wav(samples, sr)) == (sr, 1, samples)


@given(st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_codecs_never_crash_on_garbage(blob):
    """Arbitrary bytes either decode cleanly or raise the codec's typed
    error — never an unhandled exception (the decode_ok=False contract)."""
    from bigdata_lab02_spark.operators.jpeg import JpegError, decode_jpeg
    from bigdata_lab02_spark.operators.png import PngError, decode_png
    from bigdata_lab02_spark.operators.wav import WavError, decode_wav

    for fn, err in (
        (decode_png, PngError),
        (decode_wav, WavError),
        (decode_jpeg, JpegError),
    ):
        try:
            fn(blob)
        except err:
            pass


@given(
    off_a=st.integers(0, 6),
    off_b=st.integers(0, 6),
    tail_a=st.integers(0, 3),
    tail_b=st.integers(0, 3),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dedup_spans_offset_invariant_property(spark, off_a, off_b, tail_a, tail_b):
    """The round-6 ExactSubstr contract as a PROPERTY: a shared
    span_tokens-long passage is removed from both documents at ANY pair of
    offsets, and all surrounding unique tokens survive exactly."""
    from bigdata_lab02_spark.operators.dedup import dedup_spans

    passage = ["p1", "p2", "p3", "p4"]
    doc_a = [f"a{i}" for i in range(off_a)] + passage + [
        f"x{i}" for i in range(tail_a)
    ]
    doc_b = [f"b{i}" for i in range(off_b)] + passage + [
        f"y{i}" for i in range(tail_b)
    ]
    docs = spark.createDataFrame(
        [(1, " ".join(doc_a)), (2, " ".join(doc_b))], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           dedup_spans(docs, span_tokens=4, stride=1).collect()}
    assert out[1]["n_removed"] == 4 and out[2]["n_removed"] == 4
    assert out[1]["text"].split() == [t for t in doc_a if t not in passage]
    assert out[2]["text"].split() == [t for t in doc_b if t not in passage]


# ---- r8: pure-python codec roundtrip properties (no Spark session) ----

_png_dims = st.tuples(st.integers(1, 24), st.integers(1, 16))


@settings(max_examples=30, deadline=None)
@given(dims=_png_dims, ct=st.sampled_from([0, 2, 4, 6]),
       depth=st.sampled_from([8, 16]), interlace=st.booleans(),
       data=st.data())
def test_png_roundtrip_any_profile(dims, ct, depth, interlace, data):
    """encode→decode is identity (8-bit) or high-byte reduction (16-bit)
    for EVERY color type × depth × interlace combination the profile
    supports, at arbitrary small dims — including the 1-pixel and
    single-row/column Adam7 edge shapes."""
    from bigdata_lab02_spark.operators.png import decode_png, encode_png

    w, h = dims
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    n = w * h * ch
    if depth == 8:
        px = bytes(data.draw(st.binary(min_size=n, max_size=n)))
        want = px
    else:
        import struct as _s

        vals = data.draw(st.lists(st.integers(0, 65535), min_size=n,
                                  max_size=n))
        px = b"".join(_s.pack(">H", v) for v in vals)
        want = bytes(v >> 8 for v in vals)
    got = decode_png(encode_png(w, h, px, ct, bit_depth=depth,
                                interlace=interlace))
    assert got == (w, h, ch, want)


@settings(max_examples=30, deadline=None)
@given(bits=st.sampled_from([8, 16, 24]), data=st.data())
def test_wav_roundtrip_any_depth(bits, data):
    """encode→decode is identity for signed canonical samples at every
    PCM depth, including the extremes of each range."""
    from bigdata_lab02_spark.operators.wav import decode_wav, encode_wav

    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    samples = data.draw(
        st.lists(st.integers(lo, hi), min_size=1, max_size=64)
    )
    # always exercise the range extremes too
    samples = [lo, hi] + samples
    sr = data.draw(st.sampled_from([8000, 16000, 44100]))
    assert decode_wav(encode_wav(samples, sr, bits=bits)) == (sr, 1, samples)


# --------------------------------------------------- URL tier (r10)

_url_host_label = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=0x7A),
    min_size=1,
    max_size=6,
)
_url_path_seg = st.text(
    alphabet="abcXYZ019._~%7E-",
    min_size=0,
    max_size=8,
)
_urls = st.builds(
    lambda scheme, user, labels, port, segs, q, frag: (
        scheme
        + (user + "@" if user else "")
        + ".".join(labels)
        + port
        + ("/" + "/".join(segs) if segs else "")
        + q
        + frag
    ),
    scheme=st.sampled_from(
        ["http://", "HTTP://", "https://", "HTTPS://", "ftp://", ""]
    ),
    user=st.sampled_from(["", "u:p"]),
    labels=st.lists(_url_host_label, min_size=1, max_size=4),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=st.lists(_url_path_seg, min_size=0, max_size=3),
    q=st.sampled_from(
        ["", "?q=1", "?utm_source=x", "?utm_source=x&q=1",
         "?q=1&utm_medium=m&r=2", "?UTM_SOURCE=keepcase"]
    ),
    frag=st.sampled_from(["", "#f", "#a?b=1"]),
)


@settings(**_SETTINGS)
@given(urls=st.lists(_urls, min_size=1, max_size=25))
def test_url_normalization_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u): the classic URL
    canonicalization property — a normalized URL must be a fixed point
    (otherwise dedup keys depend on HOW MANY times a pipeline stage ran).
    Checked over generated scheme/userinfo/port/percent/tracking/fragment
    combinations, including unparseable inputs (fixed at NULL)."""
    from bigdata_lab02_spark.operators.url import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(
        F.col("url"), normalize_url(F.col("url")).alias("n1")
    )
    both = once.select(
        "url", "n1", normalize_url(F.col("n1")).alias("n2")
    ).collect()
    for r in both:
        assert r["n2"] == r["n1"], (r["url"], r["n1"], r["n2"])


_SFX_LIST = [
    "com", "net", "org", "io", "uk", "co.uk", "ac.uk", "org.uk",
    "us", "ma.us", "k12.ma.us", "pvt.k12.ma.us",   # depth-4 chain
    "*.ck", "!www.ck", "*.news",                    # wildcard + exception
]
_dom_label = st.sampled_from(
    ["a", "bb", "news", "co", "ac", "org", "x9", "ck", "www", "k12", "ma"]
)
_hosts = st.builds(
    lambda labels, sfx: ".".join(labels + ([sfx] if sfx else [])),
    labels=st.lists(_dom_label, min_size=0, max_size=5),
    sfx=st.sampled_from(
        [s for s in _SFX_LIST if not s.startswith(("*.", "!"))]
        + ["ck", "www.ck", "x.ck", "pvt.k12.ma.us", ""]
    ),
)


def _ref_registered(host: str) -> str | None:
    """Independent PSL reference (plain python, publicsuffix.org
    algorithm): collect ALL matching rules ('*' matches exactly one
    label; '!' rules match their literal labels); an exception match
    makes its own labels the registrable domain; otherwise the longest
    match prevails and registrable = prevailing suffix + one label
    (None when the host IS the prevailing suffix)."""
    labels = host.split(".")
    n = len(labels)
    exc: list[int] = []
    eff = 0
    for rule in _SFX_LIST:
        if rule.startswith("!"):
            rl = rule[1:].split(".")
            if n >= len(rl) and labels[-len(rl):] == rl:
                exc.append(len(rl))
            continue
        rl = rule.split(".")
        k = len(rl)
        if n < k:
            continue
        tail = labels[-k:]
        if all(a == "*" or a == b for a, b in zip(rl, tail)):
            eff = max(eff, k)
    if exc:
        k = max(exc)
        return ".".join(labels[-k:])
    if eff and n >= eff + 1:
        return ".".join(labels[-(eff + 1):])
    return None


@settings(**_SETTINGS)
@given(hosts=st.lists(_hosts, min_size=1, max_size=30))
def test_registered_domain_matches_reference(spark, hosts):
    """The per-(length, kind) broadcast-join PSL extraction agrees with
    an independent python implementation of the publicsuffix.org
    algorithm on generated hosts — including the adversarial shapes:
    prepended labels EXTENDING a short suffix into a longer listed one
    ('co' + 'uk' -> co.uk must beat uk), hosts that ARE a listed
    multi-label suffix (no registrable domain, even when a shorter rule
    also matches), wildcard-matched hosts, exception hosts and their
    subdomains (exception must beat the wildcard), 4-label suffixes,
    bare suffixes, and unlisted tails."""
    from bigdata_lab02_spark.operators.url import with_registered_domain

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, host string"
    )
    sfx = spark.createDataFrame([(s,) for s in _SFX_LIST], "suffix string")
    got = {
        r["doc_id"]: r["registered_domain"]
        for r in with_registered_domain(df, sfx).collect()
    }
    for i, h in enumerate(hosts):
        assert got[i] == _ref_registered(h), (h, got[i])


_pct_strings = st.text(
    alphabet="ab/?&=%417EfFcC3A9.~_- é中",
    min_size=0,
    max_size=24,
)


@settings(**_SETTINGS)
@given(ss=st.lists(_pct_strings, min_size=1, max_size=50))
def test_percent_decode_full_idempotent_and_conservative(ss):
    """percent_decode_full is a fixed point (dedup keys must not depend
    on how many times the stage ran) and never decodes a reserved
    escape: any %XX left in the output has uppercase hex and decodes to
    a non-unreserved, non-UTF-8-lead byte."""
    import re

    from bigdata_lab02_spark.operators.url import (
        _UNRESERVED,
        percent_decode_full,
    )

    for s in ss:
        once = percent_decode_full(s)
        assert percent_decode_full(once) == once, (s, once)
        for hx in re.findall(r"%([0-9A-Fa-f]{2})", once):
            assert hx.upper() == hx, (s, once)
            assert chr(int(hx, 16)) not in _UNRESERVED, (s, once)


_warc_uri = st.text(alphabet="abcXYZ019./:-_%", min_size=1, max_size=30)
_warc_body = st.binary(max_size=200)


@settings(max_examples=25, deadline=None)
@given(
    recs=st.lists(
        st.tuples(_warc_uri, _warc_body, st.integers(100, 599)),
        min_size=1,
        max_size=8,
    ),
    gz=st.booleans(),
)
def test_warc_encode_decode_roundtrip_property(recs, gz):
    """r11 write side as a PROPERTY: arbitrary records through
    encode_response_record (optionally as gzip members) walk back out
    of iter_warc_records + parse_http_response byte-exact — the length
    framing survives any body bytes, including bodies that contain
    CRLF-CRLF separators and WARC version lines."""
    import gzip as _gz

    from bigdata_lab02_spark.sources.warc import (
        encode_response_record,
        iter_warc_records,
        parse_http_response,
    )

    # one adversarial body per run: a byte-exact fake record inside a
    # body must NOT desync the walk (length framing, not separators)
    recs = recs + [
        ("http://adv.example.com/x",
         encode_response_record("http://fake.example.com/", b"inner"),
         200),
    ]
    encoded = [
        encode_response_record(u, b, status=s) for u, b, s in recs
    ]
    payload = (
        b"".join(_gz.compress(r) for r in encoded)
        if gz
        else b"".join(encoded)
    )
    got = list(iter_warc_records(payload))
    assert len(got) == len(recs)
    for (u, b, s), (hdrs, block) in zip(recs, got):
        assert hdrs["warc-type"] == "response"
        assert hdrs["warc-target-uri"] == u.strip()
        status, _, body = parse_http_response(block)
        assert status == s and body == b


# ---------------------------------------------- BM25 contract (r13)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(words, min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    qwords=st.lists(words, min_size=1, max_size=3),
)
def test_bm25_matches_pure_python_replay(spark, docs, qwords):
    """Every (query, doc) score the Spark operator emits must equal the
    pure-python replay of the module's integer micro-unit contract —
    on arbitrary corpora and queries, including no-match cases."""
    from bigdata_lab02_spark.operators import retrieval as rt

    MU = 1_000_000
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [(0, " ".join(qwords))], "query_id int, text string"
    )

    def toks(t):
        return [w.lower() for w in t.split() if w.strip()]

    try:
        out = rt.bm25_topk(df, qdf, k=100).collect()
    except ValueError:
        # empty query vocabulary — contract error, nothing to compare
        assert not [w for w in toks(" ".join(qwords))]
        return
    # replay
    dls = {i: len(toks(t)) for i, t in enumerate(docs)}
    n, sd = len(docs), sum(dls.values())
    if sd == 0:
        assert out == []
        return
    avgdl_mu = (MU * sd) // n
    qset = sorted(set(toks(" ".join(qwords))))
    tf = {}
    for i, t in enumerate(docs):
        for w in toks(t):
            if w in qset:
                tf[(i, w)] = tf.get((i, w), 0) + 1
    dfc = {}
    for (_, w) in tf:
        dfc[w] = dfc.get(w, 0) + 1
    exp = {}
    for (i, w), f in tf.items():
        lr = (MU * MU * dls[i]) // avgdl_mu
        norm = MU - 750_000 + (750_000 * lr) // MU
        den = MU * f + (1_200_000 * norm) // MU
        tfp = (f * (1_200_000 + MU) * MU) // den
        idf = round(MU * math.log(1 + (n - dfc[w] + 0.5) / (dfc[w] + 0.5)))
        exp[i] = exp.get(i, 0) + (idf * tfp) // MU
    got = {r.doc_id: r.score_mu for r in out}
    assert got == exp
