"""sources/warc: WARC record framing, HTTP split, gzip members, and the
full WARC → URL tier → crawl-curation composition (r10)."""

from __future__ import annotations

import gzip

import pytest

from bigdata_lab02_spark.sources.warc import (
    WarcError,
    iter_warc_records,
    parse_http_response,
    read_warc,
    warc_records,
)


def _rec(wtype, uri=None, body=b"", status=200, ctype="text/html",
         extra_warc=""):
    if wtype == "response":
        block = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n\r\n"
        ).encode() + body
    else:
        block = body
    h = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
    h += "WARC-Date: 2024-01-02T03:04:05Z\r\n"
    if uri:
        h += f"WARC-Target-URI: {uri}\r\n"
    h += extra_warc
    h += f"Content-Length: {len(block)}\r\n\r\n"
    return h.encode() + block + b"\r\n\r\n"


def test_record_walk_and_http_split():
    body = "<html><p>café page</p></html>".encode()  # multi-byte body
    data = (
        _rec("warcinfo", body=b"software: synthetic\r\n")
        + _rec("request", uri="http://a.example.com/x",
               body=b"GET /x HTTP/1.1\r\n\r\n")
        + _rec("response", uri="http://a.example.com/x", body=body)
        + _rec("revisit", uri="http://a.example.com/x")
    )
    recs = list(iter_warc_records(data))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "revisit",
    ]
    status, hh, got = parse_http_response(recs[2][1])
    assert status == 200 and hh["content-type"] == "text/html"
    assert got == body  # octet-exact: Content-Length framed the bytes


def test_gzip_members_roundtrip():
    recs = [
        _rec("response", uri=f"http://h{i}.example.com/", body=b"x" * i)
        for i in range(1, 4)
    ]
    gz = b"".join(gzip.compress(r) for r in recs)  # one member per record
    parsed = list(iter_warc_records(gz))
    assert len(parsed) == 3
    assert [h["warc-target-uri"] for h, _ in parsed] == [
        f"http://h{i}.example.com/" for i in range(1, 4)
    ]


def test_malformed_payloads_raise():
    good = _rec("response", uri="http://a/", body=b"hi")
    with pytest.raises(WarcError):
        list(iter_warc_records(b"NOT A WARC"))
    with pytest.raises(WarcError):  # length runs past the payload
        list(iter_warc_records(good[:-12]))
    with pytest.raises(WarcError):  # header block never terminates
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n"))
    with pytest.raises(WarcError):
        parse_http_response(b"no separator here")


def test_warc_records_dataframe_and_honest_failure(spark):
    rows = [
        (1, _rec("response", uri="http://a.example.com/", body=b"A")
            + _rec("metadata", uri="http://a.example.com/", body=b"m")),
        (2, b"garbage bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = warc_records(df, payload_col="content", id_col="doc_id")
    got = sorted(
        (r["doc_id"], r["record_idx"], r["warc_type"], r["parse_ok"])
        for r in out.collect()
    )
    assert got == [
        (1, 0, "response", True),
        (1, 1, "metadata", True),
        (2, None, None, False),
    ]


def test_read_warc_files_to_crawl_curation(spark, tmp_path):
    """The full CommonCrawl-shaped path on REAL files: .warc + .warc.gz
    on disk → binaryFile scan → record split → response filter → URL
    tier → crawl curation, with the dup/blocked pages dropped before
    the HTML stage and keep verdicts computed for the survivors."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.operators.crawl import crawl_curation
    from tests.test_crawl import _GOOD

    pages = [
        ("http://a.example.com/x", _GOOD),
        ("HTTP://A.Example.COM:80/x", _GOOD),        # dup after normalize
        ("https://spam.tracker.net/y", _GOOD),        # blocked
        ("https://b.example.org/z", _GOOD),
    ]
    recs = [
        _rec("response", uri=u, body=h.encode()) for u, h in pages
    ]
    (tmp_path / "part1.warc").write_bytes(b"".join(recs[:2]))
    (tmp_path / "part2.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs[2:])
    )
    rec_df = read_warc(spark, str(tmp_path / "*.warc*"))
    resp = (
        rec_df.where(
            F.col("parse_ok") & (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        .select(
            F.monotonically_increasing_id().alias("page_seq"),
            F.col("target_uri").alias("url"),
            F.col("body").cast("string").alias("html"),
        )
    )
    sfx = spark.createDataFrame(
        [(s,) for s in ["com", "net", "org", "uk", "co.uk"]], "suffix string"
    )
    blk = spark.createDataFrame([("tracker.net",)], "domain string")
    out = crawl_curation(
        resp, id_col="page_seq", url_col="url", suffixes=sfx, blocklist=blk
    )
    got = {r["norm_url"]: r for r in out.collect()}
    assert set(got) == {
        "http://a.example.com/x",
        "https://b.example.org/z",
    }
    for r in got.values():
        assert r["keep"]  # _GOOD passes the downstream verdicts


def test_warc_stream_to_url_tier(spark, tmp_path):
    """Continuous-ingest shape: a binaryFile STREAM of WARC files →
    record split (mapInPandas is stream-compatible) → stateless URL
    tier (dedup=False) — replay equals batch. Streaming URL dedup is a
    separate stateful stage by design (url.py docstring)."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.operators.url import url_filters
    from bigdata_lab02_spark.streaming import run_stream_to_memory

    recs = [
        _rec("response", uri="HTTP://A.Example.COM:80/x", body=b"<p>a</p>"),
        _rec("response", uri="https://spam.tracker.net/y", body=b"<p>b</p>"),
        _rec("request", uri="http://a.example.com/x",
             body=b"GET /x HTTP/1.1\r\n\r\n"),
    ]
    src = tmp_path / "warc_stream"
    src.mkdir()
    (src / "a.warc").write_bytes(b"".join(recs))
    sfx = spark.createDataFrame(
        [(s,) for s in ["com", "net"]], "suffix string"
    )
    blk = spark.createDataFrame([("tracker.net",)], "domain string")

    def chain(files):
        resp = warc_records(files, payload_col="content", id_col="path")
        resp = resp.where(
            F.col("parse_ok") & (F.col("warc_type") == "response")
        ).select(
            F.col("record_idx").alias("rec_id"),
            F.col("target_uri").alias("url"),
        )
        return url_filters(resp, sfx, blk, id_col="rec_id", dedup=False)

    stream_files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, "
                "content binary")
        .load(str(src))
    )
    out = run_stream_to_memory(
        spark, chain(stream_files), "t_warc_stream", mode="append"
    )
    batch_files = spark.read.format("binaryFile").load(str(src))
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, chain(batch_files).collect()))
    assert got == want and len(got) == 2


def test_sniff_charset_precedence():
    from bigdata_lab02_spark.sources.warc import sniff_charset

    # BOM beats everything
    assert sniff_charset(b"\xef\xbb\xbfx", "text/html; charset=latin-1") == (
        "utf-8-sig"
    )
    # HTTP header beats meta
    body = b'<meta charset="gbk"><p>x</p>'
    assert sniff_charset(body, 'text/html; charset="shift_jis"') == "shift_jis"
    # meta prescan (both forms), only within the first 1024 bytes
    assert sniff_charset(body, "text/html") == "gbk"
    meta2 = b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
    assert sniff_charset(meta2, None) == "windows-1252"
    late = b" " * 2000 + body
    assert sniff_charset(late, None) is None
    # unknown names are ignored, not errors
    assert sniff_charset(b"<meta charset=klingon>", None) is None


def test_decode_bodies_charsets_and_fallbacks(spark):
    from bigdata_lab02_spark.sources.warc import decode_bodies

    cafe_latin1 = "café crème".encode("latin-1")
    zh_gbk = "中文页面".encode("gbk")
    utf8 = "plain café utf8".encode("utf-8")
    # declared charset is WRONG (utf-8 claim over latin-1 bytes) and the
    # bytes are invalid UTF-8 -> honest latin-1 catch-all, charset_ok False
    lying = b"caf\xe9 broken"
    rows = [
        (1, cafe_latin1, "text/html; charset=latin-1"),
        (2, zh_gbk, "text/html; charset=GBK"),
        (3, utf8, "text/html"),
        (4, lying, "text/html; charset=utf-8"),
        (5, None, "text/html"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, body binary, http_content_type string"
    )
    out = {r["doc_id"]: r for r in decode_bodies(df).collect()}
    assert out[1]["text"] == "café crème" and out[1]["charset_ok"]
    assert out[1]["charset"] == "latin-1"
    assert out[2]["text"] == "中文页面"
    assert out[3]["text"] == "plain café utf8" and out[3]["charset"] == "utf-8"
    assert out[4]["charset"] == "latin-1" and out[4]["charset_ok"] is False
    assert "café" in out[4]["text"]  # latin-1 reading of 0xE9
    assert out[5]["text"] is None and out[5]["charset_ok"] is None


def test_warc_nonutf8_page_through_decode_bodies(spark, tmp_path):
    """End-to-end: a latin-1 page in a real WARC file decodes to the
    right text through the charset-aware path (a blind utf-8 cast would
    mojibake or null it)."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.sources.warc import decode_bodies

    html = "<html><body><p>café crème</p></body></html>"
    rec = _rec(
        "response",
        uri="http://a.example.com/latin",
        body=html.encode("latin-1"),
        ctype="text/html; charset=ISO-8859-1",
    )
    (tmp_path / "l.warc").write_bytes(rec)
    recs = read_warc(spark, str(tmp_path / "l.warc"))
    out = decode_bodies(
        recs.where(F.col("warc_type") == "response")
    ).collect()[0]
    assert out["charset"].lower() == "iso-8859-1" and out["charset_ok"]
    assert "café crème" in out["text"]


def test_per_record_http_failure_keeps_archive(spark):
    """r11 (ADVICE r10): one malformed HTTP response block fails ONLY
    its own record — the WARC length framing never desynced, so the
    other records of the payload survive with parse_ok=true."""
    bad_http = _rec("response", uri="http://b.example.com/")
    # corrupt the status line INSIDE the correctly-framed block
    bad_http = bad_http.replace(b"HTTP/1.1 200 X", b"NOTHTTP 2OO X")
    payload = (
        _rec("response", uri="http://a.example.com/", body=b"A")
        + bad_http
        + _rec("metadata", uri="http://c.example.com/", body=b"m")
    )
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")
    got = sorted(
        (r["record_idx"], r["warc_type"], r["parse_ok"],
         r["http_status"], bytes(r["body"]) if r["body"] else None)
        for r in warc_records(df, id_col="doc_id").collect()
    )
    assert got == [
        (0, "response", True, 200, b"A"),
        (1, "response", False, None, None),   # per-record failure
        (2, "metadata", True, None, None),    # framing still good after
    ]


def test_framing_desync_keeps_prefix_then_fails(spark):
    """r11: a length-chain desync mid-payload emits the records framed
    BEFORE it (their framing was consistent) plus one payload-failure
    row marking the desync (record_idx NULL) — streaming-yield
    semantics; nothing after the desync is guessed at."""
    good = _rec("response", uri="http://a.example.com/", body=b"AB")
    payload = good + _rec("response", uri="http://b.example.com/",
                          body=b"XYZ")[:-12]  # runs past the payload
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")
    got = sorted(
        (
            (r["record_idx"], r["warc_type"], r["parse_ok"])
            for r in warc_records(df, id_col="doc_id").collect()
        ),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert got == [(0, "response", True), (None, None, False)]


def test_bounded_frames_multi_hundred_mb_payload():
    """r11 (VERDICT r10 weak item): a ~300 MB synthetic archive streams
    out of the reader in MULTIPLE bounded frames — no single frame (and
    so no single Arrow batch) holds the whole parsed archive; every
    frame's body payload respects the budget (+ at most one record)."""
    from bigdata_lab02_spark.sources.warc import (
        _bounded_frames,
        _payload_rows,
    )

    body = bytes(range(256)) * 4096  # 1 MiB per record
    rec = _rec("response", uri="http://big.example.com/", body=body)
    payload = rec * 300  # ~300 MiB of body bytes
    budget = 64 << 20
    cols = [
        "doc_id", "record_idx", "warc_type", "record_id", "refers_to",
        "target_uri", "warc_date", "http_status", "http_content_type",
        "body", "parse_ok",
    ]
    frames = list(
        _bounded_frames(_payload_rows(1, payload), cols, cols.index("body"),
                        budget)
    )
    assert len(frames) >= 4  # 300 MiB / 64 MiB budget
    total = 0
    for f in frames:
        fbytes = sum(len(b) for b in f["body"] if b is not None)
        assert fbytes <= budget + len(body)  # bounded (+1 record max)
        total += len(f)
    assert total == 300
    assert all(f["parse_ok"].all() for f in frames)


def test_warc_records_small_budget_end_to_end(spark):
    """The bounded-yield path through Spark itself: a tiny budget forces
    many frames and the result is still exactly one row per record."""
    payload = b"".join(
        _rec("response", uri=f"http://h{i}.example.com/",
             body=f"body {i}".encode())
        for i in range(40)
    )
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")
    out = warc_records(df, id_col="doc_id", max_batch_bytes=64).collect()
    assert len(out) == 40
    assert sorted(r["record_idx"] for r in out) == list(range(40))
    assert all(r["parse_ok"] for r in out)


def test_resolve_revisits_join(spark):
    """r11 (VERDICT r10 item 7): revisit records take their referenced
    original's body/HTTP fields via the WARC-Refers-To equi-join;
    dangling references stay honestly unresolved; non-revisit rows pass
    through untouched."""
    from bigdata_lab02_spark.sources.warc import resolve_revisits

    orig = _rec("response", uri="http://a.example.com/x", body=b"PAGE",
                extra_warc="WARC-Record-ID: <urn:test:orig>\r\n")
    revisit = _rec("revisit", uri="http://a.example.com/x",
                   extra_warc="WARC-Record-ID: <urn:test:rev>\r\n"
                              "WARC-Refers-To: <urn:test:orig>\r\n")
    dangling = _rec("revisit", uri="http://b.example.com/y",
                    extra_warc="WARC-Refers-To: <urn:test:missing>\r\n")
    df = spark.createDataFrame(
        [(1, orig + revisit + dangling)], "doc_id long, content binary"
    )
    recs = warc_records(df, id_col="doc_id")
    got = {
        r["record_idx"]: r for r in resolve_revisits(recs).collect()
    }
    assert not got[0]["resolved"] and got[0]["resolved_from"] is None
    assert bytes(got[0]["body"]) == b"PAGE"         # original untouched
    assert got[1]["resolved"]
    assert got[1]["resolved_from"] == "<urn:test:orig>"
    assert bytes(got[1]["body"]) == b"PAGE"          # filled from original
    assert got[1]["http_status"] == 200
    assert got[1]["http_content_type"] == "text/html"
    assert not got[2]["resolved"] and got[2]["body"] is None  # dangling


def test_warc_shards_roundtrip(spark, tmp_path):
    """r11 write side: curated records → warc_shards (gzip members and
    plain) → real files → read_warc reproduces every record byte-exact
    — the re-shard/archival path is the true inverse of ingest."""
    from bigdata_lab02_spark.sources.warc import warc_shards

    rows = [
        (i % 3, f"http://h{i}.example.com/p", f"body {i} café".encode(),
         200, "text/html", "2024-02-03T04:05:06Z", f"<urn:test:{i}>")
        for i in range(12)
    ]
    recs = spark.createDataFrame(
        rows,
        "shard int, target_uri string, body binary, http_status int, "
        "http_content_type string, warc_date string, record_id string",
    )
    for gz, ext in ((True, "warc.gz"), (False, "warc")):
        shards = warc_shards(recs, gzip_members=gz).collect()
        assert sorted(s["shard"] for s in shards) == [0, 1, 2]
        assert all(s["n_records"] == 4 for s in shards)
        d = tmp_path / f"out_{ext}"
        d.mkdir()
        for s in shards:
            (d / f"shard-{s['shard']}.{ext}").write_bytes(bytes(s["content"]))
        back = read_warc(spark, str(d)).collect()
        got = sorted(
            (r["target_uri"], bytes(r["body"]), r["http_status"],
             r["http_content_type"], r["warc_date"], r["record_id"],
             r["parse_ok"])
            for r in back
        )
        want = sorted(
            (u, b, st, ct, dt, rid, True)
            for _, u, b, st, ct, dt, rid in rows
        )
        assert got == want


def test_write_warc_files_roundtrip(spark, tmp_path):
    """write_warc materializes one real archive file per shard from the
    executors; read_warc reproduces every record byte-exact."""
    from bigdata_lab02_spark.sources.warc import write_warc

    rows = [
        (i % 2, f"http://w{i}.example.com/p", f"page {i}".encode(),
         200, "text/html", "2024-02-03T04:05:06Z", f"<urn:test:w{i}>")
        for i in range(8)
    ]
    recs = spark.createDataFrame(
        rows,
        "shard int, target_uri string, body binary, http_status int, "
        "http_content_type string, warc_date string, record_id string",
    )
    out = str(tmp_path / "archive")
    write_warc(recs, out)
    import os

    assert sorted(os.listdir(out)) == ["part-0.warc.gz", "part-1.warc.gz"]
    back = read_warc(spark, out).collect()
    got = sorted((r["target_uri"], bytes(r["body"])) for r in back)
    assert got == sorted((u, b) for _, u, b, *_ in rows)
    assert all(r["parse_ok"] for r in back)


def test_warc_cdx_index_seek_read_roundtrip(spark, tmp_path):
    """r12 (VERDICT r11 item 5): write_warc(index_path=…) emits a CDX
    index whose (file, offset, length) really address each record —
    seek-read every index row from the written .warc.gz, gunzip the
    single member, and the framed record's URI/ID/body digest must
    match the index entry. Also checks the NULL-body skip stripe never
    reaches the index and that offsets tile each shard exactly."""
    import gzip
    import hashlib
    import os

    from bigdata_lab02_spark.sources.warc import (
        iter_warc_records,
        write_warc,
    )

    rows = [
        (i % 3, f"http://c{i:02d}.example.com/p",
         None if i == 5 else f"content {i} ü".encode(),
         200, "text/html", "2024-02-03T04:05:06Z", f"<urn:test:c{i}>")
        for i in range(12)
    ]
    recs = spark.createDataFrame(
        rows,
        "shard int, target_uri string, body binary, http_status int, "
        "http_content_type string, warc_date string, record_id string",
    )
    out = str(tmp_path / "archive")
    idx_path = str(tmp_path / "cdx")
    write_warc(recs, out, index_path=idx_path)
    idx = spark.read.parquet(idx_path).collect()
    bodies = {u: b for _, u, b, *_ in rows if b is not None}
    assert {r["uri"] for r in idx} == set(bodies)  # skip stripe absent
    ends: dict[str, int] = {}
    for r in idx:
        with open(os.path.join(out, r["file"]), "rb") as f:
            f.seek(r["offset"])
            member = f.read(r["length"])
        rec_bytes = gzip.decompress(member)
        (hdrs, block), = list(iter_warc_records(rec_bytes))
        assert hdrs["warc-target-uri"] == r["uri"]
        assert hdrs["warc-record-id"] == r["record_id"]
        body = block.split(b"\r\n\r\n", 1)[1]
        assert body == bodies[r["uri"]]
        assert hashlib.md5(body).hexdigest() == r["digest"]
        ends.setdefault(r["file"], 0)
        ends[r["file"]] = max(ends[r["file"]], r["offset"] + r["length"])
    # offsets+lengths tile the whole shard: last end == file size
    for fname, end in ends.items():
        assert end == os.path.getsize(os.path.join(out, fname))
    # per-file offsets are gapless from 0
    by_file: dict[str, list] = {}
    for r in idx:
        by_file.setdefault(r["file"], []).append((r["offset"], r["length"]))
    for spans in by_file.values():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln


def test_fetch_cdx_records_random_access(spark, tmp_path):
    """r12: the distributed CDX consumer — fetch_cdx_records seek-reads
    every indexed record from the written archives, verifies the body
    digest, and reports honest failures for records the index points
    past (simulated by tampering one archive)."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.sources.warc import (
        fetch_cdx_records,
        write_warc,
    )

    rows = [
        (i % 2, f"http://f{i:02d}.example.com/p", f"payload {i} é".encode(),
         200, "text/html", "2024-02-03T04:05:06Z", f"<urn:test:f{i}>")
        for i in range(10)
    ]
    recs = spark.createDataFrame(
        rows,
        "shard int, target_uri string, body binary, http_status int, "
        "http_content_type string, warc_date string, record_id string",
    )
    out = str(tmp_path / "archive")
    idx_path = str(tmp_path / "cdx")
    write_warc(recs, out, index_path=idx_path)
    idx = spark.read.parquet(idx_path)
    got = {
        r["uri"]: r
        for r in fetch_cdx_records(idx, out).collect()
    }
    bodies = {u: b for _, u, b, *_ in rows}
    assert set(got) == set(bodies)
    for u, r in got.items():
        assert r["fetch_ok"] and r["digest_ok"], u
        assert bytes(r["body"]) == bodies[u]
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html"
    # tamper: truncate one shard — its fetches fail honestly, digest
    # verification catches any record whose span still gunzips
    import os

    victim = sorted(os.listdir(out))[0]
    p = os.path.join(out, victim)
    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) // 2])
    after = fetch_cdx_records(idx, out).collect()
    bad = [r for r in after if r["file"] == victim]
    good = [r for r in after if r["file"] != victim]
    assert all(r["fetch_ok"] and r["digest_ok"] for r in good)
    assert any(not r["fetch_ok"] for r in bad)
    assert all((not r["fetch_ok"]) or r["digest_ok"] for r in bad)


def test_warc_shards_size_guard_fails_loud(spark):
    """r12 (VERDICT r11 item 6): a shard whose assembled content would
    exceed max_shard_bytes must raise a WarcError naming the shard —
    not die later in an Arrow binary-offset overflow."""
    import pytest

    from bigdata_lab02_spark.sources.warc import warc_shards

    rows = [
        (0, f"http://g{i}.example.com/p", b"x" * 4096, 200, "text/html",
         "2024-02-03T04:05:06Z", None)
        for i in range(4)
    ]
    recs = spark.createDataFrame(
        rows,
        "shard int, target_uri string, body binary, http_status int, "
        "http_content_type string, warc_date string, record_id string",
    )
    with pytest.raises(Exception, match="max_shard_bytes"):
        warc_shards(recs, gzip_members=False, max_shard_bytes=6000).collect()
    # generous budget: same records assemble fine
    ok = warc_shards(recs, gzip_members=False).collect()
    assert ok[0]["n_records"] == 4
