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
