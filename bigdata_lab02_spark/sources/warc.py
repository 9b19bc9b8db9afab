"""WARC ingest source — the format web crawls actually ship in.

CommonCrawl (and every Heritrix-lineage crawler) delivers pages as WARC
files (ISO 28500 / the WARC 1.0/1.1 format spec): length-framed records
— a ``WARC/1.x`` version line, named headers, ``Content-Length`` octets
of block — concatenated, conventionally one gzip member per record
(``.warc.gz``). A crawl-curation engine whose first stage is a URL/HTML
column needs this reader to exist, or the user can't get from the
archive bytes to that column. This module is that seam, Spark-first:

- ``spark.read.format("binaryFile")`` distributes whole-file reads (one
  task per file — WARC files are sized ~1 GB by the writers precisely
  so per-file parallelism is enough at archive scale);
- ``warc_records`` splits each payload into records with an
  Arrow-batched ``mapInPandas`` (byte-level length framing is genuinely
  imperative — the codec discipline: Python only where expressions
  can't carry the semantics), parses the HTTP response envelope of
  ``response`` records, and emits one row per record with the honest
  per-PAYLOAD failure taxonomy the media decoders use (``parse_ok`` —
  a malformed length chain means nothing after it can be trusted);
- gzip payloads (magic ``1f 8b``) are decompressed member-by-member
  (``.warc.gz`` is a stream of gzip MEMBERS, one per record — a plain
  single-shot decompress would stop after the first).

The record walk and HTTP split are oracle-gated (``warc_ingest``): the
gate generates deterministic WARC bytes whose framing (CRLF headers,
octet-exact Content-Length over multi-byte text) the DuckDB oracle
restates, so a drifting header parse, length slice, or body hash flips
rows. Composition ``warc_records → url_filters → crawl_curation`` is
integration-tested on real files — the full CommonCrawl-shaped path.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"


class WarcError(ValueError):
    """Malformed WARC payload (honest-failure taxonomy)."""


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout:
    one member per record). A single-shot decompress would silently
    return only the first record."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        out += d.flush()
        if not d.eof:
            raise WarcError("truncated gzip member")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("gzip member consumed no bytes")
        pos += consumed
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Named-field block → {lower(name): value}; bare LF tolerated
    (the spec mandates CRLF; real archives occasionally carry LF)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line {line[:40]!r}")
        headers[name.strip().decode("latin-1").lower()] = (
            value.strip().decode("latin-1")
        )
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(warc_headers, block_bytes)`` per record. Length-framed
    walk per the spec: version line, headers to the first empty line,
    ``Content-Length`` octets of block, then the two-CRLF record
    separator. Gzip payloads are transparently de-membered."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLF runs
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        eol = data.find(b"\n", pos)
        if eol < 0:
            raise WarcError("truncated version line")
        version = data[pos:eol].rstrip(b"\r")
        if not version.startswith(b"WARC/"):
            raise WarcError(f"expected WARC version line, got {version[:20]!r}")
        hdr_end = data.find(b"\r\n\r\n", eol)
        sep_len = 4
        if hdr_end < 0:
            hdr_end = data.find(b"\n\n", eol)
            sep_len = 2
        if hdr_end < 0:
            raise WarcError("unterminated WARC header block")
        headers = _parse_headers(data[eol + 1 : hdr_end])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError("missing/bad Content-Length") from exc
        block_start = hdr_end + sep_len
        if block_start + clen > n:
            raise WarcError("record block runs past the payload")
        yield headers, data[block_start : block_start + clen]
        pos = block_start + clen


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP response block → (status, headers, body). The body is the
    exact octets after the header separator — no transfer-decoding
    (crawlers store the payload already de-chunked)."""
    sep = block.find(b"\r\n\r\n")
    sep_len = 4
    if sep < 0:
        sep = block.find(b"\n\n")
        sep_len = 2
    if sep < 0:
        raise WarcError("HTTP block has no header separator")
    head = block[:sep]
    eol = head.find(b"\n")
    status_line = (head if eol < 0 else head[:eol]).rstrip(b"\r")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcError(f"bad HTTP status line {status_line[:40]!r}")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise WarcError("non-numeric HTTP status") from exc
    headers = _parse_headers(head[eol + 1 :]) if eol >= 0 else {}
    return status, headers, block[sep + sep_len :]


def warc_records(
    payloads: DataFrame,
    payload_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """One row per WARC record across all payloads:
    ``(id, record_idx, warc_type, target_uri, warc_date, http_status,
    http_content_type, body, parse_ok)``. Non-``response`` records
    (request/metadata/warcinfo/revisit) keep their type and URI with
    NULL HTTP fields — the caller filters, the reader does not guess.
    A malformed payload yields ONE ``parse_ok=false`` row (once the
    length chain desyncs nothing after it is trustworthy — the honest
    whole-payload failure, mirroring the media decoders)."""
    id_type = payloads.schema[id_col].dataType.simpleString()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "record_idx", "warc_type", "target_uri", "warc_date",
            "http_status", "http_content_type", "body", "parse_ok",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    recs = list(iter_warc_records(data))
                    parsed = []
                    for i, (hdrs, block) in enumerate(recs):
                        wtype = hdrs.get("warc-type")
                        uri = hdrs.get("warc-target-uri")
                        date = hdrs.get("warc-date")
                        status = ctype = body = None
                        if wtype == "response":
                            status, hh, body = parse_http_response(block)
                            ctype = hh.get("content-type")
                        parsed.append(
                            (rid, i, wtype, uri, date, status, ctype,
                             body, True)
                        )
                except (WarcError, TypeError):
                    rows.append(
                        (rid, None, None, None, None, None, None, None,
                         False)
                    )
                    continue
                rows.extend(parsed)
            yield pd.DataFrame(rows, columns=cols)

    return payloads.select(id_col, payload_col).mapInPandas(
        op,
        f"{id_col} {id_type}, record_idx int, warc_type string, "
        "target_uri string, warc_date string, http_status int, "
        "http_content_type string, body binary, parse_ok boolean",
    )


def sniff_charset(body: bytes, content_type: str | None) -> str | None:
    """Charset for an HTML body, by the precedence real crawls need:
    BOM, then the HTTP ``Content-Type`` charset parameter, then an HTML
    ``<meta charset=...>`` / ``http-equiv`` declaration in the first
    1024 bytes (the HTML5 prescan window). Returns a codec NAME python
    knows, or None when nothing is declared."""
    import codecs
    import re

    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"

    def known(name: str) -> str | None:
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            return None

    if content_type:
        m = re.search(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", content_type)
        if m:
            got = known(m.group(1))
            if got:
                return got
    head = body[:1024]
    m = re.search(
        rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)",
        head,
        re.IGNORECASE,
    )
    if m:
        return known(m.group(1).decode("latin-1"))
    return None


def decode_bodies(
    records: DataFrame,
    body_col: str = "body",
    content_type_col: str = "http_content_type",
    text_col: str = "text",
) -> DataFrame:
    """Charset-aware body → text decode (r10): real crawls are NOT all
    UTF-8 — latin-1/windows-1252 long tails, GBK/Shift-JIS regions —
    and a blind ``cast(body AS STRING)`` mojibakes every one of them.
    Per row: ``sniff_charset`` precedence (BOM → HTTP header → HTML
    meta prescan), strict decode under the declared charset, fallback
    to strict UTF-8, final fallback latin-1 (total — never fails, and
    an HONEST record of what happened rides along). Appends ``text``,
    ``charset`` (codec actually used), and ``charset_ok`` (False only
    when every declared/UTF-8 decode failed and latin-1 caught it).
    NULL bodies pass through with NULL text. Arrow-batched
    ``mapInPandas`` — the codec-tier discipline; zero shuffles."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in records.schema.fields
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, charsets, oks = [], [], []
            for body, ctype in zip(pdf[body_col], pdf[content_type_col]):
                if body is None:
                    texts.append(None)
                    charsets.append(None)
                    oks.append(None)
                    continue
                data = bytes(body)
                declared = sniff_charset(data, ctype)
                for cs, honest in (
                    (declared, True),
                    ("utf-8", True),
                    ("latin-1", False),
                ):
                    if cs is None:
                        continue
                    try:
                        texts.append(data.decode(cs))
                        charsets.append(cs)
                        oks.append(honest)
                        break
                    except UnicodeDecodeError:
                        continue
            pdf = pdf.copy()
            pdf[text_col] = texts
            pdf["charset"] = charsets
            pdf["charset_ok"] = oks
            yield pdf

    return records.mapInPandas(
        op, f"{schema}, {text_col} string, charset string, charset_ok boolean"
    )


def read_warc(spark, path: str) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan (one task per file —
    archive writers size files so this is the right parallel grain)
    → per-record rows. Handles ``.warc`` and ``.warc.gz``."""
    files = spark.read.format("binaryFile").load(path)
    return warc_records(files, payload_col="content", id_col="path")
