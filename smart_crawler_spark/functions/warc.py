"""WARC (Web ARChive, ISO 28500) record codec — the format crawl
corpora ship in (CommonCrawl et al.). Pure stdlib: each record is a
``WARC/1.0`` header block + payload with CRLF framing, and files are
the standard *per-record gzip members* concatenated back to back, so
any record can be decompressed without touching its neighbors — the
property that makes WARC splittable for distributed readers: a reader
can seek to any gzip member boundary and stream records from there.

This codec writes response records (the crawl fetch case) and reads
any record type. Framing per spec:

    WARC/1.0\r\n
    <name>: <value>\r\n ...          (header block)
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n                         (record trailer)

Reference: the WARC 1.1 spec (iipc/warc-specifications) — public
format knowledge only; no code derived from any reader implementation.
"""

from __future__ import annotations

import gzip
import io


def encode_warc_records(
    records: list[dict], compress: bool = True
) -> bytes:
    """Serialize records (dicts with ``url``, ``payload`` bytes, and
    optional extra headers like ``warc_type``/``status``) into a WARC
    file: one gzip member per record when ``compress`` (the
    CommonCrawl layout), plain concatenation otherwise."""
    out = io.BytesIO()
    for rec in records:
        payload: bytes = rec["payload"]
        headers = [
            ("WARC-Type", rec.get("warc_type", "response")),
            ("WARC-Target-URI", rec["url"]),
            ("Content-Length", str(len(payload))),
        ]
        if "status" in rec:
            headers.append(("WARC-Status", str(rec["status"])))
        # revisit-record headers (WARC 1.1 §6.7): the declared digest of
        # the duplicate content and the URI of the original capture
        if "digest" in rec:
            headers.append(("WARC-Payload-Digest", rec["digest"]))
        if "refers_to" in rec:
            headers.append(("WARC-Refers-To-Target-URI", rec["refers_to"]))
        block = b"WARC/1.0\r\n"
        block += b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
        )
        block += b"\r\n" + payload + b"\r\n\r\n"
        if compress:
            member = io.BytesIO()
            # mtime pinned: byte-deterministic output for the oracles
            with gzip.GzipFile(
                fileobj=member, mode="wb", mtime=0
            ) as gz:
                gz.write(block)
            out.write(member.getvalue())
        else:
            out.write(block)
    return out.getvalue()


def _split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members one member at a
    time (the WARC seek/split property). Raises ValueError on a
    truncated member or trailing non-gzip garbage."""
    import zlib

    blocks: list[bytes] = []
    buf = data
    while buf:
        if buf[:2] != b"\x1f\x8b":
            raise ValueError("not a gzip member at member boundary")
        d = zlib.decompressobj(wbits=31)  # 16+MAX_WBITS: gzip framing
        try:
            blocks.append(d.decompress(buf))
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        buf = d.unused_data
    return blocks


def decode_warc(data: bytes) -> list[dict]:
    """Parse a WARC file (per-record gzip members or plain) into
    records: ``{"url", "warc_type", "status", "payload"}``. Truncated
    or misframed records raise ValueError — a crawl ingest must know
    a shard is damaged rather than silently dropping its tail."""
    if data[:2] == b"\x1f\x8b":
        raw = b"".join(_split_gzip_members(data))
    else:
        raw = data
    records: list[dict] = []
    pos = 0
    while pos < len(raw):
        if raw[pos : pos + 8] != b"WARC/1.0":
            raise ValueError(f"bad WARC version at offset {pos}")
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated header block")
        headers: dict[str, str] = {}
        for line in raw[pos : hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"missing/bad Content-Length: {e}") from e
        body_start = hdr_end + 4
        body_end = body_start + n
        if raw[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError("truncated record payload")
        records.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_type": headers.get("warc-type", ""),
                "status": int(headers["warc-status"])
                if "warc-status" in headers
                else None,
                "digest": headers.get("warc-payload-digest"),
                "refers_to": headers.get("warc-refers-to-target-uri"),
                "payload": raw[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records


def gzip_member_spans(data: bytes) -> list[tuple[int, int]]:
    """Byte spans (offset, length) of every gzip member in a
    per-record-compressed WARC shard — the coordinates a CDX index
    stores so replay can range-read ONE record from object storage
    without touching the rest of the shard. Raises ValueError on a
    non-gzip shard, a truncated member, or trailing garbage."""
    import zlib

    spans: list[tuple[int, int]] = []
    pos = 0
    buf = data
    while buf:
        if buf[:2] != b"\x1f\x8b":
            raise ValueError("not a gzip member at member boundary")
        d = zlib.decompressobj(wbits=31)
        try:
            d.decompress(buf)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        consumed = len(buf) - len(d.unused_data)
        spans.append((pos, consumed))
        pos += consumed
        buf = d.unused_data
    return spans
