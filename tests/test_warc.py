"""WARC codec + source tests: roundtrip fidelity, the per-record gzip
split property, damage handling, and the distributed reader."""

import gzip

import pytest

from smart_crawler_spark.functions.warc import (
    decode_warc,
    encode_warc_records,
)


def _recs(n=5):
    return [
        {
            "url": f"http://h{i}.test/{i}",
            "status": 200 + i,
            "payload": (f"body {i} " * (i + 1)).encode(),
        }
        for i in range(n)
    ]


def test_warc_roundtrip_compressed_and_plain():
    for compress in (True, False):
        data = encode_warc_records(_recs(), compress=compress)
        got = decode_warc(data)
        assert [(r["url"], r["status"], r["payload"]) for r in got] == [
            (r["url"], r["status"], r["payload"]) for r in _recs()
        ]
        assert all(r["warc_type"] == "response" for r in got)


def test_warc_payload_may_contain_framing_bytes():
    """Content-Length framing, not delimiter scanning: a payload that
    embeds CRLFCRLF and 'WARC/1.0' must survive."""
    evil = b"x\r\n\r\nWARC/1.0\r\n\r\ny"
    data = encode_warc_records(
        [{"url": "http://e.test/", "payload": evil}]
    )
    (got,) = decode_warc(data)
    assert got["payload"] == evil


def test_warc_gzip_members_are_independent():
    """Each record is its own gzip member (the splittability property):
    decompressing the members separately yields one record each."""
    import zlib

    data = encode_warc_records(_recs(3))
    members = []
    buf = data
    while buf:
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(buf))
        assert d.eof
        buf = d.unused_data
    assert len(members) == 3
    for m, want in zip(members, _recs(3)):
        (rec,) = decode_warc(m)
        assert rec["url"] == want["url"]


def test_warc_truncation_and_garbage_raise():
    data = encode_warc_records(_recs(2))
    with pytest.raises(ValueError):
        decode_warc(data[: len(data) - 7])  # truncated member
    with pytest.raises(ValueError):
        decode_warc(data + b"garbage")  # trailing non-gzip bytes
    plain = encode_warc_records(_recs(2), compress=False)
    with pytest.raises(ValueError):
        decode_warc(plain[: len(plain) - 3])  # truncated trailer
    with pytest.raises(ValueError):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # not WARC at all


def test_warc_records_df_and_damaged_shard(spark):
    """The distributed reader parses healthy shards and surfaces a
    damaged shard as one err row instead of failing the scan."""
    from smart_crawler_spark.sources.warc import warc_records

    good = encode_warc_records(_recs(4))
    bad = good[: len(good) - 9]
    df = spark.createDataFrame(
        [("ok", bytearray(good)), ("dmg", bytearray(bad))],
        "shard_id string, bytes binary",
    )
    rows = warc_records(df).collect()
    ok = [r for r in rows if r["shard_id"] == "ok"]
    dmg = [r for r in rows if r["shard_id"] == "dmg"]
    assert len(ok) == 4 and all(r["err"] is None for r in ok)
    assert [r["url"] for r in ok] == [r["url"] for r in _recs(4)]
    assert len(dmg) == 1 and dmg[0]["err"] and dmg[0]["url"] is None


def test_warc_deterministic_bytes():
    """mtime is pinned, so shard bytes are run-independent (the oracle
    relies on this)."""
    a = encode_warc_records(_recs())
    b = encode_warc_records(_recs())
    assert a == b
    assert gzip.decompress(a) == gzip.decompress(b)


def test_write_warc_shards_roundtrip_and_layout_independence(spark):
    """Sink -> source roundtrip: every (url, payload md5) survives, and
    shard BYTES are identical regardless of input partitioning."""
    import hashlib

    from smart_crawler_spark.sources.warc import (
        warc_records,
        write_warc_shards,
    )

    rows = [
        (i, f"http://h{i % 3}.test/p/{i}", (f"doc {i} " * (i % 3 + 1)).encode())
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(i, u, bytearray(p)) for i, u, p in rows],
        "doc_id long, url string, payload binary",
    )
    shards_a = {
        r["shard_id"]: bytes(r["bytes"])
        for r in write_warc_shards(df, n_shards=8).collect()
    }
    shards_b = {
        r["shard_id"]: bytes(r["bytes"])
        for r in write_warc_shards(
            df.repartition(13, "url"), n_shards=8
        ).collect()
    }
    assert shards_a == shards_b and len(shards_a) == 8

    blobs = spark.createDataFrame(
        [(s, bytearray(b)) for s, b in shards_a.items()],
        "shard_id string, bytes binary",
    )
    got = {
        (r["url"], r["payload_md5"]) for r in warc_records(blobs).collect()
    }
    want = {(u, hashlib.md5(p).hexdigest()) for _, u, p in rows}
    assert got == want


def test_revisit_headers_roundtrip():
    """WARC-Payload-Digest / WARC-Refers-To-Target-URI survive the
    codec; revisit records are payload-free."""
    recs = [
        {"url": "http://a.test/x", "status": 200, "payload": b"body"},
        {
            "url": "http://a.test/x",
            "status": 200,
            "payload": b"",
            "warc_type": "revisit",
            "digest": "md5:abc123",
            "refers_to": "http://a.test/x",
        },
    ]
    got = decode_warc(encode_warc_records(recs))
    assert got[0]["digest"] is None and got[0]["refers_to"] is None
    assert got[1]["warc_type"] == "revisit"
    assert got[1]["digest"] == "md5:abc123"
    assert got[1]["refers_to"] == "http://a.test/x"
    assert got[1]["payload"] == b""


def test_resolve_revisits_cross_shard_dangling_and_err(spark):
    """Revisits resolve across shards via the digest join; a dangling
    revisit (digest matching no response) surfaces resolved=false; a
    damaged shard's err row passes through with resolved null."""
    import hashlib

    from smart_crawler_spark.sources.warc import (
        resolve_revisits,
        warc_records,
    )

    orig_payload = b"original body"
    shard_a = encode_warc_records(
        [{"url": "http://a.test/1", "status": 200, "payload": orig_payload}]
    )
    shard_b = encode_warc_records(
        [
            {
                "url": "http://a.test/1",
                "status": 200,
                "payload": b"",
                "warc_type": "revisit",
                "digest": "md5:" + hashlib.md5(orig_payload).hexdigest(),
                "refers_to": "http://a.test/1",
            },
            {
                "url": "http://b.test/2",
                "status": 200,
                "payload": b"",
                "warc_type": "revisit",
                "digest": "md5:" + "0" * 32,
                "refers_to": "http://b.test/2",
            },
        ]
    )
    dmg = shard_a[: len(shard_a) - 9]
    df = spark.createDataFrame(
        [
            ("a", bytearray(shard_a)),
            ("b", bytearray(shard_b)),
            ("dmg", bytearray(dmg)),
        ],
        "shard_id string, bytes binary",
    )
    out = {
        (r["shard_id"], r["rec_idx"]): r
        for r in resolve_revisits(warc_records(df)).collect()
    }
    ok = out[("b", 0)]
    assert ok["resolved"] is True
    assert ok["resolved_md5"] == hashlib.md5(orig_payload).hexdigest()
    assert ok["resolved_bytes"] == len(orig_payload)
    assert (ok["orig_shard_id"], ok["orig_rec_idx"]) == ("a", 0)
    dangling = out[("b", 1)]
    assert dangling["resolved"] is False
    assert dangling["resolved_md5"] is None
    resp = out[("a", 0)]
    assert resp["resolved"] is True and resp["orig_shard_id"] is None
    assert resp["resolved_md5"] == hashlib.md5(orig_payload).hexdigest()
    err = out[("dmg", None)]
    assert err["err"] and err["resolved"] is None


def test_cdx_index_spans_and_damage(spark):
    """Byte coordinates: members tile the shard exactly (contiguous,
    summing to the blob size) and every slice re-decodes to its
    record; a plain (non-gzip) shard and a truncated shard yield err
    rows, never a crash."""
    from smart_crawler_spark.datagen.warc import generate_warc_shards
    from smart_crawler_spark.sources.warc import cdx_index

    shards = generate_warc_shards(spark, 3, 5)
    blob_sizes = {
        r["shard_id"]: len(r["bytes"]) for r in shards.collect()
    }
    rows = cdx_index(shards).collect()
    assert len(rows) == 15 and all(r["slice_ok"] for r in rows)
    by_shard: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["shard_id"], r["rec_idx"])):
        by_shard.setdefault(r["shard_id"], []).append(r)
    for sid, rs in by_shard.items():
        pos = 0
        for r in rs:
            assert r["offset"] == pos, (sid, r["rec_idx"])
            pos += r["length"]
        assert pos == blob_sizes[sid]

    plain = generate_warc_shards(spark, 1, 3, compress=False)
    damaged = spark.createDataFrame(
        [("sx", b"\x1f\x8b\x08broken")], "shard_id string, bytes binary"
    )
    bad = cdx_index(plain.unionByName(damaged)).collect()
    assert len(bad) == 2
    assert all(r["err"] is not None and r["rec_idx"] is None for r in bad)
