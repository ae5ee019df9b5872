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
