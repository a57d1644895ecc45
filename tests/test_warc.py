"""WARC source (sources/warc.py): record framing, concatenated gzip
member walking, HTTP body extraction, malformed-input rejection."""

import pytest

from osm_admin_boundary_conflation_spark.sources.warc import (
    build_warc_record,
    gzip_member,
    parse_warc_gz,
)


def _rec(i, body=None):
    body = body if body is not None else f"<html>doc {i}</html>".encode()
    return build_warc_record(
        f"https://t/{i}", f"2024-02-0{i % 9 + 1}T00:00:00Z", body
    )


def test_member_walk_and_body_extraction():
    blob = b"".join(gzip_member(_rec(i)) for i in range(7))
    got = list(parse_warc_gz(blob))
    assert len(got) == 7
    for i, (url, date, status, html) in enumerate(got):
        assert url == f"https://t/{i}"
        assert status == 200
        assert html == f"<html>doc {i}</html>".encode()


def test_binary_body_with_crlf_sequences_survives():
    """Bodies containing \\r\\n\\r\\n (the framing delimiter) must pass
    through untouched — framing is Content-Length-driven, not
    delimiter-scanning."""
    body = b"a\r\n\r\nb" * 10 + bytes(range(256))
    blob = gzip_member(build_warc_record("https://t/x", "2024-01-01T00:00:00Z", body))
    (url, _, status, html), = parse_warc_gz(blob)
    assert html == body and status == 200


def test_gzip_members_are_byte_deterministic():
    assert gzip_member(_rec(3)) == gzip_member(_rec(3))


def test_non_response_records_are_skipped():
    # warcinfo/request/metadata records exist in every real CC archive;
    # they must NOT surface as placeholder page rows (ADVICE r06).
    req = _rec(1).replace(b"WARC-Type: response", b"WARC-Type: request")
    info = _rec(2).replace(b"WARC-Type: response", b"WARC-Type: warcinfo")
    blob = gzip_member(info) + gzip_member(req) + gzip_member(_rec(3))
    got = list(parse_warc_gz(blob))
    assert len(got) == 1 and got[0][0].endswith("3")


def test_malformed_inputs_raise_cleanly():
    with pytest.raises(ValueError, match="bad version line"):
        next(parse_warc_gz(gzip_member(b"NOPE/1.0\r\n\r\n\r\n")))
    # truncated block: Content-Length promises more bytes than present
    rec = _rec(2)
    cut = gzip_member(rec[: len(rec) - 30])
    with pytest.raises((ValueError, KeyError)):
        list(parse_warc_gz(cut))
    with pytest.raises(Exception):
        list(parse_warc_gz(b"\x1f\x8b garbage not gzip"))


def test_member_offsets_allow_random_access(tmp_path):
    """The CDX-grain contract: offsets/lengths computed at write time
    must frame each gzip member exactly — seek + bounded read + one
    zlib pass recovers the record with no scan of neighbors."""
    import zlib

    from osm_admin_boundary_conflation_spark.sources.warc import _parse_record

    members = [gzip_member(_rec(i)) for i in range(9)]
    path = tmp_path / "s.warc.gz"
    path.write_bytes(b"".join(members))
    off = 0
    offsets = []
    for m in members:
        offsets.append((off, len(m)))
        off += len(m)
    with open(path, "rb") as f:
        for i in (7, 0, 4):  # out of order on purpose
            o, ln = offsets[i]
            f.seek(o)
            url, _, status, html = _parse_record(zlib.decompress(f.read(ln), wbits=31))
            assert url == f"https://t/{i}" and status == 200
            assert html == f"<html>doc {i}</html>".encode()
    # a wrong length must fail loudly, not return garbage
    with open(path, "rb") as f:
        o, ln = offsets[3]
        f.seek(o)
        import pytest as _pytest

        with _pytest.raises(Exception):
            zlib.decompress(f.read(ln - 5), wbits=31)
