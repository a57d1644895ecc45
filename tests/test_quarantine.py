"""Malformed-binary quarantine: typed reasons, zero escapes."""

from osm_admin_boundary_conflation_spark.operators.quarantine import (
    build_corrupt_corpus,
    classify_blob,
    quarantine_scan,
)


def test_classify_blob_never_raises_on_random_bytes():
    import random

    rng = random.Random(99)
    for n in (0, 1, 2, 3, 7, 64, 4096):
        blob = bytes(rng.randrange(256) for _ in range(n))
        fmt, reason = classify_blob(blob)
        assert isinstance(fmt, str) and isinstance(reason, str)
    # adversarial: valid magic + garbage tails for every signature
    for magic in (b"\x1f\x8b", b"BM", b"\xff\xd8", b"RIFF"):
        for tail in (b"", b"\x00" * 5, bytes(rng.randrange(256) for _ in range(200))):
            fmt, reason = classify_blob(magic + tail)
            assert fmt != "unknown" and reason != ""


def test_classify_blob_clean_formats():
    from osm_admin_boundary_conflation_spark.operators import multimodal as M
    from osm_admin_boundary_conflation_spark.sources import warc as W

    date = "2024-03-01T00:00:00Z"
    rec = W.gzip_member(W.build_warc_record("https://ex.com/1", date, b"<html/>"))
    assert classify_blob(rec) == ("warc", "")
    assert classify_blob(M.build_bmp(5)) == ("bmp", "")
    assert classify_blob(M.build_jpeg(5)) == ("jpeg", "")
    assert classify_blob(M.build_wav(5)) == ("wav", "")


def test_quarantine_scan_corpus_outcomes(spark):
    docs = spark.range(0, 60).selectExpr("id AS doc_id")
    got = {
        (r.blob_id % 10, r.format, r.reason)
        for r in quarantine_scan(build_corrupt_corpus(docs)).collect()
    }
    assert got == {
        (0, "warc", ""),
        (1, "warc", "bad_structure"),
        (2, "warc", "bad_structure"),
        (3, "bmp", ""),
        (4, "bmp", "truncated"),
        (5, "jpeg", ""),
        (6, "jpeg", "truncated"),
        (7, "unknown", "unknown_magic"),
        (8, "wav", ""),
        (9, "wav", "truncated"),
    }
