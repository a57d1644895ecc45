"""PNG codec: roundtrip on random images, validation errors (no Spark)."""

import struct
import zlib

import numpy as np
import pytest

from osm_admin_boundary_conflation_spark.functions.png_codec import (
    SIGNATURE,
    decode_png,
    encode_png,
)


def test_roundtrip_random_rgb_all_filters():
    rng = np.random.RandomState(5)
    for h, w in [(1, 1), (3, 17), (16, 16)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in range(5):
            assert np.array_equal(decode_png(encode_png(img, filters=ft)), img)
        mixed = [i % 5 for i in range(h)]
        assert np.array_equal(decode_png(encode_png(img, filters=mixed)), img)


def test_roundtrip_grayscale():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(9, 11), dtype=np.uint8)
    out = decode_png(encode_png(img, filters=[4] * 9))
    assert out.shape == (9, 11)
    assert np.array_equal(out, img)


def test_crc_corruption_detected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    # flip a byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = blob.index(b"IDAT")
    blob[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_truncation_and_bad_signature():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope" + blob[4:])


def test_unsupported_variant_rejected():
    # hand-build a 16-bit-depth IHDR: decoder must refuse, not garble
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(SIGNATURE + chunk + iend)
