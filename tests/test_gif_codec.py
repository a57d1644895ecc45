"""GIF/LZW codec: roundtrips across width growth, validation (no Spark)."""

import numpy as np
import pytest

from osm_admin_boundary_conflation_spark.functions.gif_codec import (
    decode_gif,
    default_palette,
    encode_gif,
)


def test_roundtrip_random_and_structured():
    rng = np.random.RandomState(9)
    for h, w in [(1, 1), (5, 7), (60, 80), (200, 200)]:  # 40k px crosses 4096 reset
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        idx, pal = decode_gif(encode_gif(img))
        assert np.array_equal(idx, img)
        assert np.array_equal(pal, default_palette())
    rep = np.tile(np.arange(16, dtype=np.uint8), (300, 50))  # cScSc-heavy
    assert np.array_equal(decode_gif(encode_gif(rep))[0], rep)
    const = np.full((100, 100), 7, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(const))[0], const)


def test_extension_blocks_are_skipped():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    blob = encode_gif(img)
    # splice a graphic-control extension between palette and image desc
    at = 13 + 768  # header+LSD is 13 bytes, global palette 768
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = blob[:at] + ext + blob[at:]
    idx, _ = decode_gif(patched)
    assert np.array_equal(idx, img)


def test_truncation_and_bad_magic():
    blob = encode_gif(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) - 3])  # loses terminator+trailer
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"JIF89a" + blob[6:])


def test_pixel_count_mismatch_detected():
    blob = bytearray(encode_gif(np.zeros((4, 4), dtype=np.uint8)))
    blob[6] = 5  # corrupt width: LZW pixel count no longer matches
    with pytest.raises(ValueError):
        decode_gif(bytes(blob))
