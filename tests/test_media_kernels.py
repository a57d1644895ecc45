"""Direct differential tests for the round-7 media kernels: integral-
image box blur vs naive convolution, aHash vs a pure-python rewrite,
WAV pair-resample vs direct sample math."""

import numpy as np

from osm_admin_boundary_conflation_spark.operators import multimodal as M


def test_box_blur_matches_naive():
    for doc in (0, 7, 123):
        blob = M.build_bmp(doc, 16, 12)
        w, h, nb, br, bg, bb = M.box_blur_bmp(blob)
        assert (w, h, nb) == (16, 12, 140)
        # naive O(pixels * 9) reference on the logical image
        Y, X = np.mgrid[0:12, 0:16]
        r = (doc + X + Y) % 256
        g = (doc * 2 + X) % 256
        b = (doc * 3 + Y) % 256

        def naive(ch):
            tot = 0
            for y in range(1, 11):
                for x in range(1, 15):
                    tot += int(ch[y - 1 : y + 2, x - 1 : x + 2].sum())
            return tot

        assert (br, bg, bb) == (naive(r), naive(g), naive(b))


def test_box_blur_rejects_non_bmp():
    import pytest

    with pytest.raises(ValueError):
        M.box_blur_bmp(b"PK\x03\x04 not a bmp")


def test_ahash_bits_definition():
    for doc in (3, 11, 51):
        blob = M.build_phash_bmp(doc)
        h = M.ahash_bmp(blob)
        # recompute from first principles on the decoded-resized image
        base, v = doc // 8, doc % 8
        lum = []
        for y in range(8):
            for x in range(8):
                sx, sy = 2 * x, (3 * y) // 2
                r = (
                    sx * sy * (1 + base % 4)
                    + sx * (3 + base % 9)
                    + (v * 7 if (sx < 2 and sy < 2) else 0)
                ) % 256
                g = ((sx + 3 * sy) * (5 + base % 5) + sy * sy * (1 + base % 3)) % 256
                b = (sx * sx * (1 + base % 7) + sy * (4 + base % 11)) % 256
                lum.append(299 * r + 587 * g + 114 * b)
        t = sum(lum)
        want = 0
        for i, li in enumerate(lum):
            if 64 * li > t:
                want |= 1 << i
        if want >= 2**63:
            want -= 2**64
        assert h == want


def test_wav_pair_resample_direct():
    for doc in (0, 2, 99):
        blob = M.build_wav(doc)
        m, cs = M.wav_pair_resample_checksum(blob)
        s = [((doc * 7 + i * 13) % 65536) - 32768 for i in range(40)]
        assert m == 20
        assert cs == sum((j + 1) * (s[2 * j] + s[2 * j + 1]) for j in range(20))
