"""Property-based roundtrips for the round-7 kernels (no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_admin_boundary_conflation_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
)
from osm_admin_boundary_conflation_spark.functions.png_codec import (
    decode_png,
    encode_png,
)
from osm_admin_boundary_conflation_spark.operators.frechet import discrete_frechet2


@st.composite
def images(draw, max_side=24, channels=3):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2 ** 31 - 1))
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if channels == 3 else (h, w)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(img=images(), ftseed=st.integers(0, 2 ** 31 - 1))
def test_png_roundtrip_any_filters(img, ftseed):
    rng = np.random.RandomState(ftseed)
    filters = [int(f) for f in rng.randint(0, 5, size=img.shape[0])]
    assert np.array_equal(decode_png(encode_png(img, filters=filters)), img)


@settings(max_examples=40, deadline=None)
@given(img=images(channels=1))
def test_gif_roundtrip(img):
    idx, _pal = decode_gif(encode_gif(img))
    assert np.array_equal(idx, img)


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2 ** 31 - 1),
    n=st.integers(1, 7),
    m=st.integers(1, 7),
)
def test_frechet_invariants(seed, n, m):
    rng = np.random.RandomState(seed)
    P = rng.randint(-30, 30, size=(n, 2)).astype(np.int64)
    Q = rng.randint(-30, 30, size=(m, 2)).astype(np.int64)
    d = discrete_frechet2(P[:, 0], P[:, 1], Q[:, 0], Q[:, 1])
    # symmetric; zero iff identical-as-sequences; bounded below by the
    # forced endpoint pairings and above by the identity-ish coupling max
    assert d == discrete_frechet2(Q[:, 0], Q[:, 1], P[:, 0], P[:, 1])
    ends = max(
        int(((P[0] - Q[0]) ** 2).sum()), int(((P[-1] - Q[-1]) ** 2).sum())
    )
    assert d >= ends
    if n == m:
        assert d <= int(((P - Q) ** 2).sum(axis=1).max())
    if n == m and np.array_equal(P, Q):
        assert d == 0
