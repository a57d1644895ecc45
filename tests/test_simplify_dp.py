"""Douglas-Peucker kernel: stack implementation vs textbook recursion,
plus the closed-form staircase case the gate query pins."""

import numpy as np
import pytest

from osm_admin_boundary_conflation_spark.operators.simplify_dp import (
    douglas_peucker_brute,
    douglas_peucker_mask,
)


def _rand_polyline(rng: np.random.Generator, n: int):
    # random walk with occasional sharp jumps so both kept and dropped
    # points occur at every tolerance tested
    steps = rng.integers(-5, 6, size=(n, 2)).astype(np.float64)
    jumps = rng.integers(0, 10, size=n) == 0
    steps[jumps] *= 20
    pts = np.cumsum(steps, axis=0)
    return pts[:, 0].copy(), pts[:, 1].copy()


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("eps", [0.5, 3.0, 15.0])
def test_mask_matches_brute_force(seed, eps):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 60))
    xs, ys = _rand_polyline(rng, n)
    fast = douglas_peucker_mask(xs, ys, eps)
    slow = douglas_peucker_brute(xs, ys, eps)
    assert fast.tolist() == slow.tolist()


def test_endpoints_always_kept():
    xs = np.array([0.0, 1.0, 2.0])
    ys = np.array([0.0, 0.0, 0.0])
    mask = douglas_peucker_mask(xs, ys, 10.0)
    assert mask[0] and mask[-1] and not mask[1]


def test_degenerate_closed_chord():
    # identical endpoints: deviation falls back to point distance
    xs = np.array([0.0, 5.0, 0.0])
    ys = np.array([0.0, 0.0, 0.0])
    assert douglas_peucker_mask(xs, ys, 1.0).tolist() == [True, True, True]
    assert douglas_peucker_mask(xs, ys, 9.0).tolist() == [True, False, True]


def test_staircase_keeps_exactly_corners():
    # the gate query's closed form: 4 legs of 300 units, jitter {-1,0,1}
    idx = np.arange(121)
    k, t = idx // 30, idx % 30
    jit = np.where(t == 0, 0, (idx * 7 + 5) % 3 - 1)
    even = k % 2 == 0
    px = np.where(even, 300 * ((k + 1) // 2) + 10 * t, 300 * ((k + 1) // 2) + jit)
    py = np.where(even, 300 * (k // 2) + jit, 300 * (k // 2) + 10 * t)
    mask = douglas_peucker_mask(px.astype(float), py.astype(float), 10.0)
    assert np.flatnonzero(mask).tolist() == [0, 30, 60, 90, 120]
