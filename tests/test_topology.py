"""Topological loss tests (SURVEY.md §4, §7 step 4).

Correctness of the persistence pairing is property-tested without gudhi:
for any threshold t, the number of H0 bars alive at t must equal the number
of 4-connected components of the sublevel set, and the number of H1 bars
alive must equal the number of bounded (non-border-touching) 8-connected
components of the strict superlevel set — the Alexander-dual hole count.
Plus known-shape cases (one ring ⇒ one H1 bar) and Wasserstein properties.
"""

import numpy as np
import pytest
from scipy import ndimage

from dilabhelmholtzoct_tpu.ops.topology_ref import (
    cubical_pairs,
    diagram_from_pairs,
    wasserstein_distance,
    wasserstein_match,
)

FOUR = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
EIGHT = np.ones((3, 3))


def _alive(diagram, t, births_leq=True):
    if len(diagram) == 0:
        return 0
    return int(np.sum((diagram[:, 0] <= t) & (diagram[:, 1] > t)))


def _h0_true(values, t):
    mask = values <= t
    if not mask.any():
        return 0
    _, n = ndimage.label(mask, FOUR)
    return n


def _h1_true(values, t):
    mask = values > t
    if not mask.any():
        return 0
    lab, n = ndimage.label(mask, EIGHT)
    border = set(lab[0, :]) | set(lab[-1, :]) | set(lab[:, 0]) | set(lab[:, -1])
    border.discard(0)
    return n - len(border)


@pytest.mark.parametrize("seed", range(8))
def test_alive_counts_match_scipy(seed):
    rng = np.random.default_rng(seed)
    v = rng.random((12, 14))
    pairs = cubical_pairs(v)
    d0 = diagram_from_pairs(v, pairs["h0"])
    d1 = diagram_from_pairs(v, pairs["h1"])
    thresholds = np.concatenate([rng.random(15), v.reshape(-1)[:20]])
    for t in thresholds:
        # +1 essential class alive at any t ≥ min
        essential = 1 if t >= v.min() else 0
        assert _alive(d0, t) + essential == _h0_true(v, t), f"H0 @ {t}"
        assert _alive(d1, t) == _h1_true(v, t), f"H1 @ {t}"


def test_single_ring_one_h1_bar():
    """SURVEY.md §4: one ring ⇒ one H1 bar with known birth/death."""
    v = np.ones((11, 11))
    v[2:9, 2:9] = 0.2   # ring body
    v[4:7, 4:7] = 0.6   # enclosed higher region
    pairs = cubical_pairs(v)
    d1 = diagram_from_pairs(v, pairs["h1"])
    assert len(d1) == 1
    np.testing.assert_allclose(d1[0], [0.2, 0.6])


def test_two_rings():
    v = np.ones((10, 22))
    v[2:8, 2:8] = 0.1
    v[4:6, 4:6] = 0.5
    v[2:8, 12:20] = 0.2
    v[4:6, 14:18] = 0.9
    d1 = diagram_from_pairs(v, cubical_pairs(v)["h1"])
    assert len(d1) == 2
    got = sorted(map(tuple, d1))
    assert got == [(0.1, 0.5), (0.2, 0.9)]


def test_no_ring_no_h1():
    """A low stripe crossing the image creates no loop (outside-node case)."""
    v = np.ones((8, 8))
    v[:, 3] = 0.1  # full-height low column splits two high halves
    pairs = cubical_pairs(v)
    assert len(pairs["h1"]) == 0


def test_h0_two_blobs():
    v = np.ones((8, 12))
    v[2:4, 2:4] = 0.1
    v[5:7, 8:11] = 0.3
    pairs = cubical_pairs(v)
    d0 = diagram_from_pairs(v, pairs["h0"])
    # essential = blob born at 0.1; the 0.3 blob dies when background joins
    assert pairs["h0_essential"] is not None
    assert v.reshape(-1)[pairs["h0_essential"]] == 0.1
    assert len(d0) == 1
    np.testing.assert_allclose(d0[0], [0.3, 1.0])


def test_wasserstein_identity_and_symmetry():
    rng = np.random.default_rng(0)
    d1 = np.sort(rng.random((5, 2)), axis=1)
    d2 = np.sort(rng.random((3, 2)), axis=1)
    assert wasserstein_distance(d1, d1) < 1e-12
    a = wasserstein_distance(d1, d2)
    b = wasserstein_distance(d2, d1)
    np.testing.assert_allclose(a, b, rtol=1e-12)
    # vs empty: every bar pays its diagonal cost
    empty = np.zeros((0, 2))
    want = (np.sum(((d1[:, 1] - d1[:, 0]) / 2) ** 2)) ** 0.5
    np.testing.assert_allclose(wasserstein_distance(d1, empty, 2), want)


def test_wasserstein_simple_match():
    d1 = np.array([[0.0, 1.0]])
    d2 = np.array([[0.1, 0.9]])
    # matching the two bars costs max(.1,.1)=0.1 < pushing both to diagonal
    np.testing.assert_allclose(wasserstein_distance(d1, d2, 1), 0.1)
    m, u1, u2 = wasserstein_match(d1, d2, 1)
    assert len(m) == 1 and len(u1) == 0 and len(u2) == 0


def test_wasserstein_prefers_diagonal_for_far_bars():
    d1 = np.array([[0.0, 0.1]])       # tiny bar near diagonal
    d2 = np.array([[0.8, 1.0]])
    # diagonal costs (0.05 + 0.1) vs matching max(0.8, 0.9)=0.9
    np.testing.assert_allclose(wasserstein_distance(d1, d2, 1), 0.15)
    m, u1, u2 = wasserstein_match(d1, d2, 1)
    assert len(m) == 0 and list(u1) == [0] and list(u2) == [0]
