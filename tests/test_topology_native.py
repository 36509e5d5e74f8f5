"""C++ persistence engine vs Python reference: bar-for-bar equality."""

import numpy as np
import pytest

from dilabhelmholtzoct_tpu.ops import native
from dilabhelmholtzoct_tpu.ops.topology_ref import cubical_pairs


@pytest.mark.skipif(not native.have_native(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(6))
def test_native_matches_reference(seed):
    rng = np.random.default_rng(seed)
    grids = rng.random((3, 17, 13)).astype(np.float32)
    out = native.cubical_pairs_batch(grids, max_bars=64)
    for g in range(len(grids)):
        ref = cubical_pairs(grids[g])
        for dim in (0, 1):
            k = out["counts"][g, dim]
            got = set(
                zip(out[f"h{dim}_birth"][g, :k], out[f"h{dim}_death"][g, :k])
            )
            want = set(map(tuple, ref[f"h{dim}"]))
            assert got == want, f"grid {g} H{dim}"
        assert out["h0_essential"][g] == ref["h0_essential"]


@pytest.mark.skipif(not native.have_native(), reason="native lib unavailable")
def test_native_cap_keeps_most_persistent():
    rng = np.random.default_rng(0)
    grid = rng.random((20, 20)).astype(np.float32)
    full = native.cubical_pairs_batch(grid[None], max_bars=256)
    capped = native.cubical_pairs_batch(grid[None], max_bars=3)
    flat = grid.reshape(-1)
    k_full = full["counts"][0, 1]
    pers = np.abs(
        flat[full["h1_death"][0, :k_full]] - flat[full["h1_birth"][0, :k_full]]
    )
    top3 = set(np.sort(pers)[-3:].round(7))
    k_c = capped["counts"][0, 1]
    got = set(
        np.abs(
            flat[capped["h1_death"][0, :k_c]] - flat[capped["h1_birth"][0, :k_c]]
        ).round(7)
    )
    assert got == top3


def test_python_fallback_matches_reference(monkeypatch):
    """Force the fallback path and check it agrees with the reference."""
    monkeypatch.setattr(native, "_load", lambda: None)
    rng = np.random.default_rng(1)
    grids = rng.random((2, 9, 11)).astype(np.float32)
    out = native.cubical_pairs_batch(grids, max_bars=64)
    for g in range(2):
        ref = cubical_pairs(grids[g])
        k = out["counts"][g, 1]
        got = set(zip(out["h1_birth"][g, :k], out["h1_death"][g, :k]))
        assert got == set(map(tuple, ref["h1"]))


@pytest.mark.skipif(not native.have_native(), reason="native lib unavailable")
@pytest.mark.parametrize("feat_d", [0, 1])
@pytest.mark.parametrize("case", ["blobs", "noise", "empty-pred-side"])
def test_native_matching_equals_python_loop(case, feat_d, monkeypatch):
    """wasserstein_match_batch (C++ JV) vs the Python scipy loop.

    The pairing arrays (p_birth/p_death) must be identical. The MATCHING
    need not be: random f32 data can produce near-tied assignment costs
    where two optimal matchings exist and JV vs scipy legitimately pick
    different ones (observed at ~3e-2 target deltas on unlucky draws), so
    the matcher invariant asserted here is the per-row OPTIMAL TRANSPORT
    COST — unique even when the argmin is not, and the only thing the loss
    value depends on. (Seed note: ``hash(str)`` is salted per process, so
    the old hash-based seed made this test check different data every run.)
    """
    from dilabhelmholtzoct_tpu.ops import topology as T

    import zlib

    rng = np.random.default_rng(zlib.crc32(f"{case}-{feat_d}".encode()))
    n = 12
    pred = rng.uniform(0.1, 0.9, (n, 24, 24)).astype(np.float32)
    if case == "noise":
        true = rng.uniform(0, 1, (n, 24, 24)).astype(np.float32)
    elif case == "empty-pred-side":
        # constant pred grids -> zero pred bars; all true bars unmatched
        pred = np.full((n, 24, 24), 0.5, np.float32)
        true = rng.uniform(0, 1, (n, 24, 24)).astype(np.float32)
    else:
        true = np.zeros((n, 24, 24), np.float32)
        for i in range(n):
            y, x = rng.integers(2, 12, 2)
            h, w = rng.integers(5, 10, 2)
            true[i, y:y + h, x:x + w] = 1.0
            true[i, y + 2, x + 2] = 0.0  # pinhole -> one H1 bar
    td = T.true_diagrams_from_grids(true, feat_d)
    row_mask = (rng.uniform(size=n) > 0.2).astype(np.float32)

    got = T._host_pairs_and_matching(
        pred, None, feat_d, 2.0, 128, true_diagrams=td, row_mask=row_mask)
    monkeypatch.setattr(T, "wasserstein_match_batch", lambda *a, **k: None)
    want = T._host_pairs_and_matching(
        pred, None, feat_d, 2.0, 128, true_diagrams=td, row_mask=row_mask)

    np.testing.assert_array_equal(got[0], want[0], err_msg="p_birth")
    np.testing.assert_array_equal(got[1], want[1], err_msg="p_death")

    def row_costs(res):
        p_birth, p_death, matched, target, const_term = res
        flat = pred.reshape(n, -1)
        valid = p_birth >= 0
        b = np.take_along_axis(flat, np.clip(p_birth, 0, None), axis=1)
        d = np.take_along_axis(flat, np.clip(p_death, 0, None), axis=1)
        cost_m = np.maximum(np.abs(b - target[..., 0]),
                            np.abs(d - target[..., 1])) ** 2.0
        cost_diag = (np.abs(d - b) / 2.0) ** 2.0
        cost = np.where(matched.astype(bool), cost_m, cost_diag)
        return np.sum(np.where(valid, cost, 0.0), axis=1) + const_term

    np.testing.assert_allclose(row_costs(got), row_costs(want),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", range(5))
def test_native_ccl_matches_scipy(seed):
    from scipy import ndimage

    from dilabhelmholtzoct_tpu.ops.native import label_components_8

    rng = np.random.default_rng(seed)
    m = (rng.random((41, 29)) > 0.55).astype(np.uint8)
    got, n = label_components_8(m)
    want, n_want = ndimage.label(m, np.ones((3, 3), np.int32))
    assert n == n_want
    np.testing.assert_array_equal(got, want)
