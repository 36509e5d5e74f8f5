"""On-device cubical persistence + matching (ops/topology_device.py).

Validates the fully-on-device pairing/matching (SURVEY §7 step 4b) against
the production host path: bar-for-bar pairing equality vs the batched C++
union-find (native/persistence.cc, itself pinned to the python reference
and the independent boundary-matrix-reduction oracle), and loss/gradient
equality vs the two-phase host topo loss the trainer shipped in rounds
1-3. The reference computes the same quantity on the host CPU with gudhi +
Hungarian per step (octsam/models/topological_loss.py:55-82).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dilabhelmholtzoct_tpu.ops.native import cubical_pairs_batch
from dilabhelmholtzoct_tpu.ops.topology import (
    downsample_for_topo,
    host_pairing,
    topo_loss,
)
from dilabhelmholtzoct_tpu.ops.topology_device import (
    device_cubical_pairs,
    device_wasserstein_match,
    topo_loss_device,
)


def _bar_index_multiset(birth, death, count):
    """(N,K) padded arrays → list of sorted (birth_idx, death_idx) lists."""
    out = []
    for i in range(birth.shape[0]):
        c = int(count[i])
        out.append(sorted(zip(np.asarray(birth[i][:c]).tolist(),
                              np.asarray(death[i][:c]).tolist())))
    return out


def _native_bars(grids, dim, max_bars):
    pp = cubical_pairs_batch(np.asarray(grids, np.float32), max_bars)
    b, d = pp[f"h{dim}_birth"], pp[f"h{dim}_death"]
    return _bar_index_multiset(b, d, pp["counts"][:, dim])


GRID_CASES = {
    "random_tiny": lambda rng: rng.random((3, 7, 9)).astype(np.float32),
    "random_mid": lambda rng: rng.random((2, 16, 16)).astype(np.float32),
    "quantized_ties": lambda rng: (
        np.round(rng.random((3, 12, 12)) * 4) / 4
    ).astype(np.float32),
    "binary_blobs": lambda rng: (
        rng.random((4, 14, 14)) > 0.6
    ).astype(np.float32),
    "constant": lambda rng: np.full((2, 10, 10), 0.5, np.float32),
    "sigmoid_like": lambda rng: (
        1.0 / (1.0 + np.exp(-4 * rng.normal(size=(2, 20, 20))))
    ).astype(np.float32),
}


@pytest.mark.parametrize("case", sorted(GRID_CASES))
@pytest.mark.parametrize("dim", [0, 1])
def test_device_pairing_matches_native(case, dim):
    """Bar-for-bar (index-level) equality with the C++ union-find on
    random, tied, binary, constant and sigmoid-noise grids."""
    rng = np.random.default_rng(hash(case) % 2**31)
    grids = GRID_CASES[case](rng)
    max_bars = 128  # above every bar count in these cases: no capping
    b, d, c = jax.jit(
        device_cubical_pairs, static_argnums=(1, 2)
    )(jnp.asarray(grids), dim, max_bars)
    got = _bar_index_multiset(np.asarray(b), np.asarray(d), np.asarray(c))
    want = _native_bars(grids, dim, max_bars)
    assert got == want


@pytest.mark.parametrize("dim", [0, 1])
def test_device_pairing_50x50_sigmoid_noise(dim):
    """The training geometry (interp=50 downsampled sigmoid grids) — the
    worst case for edge counts; uncapped bar equality."""
    rng = np.random.default_rng(50)
    grids = (1.0 / (1.0 + np.exp(-rng.normal(size=(2, 50, 50))))
             ).astype(np.float32)
    max_bars = 1400  # > max bars of 50x50 noise (~1.2k): no capping
    b, d, c = device_cubical_pairs(jnp.asarray(grids), dim, max_bars)
    got = _bar_index_multiset(np.asarray(b), np.asarray(d), np.asarray(c))
    want = _native_bars(grids, dim, max_bars)
    assert got == want


@pytest.mark.parametrize("dim", [0, 1])
def test_device_pairing_capping_keeps_most_persistent(dim):
    """When count > max_bars both paths keep the max_bars most persistent
    bars (persistence.cc partial_sort semantics). Random float grids: no
    persistence ties at the cap boundary."""
    rng = np.random.default_rng(7)
    grids = rng.random((2, 16, 16)).astype(np.float32)
    max_bars = 8
    b, d, c = device_cubical_pairs(jnp.asarray(grids), dim, max_bars)
    got = _bar_index_multiset(np.asarray(b), np.asarray(d), np.asarray(c))
    want = _native_bars(grids, dim, max_bars)
    assert [len(x) for x in want] == [max_bars] * 2  # capping did happen
    assert got == want


def test_device_matching_cost_equals_host():
    """The device JV matcher reaches the same optimal assignment cost as
    the host matcher (equal-cost matchings may differ; the cost cannot)."""
    rng = np.random.default_rng(3)
    n, hw, k, q = 4, 64, 16, 2.0
    flat = rng.random((n, hw)).astype(np.float32)
    # synthetic pred pairings: random distinct pixel pairs per row
    counts = rng.integers(0, k, n)
    p_b = np.full((n, k), -1, np.int32)
    p_d = np.full((n, k), -1, np.int32)
    for i in range(n):
        idx = rng.choice(hw, size=2 * counts[i], replace=False)
        p_b[i, :counts[i]] = idx[:counts[i]]
        p_d[i, :counts[i]] = idx[counts[i]:]
    t_cnt = rng.integers(0, 6, n).astype(np.int32)
    t = 6
    t_bars = np.sort(rng.random((n, t, 2)).astype(np.float32), axis=2)

    matched, target, const = device_wasserstein_match(
        jnp.asarray(flat), jnp.asarray(p_b), jnp.asarray(p_d),
        jnp.asarray(t_bars[..., 0]), jnp.asarray(t_bars[..., 1]),
        jnp.asarray(t_cnt), q,
    )
    matched, target, const = map(np.asarray, (matched, target, const))

    from dilabhelmholtzoct_tpu.ops.topology_ref import (
        _wasserstein_match_dense,
    )

    def cost_of(flat_i, pb, pd, m, tgt, cst):
        v = pb >= 0
        bv, dv = flat_i[np.clip(pb, 0, None)], flat_i[np.clip(pd, 0, None)]
        mm = m.astype(bool) & v
        c_match = np.maximum(np.abs(bv - tgt[:, 0]),
                             np.abs(dv - tgt[:, 1])) ** q
        c_diag = (np.abs(dv - bv) / 2.0) ** q
        return float(np.sum(np.where(mm, c_match,
                                     np.where(v, c_diag, 0.0))) + cst)

    for i in range(n):
        got = cost_of(flat[i], p_b[i], p_d[i],
                      matched[i], target[i], const[i])
        d1 = np.stack([flat[i][p_b[i, :counts[i]]],
                       flat[i][p_d[i, :counts[i]]]], 1)
        d2 = t_bars[i, :t_cnt[i]].astype(np.float64)
        m, u1, u2 = _wasserstein_match_dense(d1.astype(np.float64), d2, q)
        want = sum(
            max(abs(d1[r, 0] - d2[c, 0]), abs(d1[r, 1] - d2[c, 1])) ** q
            for r, c in m
        )
        want += sum((abs(d1[r, 1] - d1[r, 0]) / 2) ** q for r in u1)
        want += sum((abs(d2[c, 1] - d2[c, 0]) / 2) ** q for c in u2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _loss_pair(pred, true, **kw):
    """(host two-phase loss, device loss) for identical inputs."""
    host = topo_loss(jnp.asarray(pred), jnp.asarray(true), **kw)
    dev = topo_loss_device(jnp.asarray(pred), jnp.asarray(true), **kw)
    return float(host), float(dev)


@pytest.mark.parametrize("feat_d,loss_q,loss_r", [
    (1, 2, False), (0, 2, False), (1, 1, False), (1, 2, True),
])
def test_device_loss_matches_host(feat_d, loss_q, loss_r):
    rng = np.random.default_rng(11 + feat_d + loss_q)
    pred = (1 / (1 + np.exp(-rng.normal(size=(2, 3, 24, 30))))
            ).astype(np.float32)
    true = (rng.random((2, 3, 24, 30)) > 0.5).astype(np.float32)
    host, dev = _loss_pair(
        pred, true, lamda=0.1, interp=16, feat_d=feat_d,
        loss_q=loss_q, loss_r=loss_r,
    )
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=1e-6)


def test_device_loss_matches_host_training_geometry():
    """The exact training call: λ=0.1, interp=50, feat_d=1, q=2
    (training_utils.py:64) with a bucket-padding channel_mask."""
    rng = np.random.default_rng(42)
    b, c = 2, 4
    pred = (1 / (1 + np.exp(-rng.normal(size=(b, c, 64, 64))))
            ).astype(np.float32)
    true = np.zeros((b, c, 64, 64), np.float32)
    for i in range(b):
        for j in range(c):
            y, x = rng.integers(8, 40, 2)
            true[i, j, y:y + 16, x:x + 16] = 1.0
    cm = np.ones((b, c), np.float32)
    cm[:, -1] = 0.0  # bucket padding
    kw = dict(lamda=0.1, interp=50, feat_d=1, loss_q=2,
              channel_mask=jnp.asarray(cm))
    host, dev = _loss_pair(pred, true, **kw)
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=1e-6)


def test_device_loss_gradients_match_host():
    """d loss / d pred identical between paths: the device combinatorics
    must be stop-gradient just like the host-fed pairing arrays."""
    rng = np.random.default_rng(5)
    pred = (1 / (1 + np.exp(-rng.normal(size=(1, 2, 20, 20))))
            ).astype(np.float32)
    true = (rng.random((1, 2, 20, 20)) > 0.5).astype(np.float32)
    kw = dict(lamda=0.1, interp=14, feat_d=1, loss_q=2)

    g_host = jax.grad(
        lambda p: topo_loss(p, jnp.asarray(true), **kw)
    )(jnp.asarray(pred))
    g_dev = jax.grad(
        lambda p: topo_loss_device(p, jnp.asarray(true), **kw)
    )(jnp.asarray(pred))
    assert np.any(np.asarray(g_dev) != 0.0)
    np.testing.assert_allclose(
        np.asarray(g_dev), np.asarray(g_host), rtol=1e-4, atol=1e-6)


def test_device_loss_jits_and_is_deterministic():
    rng = np.random.default_rng(9)
    pred = rng.random((1, 2, 16, 16)).astype(np.float32)
    true = (rng.random((1, 2, 16, 16)) > 0.5).astype(np.float32)
    f = jax.jit(lambda p, t: topo_loss_device(
        p, t, 0.1, interp=12, feat_d=1, loss_q=2))
    a = float(f(jnp.asarray(pred), jnp.asarray(true)))
    b = float(f(jnp.asarray(pred), jnp.asarray(true)))
    assert a == b and np.isfinite(a)


def test_device_loss_zero_lambda():
    x = jnp.zeros((1, 1, 8, 8))
    assert topo_loss_device(x, x, 0.0) == 0.0


def test_device_pairing_empty_and_degenerate():
    """Constant grids → empty diagrams; single-feature grids → one bar."""
    const = jnp.full((1, 10, 10), 0.3)
    for dim in (0, 1):
        _, _, c = device_cubical_pairs(const, dim, 16)
        assert int(c[0]) == 0
    # one bright ring on dark background → exactly one H1 bar
    v = np.ones((1, 20, 20), np.float32)
    v[0, 4:16, 4:16] = 0.2
    v[0, 8:12, 8:12] = 0.9
    b, d, c = device_cubical_pairs(jnp.asarray(v), 1, 16)
    got = _bar_index_multiset(np.asarray(b), np.asarray(d), np.asarray(c))
    want = _native_bars(v, 1, 16)
    assert got == want and len(want[0]) == 1
