"""JAX topological loss: value correctness, differentiability, jit,
align-corners resize parity with torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dilabhelmholtzoct_tpu.ops.topology import (
    resize_align_corners,
    topo_loss,
)
from dilabhelmholtzoct_tpu.ops.topology_ref import (
    cubical_pairs,
    diagram_from_pairs,
    wasserstein_distance,
)


def test_resize_align_corners_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.normal(size=(2, 3, 31, 17)).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), (50, 50), mode="bilinear", align_corners=True
    ).numpy()
    got = np.asarray(resize_align_corners(jnp.asarray(x), (50, 50)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _ring(v_ring, v_center, hw=(20, 20)):
    v = np.ones(hw, np.float32)
    v[4:16, 4:16] = v_ring
    v[8:12, 8:12] = v_center
    return v


def test_topo_loss_value_matches_reference_math():
    """loss == λ · mean_b Σ_c W_q(Dgm1(pred), Dgm1(true)) computed by the
    tested numpy reference."""
    pred = np.stack([_ring(0.2, 0.7), _ring(0.4, 0.9)])[None]  # (1,2,20,20)
    true = np.stack([_ring(0.1, 0.8), np.ones((20, 20), np.float32)])[None]

    want = 0.0
    for c in range(2):
        d1 = diagram_from_pairs(pred[0, c], cubical_pairs(pred[0, c])["h1"])
        d2 = diagram_from_pairs(true[0, c], cubical_pairs(true[0, c])["h1"])
        want += wasserstein_distance(d1, d2, 2)
    lam = 0.1
    got = float(topo_loss(jnp.asarray(pred), jnp.asarray(true), lam,
                          interp=0, feat_d=1, loss_q=2))
    np.testing.assert_allclose(got, lam * want, rtol=1e-5)


def test_topo_loss_zero_lambda_early_exit():
    x = jnp.zeros((1, 1, 8, 8))
    assert topo_loss(x, x, 0.0) == 0.0


def test_topo_loss_identical_inputs_zero():
    p = jnp.asarray(_ring(0.3, 0.8)[None, None])
    val = float(topo_loss(p, p, 1.0, feat_d=1))
    assert val < 1e-5


def test_topo_loss_differentiable_and_jits():
    true = jnp.asarray(_ring(0.1, 0.9)[None, None])

    def f(x):
        return topo_loss(x, true, 0.1, interp=16, feat_d=1)

    pred = jnp.asarray(_ring(0.35, 0.6)[None, None])
    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # gradient actually flows

    jitted = jax.jit(f)
    np.testing.assert_allclose(float(jitted(pred)), float(f(pred)), rtol=1e-5)


def test_topo_loss_gradient_direction():
    """Gradient descent on the topo loss should move the pred ring's
    birth/death toward the target's."""
    true = jnp.asarray(_ring(0.1, 0.9)[None, None])
    pred0 = jnp.asarray(_ring(0.4, 0.6)[None, None])

    def f(x):
        return topo_loss(x, true, 1.0, feat_d=1)

    x = pred0
    v0 = float(f(x))
    for _ in range(100):
        x = x - 0.01 * jax.grad(f)(x)
    v1 = float(f(x))
    # persistence gradients act one critical pixel at a time (exactly like
    # torch_topological): steady but incremental descent
    assert v1 < v0 - 0.02


def test_topo_loss_channel_mask():
    """Masked channels contribute nothing."""
    ring = _ring(0.2, 0.7)
    flat = np.ones((20, 20), np.float32)
    pred = jnp.asarray(np.stack([ring, ring])[None])
    true = jnp.asarray(np.stack([ring, flat])[None])
    # channel 1 mismatch normally adds cost
    full = float(topo_loss(pred, true, 1.0, feat_d=1))
    masked = float(topo_loss(pred, true, 1.0, feat_d=1,
                             channel_mask=jnp.asarray([[1.0, 0.0]])))
    assert masked < full
    assert masked < 1e-5  # channel 0 is identical


def test_topo_loss_feat_d0_and_regularizer():
    pred = jnp.asarray(_ring(0.3, 0.8)[None, None])
    true = jnp.asarray(_ring(0.1, 0.6)[None, None])
    v0 = float(topo_loss(pred, true, 1.0, feat_d=0))
    assert np.isfinite(v0)
    vr = float(topo_loss(pred, true, 1.0, feat_d=1, loss_r=True))
    v = float(topo_loss(pred, true, 1.0, feat_d=1, loss_r=False))
    assert vr > v  # total persistence of pred ring adds positive mass


def test_two_phase_matches_callback_path():
    """topo_loss (pure_callback) == host_pairing + topo_loss_from_pairing
    (the axon-TPU two-phase protocol)."""
    from dilabhelmholtzoct_tpu.ops.topology import (
        downsample_for_topo,
        host_pairing,
        topo_loss_from_pairing,
    )

    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.random((2, 3, 24, 24)).astype(np.float32))
    true = jnp.asarray((rng.random((2, 3, 24, 24)) > 0.6).astype(np.float32))
    cm = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])

    a = float(topo_loss(pred, true, 0.1, interp=16, feat_d=1,
                        channel_mask=cm))

    p50, t50 = downsample_for_topo(pred, true, 16)
    pairing = host_pairing(
        np.asarray(p50).reshape(6, 16, 16),
        np.asarray(t50).reshape(6, 16, 16), feat_d=1,
    )
    pairing = {k: jnp.asarray(v) for k, v in pairing.items()}
    b = float(topo_loss_from_pairing(pred, pairing, 0.1, interp=16,
                                     channel_mask=cm))
    np.testing.assert_allclose(a, b, rtol=1e-5)
