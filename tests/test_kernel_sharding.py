"""Pallas kernels under data parallelism: shard_map path == unsharded math.

GSPMD replicates opaque Mosaic custom calls (measured round 3: output
sharding collapses to P() on the 8-device mesh — every device would
all-gather the batch and redo the full kernel on a real pod), so under a
DP mesh the model wraps each pallas_call in shard_map over 'data'
(parallel/mesh.py kernel-mesh context). These tests pin the wrapped
paths' loss AND gradients — including the explicit psum of the fused
upscaler's parameter gradients — against the unsharded oracle, on the
8-device CPU mesh with interpret-mode kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilabhelmholtzoct_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicated, set_kernel_mesh)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.fixture
def mesh():
    m = make_mesh()
    assert m.size == 8
    try:
        yield m
    finally:
        set_kernel_mesh(None)


def tree_allclose(a, b, atol, rtol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


def test_fused_upscaler_dp_matches_unsharded(rng, mesh):
    """upscale_hyper_masks under a kernel mesh: loss + ALL grads (incl.
    the psum'd parameter grads) == the single-device kernel."""
    from dilabhelmholtzoct_tpu.ops.upscaler import upscale_hyper_masks

    bp, m, c = 8, 64, 64
    up = jnp.asarray(rng.normal(size=(bp, m, c)).astype(np.float32))
    hyper = jnp.asarray(rng.normal(size=(bp, 1, c // 8)).astype(np.float32))
    p = {
        "ct1_w": jnp.asarray(
            (rng.normal(size=(c, 2, 2, c // 4)) * 0.3).astype(np.float32)),
        "ct1_b": jnp.asarray(rng.normal(size=(c // 4,)).astype(np.float32)),
        "ln": {
            "scale": jnp.asarray(
                (1 + rng.normal(size=(c // 4,)) * 0.1).astype(np.float32)),
            "bias": jnp.asarray(
                rng.normal(size=(c // 4,)).astype(np.float32)),
        },
        "ct2_w": jnp.asarray(
            (rng.normal(size=(c // 4, 2, 2, c // 8)) * 0.3).astype(
                np.float32)),
        "ct2_b": jnp.asarray(rng.normal(size=(c // 8,)).astype(np.float32)),
    }
    ct = jnp.asarray(rng.normal(size=(bp, m, 16)).astype(np.float32))

    def loss(up, p, hyper):
        return jnp.sum(
            upscale_hyper_masks(up, p, hyper, interpret=True) * ct)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    set_kernel_mesh(None)
    v_ref, g_ref = grad_fn(up, p, hyper)
    jax.block_until_ready((v_ref, g_ref))

    set_kernel_mesh(mesh)
    ds, rs = data_sharding(mesh), replicated(mesh)
    up_s = jax.device_put(up, ds)
    hyper_s = jax.device_put(hyper, ds)
    p_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, rs), p)
    v_dp, g_dp = grad_fn(up_s, p_s, hyper_s)
    jax.block_until_ready((v_dp, g_dp))

    np.testing.assert_allclose(float(v_dp), float(v_ref), rtol=1e-5)
    tree_allclose(g_dp, g_ref, atol=1e-4, rtol=1e-4)


def test_flash_attention_dp_matches_unsharded(rng, mesh):
    """vision_attention's packed-flash branch under a kernel mesh ==
    the unsharded branch (batch-leading operands, no param reductions)."""
    from dilabhelmholtzoct_tpu.models.configs import VisionConfig
    from dilabhelmholtzoct_tpu.models.sam import (
        set_flash_attention, vision_attention)

    b, h, w, heads, hd = 8, 8, 8, 2, 64
    c = heads * hd
    cfg = VisionConfig(
        hidden_size=c, num_layers=1, num_heads=heads, image_size=h * 16,
        patch_size=16, mlp_dim=c * 4, window_size=0,
        global_attn_indexes=(0,), use_rel_pos=True,
    )
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    p = {
        "qkv": {"w": jnp.asarray(
            (rng.normal(size=(c, 3 * c)) * 0.1).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32))},
        "proj": {"w": jnp.asarray(
            (rng.normal(size=(c, c)) * 0.1).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(c,)).astype(np.float32))},
        "rel_pos_h": jnp.asarray(
            (rng.normal(size=(2 * h - 1, hd)) * 0.2).astype(np.float32)),
        "rel_pos_w": jnp.asarray(
            (rng.normal(size=(2 * w - 1, hd)) * 0.2).astype(np.float32)),
    }
    ct = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

    def loss(x, p):
        return jnp.sum(vision_attention(x, p, cfg) * ct)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0,)))

    try:
        set_flash_attention("interpret")
        set_kernel_mesh(None)
        v_ref, g_ref = grad_fn(x, p)
        jax.block_until_ready((v_ref, g_ref))

        set_kernel_mesh(mesh)
        ds, rs = data_sharding(mesh), replicated(mesh)
        x_s = jax.device_put(x, ds)
        p_s = jax.tree_util.tree_map(lambda t: jax.device_put(t, rs), p)
        v_dp, g_dp = grad_fn(x_s, p_s)
        jax.block_until_ready((v_dp, g_dp))
    finally:
        set_flash_attention("auto")

    np.testing.assert_allclose(float(v_dp), float(v_ref), rtol=1e-5)
    tree_allclose(g_dp, g_ref, atol=1e-4, rtol=1e-4)


def test_fused_i2t_dp_matches_unsharded(rng, mesh):
    """fused_i2t_ln under a kernel mesh: loss + ALL grads (incl. psum'd
    weight/LN/positional grads) == the single-device kernel."""
    from dilabhelmholtzoct_tpu.ops.decoder_attn import fused_i2t_ln

    b, pb, m, c, internal, nh, n_tok = 8, 2, 64, 64, 32, 4, 7
    bp = b * pb
    keys = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(1, m, c)).astype(np.float32))
    tok_k = jnp.asarray(
        rng.normal(size=(bp, n_tok, internal)).astype(np.float32))
    tok_v = jnp.asarray(
        rng.normal(size=(bp, n_tok, internal)).astype(np.float32))
    q_p = {"w": jnp.asarray((rng.normal(size=(c, internal)) * 0.2
                             ).astype(np.float32)),
           "b": jnp.asarray(rng.normal(size=(internal,)).astype(np.float32))}
    out_p = {"w": jnp.asarray((rng.normal(size=(internal, c)) * 0.2
                               ).astype(np.float32)),
             "b": jnp.asarray(rng.normal(size=(c,)).astype(np.float32))}
    ln_p = {"scale": jnp.asarray(
        (1 + rng.normal(size=(c,)) * 0.1).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(c,)).astype(np.float32))}
    ct = jnp.asarray(rng.normal(size=(bp, m, c)).astype(np.float32))

    def loss(keys, pe, tok_k, tok_v, q_p, out_p, ln_p):
        return jnp.sum(fused_i2t_ln(
            keys, pe, tok_k, tok_v, q_p, out_p, ln_p, nh=nh, pb=pb,
            interpret=True) * ct)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=tuple(range(7))))

    set_kernel_mesh(None)
    v_ref, g_ref = grad_fn(keys, pe, tok_k, tok_v, q_p, out_p, ln_p)
    jax.block_until_ready((v_ref, g_ref))

    set_kernel_mesh(mesh)
    ds, rs = data_sharding(mesh), replicated(mesh)
    put_d = lambda t: jax.device_put(t, ds)
    put_r = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rs), t)
    v_dp, g_dp = grad_fn(put_d(keys), put_r(pe), put_d(tok_k),
                         put_d(tok_v), put_r(q_p), put_r(out_p),
                         put_r(ln_p))
    jax.block_until_ready((v_dp, g_dp))

    np.testing.assert_allclose(float(v_dp), float(v_ref), rtol=1e-5)
    tree_allclose(g_dp, g_ref, atol=1e-4, rtol=1e-4)
