"""Fused upscaler+hypernetwork kernel vs the blocked einsum chain.

The reference math is SAM's output_upscaling Sequential + hypernetwork
contraction (exercised by the reference at training_utils.py:55-58); the
oracle here is the exact einsum chain from models/sam.py's blocked
branch, which is itself parity-tested against HF SAM at full scale
(tests/test_sam_parity.py / test_sam_full_scale.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilabhelmholtzoct_tpu.models.sam import gelu, layer_norm
from dilabhelmholtzoct_tpu.ops.upscaler import upscale_hyper_masks


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def make_params(rng, c, dtype):
    c1, c2 = c // 4, c // 8
    def arr(*shape, scale=0.3):
        return jnp.asarray(
            (rng.normal(size=shape) * scale).astype(np.float32), dtype)
    return {
        "ct1_w": arr(c, 2, 2, c1),
        "ct1_b": arr(c1),
        "ln": {"scale": 1.0 + arr(c1, scale=0.1), "bias": arr(c1)},
        "ct2_w": arr(c1, 2, 2, c2),
        "ct2_b": arr(c2),
    }


def einsum_chain(up, p, hyper_sl):
    """The models/sam.py blocked branch, verbatim semantics."""
    w1 = p["ct1_w"].astype(up.dtype)
    u1 = jnp.einsum("bhwc,cdeo->bhwdeo", up, w1) + p["ct1_b"].astype(
        up.dtype)
    u1 = gelu(layer_norm(u1, jax.tree_util.tree_map(
        lambda x: x.astype(up.dtype), p["ln"]), 1e-6))
    w2 = p["ct2_w"].astype(up.dtype)
    u2 = jnp.einsum("bhwdec,cfgo->bhwdefgo", u1, w2)
    u2 = gelu(u2 + p["ct2_b"].astype(up.dtype))
    return jnp.einsum("btc,bhwdefgc->bthwdefg",
                      hyper_sl.astype(up.dtype), u2,
                      preferred_element_type=jnp.float32)


def fused(up, p, hyper_sl):
    bp, g, _, c = up.shape
    mf = upscale_hyper_masks(up.reshape(bp, g * g, c), p, hyper_sl,
                             interpret=True)
    # (BP, G·G, t, 16) → (BP, t, G, G, 2, 2, 2, 2)
    mf = mf.reshape(bp, g, g, -1, 2, 2, 2, 2)
    return jnp.moveaxis(mf, 3, 1)


@pytest.mark.parametrize("c,n_out", [(256, 1), (64, 3)])
def test_fused_matches_einsum_f32(rng, c, n_out):
    bp, g = 2, 8
    up = jnp.asarray(rng.normal(size=(bp, g, g, c)).astype(np.float32))
    hyper = jnp.asarray(
        rng.normal(size=(bp, n_out, c // 8)).astype(np.float32))
    p = make_params(rng, c, jnp.float32)
    want = einsum_chain(up, p, hyper)
    got = fused(up, p, hyper)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_einsum_bf16(rng):
    """bf16: the kernel keeps pre-activation chains in f32 where the XLA
    path rounds to bf16 between ops, so compare both against the f32
    oracle — the kernel must be at least as accurate."""
    bp, g, c = 2, 8, 256
    up32 = rng.normal(size=(bp, g, g, c)).astype(np.float32)
    hyper32 = rng.normal(size=(bp, 1, 32)).astype(np.float32)
    p32 = make_params(rng, c, jnp.float32)
    oracle = np.asarray(einsum_chain(jnp.asarray(up32), p32,
                                     jnp.asarray(hyper32)))

    to_bf = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    up_b, hyper_b, p_b = (jnp.asarray(up32).astype(jnp.bfloat16),
                          jnp.asarray(hyper32).astype(jnp.bfloat16),
                          to_bf(p32))
    got = np.asarray(fused(up_b, p_b, hyper_b))
    ref_b = np.asarray(einsum_chain(up_b, p_b, hyper_b))
    scale = np.abs(oracle).max()
    err_fused = np.abs(got - oracle).max() / scale
    err_einsum = np.abs(ref_b - oracle).max() / scale
    assert err_fused < max(2.5 * err_einsum, 1e-3), (err_fused, err_einsum)


def test_fused_gradients_match(rng):
    bp, g, c, n_out = 2, 8, 256, 1
    up = jnp.asarray(rng.normal(size=(bp, g, g, c)).astype(np.float32))
    hyper = jnp.asarray(
        rng.normal(size=(bp, n_out, c // 8)).astype(np.float32))
    p = make_params(rng, c, jnp.float32)
    ct = jnp.asarray(
        rng.normal(size=(bp, n_out, g, g, 2, 2, 2, 2)).astype(np.float32))

    def loss_ref(up, p, hyper):
        return jnp.sum(einsum_chain(up, p, hyper) * ct)

    def loss_fused(up, p, hyper):
        return jnp.sum(fused(up, p, hyper) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(up, p, hyper)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(up, p, hyper)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, treedef = jax.tree_util.tree_flatten(g_fus)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4)


def test_fused_inside_decode_masks(rng):
    """End-to-end: decode_masks(blocked=True) with the fused upscaler ==
    the einsum blocked path, through the real model wiring."""
    from dilabhelmholtzoct_tpu.models import init_params
    from dilabhelmholtzoct_tpu.models.configs import sam_tiny
    from dilabhelmholtzoct_tpu.models.sam import (
        decode_masks, encode_prompts, image_wide_pe, set_fused_upscaler)

    cfg = sam_tiny(image_size=128)
    params = init_params(jax.random.PRNGKey(0), cfg)
    b, pb = 2, 3
    gsz = cfg.vision.image_size // cfg.vision.patch_size
    emb = jnp.asarray(rng.normal(
        size=(b, gsz, gsz, cfg.decoder.hidden_size)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(10, 100, size=(b, pb, 4)).astype(np.float32))
    sparse, dense = encode_prompts(params, cfg, b, boxes=boxes,
                                   dtype=emb.dtype)
    pe = image_wide_pe(params, cfg)

    try:
        set_fused_upscaler("off")
        want, iou_w = decode_masks(params, cfg, emb, pe, sparse, dense,
                                   multimask_output=False, blocked=True)
        set_fused_upscaler("interpret")
        got, iou_g = decode_masks(params, cfg, emb, pe, sparse, dense,
                                  multimask_output=False, blocked=True)
    finally:
        set_fused_upscaler("auto")
    np.testing.assert_allclose(np.asarray(iou_g), np.asarray(iou_w),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
