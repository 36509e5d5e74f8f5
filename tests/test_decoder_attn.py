"""Fused i2t attention+residual+LN kernel vs the XLA chain.

The oracle replicates models/sam.py's image-side update exactly
(_decoder_attention + residual + layer_norm), which is itself
parity-tested against HF SAM (tests/test_sam_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilabhelmholtzoct_tpu.models.sam import layer_norm
from dilabhelmholtzoct_tpu.ops.decoder_attn import fused_i2t_ln


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def make_params(rng, c, internal):
    def arr(*shape, s=0.2):
        return jnp.asarray((rng.normal(size=shape) * s).astype(np.float32))
    return (
        {"w": arr(c, internal), "b": arr(internal)},
        {"w": arr(internal, c), "b": arr(c)},
        {"scale": 1.0 + arr(c, s=0.1), "bias": arr(c)},
    )


def oracle(keys, pe, tok_k, tok_v, q_p, out_p, ln_p, nh, pb, eps=1e-6):
    """models/sam.py image-side chain, verbatim op order. keys is
    per-image (B, M, C); tok_* per-pair (B*pb, T, internal)."""
    b, m, c = keys.shape
    bp = b * pb
    t = tok_k.shape[1]
    internal = tok_k.shape[2]
    hd = internal // nh
    qin = (keys + pe)
    q = (jnp.dot(qin, q_p["w"], preferred_element_type=jnp.float32)
         + q_p["b"].astype(jnp.float32)).astype(keys.dtype)
    if pb > 1:
        q = jnp.repeat(q, pb, axis=0)
    qh = q.reshape(bp, m, nh, hd).transpose(0, 2, 1, 3)
    kh = tok_k.reshape(bp, t, nh, hd).transpose(0, 2, 1, 3)
    vh = tok_v.reshape(bp, t, nh, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bnqd,bnkd->bnqk", qh * (hd**-0.5), kh,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        vh.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(bp, m, internal)
    proj = (jnp.dot(out, out_p["w"], preferred_element_type=jnp.float32)
            + out_p["b"].astype(jnp.float32)).astype(keys.dtype)
    if pb > 1:
        res = jnp.repeat(keys, pb, axis=0) + proj
    else:
        res = keys + proj
    return layer_norm(res, ln_p, eps)


@pytest.mark.parametrize("pb,n_tok,dtype", [
    (1, 7, jnp.float32),
    (3, 7, jnp.float32),
    (1, 5, jnp.float32),
    (1, 7, jnp.bfloat16),
])
def test_fused_i2t_matches_oracle(rng, pb, n_tok, dtype):
    b, m, c, internal, nh = 2, 64, 256, 128, 8
    bp = b * pb
    keys = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32)
                       ).astype(dtype)
    pe = jnp.asarray(rng.normal(size=(1, m, c)).astype(np.float32)
                     ).astype(dtype)
    tok_k = jnp.asarray(
        rng.normal(size=(bp, n_tok, internal)).astype(np.float32)
    ).astype(dtype)
    tok_v = jnp.asarray(
        rng.normal(size=(bp, n_tok, internal)).astype(np.float32)
    ).astype(dtype)
    q_p, out_p, ln_p = make_params(rng, c, internal)
    if dtype == jnp.bfloat16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dtype), t)
        q_p, out_p, ln_p = cast(q_p), cast(out_p), cast(ln_p)

    got = fused_i2t_ln(keys, pe, tok_k, tok_v, q_p, out_p, ln_p,
                       nh=nh, pb=pb, interpret=True)
    want = oracle(keys, pe, tok_k, tok_v, q_p, out_p, ln_p, nh, pb)
    assert got.shape == want.shape
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


@pytest.mark.parametrize("pb", [1, 3])
def test_fused_i2t_gradients_match(rng, pb):
    b, m, c, internal, nh, n_tok = 2, 64, 256, 128, 8, 7
    bp = b * pb
    keys = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(1, m, c)).astype(np.float32))
    tok_k = jnp.asarray(
        rng.normal(size=(bp, n_tok, internal)).astype(np.float32))
    tok_v = jnp.asarray(
        rng.normal(size=(bp, n_tok, internal)).astype(np.float32))
    q_p, out_p, ln_p = make_params(rng, c, internal)
    ct = jnp.asarray(rng.normal(size=(bp, m, c)).astype(np.float32))

    def loss_f(fn):
        def loss(keys, pe, tok_k, tok_v, q_p, out_p, ln_p):
            return jnp.sum(fn(keys, pe, tok_k, tok_v, q_p, out_p,
                              ln_p) * ct)
        return loss

    fused = lambda *a: fused_i2t_ln(*a, nh=nh, pb=pb, interpret=True)
    ref = lambda *a: oracle(*a, nh, pb)
    args = (keys, pe, tok_k, tok_v, q_p, out_p, ln_p)
    g_ref = jax.grad(loss_f(ref), argnums=tuple(range(7)))(*args)
    g_fus = jax.grad(loss_f(fused), argnums=tuple(range(7)))(*args)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fus)
    assert len(flat_r) == len(flat_f)
    for a, bb in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=2e-3, rtol=2e-3)


def test_fused_inside_decode_masks(rng):
    """End-to-end: decode_masks with the fused i2t chain == the XLA path,
    through the real model wiring (exercises BOTH the shared layer-1 form
    and the per-pair layer-2/uniform form)."""
    from dilabhelmholtzoct_tpu.models import init_params
    from dilabhelmholtzoct_tpu.models.configs import sam_tiny
    from dilabhelmholtzoct_tpu.models.sam import (
        decode_masks, encode_prompts, image_wide_pe, set_fused_i2t)

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
        set_fused_i2t("off")
        want, iou_w = decode_masks(params, cfg, emb, pe, sparse, dense,
                                   multimask_output=False, blocked=True)
        set_fused_i2t("interpret")
        got, iou_g = decode_masks(params, cfg, emb, pe, sparse, dense,
                                  multimask_output=False, blocked=True)
    finally:
        set_fused_i2t("auto")
    np.testing.assert_allclose(np.asarray(iou_g), np.asarray(iou_w),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)
