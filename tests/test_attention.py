"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dilabhelmholtzoct_tpu.ops.attention import (
    attention_reference,
    flash_attention_relpos,
)


@pytest.mark.parametrize("hw,tq,tk", [((8, 8), 16, 16), ((8, 16), 32, 32)])
def test_flash_matches_reference(rng, hw, tq, tk):
    h, w = hw
    n = h * w
    bh, d = 3, 32
    q = rng.normal(size=(bh, n, d)).astype(np.float32)
    k = rng.normal(size=(bh, n, d)).astype(np.float32)
    v = rng.normal(size=(bh, n, d)).astype(np.float32)
    rel_h = (rng.normal(size=(bh, n, h)) * 0.3).astype(np.float32)
    rel_w = (rng.normal(size=(bh, n, w)) * 0.3).astype(np.float32)

    want = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rel_h), jnp.asarray(rel_w), hw=hw,
    )
    got = flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rel_h), jnp.asarray(rel_w), hw=hw, tq=tq, tk=tk,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_flash_multiblock_streaming(rng):
    """tk < n exercises the online-softmax accumulation across k blocks."""
    hw = (8, 8)
    n = 64
    q = rng.normal(size=(2, n, 16)).astype(np.float32)
    k = rng.normal(size=(2, n, 16)).astype(np.float32)
    v = rng.normal(size=(2, n, 16)).astype(np.float32)
    rel_h = (rng.normal(size=(2, n, 8)) * 0.2).astype(np.float32)
    rel_w = (rng.normal(size=(2, n, 8)) * 0.2).astype(np.float32)
    want = attention_reference(*map(jnp.asarray, (q, k, v, rel_h, rel_w)),
                               hw=hw)
    got = flash_attention_relpos(
        *map(jnp.asarray, (q, k, v, rel_h, rel_w)),
        hw=hw, tq=16, tk=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_encoder_flash_path_matches_xla(rng):
    """encode_image with the flash kernel (interpret) == XLA path."""
    import jax
    from dilabhelmholtzoct_tpu.models.configs import sam_tiny
    from dilabhelmholtzoct_tpu.models import sam as sam_mod

    cfg = sam_tiny(image_size=128)
    params = sam_mod.init_params(jax.random.PRNGKey(0), cfg)
    # make rel-pos nonzero so the bias actually matters
    for lp in params["vision"]["layers"]:
        lp["attn"]["rel_pos_h"] = jnp.asarray(
            rng.normal(size=lp["attn"]["rel_pos_h"].shape).astype(np.float32) * 0.2)
        lp["attn"]["rel_pos_w"] = jnp.asarray(
            rng.normal(size=lp["attn"]["rel_pos_w"].shape).astype(np.float32) * 0.2)
    pix = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32))
    sam_mod.set_flash_attention("off")
    want = sam_mod.encode_image(params, pix, cfg)
    try:
        sam_mod.set_flash_attention("interpret")
        got = sam_mod.encode_image(params, pix, cfg)
    finally:
        sam_mod.set_flash_attention("auto")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
    )


def test_flash_qkv_layout_matches_reference(rng):
    """Transpose-free qkv-layout kernel == reference math."""
    from dilabhelmholtzoct_tpu.ops.attention import flash_attention_qkv

    b, nh, d, h, w = 2, 3, 32, 8, 8
    n = h * w
    qkv = rng.normal(size=(b, n, 3, nh, d)).astype(np.float32)
    rel_h = (rng.normal(size=(b, n, nh, h)) * 0.3).astype(np.float32)
    rel_w = (rng.normal(size=(b, n, nh, w)) * 0.3).astype(np.float32)

    got = flash_attention_qkv(
        jnp.asarray(qkv), jnp.asarray(rel_h), jnp.asarray(rel_w),
        hw=(h, w), tq=16, tk=16, interpret=True,
    )  # (B, N, nh, d)

    # reference path wants (B*nh, N, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    rh = rel_h.transpose(0, 2, 1, 3).reshape(b * nh, n, h)
    rw = rel_w.transpose(0, 2, 1, 3).reshape(b * nh, n, w)
    want = attention_reference(*map(jnp.asarray, (q, k, v, rh, rw)), hw=(h, w))
    want = np.asarray(want).reshape(b, nh, n, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
