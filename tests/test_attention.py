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


@pytest.mark.parametrize("nh,tq,tk", [(2, 16, 16), (4, 32, 8), (6, 64, 64)])
def test_flash_packed_matches_reference(rng, nh, tq, tk):
    """Packed head-pair kernel (natural qkv layout) == reference math."""
    from dilabhelmholtzoct_tpu.ops.attention import flash_attention_packed

    d, h, w = 64, 8, 8
    n, c = h * w, nh * d
    qkv = rng.normal(size=(b := 2, n, 3 * c)).astype(np.float32)
    rel_h = (rng.normal(size=(b, nh, n, h)) * 0.3).astype(np.float32)
    rel_w = (rng.normal(size=(b, nh, n, w)) * 0.3).astype(np.float32)

    got = flash_attention_packed(
        jnp.asarray(qkv), jnp.asarray(rel_h), jnp.asarray(rel_w),
        hw=(h, w), num_heads=nh, tq=tq, tk=tk, interpret=True,
    )  # (B, N, C)

    # reference path wants (B*nh, N, d): unpack the natural feature order
    split = qkv.reshape(b, n, 3, nh, d)
    q = split[:, :, 0].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    k = split[:, :, 1].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    v = split[:, :, 2].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    rh = rel_h.reshape(b * nh, n, h)
    rw = rel_w.reshape(b * nh, n, w)
    want = attention_reference(*map(jnp.asarray, (q, k, v, rh, rw)), hw=(h, w))
    want = (
        np.asarray(want).reshape(b, nh, n, d).transpose(0, 2, 1, 3)
        .reshape(b, n, c)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("k_sub,tk", [(2, 16), (4, 32)])
def test_flash_packed_k_sub_matches_reference(rng, k_sub, tk):
    """k_sub>1 (per-sub-block sequential online softmax — the MXU/VPU
    pipelining path) == reference math. Guards the restructure that
    replaced the round-2 combined-max variant."""
    from dilabhelmholtzoct_tpu.ops.attention import flash_attention_packed

    nh, d, h, w = 2, 64, 8, 8
    n, c = h * w, nh * d
    qkv = rng.normal(size=(b := 2, n, 3 * c)).astype(np.float32)
    rel_h = (rng.normal(size=(b, nh, n, h)) * 0.3).astype(np.float32)
    rel_w = (rng.normal(size=(b, nh, n, w)) * 0.3).astype(np.float32)

    got = flash_attention_packed(
        jnp.asarray(qkv), jnp.asarray(rel_h), jnp.asarray(rel_w),
        hw=(h, w), num_heads=nh, tq=16, tk=tk, k_sub=k_sub, interpret=True,
    )
    split = qkv.reshape(b, n, 3, nh, d)
    q = split[:, :, 0].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    k = split[:, :, 1].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    v = split[:, :, 2].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    rh = rel_h.reshape(b * nh, n, h)
    rw = rel_w.reshape(b * nh, n, w)
    want = attention_reference(*map(jnp.asarray, (q, k, v, rh, rw)), hw=(h, w))
    want = (
        np.asarray(want).reshape(b, nh, n, d).transpose(0, 2, 1, 3)
        .reshape(b, n, c)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b", [50, 4, 3])
def test_flash_packed_windowed_group_matches_reference(rng, b):
    """Window-group path (whole 14x14=196-token windows per program,
    grouped 25/2/1 per b-divisibility) == reference math, including the
    non-multiple-of-8 row padding and the lse output used by the VJP."""
    from dilabhelmholtzoct_tpu.ops.attention import flash_attention_packed

    nh, d, h, w = 4, 64, 14, 14
    n, c = h * w, nh * d
    qkv = (rng.normal(size=(b, n, 3 * c)) * 0.5).astype(np.float32)
    rel_h = (rng.normal(size=(b, nh, n, h)) * 0.3).astype(np.float32)
    rel_w = (rng.normal(size=(b, nh, n, w)) * 0.3).astype(np.float32)

    got, lse = flash_attention_packed(
        jnp.asarray(qkv), jnp.asarray(rel_h), jnp.asarray(rel_w),
        hw=(h, w), num_heads=nh, interpret=True, return_lse=True,
    )

    split = qkv.reshape(b, n, 3, nh, d)
    q = split[:, :, 0].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    k = split[:, :, 1].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    v = split[:, :, 2].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
    rh = rel_h.reshape(b * nh, n, h)
    rw = rel_w.reshape(b * nh, n, w)
    want = attention_reference(*map(jnp.asarray, (q, k, v, rh, rw)), hw=(h, w))
    want = (
        np.asarray(want).reshape(b, nh, n, d).transpose(0, 2, 1, 3)
        .reshape(b, n, c)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    # lse parity vs explicit logsumexp of the reference scores
    logits = np.einsum(
        "bqd,bkd->bqk", np.asarray(q, np.float64) * d**-0.5,
        np.asarray(k, np.float64),
    ) + (rh[:, :, :, None] + rw[:, :, None, :]).reshape(b * nh, n, n)
    want_lse = np.log(np.exp(
        logits - logits.max(-1, keepdims=True)
    ).sum(-1)) + logits.max(-1)
    got_lse = (
        np.asarray(lse).transpose(0, 1, 3, 2)  # (b, pairs, 2, n)
        .reshape(b * nh, n)
    )
    np.testing.assert_allclose(got_lse, want_lse, atol=1e-4, rtol=1e-5)


def test_encoder_packed_path_matches_xla(rng):
    """encode_image routes through the packed kernel when head_dim==64."""
    import jax
    from dilabhelmholtzoct_tpu.models.configs import (
        SamConfig, VisionConfig, PromptConfig, DecoderConfig,
    )
    from dilabhelmholtzoct_tpu.models import sam as sam_mod

    cfg = SamConfig(
        vision=VisionConfig(
            hidden_size=128, num_layers=2, num_heads=2, image_size=128,
            patch_size=16, window_size=4, global_attn_indexes=(1,),
            mlp_dim=128, output_channels=32,
        ),
        prompt=PromptConfig(hidden_size=32, image_embedding_size=8,
                            input_image_size=128),
        decoder=DecoderConfig(hidden_size=32, num_layers=2, num_heads=4,
                              mlp_dim=64, iou_head_hidden_dim=32),
        num_pos_feats=16,
    )
    params = sam_mod.init_params(jax.random.PRNGKey(0), cfg)
    for lp in params["vision"]["layers"]:
        for key in ("rel_pos_h", "rel_pos_w"):
            lp["attn"][key] = jnp.asarray(
                rng.normal(size=lp["attn"][key].shape).astype(np.float32)
                * 0.2
            )
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


@pytest.mark.parametrize("nh,tq,tk", [(2, 16, 16), (4, 32, 8)])
def test_flash_packed_backward_matches_reference(rng, nh, tq, tk):
    """Custom-VJP gradients (dqkv, drel_h, drel_w) == autodiff through the
    materialized-bias reference math."""
    import jax
    from dilabhelmholtzoct_tpu.ops.attention import packed_attention_vjp

    d, h, w = 64, 8, 8
    n, c = h * w, nh * d
    qkv = rng.normal(size=(b := 2, n, 3 * c)).astype(np.float32)
    rel_h = (rng.normal(size=(b, nh, n, h)) * 0.3).astype(np.float32)
    rel_w = (rng.normal(size=(b, nh, n, w)) * 0.3).astype(np.float32)
    # a fixed random cotangent direction (sum(out * t) exercises all lanes)
    t = rng.normal(size=(b, n, c)).astype(np.float32)

    f = packed_attention_vjp(hw=(h, w), num_heads=nh, tq=tq, tk=tk,
                             interpret=True)

    def loss_flash(qkv, rel_h, rel_w):
        return jnp.sum(f(qkv, rel_h, rel_w) * t)

    def loss_ref(qkv, rel_h, rel_w):
        split = qkv.reshape(b, n, 3, nh, d)
        q = split[:, :, 0].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
        k = split[:, :, 1].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
        v = split[:, :, 2].transpose(0, 2, 1, 3).reshape(b * nh, n, d)
        rh = rel_h.reshape(b * nh, n, h)
        rw = rel_w.reshape(b * nh, n, w)
        out = attention_reference(q, k, v, rh, rw, hw=(h, w))
        out = (out.reshape(b, nh, n, d).transpose(0, 2, 1, 3)
               .reshape(b, n, c))
        return jnp.sum(out * t)

    args = tuple(map(jnp.asarray, (qkv, rel_h, rel_w)))
    got = jax.grad(loss_flash, argnums=(0, 1, 2))(*args)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for g_got, g_want, name in zip(got, want, ("dqkv", "drel_h", "drel_w")):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=5e-4, rtol=1e-3,
            err_msg=name,
        )


def test_encoder_grad_flash_matches_xla(rng):
    """Full encoder gradient wrt params: flash (interpret) == XLA path."""
    import jax
    from dilabhelmholtzoct_tpu.models.configs import (
        SamConfig, VisionConfig, PromptConfig, DecoderConfig,
    )
    from dilabhelmholtzoct_tpu.models import sam as sam_mod

    cfg = SamConfig(
        vision=VisionConfig(
            hidden_size=128, num_layers=2, num_heads=2, image_size=64,
            patch_size=16, window_size=2, global_attn_indexes=(1,),
            mlp_dim=128, output_channels=32,
        ),
        prompt=PromptConfig(hidden_size=32, image_embedding_size=4,
                            input_image_size=64),
        decoder=DecoderConfig(hidden_size=32, num_layers=2, num_heads=4,
                              mlp_dim=64, iou_head_hidden_dim=32),
        num_pos_feats=16,
    )
    params = sam_mod.init_params(jax.random.PRNGKey(0), cfg)
    for lp in params["vision"]["layers"]:
        for key in ("rel_pos_h", "rel_pos_w"):
            lp["attn"][key] = jnp.asarray(
                rng.normal(size=lp["attn"][key].shape).astype(np.float32)
                * 0.2
            )
    pix = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    def loss(params, mode):
        sam_mod.set_flash_attention(mode)
        try:
            emb = sam_mod.encode_image(params, pix, cfg)
        finally:
            sam_mod.set_flash_attention("auto")
        return jnp.sum(emb ** 2)

    g_ref = jax.grad(lambda p: loss(p, "off"))(params)
    g_flash = jax.grad(lambda p: loss(p, "interpret"))(params)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_flash, _ = jax.tree_util.tree_flatten(g_flash)
    for a, b_ in zip(flat_flash, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, rtol=2e-3
        )


@pytest.mark.parametrize("hw", [(28, 28), (20, 20), (28, 20)])
def test_fused_windowed_image_matches_partitioned(rng, hw):
    """vision_layer's fused image-layout windowed path (round 5:
    partition/unpartition done in-kernel, ops.attention.
    flash_attention_windowed_image) == the partitioned packed route,
    including tail windows where the partition zero-pads (phantom tokens
    must reproduce the qkv-bias key values the reference path produces).
    Reference window semantics: HF SAM window_partition /
    modeling_sam.py windowed attention (octsam trains via
    training_utils.py:55 forward)."""
    import jax
    from dilabhelmholtzoct_tpu.models import sam as sam_mod
    from dilabhelmholtzoct_tpu.models.configs import VisionConfig

    cfg = VisionConfig(hidden_size=128, num_heads=2, window_size=14,
                       mlp_dim=256)
    h, w = hw
    c = cfg.hidden_size
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))

    def lin(n_in, n_out):
        return {
            "w": jnp.asarray(
                (rng.normal(size=(n_in, n_out)) * 0.05).astype(np.float32)),
            "b": jnp.asarray(
                (rng.normal(size=(n_out,)) * 0.05).astype(np.float32)),
        }

    p = {
        "ln1": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "ln2": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "attn": {
            "qkv": lin(c, 3 * c),
            "proj": lin(c, c),
            "rel_pos_h": jnp.asarray(
                (rng.normal(size=(27, 64)) * 0.2).astype(np.float32)),
            "rel_pos_w": jnp.asarray(
                (rng.normal(size=(27, 64)) * 0.2).astype(np.float32)),
        },
        "mlp1": lin(c, cfg.mlp_dim),
        "mlp2": lin(cfg.mlp_dim, c),
    }

    sam_mod.set_flash_attention("interpret")
    try:
        want = sam_mod.vision_layer(x, p, cfg, cfg.window_size,
                                    fused_win=False)
        sam_mod.set_fused_windowed("interpret")
        got = sam_mod.vision_layer(x, p, cfg, cfg.window_size,
                                   fused_win=True)
    finally:
        sam_mod.set_flash_attention("auto")
        sam_mod.set_fused_windowed("auto")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
    )
