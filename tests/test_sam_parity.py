"""Numerical parity: our JAX SAM vs HuggingFace torch SamModel.

The reference's entire model stack is ``transformers.SamModel``
(octsam/models/training_utils.py:55,273-280). We verify our TPU-native
re-implementation reproduces its f32 numerics on randomized weights (no
network access needed) for both prompt types the reference uses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dilabhelmholtzoct_tpu.models import sam_tiny
from dilabhelmholtzoct_tpu.models.configs import (
    DecoderConfig,
    PromptConfig,
    SamConfig,
    VisionConfig,
)
from dilabhelmholtzoct_tpu.models.convert import from_hf_model
from dilabhelmholtzoct_tpu.models.sam import sam_forward

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_tiny(window_size=4, global_attn=(1,)):
    from transformers import SamConfig as HFSamConfig
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    vision = SamVisionConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=128,
        patch_size=16,
        window_size=window_size,
        global_attn_indexes=list(global_attn),
        mlp_dim=128,
        output_channels=32,
        num_pos_feats=16,
    )
    prompt = SamPromptEncoderConfig(
        hidden_size=32, image_size=128, patch_size=16
    )
    decoder = SamMaskDecoderConfig(
        hidden_size=32,
        mlp_dim=64,
        num_attention_heads=4,
        iou_head_hidden_dim=32,
    )
    return HFSamConfig(
        vision_config=vision.to_dict(),
        prompt_encoder_config=prompt.to_dict(),
        mask_decoder_config=decoder.to_dict(),
    )


def _our_tiny(window_size=4, global_attn=(1,)):
    base = sam_tiny(image_size=128)
    return SamConfig(
        vision=VisionConfig(
            hidden_size=64,
            num_layers=3,
            num_heads=4,
            image_size=128,
            patch_size=16,
            window_size=window_size,
            global_attn_indexes=tuple(global_attn),
            mlp_dim=128,
            output_channels=32,
        ),
        prompt=base.prompt,
        decoder=base.decoder,
        num_pos_feats=16,
    )


def _randomized_hf_model(seed=0, window_size=4, global_attn=(1,)):
    torch.manual_seed(seed)
    model = transformers.SamModel(_hf_tiny(window_size, global_attn))
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        pe = torch.randn(2, 16) * 0.7
        model.shared_image_embedding.positional_embedding.copy_(pe)
        model.prompt_encoder.shared_embedding.positional_embedding.copy_(pe)
    return model


def _compare(hf_out, our_out, atol=3e-4):
    hf_masks = hf_out.pred_masks.detach().numpy()
    our_masks = np.asarray(our_out["pred_masks"], dtype=np.float32)
    np.testing.assert_allclose(our_masks, hf_masks, atol=atol, rtol=1e-3)
    hf_iou = hf_out.iou_scores.detach().numpy()
    our_iou = np.asarray(our_out["iou_scores"], dtype=np.float32)
    np.testing.assert_allclose(our_iou, hf_iou, atol=atol, rtol=1e-3)


@pytest.mark.parametrize("window_size,global_attn", [(4, (1,)), (3, (0, 2))])
def test_box_prompt_parity(window_size, global_attn):
    """Box-prompt path — the reference default (training.py:90 'bboxes')."""
    model = _randomized_hf_model(0, window_size, global_attn)
    cfg = _our_tiny(window_size, global_attn)
    params = from_hf_model(model, cfg)

    rng = np.random.default_rng(1)
    pix = rng.normal(size=(2, 3, 128, 128)).astype(np.float32)
    boxes = np.stack(
        [
            np.sort(rng.uniform(0, 128, size=(3, 2, 2)), axis=1).reshape(3, 4)
            for _ in range(2)
        ]
    ).astype(np.float32)

    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.tensor(pix),
            input_boxes=torch.tensor(boxes),
            multimask_output=False,
        )
    our_out = sam_forward(
        params,
        cfg,
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        boxes=jnp.asarray(boxes),
        multimask_output=False,
    )
    _compare(hf_out, our_out)


def test_point_prompt_parity():
    """Point-prompt path with padding labels (-10) and pad point (-1)."""
    model = _randomized_hf_model(3)
    cfg = _our_tiny()
    params = from_hf_model(model, cfg)

    rng = np.random.default_rng(2)
    pix = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)
    points = rng.uniform(0, 128, size=(1, 2, 3, 2)).astype(np.float32)
    labels = np.array([[[1, 1, -10], [1, 0, 1]]], dtype=np.int64)

    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.tensor(pix),
            input_points=torch.tensor(points),
            input_labels=torch.tensor(labels),
            multimask_output=False,
        )
    our_out = sam_forward(
        params,
        cfg,
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        points=jnp.asarray(points),
        labels=jnp.asarray(labels.astype(np.int32)),
        multimask_output=False,
    )
    _compare(hf_out, our_out)


def test_multimask_output_parity():
    model = _randomized_hf_model(5)
    cfg = _our_tiny()
    params = from_hf_model(model, cfg)

    rng = np.random.default_rng(4)
    pix = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)
    boxes = np.array([[[10.0, 20.0, 100.0, 110.0]]], dtype=np.float32)

    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.tensor(pix),
            input_boxes=torch.tensor(boxes),
            multimask_output=True,
        )
    our_out = sam_forward(
        params,
        cfg,
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        boxes=jnp.asarray(boxes),
        multimask_output=True,
    )
    _compare(hf_out, our_out)


def test_mask_input_parity():
    """Dense mask-prompt path (SamMaskEmbedding)."""
    model = _randomized_hf_model(7)
    cfg = _our_tiny()
    params = from_hf_model(model, cfg)

    rng = np.random.default_rng(5)
    pix = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)
    boxes = np.array([[[10.0, 20.0, 100.0, 110.0]]], dtype=np.float32)
    # HF SamMaskEmbedding downsamples 4x to the embedding grid (8x8 here)
    mask_in = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)

    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.tensor(pix),
            input_boxes=torch.tensor(boxes),
            input_masks=torch.tensor(mask_in),
            multimask_output=False,
        )
    our_out = sam_forward(
        params,
        cfg,
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        boxes=jnp.asarray(boxes),
        mask_inputs=jnp.asarray(mask_in.transpose(0, 2, 3, 1)),
        multimask_output=False,
    )
    _compare(hf_out, our_out)


def test_jit_compiles_and_matches_eager():
    cfg = _our_tiny()
    from dilabhelmholtzoct_tpu.models.sam import init_params

    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    pix = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32))
    boxes = jnp.asarray(np.array([[[4.0, 4.0, 60.0, 90.0]]], np.float32))

    def fwd(p, x, b):
        return sam_forward(p, cfg, pixel_values=x, boxes=b)["pred_masks"]

    eager = fwd(params, pix, boxes)
    jitted = jax.jit(fwd)(params, pix, boxes)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), atol=1e-5
    )


def test_blocked_decode_matches_natural():
    """decode_masks(blocked=True) is a pure relayout of the natural-order
    masks, and postprocess_masks_blocked == postprocess_masks on it."""
    from dilabhelmholtzoct_tpu.models.sam import (
        decode_masks, encode_prompts, image_wide_pe, init_params,
    )
    from dilabhelmholtzoct_tpu.ops.postprocess import (
        postprocess_masks, postprocess_masks_blocked,
    )

    cfg = _our_tiny()
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(11)
    g = cfg.prompt.image_embedding_size
    c = cfg.prompt.hidden_size
    b, p = 2, 3
    emb = jnp.asarray(rng.normal(size=(b, g, g, c)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(4, 100, size=(b, p, 4)).astype(np.float32)
    )
    sparse, dense = encode_prompts(params, cfg, b, boxes=boxes)
    pe = image_wide_pe(params, cfg)

    nat, iou_n = decode_masks(params, cfg, emb, pe, sparse, dense)
    blk, iou_b = decode_masks(params, cfg, emb, pe, sparse, dense,
                              blocked=True)
    # regroup (h, w, d, e, f, g) -> (4h+2d+f, 4w+2e+g)
    m = blk.shape[2]
    re = jnp.transpose(blk, (0, 1, 2, 3, 5, 7, 4, 6, 8))
    re = re.reshape(b, p, m, 4 * g, 4 * g)
    np.testing.assert_allclose(np.asarray(nat), np.asarray(re), atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou_n), np.asarray(iou_b))

    hw = (61, 101)
    post_n = postprocess_masks(nat[:, :, 0], hw, model_size=cfg.vision.image_size)
    post_b = postprocess_masks_blocked(
        blk[:, :, 0], hw, model_size=cfg.vision.image_size
    )
    np.testing.assert_allclose(
        np.asarray(post_n), np.asarray(post_b), atol=1e-4, rtol=1e-4
    )


def test_pt_export_roundtrip(tmp_path):
    """params → reference .pt → load_pretrained == identity (the
    checkpoint interchange guarantee, training_utils.py:77 format)."""
    import jax

    from dilabhelmholtzoct_tpu.models.convert import load_pretrained
    from dilabhelmholtzoct_tpu.models.sam import init_params
    from dilabhelmholtzoct_tpu.utils.checkpoint import export_reference_pt

    cfg = _our_tiny()
    params = init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "export.pt")
    export_reference_pt(params, cfg, path)
    restored = load_pretrained(path, cfg)

    flat_a, _ = jax.tree_util.tree_flatten(params)
    flat_b, _ = jax.tree_util.tree_flatten(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_pt_export_loads_into_hf():
    """Our exported .pt is accepted by HF SamModel.load_state_dict."""
    import jax

    from dilabhelmholtzoct_tpu.models.convert import to_hf_state_dict
    from dilabhelmholtzoct_tpu.models.sam import init_params

    cfg = _our_tiny()
    params = init_params(jax.random.PRNGKey(4), cfg)
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in to_hf_state_dict(params, cfg).items()}
    model = transformers.SamModel(_hf_tiny())
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # only buffers/tied weights may be missing
    assert all("positional_embedding" in m for m in missing), missing


def test_pickled_module_checkpoint_load(tmp_path):
    """Whole-pickled-model .pth (reference app_organoid.py:12-13,
    ``torch.load(path + '.pth')`` of a full module) loads via
    allow_pickled_module=True and is refused by default."""
    from dilabhelmholtzoct_tpu.models.convert import (
        from_hf_state_dict,
        load_state_dict,
    )

    model = _randomized_hf_model(0)
    path = str(tmp_path / "organoid.pth")
    torch.save(model, path)

    with pytest.raises(Exception):
        load_state_dict(path)  # weights_only refuses arbitrary pickles

    sd = load_state_dict(path, allow_pickled_module=True)
    cfg = _our_tiny()
    got = from_hf_state_dict(sd, cfg)
    want = from_hf_model(model, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
