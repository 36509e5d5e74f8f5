"""Full-scale ViT-B numerical parity vs HuggingFace SamModel (slow, CPU).

Round-1 parity tests used tiny randomized configs only; the real ViT-B
geometry — 64x64 token grid, window 14 with 64->70 padding
(models/sam.py window_partition), rel-pos tables at full size (127/27
rows), the resize_rel_pos non-identity path — was never cross-checked. A
wrong window-padding or rel-pos gather at full scale would pass every tiny
test and silently destroy real-checkpoint accuracy (round-1 VERDICT
missing #2). Reference load path: octsam/models/training_utils.py:273-280.

Run explicitly with:  pytest -m slow tests/test_sam_full_scale.py
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dilabhelmholtzoct_tpu.models import sam_vit_base
from dilabhelmholtzoct_tpu.models.convert import from_hf_model
from dilabhelmholtzoct_tpu.models.sam import sam_forward

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def full_scale_pair():
    """Randomized full-geometry ViT-B HF model + converted pytree."""
    torch.manual_seed(0)
    hf_cfg = transformers.SamConfig()  # stock = facebook/sam-vit-base shapes
    model = transformers.SamModel(hf_cfg)
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
        pe = torch.randn(2, 128) * 0.7
        model.shared_image_embedding.positional_embedding.copy_(pe)
        model.prompt_encoder.shared_embedding.positional_embedding.copy_(pe)
    cfg = sam_vit_base()
    params = from_hf_model(model, cfg)
    return model, cfg, params


def _pixels(seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(1, 3, 1024, 1024)).astype(np.float32)


def _compare(hf_out, our_out, atol):
    hf_masks = hf_out.pred_masks.detach().numpy()
    our_masks = np.asarray(our_out["pred_masks"], dtype=np.float32)
    np.testing.assert_allclose(our_masks, hf_masks, atol=atol, rtol=1e-3)
    hf_iou = hf_out.iou_scores.detach().numpy()
    our_iou = np.asarray(our_out["iou_scores"], dtype=np.float32)
    np.testing.assert_allclose(our_iou, hf_iou, atol=atol, rtol=1e-3)


def test_vitb_full_scale_box_prompt(full_scale_pair):
    """1024² input through the full ViT-B stack (window 14 with 64->70
    padding, 127-row rel-pos tables, 4 global layers) + box prompts."""
    model, cfg, params = full_scale_pair
    pix = _pixels(1)
    boxes = np.asarray([[[100.0, 50.0, 800.0, 400.0],
                         [10.0, 700.0, 400.0, 1000.0]]], np.float32)
    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.tensor(pix),
            input_boxes=torch.tensor(boxes),
            multimask_output=False,
        )
    our_out = sam_forward(
        params, cfg,
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        boxes=jnp.asarray(boxes),
        multimask_output=False,
    )
    _compare(hf_out, our_out, atol=1e-4)


def test_vitb_full_scale_point_prompt(full_scale_pair):
    """Same geometry with point prompts incl. a padded (-1, -10) slot."""
    model, cfg, params = full_scale_pair
    pix = _pixels(2)
    points = np.asarray(
        [[[[512.0, 300.0]], [[-1.0, -1.0]]]], np.float32
    )  # (1, 2 prompts, 1 point, 2)
    labels = np.asarray([[[1], [-10]]], np.int32)
    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.tensor(pix),
            input_points=torch.tensor(points),
            input_labels=torch.tensor(labels),
            multimask_output=False,
        )
    our_out = sam_forward(
        params, cfg,
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        points=jnp.asarray(points),
        labels=jnp.asarray(labels),
        multimask_output=False,
    )
    _compare(hf_out, our_out, atol=1e-4)


def test_resize_rel_pos_nonidentity_matches_hf():
    """resize_rel_pos at a non-stock geometry (table must actually resample)
    vs HF's get_rel_pos (torch F.interpolate linear, no antialias)."""
    from transformers.models.sam.modeling_sam import SamVisionAttention

    from dilabhelmholtzoct_tpu.models.sam import rel_pos_table

    rng = np.random.default_rng(3)
    # stock ViT-B window table has 27 rows (2*14-1); ask for q=k=20 so
    # max_rel_dist=39 forces interpolation
    table = rng.normal(size=(27, 64)).astype(np.float32)

    class _Shim(SamVisionAttention):  # reuse HF's private helper unbound
        def __init__(self):
            pass

    hf = _Shim().get_rel_pos(20, 20, torch.tensor(table)).numpy()
    ours = np.asarray(rel_pos_table(jnp.asarray(table), 20, 20))
    np.testing.assert_allclose(ours, hf, atol=1e-5, rtol=1e-5)
