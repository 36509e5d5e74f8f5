"""ViT-L / ViT-H channel-geometry parity vs HuggingFace SamModel (slow, CPU).

The reference's ``--base_model`` flag accepts any HF SAM checkpoint
(octsam/models/training.py:27-28, loaded at training_utils.py:273-280), and
our presets cover facebook/sam-vit-{base,large,huge}
(models/configs.py). Full-scale parity is proven for ViT-B
(test_sam_full_scale.py); these tests pin the OTHER two variants' channel
geometry, which differs in exactly the ways that could silently break:

- ViT-L: 24 layers, hidden 1024, 16 heads, mlp 4096, global layers
  (5, 11, 17, 23).
- ViT-H: 32 layers, hidden 1280, 16 heads -> **head_dim 80, not 64** —
  this must NOT take the packed head-pair flash kernel (it asserts d==64;
  models/sam.py:238-239 gates on head_dim) and exercises the generic
  attention path with non-MXU-native head width.

Spatial size is reduced to 256 (16x16 token grid, window 14 -> padded to
28, so the window-partition path still runs) to keep the deep stacks
tractable on one CPU core; spatial-scale effects (64x64 grid, 127-row
rel-pos tables) are covered by the ViT-B full-scale suite.

Run explicitly with:  pytest -m slow tests/test_sam_variants.py
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dilabhelmholtzoct_tpu.models.configs import (
    PromptConfig,
    SamConfig,
    VisionConfig,
)
from dilabhelmholtzoct_tpu.models.convert import from_hf_model
from dilabhelmholtzoct_tpu.models.sam import sam_forward

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

IMAGE_SIZE = 256

# (hidden, layers, heads, mlp_dim, global_attn) per variant — the values of
# facebook/sam-vit-large / facebook/sam-vit-huge (models/configs.py presets).
VARIANTS = {
    "vit_l": (1024, 24, 16, 4096, (5, 11, 17, 23)),
    "vit_h": (1280, 32, 16, 5120, (7, 15, 23, 31)),
}


def _pair(name):
    hidden, layers, heads, mlp, global_attn = VARIANTS[name]

    from transformers import SamConfig as HFSamConfig
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    hf_cfg = HFSamConfig(
        vision_config=SamVisionConfig(
            hidden_size=hidden,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            image_size=IMAGE_SIZE,
            patch_size=16,
            window_size=14,
            global_attn_indexes=list(global_attn),
            mlp_dim=mlp,
        ).to_dict(),
        prompt_encoder_config=SamPromptEncoderConfig(
            image_size=IMAGE_SIZE, patch_size=16
        ).to_dict(),
        mask_decoder_config=SamMaskDecoderConfig().to_dict(),
    )
    torch.manual_seed(7)
    model = transformers.SamModel(hf_cfg)
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
        pe = torch.randn(2, 128) * 0.7
        model.shared_image_embedding.positional_embedding.copy_(pe)
        model.prompt_encoder.shared_embedding.positional_embedding.copy_(pe)

    cfg = SamConfig(
        vision=VisionConfig(
            hidden_size=hidden,
            num_layers=layers,
            num_heads=heads,
            image_size=IMAGE_SIZE,
            mlp_dim=mlp,
            global_attn_indexes=tuple(global_attn),
        ),
        prompt=PromptConfig(
            image_embedding_size=IMAGE_SIZE // 16,
            input_image_size=IMAGE_SIZE,
        ),
    )
    params = from_hf_model(model, cfg)
    return model, cfg, params


@pytest.mark.parametrize("name", ["vit_l", "vit_h"])
def test_variant_box_prompt_parity(name):
    model, cfg, params = _pair(name)
    if name == "vit_h":
        assert cfg.vision.head_dim == 80  # the non-64 head width under test

    rng = np.random.default_rng(11)
    pix = rng.normal(size=(1, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    boxes = np.asarray(
        [[[30.0, 20.0, 200.0, 120.0], [5.0, 150.0, 90.0, 250.0]]], np.float32
    )
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
    hf_masks = hf_out.pred_masks.detach().numpy()
    our_masks = np.asarray(our_out["pred_masks"], dtype=np.float32)
    np.testing.assert_allclose(our_masks, hf_masks, atol=3e-4, rtol=1e-3)
    hf_iou = hf_out.iou_scores.detach().numpy()
    our_iou = np.asarray(our_out["iou_scores"], dtype=np.float32)
    np.testing.assert_allclose(our_iou, hf_iou, atol=3e-4, rtol=1e-3)
