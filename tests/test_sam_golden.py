"""Fast SAM parity against recorded HF golden outputs (SURVEY.md §4:
"numerical parity fixtures: small fixed inputs through HF SAM (recorded
offline) vs our JAX SAM").

tests/fixtures/sam_golden.npz carries a randomized tiny HF SamModel
state_dict plus its outputs on fixed box/point inputs — so this parity
check runs in seconds without importing torch/transformers (the live
cross-check remains in test_sam_parity.py).
"""

import os

import numpy as np

import jax.numpy as jnp

from dilabhelmholtzoct_tpu.models.configs import (
    SamConfig,
    VisionConfig,
    sam_tiny,
)
from dilabhelmholtzoct_tpu.models.convert import from_hf_state_dict
from dilabhelmholtzoct_tpu.models.sam import sam_forward

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sam_golden.npz")


def _cfg():
    base = sam_tiny(image_size=128)
    return SamConfig(
        vision=VisionConfig(
            hidden_size=64, num_layers=3, num_heads=4, image_size=128,
            patch_size=16, window_size=4, global_attn_indexes=(1,),
            mlp_dim=128, output_channels=32,
        ),
        prompt=base.prompt,
        decoder=base.decoder,
        num_pos_feats=16,
    )


def _load():
    z = np.load(FIXTURE)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    return z, from_hf_state_dict(sd, _cfg())


def test_golden_box_prompt():
    z, params = _load()
    out = sam_forward(
        params, _cfg(),
        pixel_values=jnp.asarray(z["pix"].transpose(0, 2, 3, 1)),
        boxes=jnp.asarray(z["boxes"]),
        multimask_output=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), z["box_masks"], atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["iou_scores"]), z["box_iou"], atol=3e-4, rtol=1e-3
    )


def test_golden_point_prompt():
    z, params = _load()
    out = sam_forward(
        params, _cfg(),
        pixel_values=jnp.asarray(z["pix"][:1].transpose(0, 2, 3, 1)),
        points=jnp.asarray(z["pts"]),
        labels=jnp.asarray(z["lbl"]),
        multimask_output=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), z["pts_masks"], atol=3e-4, rtol=1e-3
    )
