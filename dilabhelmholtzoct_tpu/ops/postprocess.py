"""Mask postprocessing: the reference's 3-step upsample → crop → resize.

Replicates octsam/models/training_utils.py:57-59 (and app.py:25-27):

    masks = F.interpolate(pred_masks.squeeze(2), (1024, 1024), "bilinear")
    masks = masks[..., :reshaped_h, :reshaped_w]
    masks = F.interpolate(masks, (orig_h, orig_w), "bilinear")

``jax.image.resize(method='bilinear')`` uses half-pixel centers, identical to
torch ``align_corners=False``. All sizes are static, so this fuses into the
jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .preprocess import preprocess_shape


def postprocess_masks(
    low_res_masks,
    orig_hw: tuple[int, int],
    *,
    model_size: int = 1024,
):
    """(B, C, Gl, Gl) low-res logits → (B, C, orig_h, orig_w) logits."""
    b, c = low_res_masks.shape[:2]
    x = low_res_masks.astype(jnp.float32)
    # antialias=False throughout: torch F.interpolate(bilinear) never
    # antialiases, and the final step is a downscale where jax.image.resize
    # would otherwise widen the kernel and diverge from the reference.
    x = jax.image.resize(
        x, (b, c, model_size, model_size), method="bilinear", antialias=False
    )
    new_h, new_w = preprocess_shape(orig_hw[0], orig_hw[1], model_size)
    x = x[..., :new_h, :new_w]
    return jax.image.resize(x, (b, c, *orig_hw), method="bilinear", antialias=False)
