"""Mask postprocessing: the reference's 3-step upsample → crop → resize.

Replicates octsam/models/training_utils.py:57-59 (and app.py:25-27):

    masks = F.interpolate(pred_masks.squeeze(2), (1024, 1024), "bilinear")
    masks = masks[..., :reshaped_h, :reshaped_w]
    masks = F.interpolate(masks, (orig_h, orig_w), "bilinear")

``jax.image.resize(method='bilinear')`` uses half-pixel centers, identical to
torch ``align_corners=False``. All sizes are static, so this fuses into the
jitted step.

Implementation: bilinear resize is a separable LINEAR map, so the whole
3-step chain collapses into two precomputed operator matmuls

    out[b, c] = R_h · x[b, c] · R_wᵀ,   R_h = A2_h · A1_h[:crop_h],

where A1 (model_size, Gl) is the step-1 upsample operator and A2 the step-3
resize operator (crop = keeping the first crop_h rows of step 1's output).
The 1-D operators are built by resizing identity matrices through
``jax.image.resize`` itself, so their weights are exactly the ones the
direct implementation would use; composing them is exact linear algebra
(f32 summation order differs ~1e-6 on logit-scale values). The einsums pin
``precision=HIGHEST``: TPU matmuls default to ONE bf16xbf16 pass even for
f32 operands, which was measured at ~1.1e-2 logit error vs the direct form
on-chip (boundary pixels flip at the 0.5 threshold); HIGHEST (6-pass f32)
restores ~2e-7 at ~1 ms cost per step — tests/conftest.py forces the CPU
backend, so only an on-TPU check can see this.

Why: the direct form materializes (B, C, 1024, 1024) f32 intermediates
(~268 MB at B=8, P=8) twice per step plus their backward copies — ~8 ms of
a 45 ms cached train step on v5e (xplane). The operator form is two small
MXU matmuls (~12 GFLOP) with no giant intermediates, and its backward is
just the transposed matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import preprocess_shape

_OPERATOR_CACHE: dict = {}


def _bilinear_operator(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) matrix M with resize(v) == M @ v, built by resizing an
    identity through jax.image.resize (half-pixel centers, no antialias) so
    the weights match the direct implementation bit-for-bit."""
    # ensure_compile_time_eval: this may run during a jit trace (first call
    # inside a traced step); the operator must be a concrete constant.
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(n_in, dtype=jnp.float32)
        op = jax.image.resize(
            eye, (n_out, n_in), method="bilinear", antialias=False
        )
    return np.asarray(op)


def resize_operators(
    gl: int, orig_hw: tuple[int, int], model_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Composed row/column operators (R_h (H, Gl), R_w (W, Gl)) for the
    upsample→crop→resize chain. Cached per static geometry."""
    key = (gl, tuple(orig_hw), model_size)
    if key not in _OPERATOR_CACHE:
        new_h, new_w = preprocess_shape(orig_hw[0], orig_hw[1], model_size)
        a1 = _bilinear_operator(model_size, gl)
        r_h = _bilinear_operator(orig_hw[0], new_h) @ a1[:new_h]
        r_w = _bilinear_operator(orig_hw[1], new_w) @ a1[:new_w]
        _OPERATOR_CACHE[key] = (r_h, r_w)
    return _OPERATOR_CACHE[key]


def postprocess_masks(
    low_res_masks,
    orig_hw: tuple[int, int],
    *,
    model_size: int = 1024,
):
    """(B, C, Gl, Gl) low-res logits → (B, C, orig_h, orig_w) logits."""
    gl = low_res_masks.shape[-1]
    r_h, r_w = resize_operators(gl, orig_hw, model_size)
    x = low_res_masks.astype(jnp.float32)
    x = jnp.einsum(
        "bcgw,Hg->bcHw", x, jnp.asarray(r_h),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "bcHw,Ww->bcHW", x, jnp.asarray(r_w),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def postprocess_masks_blocked(
    blocked_masks,
    orig_hw: tuple[int, int],
    *,
    model_size: int = 1024,
):
    """Blocked-layout variant consuming decode_masks(..., blocked=True)
    output with the token axis already squeezed.

    blocked_masks: (B, C, G, G, 2, 2, 2, 2) where pixel (4h+2d+f, 4w+2e+g)
    lives at [h, w, d, e, f, g]. The resize operators' input axis factors
    the same way row-major, so regroup + resize collapse into one einsum —
    the (B, C, 4G, 4G) natural-order image is never materialized.
    """
    g = blocked_masks.shape[2]
    r_h, r_w = resize_operators(4 * g, orig_hw, model_size)
    rh_f = jnp.asarray(r_h.reshape(orig_hw[0], g, 2, 2))
    rw_f = jnp.asarray(r_w.reshape(orig_hw[1], g, 2, 2))
    x = blocked_masks.astype(jnp.float32)
    x = jnp.einsum(
        "bchwdefg,Hhdf->bcwegH", x, rh_f,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "bcwegH,Wweg->bcHW", x, rw_f,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def postprocess_masks_direct(
    low_res_masks,
    orig_hw: tuple[int, int],
    *,
    model_size: int = 1024,
):
    """Direct (image-resize) reference implementation of the same chain;
    kept for tests that pin the operator form against it."""
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
    return jax.image.resize(
        x, (b, c, *orig_hw), method="bilinear", antialias=False
    )
