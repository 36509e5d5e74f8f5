"""SAM image/prompt preprocessing, pure-JAX and jit-fusable.

Replicates ``transformers.SamProcessor`` semantics (the reference calls it at
octsam/models/training_utils.py:46-52,274 and octsam/inference/app.py:21-23):

  * resize longest side to 1024 (bilinear, half-pixel centers),
  * rescale 1/255 and normalize with ImageNet mean/std,
  * zero-pad bottom/right to 1024x1024,
  * rescale prompt coordinates into the resized frame,
  * report ``original_size`` / ``reshaped_input_size`` bookkeeping.

Unlike the reference — which runs PIL/numpy per image on the host inside the
train loop — everything here is a jittable function of a uint8 image batch,
so XLA fuses pseudocolor LUT + resize + normalize + pad into the forward
pass, and the whole pipeline runs on-device.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_shape(orig_h: int, orig_w: int, longest_edge: int = 1024):
    """Target (h, w) after longest-side resize.

    Matches HF ``SamImageProcessor._get_preprocess_shape``
    (image_processing_sam.py:203-212): scale then round-half-up.
    """
    scale = longest_edge / max(orig_h, orig_w)
    return int(orig_h * scale + 0.5), int(orig_w * scale + 0.5)


def _upsample2_bilinear(x, axis: int):
    """Exact 2x bilinear upsampling along ``axis`` (half-pixel centers,
    edge clamp — the ``jax.image.resize(..., 'bilinear')`` convention):
    out[2j] = 0.25*x[j-1] + 0.75*x[j], out[2j+1] = 0.75*x[j] + 0.25*x[j+1].

    Closed-form elementwise path for the OCT geometry (496x512 -> 992x1024
    is exactly 2x per side): the general gather-based resize lowering runs
    ~8x off bandwidth roofline on TPU (~1.0 ms/step of the full fine-tune
    step, xplane round 5); this form fuses to shifted reads + one
    interleaving write.
    """
    lo = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis)
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                              axis=axis)], axis)
    even = 0.25 * lo + 0.75 * x
    odd = 0.75 * x + 0.25 * hi
    y = jnp.stack([even, odd], axis=axis + 1)
    return y.reshape(
        x.shape[:axis] + (2 * x.shape[axis],) + x.shape[axis + 1:])


def preprocess_image(
    image,
    *,
    target_size: int = 1024,
    dtype=jnp.float32,
):
    """uint8/float (B, H, W, 3) → normalized, padded (B, T, T, 3).

    Returns (pixel_values, reshaped_input_size) where reshaped_input_size is
    the static (h, w) the image occupies inside the padded square.
    """
    b, h, w, c = image.shape
    new_h, new_w = preprocess_shape(h, w, target_size)
    x = image.astype(jnp.float32)
    if (new_h, new_w) == (2 * h, 2 * w):
        # normalize BEFORE the upsample (affine maps commute exactly with
        # convex bilinear weights) so the elementwise chain runs on the
        # small source image; then the closed-form 2x path.
        x = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        x = _upsample2_bilinear(_upsample2_bilinear(x, 1), 2)
    else:
        x = jax.image.resize(x, (b, new_h, new_w, c), method="bilinear")
        x = x / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.pad(
        x, ((0, 0), (0, target_size - new_h), (0, target_size - new_w), (0, 0))
    )
    return x.astype(dtype), (new_h, new_w)


def rescale_coords(coords, orig_hw, target_size: int = 1024):
    """Map xy prompt coordinates from original-image space to resized space.

    coords: (..., 2) with x at [..., 0], y at [..., 1]. Matches
    ``SamProcessor._normalize_coordinates`` (processing_sam.py:220-240).
    """
    old_h, old_w = orig_hw
    new_h, new_w = preprocess_shape(old_h, old_w, target_size)
    scale = jnp.asarray([new_w / old_w, new_h / old_h], dtype=jnp.float32)
    return coords.astype(jnp.float32) * scale


def rescale_boxes(boxes, orig_hw, target_size: int = 1024):
    """(..., 4) xyxy boxes → resized space."""
    shape = boxes.shape
    return rescale_coords(
        boxes.reshape(*shape[:-1], 2, 2), orig_hw, target_size
    ).reshape(shape)


# ---------------------------------------------------------------------------
# Pseudocolor maps (reference: 23 OpenCV colormaps, training.py:58-82,
# applied per-image at training_utils.py:439-440). Implemented as 256x3 LUT
# gathers — fused by XLA into the preprocessing graph.
# ---------------------------------------------------------------------------

COLORMAP_NAMES = (
    "Autumn", "Bone", "Cividis", "Cool", "Deepgreen", "Hot", "HSV",
    "Inferno", "Jet", "Magma", "Ocean", "Parula", "Pink", "Plasma",
    "Rainbow", "Viridis", "Winter", "Spring", "Summer",
    "Twilight shifted", "Twilight", "Turbo", "grayscale",
)


@lru_cache(maxsize=None)
def colormap_lut(name: str) -> np.ndarray:
    """(256, 3) uint8 LUT for an OpenCV colormap name.

    Channel order matches the reference pipeline exactly: the reference reads
    images with cv2 (BGR) and applies ``cv2.applyColorMap`` (BGR output)
    without ever converting to RGB, so we keep cv2's native channel order.
    'grayscale' is the identity map (no colormap applied).
    """
    if name == "grayscale":
        g = np.arange(256, dtype=np.uint8)
        return np.stack([g, g, g], axis=-1)
    import cv2

    cv2_ids = {
        "Autumn": cv2.COLORMAP_AUTUMN, "Bone": cv2.COLORMAP_BONE,
        "Cividis": cv2.COLORMAP_CIVIDIS, "Cool": cv2.COLORMAP_COOL,
        "Deepgreen": cv2.COLORMAP_DEEPGREEN, "Hot": cv2.COLORMAP_HOT,
        "HSV": cv2.COLORMAP_HSV, "Inferno": cv2.COLORMAP_INFERNO,
        "Jet": cv2.COLORMAP_JET, "Magma": cv2.COLORMAP_MAGMA,
        "Ocean": cv2.COLORMAP_OCEAN, "Parula": cv2.COLORMAP_PARULA,
        "Pink": cv2.COLORMAP_PINK, "Plasma": cv2.COLORMAP_PLASMA,
        "Rainbow": cv2.COLORMAP_RAINBOW, "Viridis": cv2.COLORMAP_VIRIDIS,
        "Winter": cv2.COLORMAP_WINTER, "Spring": cv2.COLORMAP_SPRING,
        "Summer": cv2.COLORMAP_SUMMER,
        "Twilight shifted": cv2.COLORMAP_TWILIGHT_SHIFTED,
        "Twilight": cv2.COLORMAP_TWILIGHT, "Turbo": cv2.COLORMAP_TURBO,
    }
    grad = np.arange(256, dtype=np.uint8).reshape(256, 1)
    return cv2.applyColorMap(grad, cv2_ids[name]).reshape(256, 3)


def apply_pseudocolor(gray, lut):
    """gray: (..., H, W) uint8 channel-0 intensities; lut: (256, 3) uint8.

    Equivalent of ``cv2.applyColorMap(image[:, :, 0], colormap)``
    (training_utils.py:439-440) as an XLA gather.
    """
    return jnp.asarray(lut)[gray.astype(jnp.int32)]
