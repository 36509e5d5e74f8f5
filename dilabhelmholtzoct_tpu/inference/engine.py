"""Interactive segmentation engine: jitted SAM serving with encoder cache.

Serving core of the reference's Gradio app (octsam/inference/app.py:17-30):
``inference(img, pixel, prompt_type)`` → sigmoid>0.5 uint8 masks after the
3-step postprocess. TPU-first improvements over the reference:

  * the image encoder runs ONCE per image — repeated prompts on the same
    image (the interactive pattern) reuse cached embeddings (the reference
    re-encodes on every click, SURVEY.md §7 step 6);
  * encode and decode are separately jitted, so a prompt change costs only
    the ~ms decoder pass;
  * prompt shapes are bucketed to avoid recompilation per prompt count.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import SamConfig, config_for
from ..models.sam import (
    decode_masks,
    encode_image,
    encode_prompts,
    image_wide_pe,
)
from ..ops.postprocess import postprocess_masks_blocked
from ..ops.preprocess import preprocess_image, rescale_boxes, rescale_coords


class SegmentationEngine:
    def __init__(self, params, cfg: SamConfig, *, cache_size: int = 8):
        self.params = params
        self.cfg = cfg
        self.cache_size = cache_size
        self._cache: dict[str, jax.Array] = {}
        self._encode = jax.jit(
            lambda p, x: encode_image(p, x, self.cfg)
        )
        self._decode_cache: dict = {}

    @classmethod
    def from_checkpoint(cls, base_model: str, checkpoint_path: str | None,
                        allow_pickled_module: bool = False, **kw):
        """Load base config + (optionally fine-tuned) weights from a local
        HF-format checkpoint (.pt/.pth/.safetensors) — the app's load path
        (app.py:11-15). ``allow_pickled_module=True`` additionally accepts
        whole-pickled-module files (app_organoid.py:12-13); opt-in because
        arbitrary pickles can execute code."""
        from ..models.convert import load_pretrained
        from ..models.sam import init_params

        cfg = config_for(base_model)
        if checkpoint_path:
            params = load_pretrained(
                checkpoint_path, cfg,
                allow_pickled_module=allow_pickled_module,
            )
            params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            params = init_params(jax.random.PRNGKey(0), cfg)
        return cls(params, cfg, **kw)

    # -- encoder cache -----------------------------------------------------

    def _embeddings(self, image: np.ndarray):
        # shape/dtype are part of the key (identical bytes reshaped are a
        # different image); hits re-insert so eviction is LRU, not FIFO —
        # alternating clicks across cache_size+1 images must not evict the
        # image that was just reused
        h = hashlib.sha1(str((image.shape, image.dtype.str)).encode())
        h.update(np.ascontiguousarray(image))
        key = h.hexdigest()
        if key in self._cache:
            self._cache[key] = self._cache.pop(key)
            return self._cache[key]
        if len(self._cache) >= self.cache_size:
            self._cache.pop(next(iter(self._cache)))
        pix, _ = preprocess_image(
            jnp.asarray(image[None]),
            target_size=self.cfg.vision.image_size,
        )
        self._cache[key] = self._encode(self.params, pix)
        return self._cache[key]

    # -- decode ------------------------------------------------------------

    def _decode_fn(self, prompt_type: str, n: int, orig_hw):
        key = (prompt_type, n, orig_hw)
        if key in self._decode_cache:
            return self._decode_cache[key]
        cfg = self.cfg
        size = cfg.vision.image_size

        @jax.jit
        def run(params, emb, prompts, labels):
            if prompt_type == "points":
                sparse, dense = encode_prompts(
                    params, cfg, 1,
                    points=rescale_coords(prompts, orig_hw, size)[None],
                    labels=labels[None],
                    dtype=emb.dtype,
                )
            else:
                sparse, dense = encode_prompts(
                    params, cfg, 1,
                    boxes=rescale_boxes(prompts, orig_hw, size)[None],
                    dtype=emb.dtype,
                )
            pe = image_wide_pe(params, cfg)
            low, _ = decode_masks(
                params, cfg, emb, pe, sparse, dense, multimask_output=False,
                blocked=True,
            )
            masks = postprocess_masks_blocked(
                low[:, :, 0], orig_hw, model_size=size
            )
            probs = jax.nn.sigmoid(masks[0])
            # threshold ON DEVICE: the interactive path fetches the uint8
            # mask only — 4x fewer bytes over the tunnel than f32 probs
            # (app.py:30's sigmoid>0.5 on host needed the full float mask)
            return (probs > 0.5).astype(jnp.uint8), probs

        self._decode_cache[key] = run
        return run

    # -- public API --------------------------------------------------------

    def segment(self, image: np.ndarray, prompt, prompt_type: str = "bbox",
                with_probs: bool = True):
        """image: (H, W, 3) uint8; prompt: [x, y] point or [x0, y0, x1, y1]
        box, or a list of them. Returns (masks (n, H, W) uint8, probs).

        The whole prompt→mask path (prompt encode, decode, postprocess,
        sigmoid, threshold) is ONE jitted dispatch; prompts are passed as
        host numpy so their upload rides the dispatch instead of paying a
        separate device_put round trip. ``with_probs=False`` (the
        interactive-app path, which only overlays the binary mask —
        app.py:30) fetches just the uint8 mask: 4x fewer bytes and a
        single device→host transfer per click."""
        from ..data.sampling import bucket_for

        orig_hw = image.shape[:2]
        emb = self._embeddings(image)
        prompt = np.asarray(prompt, np.float32)
        if prompt.ndim == 1:
            prompt = prompt[None]
        n = len(prompt)
        # pad the prompt count to a bucket so an interactive session adding
        # one prompt per click compiles O(log n) decode programs, not one
        # per count; each prompt decodes independently in SAM, so zero-pad
        # rows are exact and their masks are sliced off device-side below
        nb = bucket_for(n, buckets=(1, 2, 4, 8, 16, 32, 64))
        if prompt_type == "points":
            prompts = np.zeros((nb, 1, 2), np.float32)
            prompts[:n] = prompt.reshape(n, 1, 2)
            labels = np.zeros((nb, 1), np.int32)
            labels[:n] = 1
        else:
            prompts = np.zeros((nb, 4), np.float32)
            prompts[:n] = prompt.reshape(n, 4)
            labels = np.zeros((0,), np.int32)
        run = self._decode_fn(
            "points" if prompt_type == "points" else "bbox", nb, orig_hw
        )
        binary, probs = run(self.params, emb, prompts, labels)
        if nb > n:  # lazy device-side slice rides the fetch's dispatch
            binary, probs = binary[:n], probs[:n]
        if not with_probs:
            return np.asarray(jax.device_get(binary)), None
        # one bundled fetch for both outputs (per-array fetches each pay
        # the ~29 ms tunnel round trip)
        binary, probs = jax.device_get((binary, probs))
        return np.asarray(binary), np.asarray(probs, np.float32)


def parse_image_prompter_points(points):
    """Parse gradio-image-prompter events (app.py:36-49 contract).

    Each entry is [x, y, ·, x2, y2, ·]; a point iff entries 3 and 4 are 0,
    else a box. Returns list of ("points"|"bbox", prompt) tuples.
    """
    out = []
    for entry in points:
        pixel = list(map(int, entry))
        prompt = [pixel[0], pixel[1], pixel[3], pixel[4]]
        if pixel[3] == 0 and pixel[4] == 0:
            out.append(("points", [prompt[0], prompt[1]]))
        else:
            out.append(("bbox", prompt))
    return out


def point_marker(shape_hw, x: int, y: int) -> np.ndarray:
    """3x3 point marker overlay (app.py:42-44)."""
    point = np.zeros(shape_hw, np.uint8)
    point[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2] = 1
    return point
