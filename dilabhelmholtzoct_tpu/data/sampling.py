"""Mask→prompt sampling: connected components, jittered bboxes, points.

Host-side input-pipeline stage replicating the reference's ``SAMDataset``
prompt extraction (octsam/models/training_utils.py:381-447):

  * per class value present in the label map (background 0 included,
    training_utils.py:393-397), connected components under the 3x3
    all-ones structure (8-connectivity, training_utils.py:391,399),
  * per component either a bbox from min/max x/y with ±10px random jitter
    clamped to the image (training_utils.py:402-411) or one uniformly
    random foreground point (training_utils.py:429-431),
  * per-component binary ground-truth masks and class values.

Divergence from the reference (documented, SURVEY.md §"Known reference
bugs"): we use an explicit ``numpy.random.Generator`` instead of global
numpy/random state, so sampling is reproducible and thread-safe.

Batches are padded to static bucket sizes for TPU (no recompilation per
ragged batch); ``channel_mask`` marks the channels the reference's dynamic
``pad_sequence`` collation (training_utils.py:449-458) would contain, making
downstream loss math exactly equal to the reference's ragged batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import ndimage

_STRUCTURE = np.ones((3, 3), dtype=np.int32)

# Static bucket sizes for per-image component counts. 14 classes can each
# split into several components; 64 is a hard cap (components beyond it are
# dropped with a warning — never silently).
DEFAULT_BUCKETS = (8, 16, 32, 64)


@dataclass
class PromptedSample:
    """Prompts for one image (ragged, host-side).

    Ground-truth component masks are carried as ONE compact ``comp_map``
    ((H, W) int32, slot ids 1..n in prompt order, 0 = none) instead of n
    full float masks — 32x smaller on host and on the wire; the training
    step materializes the one-hot masks on device.
    """

    bboxes: np.ndarray  # (n, 4) float32 xyxy  (or points (n, 1, 2))
    comp_map: np.ndarray  # (H, W) int32 component slots 1..n
    mask_values: np.ndarray  # (n,) int32 class value per component

    @property
    def n(self) -> int:
        return len(self.mask_values)

    @property
    def gt_masks(self) -> np.ndarray:
        """(n, H, W) float32 binary masks (materialized on demand)."""
        n = self.n
        if n == 0:
            return np.zeros((0, *self.comp_map.shape), np.float32)
        return (
            self.comp_map[None] == np.arange(1, n + 1)[:, None, None]
        ).astype(np.float32)


def label_components(binary_mask: np.ndarray):
    """8-connected component labeling (3x3 ones structure). Uses the C++
    union-find engine (ops/native.py) — bit-identical to
    ``scipy.ndimage.label`` — with scipy as fallback."""
    from ..ops.native import label_components_8

    return label_components_8(binary_mask)


MAX_COMPONENTS = 256  # host-side extraction cap (far above any real image)


def extract_for_sampling(ground_truth_mask: np.ndarray):
    """Deterministic (RNG-free) half of prompt sampling: the C++ component
    extraction. Returns an opaque tuple for ``prompts_from_extraction`` or
    None when the native library is unavailable.

    Split out so the input pipeline can CACHE it across epochs: the
    reference re-runs scipy.ndimage.label every epoch
    (training_utils.py:397-415), but the labeling is a pure function of the
    label map — only the ±10px jitter / point draw needs fresh randomness.
    At 496x512/14 classes extraction costs ~24 ms/image on one host core,
    which would otherwise dominate the epoch once the device step is fast.
    """
    from ..ops.native import extract_components

    gt8 = np.ascontiguousarray(ground_truth_mask, np.uint8)
    return extract_components(gt8, MAX_COMPONENTS)


def prompts_from_extraction(
    native,
    shape: tuple[int, int],
    prompt_type: str,
    rng: np.random.Generator,
) -> PromptedSample:
    """Randomized half: jittered bboxes / uniform points from a (possibly
    cached) ``extract_for_sampling`` result. RNG draw order matches the
    reference and the pure-python fallback exactly."""
    from ..ops.native import component_pixel_at

    h, w = shape
    comp_map, values, raw_boxes, sizes, total = native
    n = len(values)
    if prompt_type == "points":
        ranks = np.asarray(
            [int(rng.integers(0, int(sz))) for sz in sizes], np.int64
        )
        xy = component_pixel_at(comp_map, ranks)
        prompts = xy.astype(np.float32).reshape(n, 1, 2)
    else:
        prompts = np.empty((n, 4), np.float32)
        for s in range(n):
            x0, y0, x1, y1 = (int(q) for q in raw_boxes[s])
            # ±10px jitter, clamped; drawn in the reference's order
            # x_min, x_max, y_min, y_max (training_utils.py:407-410)
            jx0 = max(0, x0 + int(rng.integers(-10, 10)))
            jx1 = min(w, x1 + int(rng.integers(-10, 10)))
            jy0 = max(0, y0 + int(rng.integers(-10, 10)))
            jy1 = min(h, y1 + int(rng.integers(-10, 10)))
            prompts[s] = (jx0, jy0, jx1, jy1)
    return PromptedSample(
        bboxes=prompts, comp_map=comp_map,
        mask_values=values.astype(np.int32),
    )


def sample_prompts(
    ground_truth_mask: np.ndarray,
    prompt_type: str,
    rng: np.random.Generator,
) -> PromptedSample:
    """Extract per-component prompts from a (H, W) integer label map.

    Fast path: one C++ pass (ops/native.extract_components) computing the
    component map, per-component bboxes and sizes; random point prompts are
    rank-selected in C++ too. RNG draw order matches the pure-python
    fallback exactly, so results are identical either way (tested)."""
    native = extract_for_sampling(ground_truth_mask)
    if native is not None:
        return prompts_from_extraction(
            native, ground_truth_mask.shape, prompt_type, rng
        )

    h, w = ground_truth_mask.shape
    # pure-python fallback (identical semantics)
    prompts, values = [], []
    comp_map = np.zeros((h, w), np.int32)
    slot = 0
    for v in np.unique(ground_truth_mask):
        binary = ground_truth_mask == v
        labeled, ncomp = label_components(binary)
        for c in range(1, ncomp + 1):
            comp = labeled == c
            ys, xs = np.nonzero(comp)
            values.append(int(v))
            slot += 1
            comp_map[comp] = slot
            if prompt_type == "points":
                i = int(rng.integers(0, len(xs)))
                prompts.append([[float(xs[i]), float(ys[i])]])
            else:
                x_min = max(0, int(xs.min()) + int(rng.integers(-10, 10)))
                x_max = min(w, int(xs.max()) + int(rng.integers(-10, 10)))
                y_min = max(0, int(ys.min()) + int(rng.integers(-10, 10)))
                y_max = min(h, int(ys.max()) + int(rng.integers(-10, 10)))
                prompts.append([x_min, y_min, x_max, y_max])
    return PromptedSample(
        bboxes=np.asarray(prompts, np.float32).reshape(
            (slot, 1, 2) if prompt_type == "points" else (slot, 4)
        ) if slot else np.zeros(
            (0, 1, 2) if prompt_type == "points" else (0, 4), np.float32),
        comp_map=comp_map,
        mask_values=np.asarray(values, np.int32),
    )


def bucket_for(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def collate(
    samples: list[PromptedSample],
    images: np.ndarray | None = None,
    *,
    prompt_type: str = "bboxes",
    buckets=DEFAULT_BUCKETS,
) -> dict:
    """Pad a list of ragged samples into one static-shape batch.

    Returns dict with:
      image        (B, H, W, 3) uint8
      prompts      (B, C, 4) f32 boxes or (B, C, 1, 2) f32 points
      point_labels (B, C, 1) i32 — 1 for channels the reference's ragged
                   batch would contain (its pad_sequence zero-pads points,
                   which HF then treats as real (0,0) foreground points —
                   replicated here), -10 for bucket-only padding channels
                   (skipped by the prompt encoder; they never enter the loss)
      gt_masks     (B, C, H, W) f32
      mask_values  (B, C) i32
      channel_mask (B, C) f32 — 1 where the reference's ragged batch would
                   have a channel (c < max component count in batch)
      n_components (B,) i32 — true per-sample component counts
    """
    bsz = len(samples)
    if images is not None:
        h, w = images.shape[1:3]
    else:
        h, w = samples[0].comp_map.shape
    max_n = max(s.n for s in samples)
    cap = buckets[-1]
    if max_n > cap:
        import warnings

        warnings.warn(
            f"batch has {max_n} components; capping at {cap} "
            f"(excess components dropped)"
        )
        max_n = cap
    c = bucket_for(max_n, buckets)

    comp_map = np.zeros((bsz, h, w), np.int32)
    values = np.zeros((bsz, c), np.int32)
    n_comp = np.zeros((bsz,), np.int32)
    if prompt_type == "points":
        prompts = np.zeros((bsz, c, 1, 2), np.float32)
        labels = np.full((bsz, c, 1), -10, np.int32)
    else:
        prompts = np.zeros((bsz, c, 4), np.float32)
        labels = None

    for i, s in enumerate(samples):
        n = min(s.n, c)
        n_comp[i] = n
        comp_map[i] = s.comp_map  # slots > c fall outside the one-hot range
        if n:
            prompts[i, :n] = s.bboxes[:n]
            values[i, :n] = s.mask_values[:n]
            if labels is not None:
                labels[i, :n] = 1

    channel_mask = np.zeros((bsz, c), np.float32)
    channel_mask[:, :max_n] = 1.0
    if labels is not None:
        # reference parity: ragged-pad slots (n..max_n) are (0,0) points
        # with implicit label 1 (pad_sequence + HF default labels of ones)
        labels[:, :max_n] = np.where(
            labels[:, :max_n] == -10, 1, labels[:, :max_n]
        )

    out = {
        "prompts": prompts,
        "comp_map": comp_map,
        "mask_values": values,
        "channel_mask": channel_mask,
        "n_components": n_comp,
    }
    if images is not None:
        out["image"] = images
    if labels is not None:
        out["point_labels"] = labels
    return out


def gt_masks_from_comp_map(comp_map, n_channels: int):
    """(B, H, W) int slot map → (B, C, H, W) f32 one-hot masks.

    Works on numpy and jax arrays — the device-side materialization used by
    the training step (slot ids beyond n_channels vanish, matching the
    bucket cap)."""
    if isinstance(comp_map, np.ndarray):
        rng_ = np.arange(1, n_channels + 1, dtype=comp_map.dtype)
        return (comp_map[:, None] == rng_[None, :, None, None]).astype(
            np.float32
        )
    import jax.numpy as jnp

    rng_ = jnp.arange(1, n_channels + 1, dtype=comp_map.dtype)
    return (
        comp_map[:, None] == rng_[None, :, None, None]
    ).astype(jnp.float32)
