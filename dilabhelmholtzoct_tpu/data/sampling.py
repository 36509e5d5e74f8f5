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
    """Prompts for one image (ragged, host-side)."""

    bboxes: np.ndarray  # (n, 4) float32 xyxy  (or points (n, 1, 2))
    gt_masks: np.ndarray  # (n, H, W) float32 binary
    mask_values: np.ndarray  # (n,) int32 class value per component

    @property
    def n(self) -> int:
        return len(self.mask_values)


def label_components(binary_mask: np.ndarray):
    """8-connected component labeling (3x3 ones structure). Uses the C++
    union-find engine (ops/native.py) — bit-identical to
    ``scipy.ndimage.label`` — with scipy as fallback."""
    from ..ops.native import label_components_8

    return label_components_8(binary_mask)


def sample_prompts(
    ground_truth_mask: np.ndarray,
    prompt_type: str,
    rng: np.random.Generator,
) -> PromptedSample:
    """Extract per-component prompts from a (H, W) integer label map."""
    h, w = ground_truth_mask.shape
    prompts, gt_masks, values = [], [], []
    for v in np.unique(ground_truth_mask):
        binary = ground_truth_mask == v
        labeled, ncomp = label_components(binary)
        for c in range(1, ncomp + 1):
            comp = labeled == c
            ys, xs = np.nonzero(comp)
            values.append(int(v))
            gt_masks.append(comp.astype(np.float32))
            if prompt_type == "points":
                i = int(rng.integers(0, len(xs)))
                prompts.append([[float(xs[i]), float(ys[i])]])
            else:
                # ±10px jitter, clamped — same bounds as the reference
                # (np.random.randint(-10, 10) at training_utils.py:407-410)
                x_min = max(0, int(xs.min()) + int(rng.integers(-10, 10)))
                x_max = min(w, int(xs.max()) + int(rng.integers(-10, 10)))
                y_min = max(0, int(ys.min()) + int(rng.integers(-10, 10)))
                y_max = min(h, int(ys.max()) + int(rng.integers(-10, 10)))
                prompts.append([x_min, y_min, x_max, y_max])
    return PromptedSample(
        bboxes=np.asarray(prompts, np.float32),
        gt_masks=np.stack(gt_masks) if gt_masks else np.zeros((0, h, w), np.float32),
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
        h, w = samples[0].gt_masks.shape[-2:]
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

    gt = np.zeros((bsz, c, h, w), np.float32)
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
        if n:
            prompts[i, :n] = s.bboxes[:n]
            gt[i, :n] = s.gt_masks[:n]
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
        "gt_masks": gt,
        "mask_values": values,
        "channel_mask": channel_mask,
        "n_components": n_comp,
    }
    if images is not None:
        out["image"] = images
    if labels is not None:
        out["point_labels"] = labels
    return out
