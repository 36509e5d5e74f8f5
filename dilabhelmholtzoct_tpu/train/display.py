"""Sample visualization: class-colored prediction/GT overlays.

Parity with the reference's ``display_samples`` (octsam/models/
training_utils.py:301-349): index selection by display_mode ∈ {predefined,
random_equal (seed 17), random_changing (seed time), none}; forward pass;
argmax over component channels; component→class remap (the reference's
negate/abs torch.where trick, training_utils.py:329-338, implemented here
as a direct index map); overlays logged per split under ``{split}_samples``.

Without wandb the overlays are written as PNGs to the run directory.
"""

from __future__ import annotations

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np


# distinct RGB colors for up to 14 classes (0 = background stays dark)
_PALETTE = np.array([
    [0, 0, 0], [230, 25, 75], [60, 180, 75], [255, 225, 25],
    [0, 130, 200], [245, 130, 48], [145, 30, 180], [70, 240, 240],
    [240, 50, 230], [210, 245, 60], [250, 190, 190], [0, 128, 128],
    [170, 110, 40], [128, 128, 0],
], np.uint8)


def _select_indices(config, split, n):
    mode = config.display_mode
    if mode == "none":
        return []
    if mode == "predefined":
        return [i for i in config.display_idx if i < n]
    # unknown modes must fail loudly, not silently act as unseeded random
    if mode == "random_equal":
        rng = random.Random(17)  # reference seed (training_utils.py:307)
    elif mode == "random_changing":
        rng = random.Random(time.time())
    else:
        raise ValueError(
            f"unknown display_mode {mode!r}; expected one of "
            "predefined/random_equal/random_changing/none"
        )
    count = config.display_train_nr if split == "train" else config.display_val_nr
    return [rng.randint(0, n - 1) for _ in range(count)]


def _class_map(masks_logits, mask_values):
    """(C, H, W) logits + per-channel class values → (H, W) class map via
    channel argmax then component→class remap."""
    comp = np.argmax(masks_logits, axis=0)
    return np.asarray(mask_values, np.int32)[comp]


def _overlay(image, class_map, alpha=0.5):
    color = _PALETTE[np.clip(class_map, 0, len(_PALETTE) - 1)]
    return (image.astype(np.float32) * (1 - alpha)
            + color.astype(np.float32) * alpha).astype(np.uint8)


def display_samples(
    params, cfg, config, dataset, split, logger, run_dir, *, epoch, orig_hw
):
    indices = _select_indices(config, split, len(dataset))
    if not indices:
        return
    out_dir = os.path.join(run_dir, "display")
    os.makedirs(out_dir, exist_ok=True)
    images_logged = []
    # jitted + bucketed inference (shared with the eval harness); argmax over
    # sigmoid probs == argmax over logits, so the class map is identical
    from ..eval.harness import make_infer_fn

    infer = make_infer_fn(params, cfg, config, orig_hw)
    for i in indices:
        image, sample = dataset[i]
        if sample.n == 0:
            continue
        probs = infer(image, sample)
        pred_map = _class_map(probs, sample.mask_values)
        gt_map = _class_map(sample.gt_masks, sample.mask_values)

        entry = None
        try:
            from PIL import Image

            panel = np.concatenate(
                [image, _overlay(image, pred_map), _overlay(image, gt_map)],
                axis=1,
            )
            path = os.path.join(out_dir, f"{split}_e{epoch}_i{i}.png")
            Image.fromarray(panel).save(path)
            entry = path
        except ImportError:
            pass
        try:
            # exact reference overlay format when wandb is installed:
            # wandb.Image(image, masks={pred, gt}) with class_labels
            # (training_utils.py:339-348)
            import wandb

            entry = wandb.Image(image, masks={
                "pred": {"mask_data": pred_map,
                         "class_labels": config.mask_dict},
                "gt": {"mask_data": gt_map,
                       "class_labels": config.mask_dict},
            })
        except ImportError:
            pass
        if entry is not None:
            images_logged.append(entry)
    logger.log_images(f"{split}_samples", images_logged)
