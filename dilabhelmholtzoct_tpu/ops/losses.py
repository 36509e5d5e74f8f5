"""Segmentation losses, replicating ``monai.losses.DiceCELoss(sigmoid=True)``.

The reference's training criterion (octsam/models/training_utils.py:32,62):
Dice (sigmoid, smooth 1e-5 num/den, per-sample-per-channel, mean reduction)
plus CE — torch ``CrossEntropyLoss`` with probabilistic (float, same-shape)
targets when the channel dim > 1, ``BCEWithLogitsLoss`` when it is 1
(monai 1.3 behavior). Verified against torch in tests/test_losses.py.

The masked variants make the loss exact under TPU bucket-padding: channels
are padded to a static bucket size, and ``channel_mask`` marks which channels
the reference's dynamic ``pad_sequence`` batch would actually contain
(training_utils.py:449-458) so the math is identical to the reference's
ragged batches while every shape stays static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SMOOTH_NR = 1e-5
SMOOTH_DR = 1e-5


def dice_loss(logits, targets, channel_mask=None):
    """Soft Dice with sigmoid activation.

    logits/targets: (B, C, *spatial); channel_mask: optional (B, C) {0,1}.
    Returns the mean of per-(b,c) dice terms (over masked entries if a mask
    is given) — matching monai ``DiceLoss(sigmoid=True)`` defaults.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    axes = tuple(range(2, logits.ndim))
    intersection = jnp.sum(t * probs, axis=axes)
    denominator = jnp.sum(t, axis=axes) + jnp.sum(probs, axis=axes)
    f = 1.0 - (2.0 * intersection + SMOOTH_NR) / (denominator + SMOOTH_DR)
    if channel_mask is None:
        return jnp.mean(f)
    m = channel_mask.astype(jnp.float32)
    return jnp.sum(f * m) / jnp.maximum(jnp.sum(m), 1.0)


def softmax_ce_prob_targets(logits, targets, channel_mask=None):
    """torch ``CrossEntropyLoss`` with probabilistic targets over axis 1.

    loss = mean over (B, *spatial) of  -sum_c targets_c * log_softmax(logits)_c
    Masked channels are excluded from the softmax (set to -inf) and from the
    target sum.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if channel_mask is None:
        logp = jax.nn.log_softmax(x, axis=1)
        return jnp.mean(-jnp.sum(t * logp, axis=1))
    m = channel_mask.astype(bool)
    shape = (m.shape[0], m.shape[1]) + (1,) * (logits.ndim - 2)
    mb = m.reshape(shape)
    x = jnp.where(mb, x, -jnp.inf)
    t = jnp.where(mb, t, 0.0)
    logp = jax.nn.log_softmax(x, axis=1)
    logp = jnp.where(jnp.isfinite(logp), logp, 0.0)
    per_pixel = -jnp.sum(t * logp, axis=1)  # (B, *spatial)
    # mean over pixels of rows that exist (fully-masked rows are
    # data-parallel padding and must not dilute the denominator)
    row_valid = jnp.any(m, axis=1).astype(jnp.float32)  # (B,)
    n_pix = float(np.prod(per_pixel.shape[1:]))
    denom = jnp.maximum(jnp.sum(row_valid) * n_pix, 1.0)
    rshape = (-1,) + (1,) * (per_pixel.ndim - 1)
    return jnp.sum(per_pixel * row_valid.reshape(rshape)) / denom


def bce_with_logits(logits, targets):
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # numerically-stable BCEWithLogits
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


def dice_ce_loss(logits, targets, channel_mask=None):
    """monai ``DiceCELoss(sigmoid=True)`` equivalent (lambda_dice=lambda_ce=1).

    logits/targets: (B, C, H, W). With C == 1 the CE term is BCE-with-logits,
    matching monai's dispatch.
    """
    d = dice_loss(logits, targets, channel_mask)
    if logits.shape[1] == 1:
        ce = bce_with_logits(logits, targets)
    else:
        ce = softmax_ce_prob_targets(logits, targets, channel_mask)
    return d + ce


def segmentation_loss(name: str):
    """Resolve the reference's ``--loss`` flag (training.py:29; only
    'diceCE' is implemented there) to a loss fn; we additionally support its
    two components standalone."""
    name = name.lower()
    if name == "dicece":
        return dice_ce_loss
    if name == "dice":
        return dice_loss
    if name in ("ce", "crossentropy"):
        return softmax_ce_prob_targets
    raise ValueError(f"unknown loss {name!r}; known: diceCE, dice, ce")
