"""Golden tests for the ops layer against the reference's actual dependencies
(HF SamProcessor, torch F.interpolate, torch CE/BCE, sklearn metrics, cv2
colormaps) — all constructed locally, no network."""

import numpy as np
import pytest

import jax.numpy as jnp

from dilabhelmholtzoct_tpu.ops.losses import (
    bce_with_logits,
    dice_ce_loss,
    dice_loss,
    softmax_ce_prob_targets,
)
from dilabhelmholtzoct_tpu.ops.metrics import (
    average_precision,
    binary_report,
    f1,
    iou,
    sensitivity,
    specificity,
)
from dilabhelmholtzoct_tpu.ops.postprocess import postprocess_masks
from dilabhelmholtzoct_tpu.ops.preprocess import (
    apply_pseudocolor,
    colormap_lut,
    preprocess_image,
    preprocess_shape,
    rescale_boxes,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Processor parity
# ---------------------------------------------------------------------------


def _hf_processor():
    from transformers.models.sam.image_processing_sam import SamImageProcessor
    from transformers.models.sam.processing_sam import SamProcessor

    return SamProcessor(SamImageProcessor())


def test_preprocess_shape_matches_hf():
    proc = _hf_processor().image_processor
    for hw in [(496, 512), (512, 496), (1024, 1024), (100, 333), (7, 5)]:
        assert preprocess_shape(*hw) == proc._get_preprocess_shape(hw, 1024)


def test_preprocess_image_matches_hf(rng):
    """496x512 OCT geometry: our fused resize+normalize+pad vs SamProcessor."""
    proc = _hf_processor()
    img = rng.integers(0, 256, size=(496, 512, 3), dtype=np.uint8)
    hf = proc(img, return_tensors="pt")
    hf_pix = hf["pixel_values"][0].numpy()  # (3, 1024, 1024)

    ours, reshaped = preprocess_image(jnp.asarray(img[None]))
    ours = np.asarray(ours[0]).transpose(2, 0, 1)

    assert tuple(hf["reshaped_input_sizes"][0].tolist()) == reshaped
    assert tuple(hf["original_sizes"][0].tolist()) == (496, 512)
    # PIL uint8 bilinear resize quantizes its output to uint8 (fixed-point
    # internals); our resize stays in float — strictly more accurate. The
    # difference is bounded by uint8 rounding: ±1/255 pre-norm ≈ 0.02
    # post-norm max, ~0.006 mean.
    assert np.max(np.abs(ours - hf_pix)) < 0.03
    assert np.mean(np.abs(ours - hf_pix)) < 0.01


def test_upsample2_matches_general_resize(rng):
    """The closed-form exact-2x bilinear path (round 5, used for the OCT
    496x512 -> 992x1024 resize) == jax.image.resize bilinear, to float
    rounding. Reference semantics: SamProcessor's PIL bilinear resize
    (octsam/models/training_utils.py:46-52)."""
    import jax
    from dilabhelmholtzoct_tpu.ops.preprocess import _upsample2_bilinear

    x = jnp.asarray(rng.normal(size=(2, 31, 17, 3)).astype(np.float32))
    got = _upsample2_bilinear(_upsample2_bilinear(x, 1), 2)
    want = jax.image.resize(x, (2, 62, 34, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_box_rescale_matches_hf():
    proc = _hf_processor()
    img = np.zeros((496, 512, 3), np.uint8)
    boxes = [[[10.0, 20.0, 300.0, 400.0], [0.0, 0.0, 512.0, 496.0]]]
    hf = proc(img, input_boxes=boxes, return_tensors="pt")
    ours = rescale_boxes(jnp.asarray(boxes[0]), (496, 512))
    np.testing.assert_allclose(
        np.asarray(ours), hf["input_boxes"][0].numpy(), rtol=1e-6
    )


def test_pseudocolor_matches_cv2(rng):
    import cv2

    gray = rng.integers(0, 256, size=(64, 48), dtype=np.uint8)
    for name in ["Bone", "Jet", "Viridis", "Turbo"]:
        import cv2 as _cv2

        cv2_ids = {
            "Bone": _cv2.COLORMAP_BONE, "Jet": _cv2.COLORMAP_JET,
            "Viridis": _cv2.COLORMAP_VIRIDIS, "Turbo": _cv2.COLORMAP_TURBO,
        }
        want = cv2.applyColorMap(gray, cv2_ids[name])
        got = np.asarray(apply_pseudocolor(jnp.asarray(gray), colormap_lut(name)))
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Postprocess parity (the 3-step interpolate/crop/interpolate)
# ---------------------------------------------------------------------------


def test_postprocess_matches_torch(rng):
    import torch.nn.functional as F

    low = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    t = torch.tensor(low)
    m = F.interpolate(t, (1024, 1024), mode="bilinear", align_corners=False)
    m = m[..., :992, :1024]
    m = F.interpolate(m, (496, 512), mode="bilinear", align_corners=False)

    ours = postprocess_masks(jnp.asarray(low), (496, 512))
    np.testing.assert_allclose(
        np.asarray(ours), m.numpy(), atol=2e-4, rtol=1e-4
    )


def test_postprocess_operator_matches_direct(rng):
    """The composed-operator form == the direct two-resize form at the real
    decoder geometry (256² → crop 992×1024 → 496×512)."""
    from dilabhelmholtzoct_tpu.ops.postprocess import postprocess_masks_direct

    low = rng.normal(size=(2, 4, 256, 256)).astype(np.float32)
    ours = postprocess_masks(jnp.asarray(low), (496, 512))
    direct = postprocess_masks_direct(jnp.asarray(low), (496, 512))
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(direct), atol=1e-4, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# Losses vs torch / monai semantics
# ---------------------------------------------------------------------------


def test_dice_loss_hand_value():
    # 1x1x2x2: pred logits large → probs ~ {0,1}
    logits = jnp.asarray([[[[100.0, -100.0], [100.0, -100.0]]]])
    target = jnp.asarray([[[[1.0, 0.0], [0.0, 0.0]]]])
    # probs = [[1,0],[1,0]]; inter=1, denom=1+2=3
    want = 1.0 - (2 * 1 + 1e-5) / (3 + 1e-5)
    np.testing.assert_allclose(float(dice_loss(logits, target)), want, rtol=1e-6)


def test_ce_prob_targets_matches_torch(rng):
    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    # disjoint component masks: one-hot over channels (some pixels all-zero)
    labels = rng.integers(0, 6, size=(2, 8, 8))
    target = np.zeros((2, 5, 8, 8), np.float32)
    for c in range(5):
        target[:, c][labels == c] = 1.0

    want = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(target)
    ).item()
    got = float(softmax_ce_prob_targets(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_matches_torch(rng):
    logits = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    target = (rng.random((2, 1, 8, 8)) > 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(target)
    ).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_ce_masked_equals_unmasked_on_smaller_batch(rng):
    """Bucket-padding equivalence: loss on (B, C=3) ragged batch == loss on
    (B, C=8) bucket with channel_mask marking the first 3 channels."""
    logits3 = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    target3 = (rng.random((2, 3, 16, 16)) > 0.7).astype(np.float32)
    logits8 = np.concatenate(
        [logits3, rng.normal(size=(2, 5, 16, 16)).astype(np.float32)], axis=1
    )
    target8 = np.concatenate([target3, np.zeros((2, 5, 16, 16), np.float32)], 1)
    mask = np.zeros((2, 8), np.float32)
    mask[:, :3] = 1.0

    plain = float(dice_ce_loss(jnp.asarray(logits3), jnp.asarray(target3)))
    masked = float(
        dice_ce_loss(jnp.asarray(logits8), jnp.asarray(target8), jnp.asarray(mask))
    )
    np.testing.assert_allclose(masked, plain, rtol=1e-5)


# ---------------------------------------------------------------------------
# Metrics vs sklearn
# ---------------------------------------------------------------------------


def test_metrics_match_sklearn(rng):
    import sklearn.metrics as skm

    gt = (rng.random(5000) > 0.8).astype(np.uint8)
    pred = (rng.random(5000) > 0.7).astype(np.uint8)
    scores = rng.random(5000)

    tn, fp, fn, tp = skm.confusion_matrix(gt, pred).ravel()
    rep = binary_report(pred, gt, scores)
    np.testing.assert_allclose(rep["f1"], skm.f1_score(gt, pred), rtol=1e-9)
    np.testing.assert_allclose(
        rep["ap"], skm.average_precision_score(gt, scores), rtol=1e-9
    )
    np.testing.assert_allclose(rep["sensitivity"], tp / (tp + fn), rtol=1e-12)
    np.testing.assert_allclose(rep["specificity"], tn / (tn + fp), rtol=1e-12)
    np.testing.assert_allclose(
        rep["dice"], 2 * tp / (2 * tp + fp + fn), rtol=1e-12
    )
    np.testing.assert_allclose(rep["iou"], tp / (tp + fp + fn), rtol=1e-12)


def test_ap_with_ties_matches_sklearn(rng):
    import sklearn.metrics as skm

    gt = (rng.random(500) > 0.6).astype(np.uint8)
    scores = np.round(rng.random(500), 1)  # heavy ties
    np.testing.assert_allclose(
        average_precision(scores, gt),
        skm.average_precision_score(gt, scores),
        rtol=1e-9,
    )


def test_ap_batched_matches_per_sample(rng):
    """average_precision_batched row-for-row equals the scalar AP (and
    sklearn), including heavy score ties and all-negative rows."""
    import sklearn.metrics as skm

    from dilabhelmholtzoct_tpu.ops.metrics import average_precision_batched

    n, p = 11, 700
    scores = np.round(rng.random((n, p)), 1).astype(np.float32)  # ties
    labels = (rng.random((n, p)) > 0.7).astype(np.uint8)
    labels[3] = 0  # n_pos == 0 row → AP 0.0 by our convention
    batched = average_precision_batched(scores, labels, row_chunk=4)
    for j in range(n):
        np.testing.assert_allclose(
            batched[j], average_precision(scores[j], labels[j]), rtol=1e-12,
            err_msg=f"row {j}",
        )
        if labels[j].any():
            np.testing.assert_allclose(
                batched[j],
                skm.average_precision_score(labels[j], scores[j]),
                rtol=1e-9, err_msg=f"row {j} vs sklearn",
            )


def test_mean_iou_matches_hf_semantics(rng):
    """HF evaluate mean_iou per_category_{iou,accuracy}[1] equivalence,
    computed from its documented formulas (intersect/union, intersect/label)."""
    gt = (rng.random((4, 32, 32)) > 0.7).astype(np.uint8)
    pred = (rng.random((4, 32, 32)) > 0.6).astype(np.uint8)
    inter = np.sum((pred == 1) & (gt == 1))
    union = np.sum((pred == 1) | (gt == 1))
    rep = binary_report(pred, gt)
    np.testing.assert_allclose(rep["iou"], inter / union, rtol=1e-12)
    np.testing.assert_allclose(rep["accuracy"], inter / np.sum(gt == 1), rtol=1e-12)
