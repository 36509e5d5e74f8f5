"""Data layer tests: store round-trip, prompt samplers on synthetic masks
(SURVEY.md §4), bucketed collation invariants, preprocessing CLI end-to-end."""

import os

import numpy as np
import pytest

from dilabhelmholtzoct_tpu.data.sampling import (
    bucket_for,
    collate,
    sample_prompts,
)


def _blob_mask():
    """Label map with known components: class 1 two blobs, class 2 one."""
    m = np.zeros((64, 64), np.uint8)
    m[5:15, 5:15] = 1
    m[40:50, 40:55] = 1
    m[20:30, 30:38] = 2
    return m


def test_bbox_sampler_components():
    s = sample_prompts(_blob_mask(), "bboxes", np.random.default_rng(0))
    # background(1) + class1(2) + class2(1) = 4 components
    assert s.n == 4
    assert list(s.mask_values) == [0, 1, 1, 2]
    assert s.gt_masks.shape == (4, 64, 64)
    # each gt mask is a single binary component; union of class-1 masks
    # equals the class-1 region
    cls1 = (s.gt_masks[1] + s.gt_masks[2]) > 0
    np.testing.assert_array_equal(cls1, _blob_mask() == 1)
    # bboxes contain their component (jitter can only expand up to 10px
    # outward or shrink 10px inward)
    for i in range(4):
        x0, y0, x1, y1 = s.bboxes[i]
        ys, xs = np.nonzero(s.gt_masks[i])
        assert x0 >= max(0, xs.min() - 10) and x1 <= min(64, xs.max() + 10)
        assert y0 >= max(0, ys.min() - 10) and y1 <= min(64, ys.max() + 10)


def test_point_sampler_inside_component():
    s = sample_prompts(_blob_mask(), "points", np.random.default_rng(1))
    assert s.bboxes.shape == (4, 1, 2)
    for i in range(4):
        x, y = s.bboxes[i, 0]
        assert s.gt_masks[i][int(y), int(x)] == 1.0


def test_jitter_varies_with_rng():
    a = sample_prompts(_blob_mask(), "bboxes", np.random.default_rng(0))
    b = sample_prompts(_blob_mask(), "bboxes", np.random.default_rng(7))
    assert not np.array_equal(a.bboxes, b.bboxes)
    # deterministic for equal seeds
    c = sample_prompts(_blob_mask(), "bboxes", np.random.default_rng(0))
    np.testing.assert_array_equal(a.bboxes, c.bboxes)


def test_collate_buckets_and_masks():
    rng = np.random.default_rng(0)
    masks = [_blob_mask(), np.zeros((64, 64), np.uint8)]
    samples = [sample_prompts(m, "bboxes", rng) for m in masks]
    images = np.zeros((2, 64, 64, 3), np.uint8)
    batch = collate(samples, images)
    assert batch["prompts"].shape == (2, 8, 4)  # bucketed to 8
    assert batch["comp_map"].shape == (2, 64, 64)
    # device-side one-hot materialization reproduces the dense masks
    from dilabhelmholtzoct_tpu.data.sampling import gt_masks_from_comp_map

    gt = gt_masks_from_comp_map(batch["comp_map"], 8)
    assert gt.shape == (2, 8, 64, 64)
    np.testing.assert_array_equal(gt[0, :4], samples[0].gt_masks)
    # sample 0 has 4 components, sample 1 has 1 (all-background)
    np.testing.assert_array_equal(batch["n_components"], [4, 1])
    # reference ragged width = 4 → channel_mask covers 4 channels
    np.testing.assert_array_equal(batch["channel_mask"][:, :4], 1.0)
    np.testing.assert_array_equal(batch["channel_mask"][:, 4:], 0.0)
    # padded prompt slots are zero boxes (reference pad_sequence semantics)
    np.testing.assert_array_equal(batch["prompts"][1, 1:], 0.0)


def test_collate_points_labels():
    rng = np.random.default_rng(0)
    samples = [
        sample_prompts(_blob_mask(), "points", rng),
        sample_prompts(np.zeros((64, 64), np.uint8), "points", rng),
    ]
    batch = collate(samples, np.zeros((2, 64, 64, 3), np.uint8),
                    prompt_type="points")
    labels = batch["point_labels"]
    assert labels.shape == (2, 8, 1)
    # ragged region (c < 4): label 1 everywhere (ref pads with (0,0) pts)
    np.testing.assert_array_equal(labels[:, :4], 1)
    # bucket-only region: -10 (skipped by prompt encoder)
    np.testing.assert_array_equal(labels[:, 4:], -10)


def test_bucket_for():
    assert bucket_for(1) == 8
    assert bucket_for(8) == 8
    assert bucket_for(9) == 16
    assert bucket_for(100) == 64


def test_store_roundtrip(tmp_path, rng):
    from dilabhelmholtzoct_tpu.data.store import load_split, split_and_save

    images = rng.integers(0, 255, size=(10, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 5, size=(10, 32, 32), dtype=np.uint8)
    name, save_dir = split_and_save(
        images, labels, str(tmp_path), test_size=0.2, shuffle=True, seed=0
    )
    assert "preprocessed_at_" in name
    train = load_split(save_dir, "train")
    test = load_split(save_dir, "test")
    assert len(train) == 8 and len(test) == 2
    from dilabhelmholtzoct_tpu.data.store import item_arrays

    im, lb = item_arrays(train[0])
    assert im.shape == (32, 32, 3) and lb.shape == (32, 32)


def test_preprocessing_cli_custom(tmp_path, rng):
    import cv2

    raw = tmp_path / "raw" / "custom"
    (raw / "imagesgreyscale").mkdir(parents=True)
    (raw / "masks14").mkdir(parents=True)
    for i in range(5):
        img = rng.integers(0, 255, size=(496, 512, 3), dtype=np.uint8)
        msk = np.zeros((496, 512, 3), np.uint8)
        msk[100:200, 100:300] = (i % 14, i % 14, i % 14)
        cv2.imwrite(str(raw / "imagesgreyscale" / f"img{i}.png"), img)
        cv2.imwrite(str(raw / "masks14" / f"img{i}.png"), msk)
    # one wrong-size pair — must be skipped, not crash
    cv2.imwrite(str(raw / "imagesgreyscale" / "bad.png"),
                np.zeros((100, 100, 3), np.uint8))
    cv2.imwrite(str(raw / "masks14" / "bad.png"),
                np.zeros((100, 100, 3), np.uint8))

    from dilabhelmholtzoct_tpu.data.preprocessing import main

    name, save_dir = main([
        "--dataset", "custom",
        "--data_directory", str(tmp_path),
        "--test_size", "0.2",
        "--seed", "0",
    ])
    from dilabhelmholtzoct_tpu.data.store import load_split

    assert len(load_split(save_dir, "train")) == 4
    assert len(load_split(save_dir, "test")) == 1


def test_pipeline_batches():
    from dilabhelmholtzoct_tpu.data.pipeline import PromptedDataset, batches

    items = []
    for i in range(6):
        m = _blob_mask() if i % 2 == 0 else np.zeros((64, 64), np.uint8)
        items.append({
            "image": np.full((64, 64, 3), i, np.uint8),
            "label": m,
        })
    ds = PromptedDataset(items, prompt_type="bboxes", seed=0)
    got = list(batches(ds, batch_size=4, shuffle=False, num_workers=2))
    assert len(got) == 2
    assert got[0]["image"].shape == (4, 64, 64, 3)
    # pad_last (default): final partial batch padded to batch_size with
    # all-zero channel_mask rows (a single static batch shape per bucket)
    assert got[1]["image"].shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(got[1]["channel_mask"][2:], 0.0)
    unpadded = list(batches(ds, batch_size=4, num_workers=2, pad_last=False))
    assert unpadded[1]["image"].shape == (2, 64, 64, 3)
    # epochs differ (fresh jitter), same epoch reproducible
    again = list(batches(ds, batch_size=4, shuffle=False, num_workers=2))
    np.testing.assert_array_equal(got[0]["prompts"], again[0]["prompts"])
    ep1 = list(batches(ds, batch_size=4, epoch=1, num_workers=2))
    assert not np.array_equal(got[0]["prompts"], ep1[0]["prompts"])


def test_component_cache_identical_samples():
    """cache_components=True must be sample-for-sample identical to the
    uncached path across epochs (extraction is deterministic; only the
    jitter consumes RNG), and must actually hit the cache on epoch 2."""
    from dilabhelmholtzoct_tpu.data.pipeline import PromptedDataset

    items = []
    for i in range(4):
        m = _blob_mask()
        items.append({"image": np.full((64, 64, 3), i, np.uint8), "label": m})
    for prompt_type in ("bboxes", "points"):
        cached = PromptedDataset(items, prompt_type=prompt_type, seed=3)
        plain = PromptedDataset(items, prompt_type=prompt_type, seed=3,
                                cache_components=False)
        for epoch in (0, 1):
            cached.set_epoch(epoch)
            plain.set_epoch(epoch)
            for i in range(len(items)):
                a = cached.sample(i)
                b = plain.sample(i)
                np.testing.assert_array_equal(a.bboxes, b.bboxes)
                np.testing.assert_array_equal(a.comp_map, b.comp_map)
                np.testing.assert_array_equal(a.mask_values, b.mask_values)
        assert len(cached._comp_cache) == len(items)


def test_augmentation_pipeline(rng):
    from dilabhelmholtzoct_tpu.data.augment import Augmenter, make_augmenter
    from dilabhelmholtzoct_tpu.data.pipeline import PromptedDataset

    assert make_augmenter(()) is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Augmenter(["nope"])

    aug = Augmenter(["hflip", "brightness", "gaussian_noise", "shift"], p=1.0)
    img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    mask = np.zeros((32, 40), np.uint8)
    mask[5:15, 5:15] = 3
    out_i, out_m = aug(img, mask, np.random.default_rng(0))
    assert out_i.shape == img.shape and out_m.shape == mask.shape
    assert set(np.unique(out_m)) <= {0, 3}  # labels never interpolated

    # deterministic given the rng, and geometric ops move img & mask together
    flip = Augmenter(["hflip"], p=1.0)
    fi, fm = flip(img, mask, np.random.default_rng(1))
    np.testing.assert_array_equal(fi, img[:, ::-1])
    np.testing.assert_array_equal(fm, mask[:, ::-1])

    # dataset integration: augmented __getitem__ works, .sample() refuses
    ds = PromptedDataset([{"image": img, "label": mask}], augment=aug, seed=0)
    image, s = ds[0]
    assert s.n >= 1
    with _pytest.raises(AssertionError):
        ds.sample(0)


def test_preprocess_dme_mat_files(tmp_path, rng):
    """DME loader: .mat subjects, NaN masks zeroed, empty B-scans dropped
    (the reference's version is broken — missing import, undefined var)."""
    from scipy.io import savemat

    raw = tmp_path / "raw" / "dme"
    raw.mkdir(parents=True)
    for i in range(10):
        images = rng.integers(0, 255, (96, 128, 61)).astype(np.uint8)
        masks = np.zeros((96, 128, 61), np.float64)
        masks[20:40, 30:60, 0] = 3.0     # valid B-scan 0
        masks[10:30, 10:50, 5] = np.nan  # all-NaN → zeroed → dropped
        masks[50:70, 70:100, 7] = 2.0    # valid B-scan 7
        savemat(str(raw / f"Subject_{str(i+1).zfill(2)}.mat"),
                {"images": images, "manualLayers1": masks})

    from dilabhelmholtzoct_tpu.data.preprocessing import preprocess_dme

    images, labels = preprocess_dme(
        str(raw), {"use_masks": "manualLayers1", "print_status": False}
    )
    assert images.shape == (20, 96, 128, 3)  # 2 valid scans x 10 subjects
    assert labels.shape == (20, 96, 128)
    assert set(np.unique(labels)) <= {0, 2, 3}


def test_collate_caps_overflow_with_warning(rng):
    import warnings as _warnings

    from dilabhelmholtzoct_tpu.data.sampling import PromptedSample, collate

    n = 10
    s = PromptedSample(
        bboxes=rng.uniform(0, 30, (n, 4)).astype(np.float32),
        comp_map=rng.integers(0, n + 1, (16, 16)).astype(np.int32),
        mask_values=np.arange(n, dtype=np.int32),
    )
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        batch = collate([s], np.zeros((1, 16, 16, 3), np.uint8),
                        buckets=(4, 8))
        assert any("capping" in str(x.message) for x in w)
    assert batch["prompts"].shape == (1, 8, 4)
    assert batch["n_components"][0] == 8


def test_store_raw_storage_roundtrip(tmp_path, rng):
    import time as _time

    from dilabhelmholtzoct_tpu.data.store import (
        item_arrays, load_split, split_and_save,
    )

    images = rng.integers(0, 255, size=(12, 48, 56, 3), dtype=np.uint8)
    labels = rng.integers(0, 5, size=(12, 48, 56), dtype=np.uint8)
    _, d = split_and_save(images, labels, str(tmp_path), test_size=0.25,
                          shuffle=False, seed=0, storage="raw")
    train = load_split(d, "train")
    im, lb = item_arrays(train[0])
    assert im.shape == (48, 56, 3) and im.dtype == np.uint8
    assert lb.shape == (48, 56)
    np.testing.assert_array_equal(im, images[0])
    np.testing.assert_array_equal(lb, labels[0])
