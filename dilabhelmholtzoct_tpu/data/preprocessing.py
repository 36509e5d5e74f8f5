"""Preprocessing CLI: raw images → on-disk train/test dataset.

CLI-compatible rebuild of octsam/data/preprocessing.py (flags
``--dataset {custom,dme,amd} --data_directory --test_size --shuffle
--dme_masks``, preprocessing.py:8-14) and its loaders
(preprocessing_utils.py:29-97). The reference's ``preprocess_dme`` is broken
(``loadmat`` never imported, undefined ``img`` — preprocessing_utils.py:45,57);
ours implements what that code intends. ``amd`` stays NotImplementedError
for parity (preprocessing_utils.py:89-90).

Usage:
    python -m dilabhelmholtzoct_tpu.data.preprocessing \
        --dataset custom --data_directory /vol/data/datasets
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .store import split_and_save, timestamp

CUSTOM_SHAPE = (496, 512, 3)  # shape gate, preprocessing_utils.py:76


def preprocess_custom(raw_data_path: str, config: dict):
    """Load ``imagesgreyscale/`` + ``masks14/`` PNG pairs, keep channel 0 of
    the mask, skip any pair not exactly 496x512x3."""
    import cv2

    img_dir = os.path.join(raw_data_path, "imagesgreyscale")
    mask_dir = os.path.join(raw_data_path, "masks14")
    images, masks = [], []
    for filename in sorted(os.listdir(img_dir)):
        image = cv2.imread(os.path.join(img_dir, filename))
        mask = cv2.imread(os.path.join(mask_dir, filename))
        if image is None or mask is None:
            continue
        if mask.shape != CUSTOM_SHAPE or image.shape != CUSTOM_SHAPE:
            if config.get("print_status"):
                print(f"Skipped image of different size! {filename} "
                      f"{mask.shape if mask is not None else None} {image.shape}")
            continue
        images.append(image)
        masks.append(mask[:, :, 0])
    if not images:
        raise FileNotFoundError(f"no valid image/mask pairs under {raw_data_path}")
    return np.stack(images), np.stack(masks)


def preprocess_dme(raw_data_path: str, config: dict):
    """Chiu-2015 DME: 10 subjects x 61 B-scans from .mat; drop empty masks."""
    from scipy.io import loadmat

    use_masks = config.get("use_masks", "manualLayers1")
    images, masks = [], []
    for i in range(10):
        number = str(i + 1).zfill(2)
        if config.get("print_status"):
            print("subject" + number)
        subject = loadmat(os.path.join(raw_data_path, f"Subject_{number}.mat"))
        s_images = subject["images"]
        s_masks = np.nan_to_num(np.asarray(subject[use_masks], np.float32))
        # The loader's semantics (slice axis 2, use as an (H, W) per-pixel
        # class map) only fit PER-PIXEL mask arrays like manualFluid1
        # ((H, W, 61) in Chiu-2015). The reference's default
        # --dme_masks=manualLayers1 is (8, W, 61) layer-boundary ROW
        # INDICES up to H-1 — not a mask; slicing it would produce
        # shape-mismatched labels whose values silently wrap in uint8.
        # (The reference's own dme loader never ran — missing loadmat
        # import / undefined `img`, preprocessing_utils.py:45,57 — so
        # there is no working behavior to replicate; fail loudly.)
        if s_masks.shape[:2] != s_images.shape[:2]:
            raise ValueError(
                f"--dme_masks={use_masks!r} has shape {s_masks.shape}, "
                f"which is not a per-pixel mask for images of shape "
                f"{s_images.shape}; use a per-pixel key such as "
                f"'manualFluid1'"
            )
        if s_masks.max() > 255:
            raise ValueError(
                f"--dme_masks={use_masks!r} holds values up to "
                f"{s_masks.max():.0f}, which do not fit uint8 class labels"
            )
        for j in range(s_masks.shape[2]):
            mask = s_masks[:, :, j]
            if np.sum(mask) == 0:
                continue
            image = s_images[:, :, j]
            images.append(np.repeat(image[:, :, None], 3, axis=2))
            masks.append(mask.astype(np.uint8))
    return np.stack(images), np.stack(masks)


def preprocess_amd(raw_data_path: str, config: dict):
    raise NotImplementedError()  # parity: preprocessing_utils.py:89-90


_LOADERS = {
    "custom": preprocess_custom,
    "dme": preprocess_dme,
    "amd": preprocess_amd,
}


def preprocess(dataset, raw_data_path, processed_data_path, config):
    if dataset not in _LOADERS:
        raise ValueError("dataset is not implemented")
    config.get("print_status") and print("Start preprocessing")
    images, masks = _LOADERS[dataset](raw_data_path, config)
    config.get("print_status") and print(
        "Preprocessed images and masks. Now creating dataset"
    )
    name, save_dir = split_and_save(
        images,
        masks,
        processed_data_path,
        test_size=config["test_size"],
        shuffle=config["shuffle"],
        file_description=config.get("additional_file_description", "default_"),
        time=config.get("time"),
        seed=config.get("seed"),
        storage=config.get("storage", "png"),
    )
    config.get("print_status") and print(f"Finished. Dataset name is {name}")
    return name, save_dir


from ..utils.flags import str2bool as _str2bool  # shared strict parser


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="custom")
    parser.add_argument("--data_directory", type=str, default="/vol/data/datasets")
    parser.add_argument("--test_size", type=float, default=0.2)
    parser.add_argument("--shuffle", type=_str2bool, default=True)
    parser.add_argument("--dme_masks", type=str, default="manualLayers1")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--storage", type=str, default="png",
                        choices=["png", "raw"],
                        help="'raw' stores arrow tensors (~20x faster "
                             "build/read, larger on disk)")
    args = parser.parse_args(argv)

    raw_data_path = os.path.join(args.data_directory, "raw", args.dataset)
    processed_data_path = os.path.join(args.data_directory, "processed", args.dataset)

    config = {
        "test_size": args.test_size,
        "shuffle": args.shuffle,
        "time": timestamp(),
        "print_status": True,
        "additional_file_description": "default_",
        "seed": args.seed,
        "storage": args.storage,
    }
    if args.dataset == "dme":
        config["use_masks"] = args.dme_masks
        config["additional_file_description"] = args.dme_masks + "_"
    return preprocess(args.dataset, raw_data_path, processed_data_path, config)


if __name__ == "__main__":
    main()
