"""Dataset store: the reference's on-disk contract.

Keeps the exact interchange format the reference produces/consumes — a HF
``DatasetDict{train, test}`` of ``{image, label}`` saved to disk with
timestamped names (octsam/data/preprocessing_utils.py:19-25,92-97;
consumed via ``datasets.load_from_disk`` at training_utils.py:283) — so
datasets preprocessed by either framework are interchangeable.
"""

from __future__ import annotations

import datetime
import os

import numpy as np


def timestamp() -> str:
    """Reference timestamp format (preprocessing.py:6)."""
    return datetime.datetime.now().strftime("%y-%m-%d_%H.%M.%S")


def create_dataset(images: np.ndarray, labels: np.ndarray,
                   storage: str = "png"):
    """(N, H, W, 3) images + (N, H, W) labels → HF Dataset{image, label}.

    storage='png' keeps the reference's interchange format (HF Image
    feature; ~2s/100 images to encode). storage='raw' stores uint8 arrow
    tensors instead — ~20x faster to build and read, larger on disk; the
    loaders (item_arrays) handle both transparently."""
    from datasets import Array2D, Array3D, Dataset, Features, Image

    if storage == "raw":
        n, h, w, c = images.shape
        features = Features({
            "image": Array3D(shape=(h, w, c), dtype="uint8"),
            "label": Array2D(shape=(h, w), dtype="uint8"),
        })
        return Dataset.from_dict(
            {"image": images, "label": labels}, features=features
        )
    ds = Dataset.from_dict({"image": list(images), "label": list(labels)})
    ds = ds.cast_column("image", Image())
    ds = ds.cast_column("label", Image())
    return ds


def split_and_save(
    images,
    labels,
    processed_data_path: str,
    *,
    test_size: float = 0.2,
    shuffle: bool = True,
    file_description: str = "default_",
    time: str | None = None,
    seed: int | None = None,
    storage: str = "png",
):
    """train/test split + save; returns (dataset_name, save_directory).

    Name format matches the reference:
    ``{description}preprocessed_at_{time}`` (preprocessing_utils.py:22).
    """
    ds = create_dataset(images, labels, storage=storage)
    split = ds.train_test_split(test_size=test_size, shuffle=shuffle, seed=seed)
    name = f"{file_description}preprocessed_at_{time or timestamp()}"
    save_dir = os.path.join(processed_data_path, name)
    split.save_to_disk(save_dir)
    return name, save_dir


def load_split(dataset_path: str, split: str):
    """Load one split; returns a sequence of {'image', 'label'} items."""
    import datasets

    return datasets.load_from_disk(dataset_path)[split]


def item_arrays(item) -> tuple[np.ndarray, np.ndarray]:
    """A dataset item → (image (H,W,3) uint8, label (H,W) uint8).

    Handles both storage formats: Image features (PIL) and raw arrow
    tensors (returned as nested lists → int64 without the cast)."""
    image = np.asarray(item["image"], dtype=None)
    label = np.asarray(item["label"], dtype=None)
    if image.dtype != np.uint8:
        image = image.astype(np.uint8)
    if label.dtype != np.uint8:
        label = label.astype(np.uint8)
    if label.ndim == 3:
        label = label[..., 0]
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    return image, label
