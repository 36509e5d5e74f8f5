"""Host input pipeline: prompted dataset + prefetching batch iterator.

TPU-first replacement for the reference's ``SAMDataset`` + torch
``DataLoader`` (octsam/models/training_utils.py:282-287,381-458): prompt
sampling (connected components + jitter) runs in a background thread pool
while the device computes, and batches come out in static bucketed shapes.
"""

from __future__ import annotations

import concurrent.futures
from typing import Iterator

import numpy as np

from .sampling import DEFAULT_BUCKETS, PromptedSample, collate, sample_prompts
from .store import item_arrays


class PromptedDataset:
    """Per-item prompt sampling over a stored split.

    Mirrors the reference ``SAMDataset.__getitem__`` contract
    (training_utils.py:436-447): pseudocolor applied to channel 0, then
    per-component prompts extracted with fresh randomness per access.
    """

    def __init__(
        self,
        dataset,
        *,
        prompt_type: str = "bboxes",
        pseudocolor: str | None = None,
        seed: int = 0,
        augment=None,
    ):
        self.dataset = dataset
        self.prompt_type = prompt_type
        self.pseudocolor = (
            None if pseudocolor in (None, "grayscale") else pseudocolor
        )
        self._seed = seed
        self._epoch = 0
        self.augment = augment  # data/augment.Augmenter or None
        # label-only view: HF datasets decode every image column on row
        # access; prompt sampling only needs the label map, and decoding the
        # 496x512 PNG image too doubles the host cost of every epoch
        self._labels_only = None
        if hasattr(dataset, "remove_columns"):
            try:
                self._labels_only = dataset.remove_columns(["image"])
            except (ValueError, KeyError):
                pass

    def __len__(self):
        return len(self.dataset)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def image(self, idx: int) -> np.ndarray:
        image, _ = item_arrays(self.dataset[int(idx)])
        if self.pseudocolor is not None:
            from ..ops.preprocess import colormap_lut

            image = colormap_lut(self.pseudocolor)[image[:, :, 0]]
        return image

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(
            (self._seed * 1_000_003 + self._epoch * 7919 + int(idx)) & 0x7FFFFFFF
        )

    def sample(self, idx: int) -> PromptedSample:
        """Prompts only — skips image decode (embedding-cache train path).
        Unavailable with augmentation enabled (augmented geometry changes
        the image the cached embedding was computed from)."""
        assert self.augment is None, (
            "embedding cache is incompatible with data augmentation; "
            "set cache_embeddings=False"
        )
        if self._labels_only is not None:
            label = np.array(self._labels_only[int(idx)]["label"])
            if label.ndim == 3:
                label = label[..., 0]
        else:
            _, label = item_arrays(self.dataset[int(idx)])
        return sample_prompts(label, self.prompt_type, self._rng(idx))

    def __getitem__(self, idx: int) -> tuple[np.ndarray, PromptedSample]:
        image, label = item_arrays(self.dataset[int(idx)])
        rng = self._rng(idx)
        if self.augment is not None:
            image, label = self.augment(image, label, rng)
        if self.pseudocolor is not None:
            from ..ops.preprocess import colormap_lut

            image = colormap_lut(self.pseudocolor)[image[:, :, 0]]
        return image, sample_prompts(label, self.prompt_type, rng)


def batches(
    dataset: PromptedDataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    buckets=DEFAULT_BUCKETS,
    num_workers: int = 8,
    prefetch: int = 4,
    drop_last: bool = False,
    with_images: bool = True,
) -> Iterator[dict]:
    """Prefetching batch iterator with static bucketed shapes."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    dataset.set_epoch(epoch)

    chunks = [
        order[i : i + batch_size] for i in range(0, n, batch_size)
    ]
    if drop_last:
        chunks = [c for c in chunks if len(c) == batch_size]

    def build(idx_chunk):
        if with_images:
            items = [dataset[i] for i in idx_chunk]
            images = np.stack([im for im, _ in items])
            samples = [s for _, s in items]
        else:
            images = None
            samples = [dataset.sample(i) for i in idx_chunk]
        batch = collate(
            samples, images, prompt_type=dataset.prompt_type, buckets=buckets
        )
        batch["indices"] = np.asarray(idx_chunk, np.int32)
        return batch

    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
        pending = []
        it = iter(chunks)
        for _ in range(prefetch):
            try:
                pending.append(pool.submit(build, next(it)))
            except StopIteration:
                break
        while pending:
            fut = pending.pop(0)
            try:
                pending.append(pool.submit(build, next(it)))
            except StopIteration:
                pass
            yield fut.result()
