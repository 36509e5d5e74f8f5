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

from .sampling import (
    DEFAULT_BUCKETS,
    PromptedSample,
    collate,
    extract_for_sampling,
    prompts_from_extraction,
    sample_prompts,
)
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
        cache_components: bool = True,
    ):
        self.dataset = dataset
        self.prompt_type = prompt_type
        self.pseudocolor = (
            None if pseudocolor in (None, "grayscale") else pseudocolor
        )
        self._seed = seed
        self._epoch = 0
        self.augment = augment  # data/augment.Augmenter or None
        # Cross-epoch cache of the deterministic component extraction
        # (label decode + C++ CCL/bboxes, ~25 ms/img on one core): the
        # labeling is a pure function of the label map, only the jitter /
        # point draws need per-epoch randomness (sampling.py). Disabled
        # under augmentation (the label map changes every epoch). ~0.5 MB
        # per cached 496x512 item.
        self._comp_cache: dict | None = (
            {} if (cache_components and augment is None) else None
        )
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
        # SeedSequence hash-mixes the three keys: a linear combination like
        # seed*K1 + epoch*K2 + idx collides across epochs once the dataset
        # outgrows K2 (item i at epoch e+1 replays item i+K2's stream at e)
        return np.random.default_rng(
            np.random.SeedSequence([self._seed, self._epoch, int(idx)])
        )

    def _label(self, idx: int) -> np.ndarray:
        if self._labels_only is not None:
            label = np.array(self._labels_only[int(idx)]["label"])
            if label.ndim == 3:
                label = label[..., 0]
            return label
        _, label = item_arrays(self.dataset[int(idx)])
        return label

    def _sample_cached(self, idx, rng, label=None) -> PromptedSample:
        """Prompt sampling with the cross-epoch component cache."""
        if self._comp_cache is None:
            if label is None:
                label = self._label(idx)
            return sample_prompts(label, self.prompt_type, rng)
        hit = self._comp_cache.get(idx)
        if hit is None:
            if label is None:
                label = self._label(idx)
            native = extract_for_sampling(label)
            if native is None:  # no native lib: fall back, uncached
                return sample_prompts(label, self.prompt_type, rng)
            hit = (native, label.shape)
            self._comp_cache[idx] = hit
        return prompts_from_extraction(hit[0], hit[1], self.prompt_type, rng)

    def sample(self, idx: int) -> PromptedSample:
        """Prompts only — skips image decode (embedding-cache train path).
        Unavailable with augmentation enabled (augmented geometry changes
        the image the cached embedding was computed from)."""
        assert self.augment is None, (
            "embedding cache is incompatible with data augmentation; "
            "set cache_embeddings=False"
        )
        return self._sample_cached(int(idx), self._rng(idx))

    def comp_map(self, idx: int) -> np.ndarray:
        """(H, W) int32 component-slot map for one item — deterministic
        (RNG-free), so the trainer can stage all maps on device once and
        gather rows per batch instead of re-uploading 8 MB of int32 per
        step (large sustained host->device traffic degrades the axon
        tunnel: epochs were measured drifting 5s -> 50s)."""
        assert self.augment is None
        sample = self._sample_cached(int(idx), np.random.default_rng(0))
        return sample.comp_map

    def __getitem__(self, idx: int) -> tuple[np.ndarray, PromptedSample]:
        image, label = item_arrays(self.dataset[int(idx)])
        rng = self._rng(idx)
        if self.augment is not None:
            image, label = self.augment(image, label, rng)
        if self.pseudocolor is not None:
            from ..ops.preprocess import colormap_lut

            image = colormap_lut(self.pseudocolor)[image[:, :, 0]]
        return image, self._sample_cached(int(idx), rng, label=label)


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
    pad_last: bool = True,
) -> Iterator[dict]:
    """Prefetching batch iterator with static bucketed shapes.

    pad_last=True pads the final partial batch up to ``batch_size`` with
    zero rows whose ``channel_mask`` is all-zero (excluded from every
    masked loss term — math identical to the reference's smaller last
    batch). Without it, a shuffled run keeps meeting new
    (bucket, last-batch-size) shape combinations and pays a fresh XLA
    compile mid-training — measured as epochs degrading 9s -> 42s.
    """
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
        pad = batch_size - len(idx_chunk)
        if pad_last and pad > 0:
            for k, v in batch.items():
                batch[k] = np.concatenate(
                    [v, np.zeros((pad, *v.shape[1:]), v.dtype)]
                )
            # pad rows get a -1 sentinel index, NOT 0 (a real sample id):
            # an indices consumer that forgets to check channel_mask should
            # fail loudly instead of silently double-counting sample 0
            batch["indices"][len(idx_chunk):] = -1
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
