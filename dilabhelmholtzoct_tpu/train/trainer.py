"""MedSAM-style decoder-only fine-tuning loop, TPU-first.

Capability parity with the reference training loop (octsam/models/
training_utils.py:27-80): frozen image/prompt encoders, Adam on the mask
decoder only (training_utils.py:31,277-279), DiceCE (+ optional topological)
loss on postprocessed masks, per-epoch train/valid logging with the
reference's metric names, checkpointing, sample display, final evaluation.

TPU-first design differences (documented divergences):
  * The whole train step — preprocess, forward, postprocess, loss, backward,
    Adam — is ONE jitted XLA program; gradients only exist for the decoder
    subtree (the reference zeroes grads on frozen modules instead).
  * Optional (default-on) **image-embedding cache**: the encoder is frozen,
    so its output per image is constant across epochs. We encode the dataset
    once and train the decoder against cached embeddings — numerically
    identical to recomputing the encoder every step (which the reference
    does), but ~25x less compute per step for ViT-B.
  * Ragged per-image prompt counts are bucketed to static shapes with
    channel masks that reproduce the reference's ``pad_sequence`` loss math
    exactly (see ops/losses.py, data/sampling.py).
  * Per-epoch checkpoints + resume (the reference saves once at the very
    end, training_utils.py:77).
  * Reference bugs NOT replicated: first-batch skip (training_utils.py:42-44)
    and validation-loss double count (training_utils.py:371-376).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import PromptedDataset, batches
from ..data.sampling import DEFAULT_BUCKETS, gt_masks_from_comp_map
from ..models.configs import SamConfig, config_for
from ..models.sam import (
    decode_masks,
    encode_image,
    encode_image_microbatched,
    encode_prompts,
    image_wide_pe,
    init_params,
)
from ..ops.losses import segmentation_loss
from ..ops.postprocess import postprocess_masks_blocked
from ..ops.preprocess import preprocess_image, rescale_boxes, rescale_coords
from ..utils import checkpoint as ckpt_utils
from ..utils.logging import MultiLogger, make_logger


@dataclass
class TrainConfig:
    """Typed config carrying the reference's flag surface (training.py:107-127)
    plus TPU-specific knobs."""

    base_model: str = "facebook/sam-vit-base"
    dataset: str = ""  # path to processed DatasetDict
    checkpoint: str = "checkpoints"  # output dir
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    epochs: int = 10
    batch_size: int = 2
    shuffle: bool = False
    optimizer: str = "adam"
    loss: str = "diceCE"
    prompt_type: str = "bboxes"
    pseudocolor: str | None = None  # colormap name or None/grayscale
    topological: bool = False
    evaluate: bool = True
    eval_device: str = "default"  # "default" | "cpu" — SURVEY parity
    #   decision: the reference's evaluate_metrics never moves the model to
    #   the GPU (training_utils.py:83-85), so its eval always runs on CPU.
    #   "cpu" replicates that placement as an option; "default" keeps eval
    #   on the accelerator (the TPU-native default).
    display_name: str = "run"
    time: str = ""
    display_mode: str = "none"
    display_idx: tuple[int, ...] = (0, 1, 3)
    display_train_nr: int = 1
    display_val_nr: int = 1
    mask_dict: dict[int, str] = field(default_factory=dict)
    # --- TPU-native knobs (no reference equivalent) ---
    pretrained_checkpoint: str | None = None  # HF .pt/.safetensors on disk
    cache_embeddings: bool = True
    compute_dtype: str = "bfloat16"
    ckpt_keep: int = 3  # newest per-epoch checkpoints retained (0 = all);
    #   full-state ViT-L/H checkpoints are GBs each — unbounded retention
    #   fills the volume mid-run
    buckets: tuple[int, ...] = DEFAULT_BUCKETS
    seed: int = 0
    resume: bool = False
    log_jsonl: str | None = None
    use_wandb: bool = False
    # wandb.init identity (reference: training.py:173-180 — project/entity/
    # run-name/config/save_code all forwarded)
    project_name: str = "OCT-TPU-experiments"
    entity: str | None = None
    wandb_dir: str | None = None  # reference hardcodes "/vol/data/runs"
    topo_lamda: float = 0.1
    topo_feat_d: int = 1
    topo_interp: int = 50
    topo_pipeline: bool = True  # overlap host persistence-pairing with
    #   device compute via a one-batch delay (pairing one param-step
    #   stale; loss/grad values still use current params; first step
    #   exact). False = synchronous two-phase, exact reference step
    #   ordering. Default flipped to True in round 3 after two
    #   convergence studies (tools/topo_pipeline_study.py; BASELINE.md
    #   "topo_pipeline study") showed sync-vs-pipelined loss curves are
    #   statistically indistinguishable (branch deltas ~1e-3 for ~10
    #   epochs from a shared warm start, final valid 2.03±0.12 vs
    #   2.05±0.14, identical final Dice; when step-to-step pairings
    #   stabilize the two modes are bit-identical) while pipelined is
    #   ~1.17x faster per step (153.0 vs 179.1 ms, BASELINE.md round-3
    #   config-4 row).
    topo_device: bool = True  # compute the topological pairing + matching
    #   ON DEVICE inside the jitted step (ops/topology_device.py: batched
    #   union-find persistence + lane-lockstep Jonker-Volgenant matching as
    #   XLA while_loops) instead of the two-phase host protocol. Removes
    #   the per-step device->host grid fetch, the pipelining staleness, and
    #   the host union-find bound — and is multihost-compatible (the host
    #   pairing is not). Loss/grad equality vs the host path is pinned in
    #   tests/test_topology_device.py; step-level equality in
    #   tests/test_training.py::test_topo_device_mode_matches_host.
    #   DEFAULT since round 5 (was the opt-in mode in round 4): it is
    #   simultaneously the most reference-exact (no pairing staleness — the
    #   reference pairs inside the step, topological_loss.py:55-82 invoked
    #   at training_utils.py:63-64), the fastest measured on TPU (37.7 ms
    #   vs 97 ms pipelined-host in the same bench run, BENCH_r04), and the
    #   only multihost-compatible mode. `--topo_device false` restores the
    #   host protocol; with it, topo_pipeline picks pipelined vs sync
    #   (sync = literal reference step ordering on the host path).
    topo_true_cache: bool = True  # cache GT-side persistence diagrams
    #   across epochs (exact: targets are constant; auto-disabled under
    #   augmentation). Skips the target persistence, the gt one-hot
    #   phase-A work, and the target-grid download from epoch 2 on.
    export_pt: bool = False  # write reference-format .pt (imports torch)
    encoder_microbatch: int = 1  # images encoded per sequential chunk
    data_transforms: tuple[str, ...] = ()  # augment ops (train split only)
    data_parallel: bool = True  # shard batches over all local devices
    multihost: bool = False  # bootstrap jax.distributed (multi-process DP);
    #   coordinator/process identity from args or JAX_COORDINATOR_ADDRESS /
    #   JAX_NUM_PROCESSES / JAX_PROCESS_ID (parallel/distributed.py)
    trainable: str = "decoder"  # "decoder" (reference parity) | "all"
    #   "all" unfreezes the encoders (BASELINE.md config 5, e.g. ViT-L
    #   encoder fine-tune): requires cache_embeddings=False; encoder runs
    #   with layer remat and the XLA attention path (the flash kernel is
    #   forward-only).
    profile_dir: str | None = None  # capture an XLA trace of epoch 0
    # parity mode: recompute the encoder inside every step like the reference
    # (cache_embeddings=False) is triggered via that flag.


def prepare_model(config: TrainConfig) -> tuple[SamConfig, dict]:
    """Model config + params (reference: prepare_model, training_utils.py:273).

    Loads a local HF checkpoint when ``pretrained_checkpoint`` is given;
    otherwise random-initializes (offline environments without SAM weights
    on disk — the scale of initialization follows HF's)."""
    cfg = config_for(config.base_model)
    if config.pretrained_checkpoint:
        from ..models.convert import load_pretrained

        params = load_pretrained(config.pretrained_checkpoint, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = init_params(jax.random.PRNGKey(config.seed), cfg)
    return cfg, params


def _split_params(params: dict, trainable: str = "decoder") -> tuple[dict, dict]:
    """(trainable subtree, frozen rest).

    "decoder" mirrors the reference's optimizer scope
    ``model.mask_decoder.parameters()`` (training_utils.py:31) with frozen
    vision/prompt encoders (training_utils.py:277-279); "all" trains the
    whole model (encoder fine-tuning)."""
    if trainable == "all":
        return params, {}
    decoder = params["decoder"]
    frozen = {k: v for k, v in params.items() if k != "decoder"}
    return decoder, frozen


def _merge_params(trainable_tree: dict, frozen: dict) -> dict:
    if not frozen:
        return trainable_tree
    params = dict(frozen)
    params["decoder"] = trainable_tree
    return params


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """torch ``Adam(lr, weight_decay)`` equivalence: L2 term added to the
    gradient before the Adam moments (optax.add_decayed_weights → adam)."""
    opt = config.optimizer.lower()
    if opt == "adam":
        core = optax.adam(config.learning_rate)
    elif opt == "adamw":
        return optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
    elif opt == "sgd":
        core = optax.sgd(config.learning_rate)
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")
    if config.weight_decay:
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay), core
        )
    return core


def _forward_from_embeddings(
    decoder_params,
    frozen_params,
    cfg: SamConfig,
    embeddings,  # (B, G, G, C)
    batch,
    orig_hw,
    prompt_type: str,
):
    """Prompt-encode → decode → postprocess → (B, C, H, W) logits."""
    params = _merge_params(decoder_params, frozen_params)
    b = embeddings.shape[0]
    size = cfg.vision.image_size
    if prompt_type == "points":
        pts = rescale_coords(batch["prompts"], orig_hw, size)
        sparse, dense = encode_prompts(
            params, cfg, b,
            points=pts, labels=batch["point_labels"],
            dtype=embeddings.dtype,
        )
    else:
        boxes = rescale_boxes(batch["prompts"], orig_hw, size)
        sparse, dense = encode_prompts(
            params, cfg, b, boxes=boxes, dtype=embeddings.dtype
        )
    pe = image_wide_pe(params, cfg)
    low_res, _ = decode_masks(
        params, cfg, embeddings, pe, sparse, dense, multimask_output=False,
        blocked=True,
    )
    low_res = low_res[:, :, 0]  # squeeze(2) in the reference
    return postprocess_masks_blocked(low_res, orig_hw, model_size=size)


def _cast_floats(tree, dtype):
    """Mixed precision: master params stay f32 (optimizer math); all forward
    compute runs in ``compute_dtype``. Inside a grad closure the cast makes
    gradients arrive back in f32. Must be applied to EVERY forward's params
    (train loss, topo phase A, eval): f32 leaves promote every activation
    back to f32 and silently bypass the bf16-gated fused Pallas kernels —
    round 1's 'bf16' benchmark actually measured f32 because only
    pixel_values were cast."""
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _loss_from_masks(masks, batch, config: TrainConfig, pairing=None):
    """DiceCE (+ topological) loss. The topological term uses the two-phase
    pairing protocol (ops/topology.py): the combinatorial pairing arrives
    precomputed in ``pairing`` because the axon TPU runtime cannot run host
    callbacks inside jit."""
    gt_masks = gt_masks_from_comp_map(batch["comp_map"], masks.shape[1])
    loss = segmentation_loss(config.loss)(
        masks, gt_masks, batch["channel_mask"]
    )
    if config.topological and config.topo_device:
        from ..ops.topology_device import topo_loss_device

        loss = loss + topo_loss_device(
            jax.nn.sigmoid(masks.astype(jnp.float32)),
            gt_masks,
            config.topo_lamda,
            interp=config.topo_interp,
            feat_d=config.topo_feat_d,
            channel_mask=batch["channel_mask"],
        )
    elif config.topological and pairing is not None:
        from ..ops.topology import topo_loss_from_pairing

        loss = loss + topo_loss_from_pairing(
            jax.nn.sigmoid(masks.astype(jnp.float32)),
            pairing,
            config.topo_lamda,
            interp=config.topo_interp,
            channel_mask=batch["channel_mask"],
        )
    return loss


_EMPTY_DIAG = np.zeros((0, 2), np.float32)

# Active-row gather: the host knows channel_mask, so inactive (bucket-
# padding) rows never need to cross the tunnel — the grids are gathered
# on device to a padded (R, interp, interp) buffer before the fetch.
# Sustained device->host transfers on this tunnel degrade to a few MB/s
# (docs/ROADMAP.md), so bytes, not latency, bound the pipelined step;
# topo_profile measured the grid fetch at p50 40.6 ms/step. Exact: the
# skipped rows' pairing entries are already zeroed/ignored (row_mask +
# channel_mask in the loss). R is padded to a multiple of 16 so the tiny
# gather program compiles for at most bucket*B/16 distinct shapes.
_gather_rows = jax.jit(lambda g, idx: g.reshape((-1,) + g.shape[2:])[idx])


class _TopoHostPairer:
    """Host half of the two-phase topological protocol, shared by the train
    and eval steps: cross-epoch GT-diagram cache (exact — the targets are
    component masks from the extraction cache, constant across epochs;
    prompts re-jitter but GT does not; disabled under augmentation, where GT
    masks change per epoch), bucket-padding row skip via row_mask, and the
    active-row device gather above. Callers feed the HOST batch (sample
    indices + channel mask) through ``set_host_batch`` before each step;
    bench/profiler callers that skip this get the legacy no-cache path."""

    def __init__(self, config: TrainConfig):
        self.config = config
        self.use_cache = config.topo_true_cache and not config.data_transforms
        self.cache: dict[int, list] = {}
        self.meta = None

    def set_host_batch(self, batch):
        idxs = batch.get("indices")
        self.meta = (
            None if idxs is None else [int(i) for i in np.asarray(idxs)],
            np.asarray(batch["channel_mask"]),
        )

    def cache_hit(self, meta):
        if not (self.use_cache and meta is not None
                and meta[0] is not None):
            return False
        # padding rows (index sentinel -1, all-zero channel_mask) need no
        # cached diagrams — requiring them would keep every padded batch on
        # the miss path forever
        counts = np.asarray(meta[1]).sum(axis=1)
        return all(
            ix in self.cache
            for ix, cnt in zip(meta[0], counts) if cnt > 0
        )

    @staticmethod
    def active_sel(cmask):
        """(idx (R,) int32 padded, n_real) or None when nothing is saved."""
        flat = cmask.reshape(-1)
        rows = np.flatnonzero(flat > 0)
        r_pad = max(16, -(-len(rows) // 16) * 16)
        if r_pad >= flat.size:
            return None
        idx = np.zeros(r_pad, np.int32)
        idx[:len(rows)] = rows
        return idx, len(rows)

    def pair(self, pred50, true50, meta=None, sel=None):
        from ..ops.topology import host_pairing, true_diagrams_from_grids

        config = self.config
        if sel is not None:  # gathered cache-hit path: only active rows
            idxs, cmask = meta
            bucket = cmask.shape[1]
            idx, n_real = sel
            pred_sub = np.asarray(jax.device_get(pred50))  # (R, i, i)
            rows = idx[:n_real]
            diagrams = [
                self.cache[idxs[r // bucket]][r % bucket]
                if (r % bucket) < len(self.cache[idxs[r // bucket]])
                else _EMPTY_DIAG
                for r in rows
            ]
            row_mask = (np.arange(len(idx)) < n_real).astype(np.float32)
            sub = host_pairing(
                pred_sub, None, feat_d=config.topo_feat_d,
                true_diagrams=diagrams + [_EMPTY_DIAG] * (len(idx) - n_real),
                row_mask=row_mask,
            )
            n = cmask.size
            k = sub["p_birth"].shape[1]
            full = {
                "p_birth": np.full((n, k), -1, np.int32),
                "p_death": np.full((n, k), -1, np.int32),
                "matched": np.zeros((n, k), np.int8),
                "target": np.zeros((n, k, 2), np.float32),
                "const_term": np.zeros((n,), np.float32),
            }
            for key in full:
                full[key][rows] = sub[key][:n_real]
            return jax.device_put(full)

        if meta is None or meta[0] is None or not self.use_cache:
            # legacy path (bench/profilers): both grids fetched, no cache
            pred50, true50 = jax.device_get((pred50, true50))
            b, c = pred50.shape[:2]
            pairing = host_pairing(
                pred50.reshape(b * c, *pred50.shape[2:]),
                true50.reshape(b * c, *true50.shape[2:]),
                feat_d=config.topo_feat_d,
                row_mask=(meta[1].reshape(-1) if meta is not None else None),
            )
            return jax.device_put(pairing)

        idxs, cmask = meta
        bucket = cmask.shape[1]
        if true50 is None:  # cache hit: assemble per-row GT diagrams
            pred50 = np.asarray(jax.device_get(pred50))
            diagrams = []
            for ix in idxs:
                # .get: padding rows (ix == -1, zero channel_mask) have no
                # cache entry; their empty diagrams are row_mask-inert
                slots = self.cache.get(ix, [])
                diagrams.extend(
                    slots[s] if s < len(slots) else _EMPTY_DIAG
                    for s in range(bucket)
                )
        else:  # miss: compute once, fill the cache
            pred50, true50 = jax.device_get((pred50, true50))
            b, c = pred50.shape[:2]
            diagrams = true_diagrams_from_grids(
                true50.reshape(b * c, *true50.shape[2:]),
                config.topo_feat_d,
            )
            for bi, ix in enumerate(idxs):
                cnt = int(cmask[bi].sum())
                if cnt == 0:
                    # PADDING rows (pipeline pad_last / DP pad_host_batch)
                    # carry index 0 with an all-zero channel_mask. Never
                    # cache them: overwriting would clobber sample 0's real
                    # diagrams, and even writing an empty list when sample 0
                    # is not yet cached could later satisfy cache_hit with
                    # wrong (empty) diagrams for the real sample 0.
                    continue
                self.cache[ix] = [diagrams[bi * c + s] for s in range(cnt)]
        b, c = pred50.shape[:2]
        pairing = host_pairing(
            pred50.reshape(b * c, *pred50.shape[2:]), None,
            feat_d=config.topo_feat_d, true_diagrams=diagrams,
            row_mask=cmask.reshape(-1),
        )
        return jax.device_put(pairing)


def make_train_step(
    cfg: SamConfig,
    config: TrainConfig,
    optimizer,
    orig_hw: tuple[int, int],
    from_embeddings: bool,
):
    """Build the jitted train step. Two variants:

    * from_embeddings=True: batch carries cached image embeddings.
    * from_embeddings=False: batch carries uint8 images; the frozen encoder
      runs inside the step (reference-exact path) under stop_gradient.
    """
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32

    train_encoder = config.trainable == "all"

    cast_tree = functools.partial(_cast_floats, dtype=dtype)

    def get_embeddings(decoder_params, frozen_params, batch):
        if from_embeddings:
            return batch["embeddings"].astype(dtype)
        pix, _ = preprocess_image(
            batch["image"], target_size=cfg.vision.image_size, dtype=dtype
        )
        params_f = cast_tree(_merge_params(decoder_params, frozen_params))
        if train_encoder:
            # gradient flows through the encoder: remat each layer; the
            # packed flash kernel is differentiable (custom VJP with
            # blockwise recompute), so memory stays O(N·d) per layer
            return encode_image(params_f, pix, cfg, remat=True)
        return jax.lax.stop_gradient(
            encode_image_microbatched(params_f, pix, cfg,
                                      config.encoder_microbatch))

    def loss_fn(decoder_params, frozen_params, embeddings, batch, pairing):
        if embeddings is None:
            # trainable='all': the encoder must run INSIDE the grad closure
            embeddings = get_embeddings(decoder_params, frozen_params, batch)
        masks = _forward_from_embeddings(
            cast_tree(decoder_params), cast_tree(frozen_params), cfg,
            embeddings, batch, orig_hw, config.prompt_type,
        )
        return _loss_from_masks(masks, batch, config, pairing)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(decoder_params, opt_state, frozen_params, batch, pairing=None):
        embeddings = (
            None if train_encoder
            else get_embeddings(decoder_params, frozen_params, batch)
        )
        loss, grads = jax.value_and_grad(loss_fn)(
            decoder_params, frozen_params, embeddings, batch, pairing
        )
        updates, opt_state = optimizer.update(
            grads, opt_state, params=decoder_params
        )
        decoder_params = optax.apply_updates(decoder_params, updates)
        return decoder_params, opt_state, loss

    if not config.topological or config.topo_device:
        # topo_device: the topological term runs inside `step` itself
        # (_loss_from_masks), so no two-phase machinery is needed
        return step

    # Two-phase topological mode: phase A produces the downsampled grids for
    # the host pairing; phase B (`step`) consumes the pairing arrays.
    @jax.jit
    def fwd_grids(decoder_params, frozen_params, batch):
        embeddings = get_embeddings(decoder_params, frozen_params, batch)
        # cast like loss_fn does: phase A must run at the same compute
        # dtype as phase B so the host pairing is computed from the exact
        # grids the loss consumes (and so bf16 keeps the fused kernels on)
        masks = _forward_from_embeddings(
            cast_tree(decoder_params), cast_tree(frozen_params), cfg,
            embeddings, batch, orig_hw, config.prompt_type,
        )
        from ..ops.topology import downsample_for_topo

        gt_masks = gt_masks_from_comp_map(batch["comp_map"], masks.shape[1])
        return downsample_for_topo(
            jax.nn.sigmoid(masks.astype(jnp.float32)),
            gt_masks,
            config.topo_interp,
        )

    @jax.jit
    def fwd_grids_pred(decoder_params, frozen_params, batch):
        # cache-hit variant: the GT-side diagrams are already cached, so
        # neither the gt one-hot materialization nor the true-grid
        # download happens
        embeddings = get_embeddings(decoder_params, frozen_params, batch)
        masks = _forward_from_embeddings(
            cast_tree(decoder_params), cast_tree(frozen_params), cfg,
            embeddings, batch, orig_hw, config.prompt_type,
        )
        from ..ops.topology import downsample_grid

        return downsample_grid(
            jax.nn.sigmoid(masks.astype(jnp.float32)), config.topo_interp
        )

    pairer = _TopoHostPairer(config)

    def _fwd_for_meta(decoder_params, frozen_params, batch, meta):
        """Returns (pred_grids, true_grids_or_None, active_sel_or_None)."""
        if pairer.cache_hit(meta):
            pred = fwd_grids_pred(decoder_params, frozen_params, batch)
            sel = pairer.active_sel(meta[1])
            if sel is not None:
                pred = _gather_rows(pred, jnp.asarray(sel[0]))
            return pred, None, sel
        return (*fwd_grids(decoder_params, frozen_params, batch), None)

    def topo_step(decoder_params, opt_state, frozen_params, batch):
        meta = pairer.meta
        pred50, true50, sel = _fwd_for_meta(
            decoder_params, frozen_params, batch, meta)
        pairing = pairer.pair(pred50, true50, meta, sel)
        return step(decoder_params, opt_state, frozen_params, batch, pairing)

    if not config.topo_pipeline:
        topo_step.set_host_batch = pairer.set_host_batch
        return topo_step

    # Pipelined (opt-in) topological mode: one-batch delay. Batch k's
    # grids are produced at the CURRENT params and dispatched immediately;
    # while the device computes them, the host pairs the PREVIOUS batch's
    # grids and dispatches its full step. The pairing a step consumes is
    # therefore computed at params one update older than the step sees —
    # only the combinatorial matching is stale; the loss/gradient values
    # still flow through the current parameters (the reference recomputes
    # the matching per step; λ=0.1 makes the one-step staleness
    # negligible). Hides the host persistence work (~70 ms/step of the
    # synchronous mode) behind device time. Returns loss=None for the
    # deferred batch; callers must call .flush() after the batch loop.
    state = {"pending": None}

    def topo_step_pipelined(decoder_params, opt_state, frozen_params, batch):
        meta = pairer.meta
        grids = _fwd_for_meta(decoder_params, frozen_params, batch, meta)
        for g in grids[:2]:
            # start the device->host transfer NOW so it overlaps the next
            # dispatches and the previous batch's host pairing; the later
            # device_get in pair() then returns without blocking on the
            # tunnel (~1.3 MB of 50x50 grids costs ~50 ms synchronously
            # at fresh-tunnel rates)
            if g is not None and hasattr(g, "copy_to_host_async"):
                g.copy_to_host_async()
        prev = state["pending"]
        state["pending"] = (batch, grids, meta)
        if prev is None:
            return decoder_params, opt_state, None
        prev_batch, prev_grids, prev_meta = prev
        pairing = pairer.pair(prev_grids[0], prev_grids[1], prev_meta,
                              prev_grids[2])
        return step(decoder_params, opt_state, frozen_params, prev_batch,
                    pairing)

    def flush(decoder_params, opt_state, frozen_params):
        prev = state["pending"]
        state["pending"] = None
        if prev is None:
            return decoder_params, opt_state, None
        prev_batch, prev_grids, prev_meta = prev
        pairing = pairer.pair(prev_grids[0], prev_grids[1], prev_meta,
                              prev_grids[2])
        return step(decoder_params, opt_state, frozen_params, prev_batch,
                    pairing)

    topo_step_pipelined.flush = flush
    topo_step_pipelined.set_host_batch = pairer.set_host_batch
    return topo_step_pipelined


def make_eval_step(cfg, config: TrainConfig, orig_hw, from_embeddings: bool):
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def masks_fn(decoder_params, frozen_params, batch):
        # same mixed-precision contract as the train step: without the
        # cast, f32 master params promote every activation to f32 and the
        # bf16-gated fused kernels are bypassed, making validation ~2x
        # slower AND measured in a different precision than train loss
        decoder_params = _cast_floats(decoder_params, dtype)
        frozen_params = _cast_floats(frozen_params, dtype)
        if from_embeddings:
            embeddings = batch["embeddings"].astype(dtype)
        else:
            pix, _ = preprocess_image(
                batch["image"], target_size=cfg.vision.image_size, dtype=dtype
            )
            params_f = _merge_params(decoder_params, frozen_params)
            embeddings = encode_image_microbatched(
                params_f, pix, cfg, config.encoder_microbatch)
        return _forward_from_embeddings(
            decoder_params, frozen_params, cfg, embeddings, batch, orig_hw,
            config.prompt_type,
        )

    @jax.jit
    def loss_plain(masks, batch):
        return _loss_from_masks(masks, batch, config, None)

    if not config.topological or config.topo_device:
        # topo_device: loss_plain's _loss_from_masks computes the
        # topological term on device — no host pairer needed
        def step(decoder_params, frozen_params, batch):
            masks = masks_fn(decoder_params, frozen_params, batch)
            return loss_plain(masks, batch)

        return step

    # Topological validation shares the train side's host-pairing machinery
    # (its own _TopoHostPairer instance, so valid-set sample indices never
    # collide with train's): GT diagrams are cached across epochs, padding
    # rows are skipped via row_mask, and cache-hit batches gather + fetch
    # only active pred rows. Callers opt in with set_host_batch (the epoch
    # loop does); without it the legacy both-grids path runs, as before.
    pairer = _TopoHostPairer(config)

    @jax.jit
    def grids_both(masks, batch):
        from ..ops.topology import downsample_for_topo

        pred = jax.nn.sigmoid(masks.astype(jnp.float32))
        gt_masks = gt_masks_from_comp_map(batch["comp_map"], masks.shape[1])
        return downsample_for_topo(pred, gt_masks, config.topo_interp)

    @jax.jit
    def grids_pred(masks):
        from ..ops.topology import downsample_grid

        return downsample_grid(
            jax.nn.sigmoid(masks.astype(jnp.float32)), config.topo_interp
        )

    @jax.jit
    def loss_total(masks, batch, pairing):
        return _loss_from_masks(masks, batch, config, pairing)

    def step(decoder_params, frozen_params, batch):
        masks = masks_fn(decoder_params, frozen_params, batch)
        meta = pairer.meta
        if pairer.cache_hit(meta):
            pred50 = grids_pred(masks)
            sel = pairer.active_sel(meta[1])
            if sel is not None:
                pred50 = _gather_rows(pred50, jnp.asarray(sel[0]))
            pairing = pairer.pair(pred50, None, meta, sel)
        else:
            pred50, true50 = grids_both(masks, batch)
            pairing = pairer.pair(pred50, true50, meta)
        return loss_total(masks, batch, pairing)

    step.set_host_batch = pairer.set_host_batch
    return step


def precompute_embeddings(
    params, cfg: SamConfig, dataset: PromptedDataset, *,
    batch_size: int = 8, microbatch: int = 1, dtype=jnp.bfloat16,
    verbose: bool = True,
):
    """Encode every image once (frozen encoder ⇒ constant across epochs).

    Returns a device array (N, G, G, C) in ``dtype``. For 552 images of
    ViT-B geometry this is ~1.1 GB bf16 — resident in HBM for the whole run.
    """
    # ONE jitted program per batch (preprocess fused with the encoder):
    # eager per-op preprocess paid a ~29 ms tunnel RTT per op and ran the
    # whole precompute at 4.4 img/s; host image decode is prefetched in a
    # thread so the device never waits on PNG decoding.
    @jax.jit
    def encode(p, imgs):
        pix, _ = preprocess_image(
            imgs, target_size=cfg.vision.image_size, dtype=dtype
        )
        return encode_image_microbatched(p, pix, cfg, microbatch).astype(dtype)

    n = len(dataset)
    outs = []
    t0 = time.time()
    import concurrent.futures

    chunks = [range(i0, min(i0 + batch_size, n))
              for i0 in range(0, n, batch_size)]

    def load(idx):
        return np.stack([dataset.image(i) for i in idx])

    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        futs = [pool.submit(load, c) for c in chunks]
        for fut in futs:
            outs.append(encode(params, jnp.asarray(fut.result())))
    emb = jnp.concatenate(outs, axis=0)
    emb.block_until_ready()
    if verbose:
        print(f"[cache] encoded {n} images in {time.time() - t0:.1f}s "
              f"({emb.nbytes / 2**20:.0f} MiB in HBM)")
    return emb


def training(config: TrainConfig, logger: MultiLogger | None = None) -> dict:
    """Full training entry (reference: training(), training_utils.py:27-80).

    Returns {'params', 'cfg', 'history', 'checkpoint_dir'}.
    """
    from ..parallel.mesh import set_kernel_mesh

    try:
        return _training_impl(config, logger)
    finally:
        # the DP branch activates the process-global kernel mesh for
        # shard_map'ed Pallas calls; clear it so later single-device work
        # in the same process (eval tools, A/B benches) is not silently
        # sharded over a stale mesh
        set_kernel_mesh(None)


def _training_impl(config: TrainConfig, logger: MultiLogger | None) -> dict:
    from ..data.store import load_split
    from ..parallel import distributed as dist

    # Multi-host bootstrap (no-op unless JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES are set or config.multihost requests it). Every
    # process runs the same deterministic loop and owns a contiguous row
    # slice of each global batch; process 0 owns logging/checkpoints.
    if config.topological and config.multihost and not config.topo_device:
        # _pair() calls jax.device_get on fwd_grids outputs; under
        # multi-process DP those are globally-sharded arrays that are not
        # fully addressable from one process, so the first topo step would
        # raise deep inside the loop. Fail fast instead. topo_device=True
        # has no host pairing and composes with multihost.
        raise ValueError(
            "topological=True with the host pairing protocol is "
            "incompatible with multihost=True (the pairing needs fully-"
            "addressable grids); use topo_device=True (on-device "
            "persistence) or run topo training single-host"
        )
    multihost = dist.initialize(explicit=True) if config.multihost else False
    primary = jax.process_index() == 0

    if logger is None and not primary:
        logger = make_logger(quiet=True)
    if logger is None:
        logger = make_logger(
            jsonl_path=config.log_jsonl
            or os.path.join(config.checkpoint, config.display_name, "metrics.jsonl"),
            use_wandb=config.use_wandb,
            # reference contract: wandb.init(project=..., entity=...,
            # name=display_name, config=<flat config>, save_code=True,
            # dir=...) — training.py:173-180
            wandb_kwargs={
                "project": config.project_name,
                "entity": config.entity,
                "name": config.display_name,
                "config": dataclasses.asdict(config),
                "dir": config.wandb_dir,
            },
        )

    cfg, params = prepare_model(config)
    pseudo = config.pseudocolor
    augment = None
    if config.data_transforms:
        from ..data.augment import make_augmenter

        augment = make_augmenter(config.data_transforms)
        if config.cache_embeddings:
            raise ValueError(
                "data_transforms requires cache_embeddings=False (augmented "
                "images invalidate cached encoder outputs)"
            )
    train_ds = PromptedDataset(
        load_split(config.dataset, "train"),
        prompt_type=config.prompt_type, pseudocolor=pseudo, seed=config.seed,
        augment=augment,
    )
    valid_ds = PromptedDataset(
        load_split(config.dataset, "test"),
        prompt_type=config.prompt_type, pseudocolor=pseudo, seed=config.seed + 1,
    )
    img0 = train_ds.image(0)
    orig_hw = img0.shape[:2]

    if config.trainable == "all" and config.cache_embeddings:
        raise ValueError(
            "trainable='all' requires cache_embeddings=False (the encoder "
            "output is no longer constant)"
        )
    decoder_params, frozen_params = _split_params(params, config.trainable)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(decoder_params)

    run_dir = os.path.join(config.checkpoint, config.display_name)
    os.makedirs(run_dir, exist_ok=True)
    start_epoch = 0
    if config.resume:
        restored, step_num = ckpt_utils.restore_checkpoint(
            run_dir, target={"decoder": decoder_params,
                             "opt_state": opt_state, "epoch": 0}
        )
        if restored is not None:
            decoder_params = restored["decoder"]
            opt_state = restored["opt_state"]
            start_epoch = int(restored["epoch"]) + 1
            print(f"[resume] from epoch {start_epoch}")

    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    use_cache = config.cache_embeddings
    train_emb = valid_emb = None
    train_cm = valid_cm = None
    if use_cache:
        train_emb = precompute_embeddings(
            params, cfg, train_ds, dtype=dtype,
            microbatch=config.encoder_microbatch)
        valid_emb = precompute_embeddings(
            params, cfg, valid_ds, dtype=dtype,
            microbatch=config.encoder_microbatch)
        if config.multihost:
            # Pull the cache to host ONCE: device_batch slices rows per
            # batch with np.asarray(emb), and if emb stayed device-resident
            # every step would pay a full device->host transfer of the
            # whole ~GB cache (sustained transfers also wedge the tunnel).
            train_emb = np.asarray(train_emb)
            valid_emb = np.asarray(valid_emb)
        if not config.multihost:
            # Stage the (deterministic) component maps on device once,
            # like the embeddings: re-uploading 8 MB of int32 comp_map per
            # batch is the dominant host->device traffic and sustained
            # uploads degrade the axon tunnel (epochs drift 5s -> 50s
            # after a few hundred MB; device-resident batches are steady).
            # Slot ids are clipped to 255 for uint8 — slots above any
            # bucket never produce a loss channel, so the clip is inert.
            def stage_comp_maps(ds):
                cm = np.stack([
                    np.minimum(ds.comp_map(i), 255)
                    for i in range(len(ds))
                ]).astype(np.uint8)
                return jnp.asarray(cm)

            train_cm = stage_comp_maps(train_ds)
            valid_cm = stage_comp_maps(valid_ds)

    train_step = make_train_step(cfg, config, optimizer, orig_hw, use_cache)
    eval_step = make_eval_step(cfg, config, orig_hw, use_cache)

    # Data parallelism: batch sharded over a ('data',) mesh of all local
    # devices; params replicated; XLA SPMD inserts the gradient all-reduce
    # over ICI (SURVEY.md §2.3 — the reference is strictly single-device).
    mesh = None
    if config.data_parallel and len(jax.devices()) > 1:
        from ..parallel.mesh import (
            data_sharding, make_mesh, pad_to_multiple, replicate,
        )

        mesh = make_mesh()
        n_dev = len(jax.devices())
        decoder_params = replicate(decoder_params, mesh)
        opt_state = replicate(opt_state, mesh)
        frozen_params = replicate(frozen_params, mesh)
        batch_sharding = data_sharding(mesh)
        from ..parallel.mesh import set_kernel_mesh

        # Pallas kernels must be shard_map'ed over 'data' under DP —
        # GSPMD replicates opaque Mosaic custom calls (parallel/mesh.py)
        set_kernel_mesh(mesh)
        print(f"[dp] data-parallel over {n_dev} devices")

    def pad_host_batch(batch):
        """Under DP, pad the HOST batch to the device count before anything
        else sees it: the topo pairer captures indices/channel_mask from
        this same dict (set_host_batch in the epoch loop), so its geometry
        must match the padded rows the device step consumes — sizing the
        pairing arrays from an unpadded channel_mask while the step's masks
        are padded would crash at trace time. Pad rows get index 0 with a
        zero channel_mask (pad_to_multiple), the same convention as the
        pipeline's last-batch padding; the pairer never caches or pairs
        zero-count rows."""
        if mesh is None:
            return batch
        padded, _ = pad_to_multiple(
            {k: v for k, v in batch.items()
             if k in ("prompts", "comp_map", "channel_mask", "point_labels",
                      "indices", "image")},
            len(jax.devices()),
        )
        return padded

    def device_batch(batch, emb, cm=None):
        keys = ("prompts", "comp_map", "channel_mask", "point_labels")
        if cm is not None:
            # comp_map staged on device (see stage_comp_maps above):
            # gather rows there instead of uploading them
            keys = tuple(k for k in keys if k != "comp_map")
        if mesh is not None:
            # batch arrives already padded (pad_host_batch)
            n_rows = next(iter(batch.values())).shape[0]
            if multihost:
                # every process iterates the identical (seeded) batch
                # order; each contributes only its contiguous row slice
                sl = dist.process_slice(n_rows)
                put = lambda v: dist.global_batch_array(
                    np.asarray(v)[sl], n_rows, batch_sharding
                )
            else:
                put = lambda v: jax.device_put(
                    jnp.asarray(v), batch_sharding
                )
        else:
            put = jnp.asarray
        out = {k: put(v) for k, v in batch.items() if k in keys}
        idx_dev = None
        if cm is not None or (use_cache and not multihost):
            # pad rows carry a -1 sentinel; clamp for the device gathers
            # (jnp.take's default out-of-bounds mode would FILL those rows
            # with NaN) — whatever row they read is loss-inert via the
            # all-zero channel_mask
            idx_dev = jnp.maximum(
                jnp.asarray(np.asarray(batch["indices"])), 0
            )
        if cm is not None:
            cm_rows = jnp.take(cm, idx_dev, axis=0).astype(jnp.int32)
            out["comp_map"] = (
                jax.device_put(cm_rows, batch_sharding)
                if mesh is not None else cm_rows
            )
        if use_cache:
            if multihost:
                # emb is kept host-side per process; ship only local rows
                # (-1 pad sentinels wrap to the last row — loss-inert via
                # the all-zero channel_mask)
                out["embeddings"] = put(
                    np.asarray(emb)[np.asarray(batch["indices"])]
                )
            else:
                emb_rows = jnp.take(emb, idx_dev, axis=0)
                out["embeddings"] = (
                    jax.device_put(emb_rows, batch_sharding)
                    if mesh is not None else emb_rows
                )
        else:
            out["image"] = put(batch["image"])
        return out

    history = []
    display = None
    if config.display_mode != "none":
        from .display import display_samples

        display = display_samples

    def run_display(epoch):
        if display is None:
            return
        full = _merge_params(decoder_params, frozen_params)
        for split, ds in (("train", train_ds), ("test", valid_ds)):
            display(full, cfg, config, ds, split, logger, run_dir,
                    epoch=epoch, orig_hw=orig_hw)

    from ..utils.profiling import StepTimer, profile_trace

    timer = StepTimer(logger, prefix="perf/train")
    if primary:
        run_display(start_epoch - 1)
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        total, count = 0.0, 0
        trace_ctx = (
            profile_trace(config.profile_dir)
            if epoch == start_epoch and config.profile_dir
            else contextlib.nullcontext()
        )
        epoch_losses = []
        with trace_ctx:
            for batch in batches(
                train_ds, config.batch_size,
                shuffle=config.shuffle, seed=config.seed, epoch=epoch,
                buckets=config.buckets, with_images=not use_cache,
            ):
                batch = pad_host_batch(batch)
                if hasattr(train_step, "set_host_batch"):
                    train_step.set_host_batch(batch)  # topo GT-diagram cache
                db = device_batch(batch, train_emb, train_cm)
                with timer:
                    decoder_params, opt_state, loss = train_step(
                        decoder_params, opt_state, frozen_params, db
                    )
                # keep the loss on device: a float() here would sync every
                # step and stall the dispatch pipeline (~10% throughput)
                if loss is not None:  # pipelined topo defers one batch
                    epoch_losses.append(loss)
                    count += 1
            if hasattr(train_step, "flush"):
                decoder_params, opt_state, loss = train_step.flush(
                    decoder_params, opt_state, frozen_params
                )
                if loss is not None:
                    epoch_losses.append(loss)
                    count += 1
        t_train = time.time() - t0
        # ONE device fetch for the whole epoch: per-loss float() would pay
        # the ~29 ms tunnel RTT per step (1.8 s/epoch at 62 steps)
        total = float(np.sum(jax.device_get(jnp.stack(epoch_losses)))) \
            if epoch_losses else 0.0
        t_sync = time.time() - t0 - t_train
        train_loss = total / max(count, 1)
        logger.log({"train/train_loss": train_loss, "train/epoch": epoch})
        timer.log_summary()

        vlosses = []
        for batch in batches(
            valid_ds, config.batch_size, epoch=epoch, buckets=config.buckets,
            with_images=not use_cache,
        ):
            batch = pad_host_batch(batch)
            if hasattr(eval_step, "set_host_batch"):
                eval_step.set_host_batch(batch)  # topo GT-diagram cache
            db = device_batch(batch, valid_emb, valid_cm)
            vlosses.append(eval_step(decoder_params, frozen_params, db))
        vtotal = float(np.sum(jax.device_get(jnp.stack(vlosses)))) \
            if vlosses else 0.0
        t_val = time.time() - t0 - t_train - t_sync
        vcount = len(vlosses)
        valid_loss = vtotal / max(vcount, 1)
        logger.log({"val/valid_loss": valid_loss, "val/epoch": epoch})
        dt = time.time() - t0
        n_img = count * config.batch_size
        print(
            f"EPOCH: {epoch}, Train Loss: {train_loss:.4f}, "
            f"Valid Loss: {valid_loss:.4f} ({dt:.1f}s, "
            f"{n_img / dt:.1f} img/s; "
            f"train {t_train:.1f}s sync {t_sync:.1f}s val {t_val:.1f}s)"
        )
        history.append({"epoch": epoch, "train_loss": train_loss,
                        "valid_loss": valid_loss, "seconds": dt})
        t_ck = time.time()
        if primary:
            # params are replicated, so process 0 holds the full state;
            # saving from one process avoids concurrent writes on a
            # shared filesystem
            ckpt_utils.save_checkpoint(
                run_dir, epoch,
                {"decoder": decoder_params, "opt_state": opt_state,
                 "epoch": epoch},
                keep=config.ckpt_keep,
            )
            run_display(epoch)
        print(f"[epoch {epoch}] ckpt+display {time.time() - t_ck:.1f}s")

    params_final = _merge_params(decoder_params, frozen_params)

    # final checkpoint in the reference's naming scheme + .pt interop export.
    # Like the per-epoch checkpoints, only process 0 writes (concurrent
    # writes to one file on a shared filesystem corrupt it) and only
    # process 0 runs the final evaluation (params are replicated; N copies
    # of the same full eval are pure waste).
    if config.export_pt and primary:
        final_name = f"{config.display_name}_{config.time or 'final'}"
        try:
            ckpt_utils.export_reference_pt(
                params_final, cfg,
                os.path.join(config.checkpoint, final_name + ".pt"),
            )
        except ImportError:
            print("[ckpt] torch unavailable; skipped .pt export")

    result = {
        "params": params_final,
        "cfg": cfg,
        "history": history,
        "checkpoint_dir": run_dir,
    }
    if config.evaluate and primary:
        from ..eval.harness import evaluate_metrics

        result["metrics"] = evaluate_metrics(
            params_final, cfg, config, valid_ds, orig_hw=orig_hw
        )
    logger.finish()
    return result
