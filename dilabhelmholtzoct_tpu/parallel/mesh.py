"""Device mesh + sharding for data-parallel training over ICI.

The reference has zero parallelism (single ``model.to(device)``,
octsam/models/training_utils.py:33-34; SURVEY.md §2.3). The TPU-native
scale-out for this workload is 1-D data parallelism: batch sharded over a
``('data',)`` mesh, parameters replicated, gradient all-reduce inserted by
XLA's SPMD partitioner and carried over ICI. TP/PP/SP/EP are intentionally
out of scope (SURVEY.md §2.3 — the model fits on one chip and the dataset
is 552 images).

Usage:
    mesh = make_mesh()                       # all local devices
    batch = shard_batch(batch, mesh)         # leading axis over 'data'
    params = replicate(params, mesh)
    step = jax.jit(train_step, ...)          # XLA inserts the psum
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in the batch with its leading axis over 'data'."""
    s = data_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree on every device of the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


# ---------------------------------------------------------------------------
# Kernel mesh context — Pallas calls under data parallelism
#
# Mosaic kernels are opaque custom calls to XLA's SPMD partitioner: under a
# plain sharded jit, GSPMD replicates them (measured on the 8-device CPU
# mesh, round 3: output sharding collapses to P() — every device would
# all-gather the batch and redo the FULL kernel on a real pod). Model code
# therefore wraps each pallas_call in shard_map over the 'data' axis when a
# kernel mesh is active. The trainer (and the multichip dryrun) set this
# right after building the DP mesh.
# ---------------------------------------------------------------------------

_KERNEL_MESH: Mesh | None = None


def set_kernel_mesh(mesh: Mesh | None):
    """Activate (or clear, with None) the mesh used to shard Pallas kernels."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


_WARNED_INDIVISIBLE = set()


def kernel_mesh(batch_size: int) -> Mesh | None:
    """The active kernel mesh, if the leading batch axis divides evenly."""
    m = _KERNEL_MESH
    if m is None or m.size <= 1:
        return None
    if batch_size % m.size != 0:
        # falling back to the unwrapped pallas_call means GSPMD replicates
        # the kernel (full-batch redundant work on every device) — loud
        # once per (batch, mesh) shape so perf regressions are traceable
        key = (batch_size, m.size)
        if key not in _WARNED_INDIVISIBLE:
            _WARNED_INDIVISIBLE.add(key)
            import warnings

            warnings.warn(
                f"batch axis {batch_size} does not divide the {m.size}-"
                f"device kernel mesh: Pallas kernels for this shape run "
                f"unwrapped and GSPMD will replicate them (every device "
                f"redoes the full-batch kernel)", stacklevel=2,
            )
        return None
    return m


def shard_map_kernel(f, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax API generations (jax.shard_map is keyword-only
    with check_vma; the experimental module used check_rep — and on jax
    before ~0.5 there is no jax.shard_map attribute at all)."""
    new_api = getattr(jax, "shard_map", None)
    if new_api is not None:
        try:
            return new_api(f, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        except TypeError:  # pragma: no cover - transitional signatures
            pass
    from jax.experimental.shard_map import shard_map  # pragma: no cover

    return shard_map(f, mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)  # pragma: no cover


def pad_to_multiple(batch: dict, multiple: int):
    """Pad the leading (batch) axis up to a multiple of the mesh size so the
    per-device shard is even; padded rows get zero channel_mask so they do
    not contribute to the loss."""
    b = next(iter(batch.values())).shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch, b
    out = {}
    for k, v in batch.items():
        pad_width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    if "channel_mask" in out:
        out["channel_mask"][b:] = 0.0
    if "indices" in out:
        # -1 sentinel, same convention as the pipeline's last-batch padding
        # (data/pipeline.py): pad rows must never alias sample 0
        out["indices"][b:] = -1
    return out, b
