"""Multi-host (multi-process) data parallelism.

The reference is strictly single-device (octsam/models/training_utils.py:
33-34); single-host multi-chip DP is parallel/mesh.py. This module adds the
multi-host layer: ``jax.distributed.initialize`` bootstrap, a per-process
slice of every global batch, and assembly of global sharded arrays from
process-local shards via ``jax.make_array_from_process_local_data``. XLA
still inserts the gradient all-reduce; with a ('data',) mesh laid out over
all processes' devices the collective rides ICI within a slice and DCN
across slices — no application-level communication code.

Single-process behavior is a strict no-op passthrough, so the trainer uses
these helpers unconditionally.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    explicit: bool = False,
) -> bool:
    """Bootstrap jax.distributed from args or env. Returns True if a
    multi-process runtime was initialized.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID. With ``explicit=True`` (the trainer passes it when
    ``--multihost`` was requested) and no coordinator info found, we fall
    back to argument-free ``jax.distributed.initialize()`` — the Cloud TPU
    pod / SLURM auto-detect path — and warn loudly if even that finds no
    cluster, instead of silently training single-process.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    have_all = (coordinator_address is not None
                and num_processes is not None and process_id is not None)
    if not have_all:
        # PARTIAL info (e.g. a leftover JAX_NUM_PROCESSES without a
        # coordinator) must not reach the explicit initialize() below —
        # jax would raise a raw RuntimeError on a non-cluster host instead
        # of the documented warn-and-continue
        if any(v is not None
               for v in (coordinator_address, num_processes, process_id)):
            import warnings

            warnings.warn(
                "partial multihost coordinator info found (need ALL of "
                "JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, "
                "JAX_PROCESS_ID); ignoring it and "
                + ("trying cluster auto-detect" if explicit
                   else "running single-process"),
                RuntimeWarning,
                stacklevel=2,
            )
        if not explicit:
            # plain single-process run; nothing requested
            return False
        try:
            jax.distributed.initialize()  # pod/cluster auto-detect
            _initialized = True
        except Exception as e:  # no detectable cluster environment
            import warnings

            warnings.warn(
                "multihost was requested but no coordinator info was found "
                "(set JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                f"JAX_PROCESS_ID) and cluster auto-detect failed ({e}); "
                "continuing SINGLE-process",
                RuntimeWarning,
                stacklevel=2,
            )
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def process_slice(n_rows: int) -> slice:
    """Contiguous slice of a global batch owned by this process.

    n_rows must already be padded to a multiple of process_count
    (parallel/mesh.pad_to_multiple with multiple=len(jax.devices()) covers
    this: device count is a multiple of process count).
    """
    pc = jax.process_count()
    assert n_rows % pc == 0, (n_rows, pc)
    per = n_rows // pc
    pi = jax.process_index()
    return slice(pi * per, (pi + 1) * per)


def global_batch_array(local_rows, global_rows: int, sharding):
    """Assemble a global sharded array from this process's local rows.

    local_rows: this process's shard (numpy or jax array), the
    ``process_slice(global_rows)`` rows of the conceptual global batch.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    global_shape = (global_rows,) + tuple(np.shape(local_rows))[1:]
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows), global_shape
    )
