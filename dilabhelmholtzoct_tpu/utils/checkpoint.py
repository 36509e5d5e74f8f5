"""Checkpointing: Orbax-backed save/restore with per-epoch resume.

Upgrade over the reference, which saves exactly one ``state_dict`` at the
very end of training (octsam/models/training_utils.py:77) — a crash at epoch
9/10 loses everything, and no optimizer state is kept. Here every epoch
checkpoints (params + optimizer state + epoch counter) and training resumes
from the latest step. ``export_reference_pt`` additionally writes the
reference's ``.pt`` interchange format for cross-framework use.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, step: int, state, *,
                    keep: int | None = 3) -> str:
    """Save a pytree (params / train state) under ``directory/step_N``.

    keep: retain only the newest ``keep`` step dirs (None/0 = keep all).
    Per-epoch full-state checkpoints of a trainable='all' ViT-L/H run are
    several GB each (params + Adam mu/nu); without retention a long run
    fills the volume mid-training — the exact failure checkpointing exists
    to prevent."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if keep:
        base = os.path.abspath(directory)
        steps = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(base)
            if d.startswith("step_") and d.split("_", 1)[1].isdigit()
        )
        for old in steps[:-keep]:
            import shutil

            shutil.rmtree(os.path.join(base, f"step_{old}"),
                          ignore_errors=True)
    return path


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(directory)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: int | None = None, target=None):
    """Restore the pytree saved at ``step`` (default: latest)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None, None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    restored = _checkpointer().restore(path, target=target)
    return restored, step


def export_reference_pt(params, cfg, path: str):
    """Write a torch ``.pt`` state_dict loadable by HF SamModel — the
    reference's checkpoint interchange format (training_utils.py:77)."""
    import torch

    from ..models.convert import to_hf_state_dict

    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in to_hf_state_dict(jax.device_get(params), cfg).items()
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(sd, path)
    return path
