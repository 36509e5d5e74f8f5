"""Differentiable topological loss — TPU-native rebuild of
octsam/models/topological_loss.py (cubical persistence + Wasserstein).

Reference semantics (topological_loss.py:11-96): early-exit when λ=0;
bilinear downsample pred/true to ``interp``² with align_corners=True;
cubical sublevel persistence diagrams; filter to homology dimension
``feat_d``; per-(sample, channel) q-Wasserstein between pred and true
diagrams; sum over channels, mean over batch, ×λ; optional
total-persistence regularizer (loss_r).

TPU-native design: the *combinatorial* parts — the persistence pairing and
the optimal matching — are piecewise-constant functions of the input, so
they carry no gradient. They run on host (batched C++ union-find via
``ops/native.py`` + Hungarian matching) inside ONE ``jax.pure_callback``
per step, returning fixed-size integer index arrays. Everything carrying
gradient — the align-corners resize, the gathered birth/death values, the
matched-cost assembly — runs on-device in the jitted graph. Gradients flow
exactly where torch_topological's do: through the pixel values at paired
locations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .native import cubical_pairs_batch, wasserstein_match_batch
from .topology_ref import wasserstein_match

# Fixed per-diagram bar capacity (static shapes for the jitted gather path).
# Measured on 50x50 grids (tests/test_topology_jax.py cap test): uniform
# sigmoid noise — the worst realistic early-training input — peaks at ~310
# H0 / ~490 H1 bars, so 512 loses nothing in practice (round-1's 32 dropped
# >90% of noisy-grid bars and understated the loss). Beyond-capacity bars
# are still dropped lowest-persistence-first (ops/native.py), bounding the
# error by the smallest persistences. The matching cost is insensitive to
# the cap thanks to the reduced assignment (topology_ref.wasserstein_match):
# O(min(n1,n2)^2 * max) — the tiny ground-truth diagram is the min side.
MAX_BARS = 512


def resize_align_corners(x, out_hw):
    """Differentiable bilinear resize with align_corners=True semantics
    (torch F.interpolate(..., align_corners=True), topological_loss.py:33-46).

    x: (..., H, W) → (..., out_h, out_w)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return np.zeros(1, np.float32)
        return np.arange(n_out, dtype=np.float32) * ((n_in - 1) / (n_out - 1))

    yy = axis_coords(h, oh)
    xx = axis_coords(w, ow)
    y0 = np.clip(np.floor(yy).astype(np.int32), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xx).astype(np.int32), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = jnp.asarray((yy - y0).astype(np.float32))
    wx = jnp.asarray((xx - x0).astype(np.float32))

    top = x[..., y0, :]
    bot = x[..., y1, :]
    rows = top + wy[:, None] * (bot - top)
    left = rows[..., :, x0]
    right = rows[..., :, x1]
    return left + wx * (right - left)


def true_diagrams_from_grids(true, feat_d=1, max_bars=MAX_BARS):
    """Per-row persistence diagram VALUES (birth, death) of target grids.

    The targets are constant across epochs (GT component masks), so their
    diagrams are computed once and cached by the trainer; only the values
    matter downstream (matching costs, matched targets, const_term) — the
    gradient flows exclusively through the PRED side's pixel indices.
    Returns a list of (cnt_i, 2) f32 arrays, one per row.
    """
    true = np.asarray(true, np.float32)
    n = true.shape[0]
    empty = np.zeros((0, 2), np.float32)
    if feat_d not in (0, 1):  # no 2-dim features on a 2-D grid
        return [empty] * n
    tp = cubical_pairs_batch(true, max_bars)
    bkey, dkey = f"h{feat_d}_birth", f"h{feat_d}_death"
    out = []
    for i in range(n):
        cnt = int(tp["counts"][i, feat_d])
        if not cnt:
            out.append(empty)
            continue
        tflat = true[i].reshape(-1)
        tb = tp[bkey][i, :cnt]
        td = tp[dkey][i, :cnt]
        out.append(np.stack([tflat[tb], tflat[td]], 1).astype(np.float32))
    return out


def host_pairing(pred, true, feat_d=1, q=2.0, max_bars=MAX_BARS,
                 true_diagrams=None, row_mask=None):
    """Host-side pairing + matching for the two-phase TPU path.

    The axon TPU runtime does not support ``jax.pure_callback``, so the
    trainer calls this directly between two jitted device programs: a
    forward pass produces the downsampled (N, interp, interp) grids, this
    computes the combinatorial structure on host (batched C++ union-find +
    Hungarian), and the resulting arrays are fed as *inputs* to the jitted
    loss/grad step (``topo_loss_from_pairing``). Identical math to the
    ``pure_callback`` path.

    true_diagrams: optional per-row diagram values
    (``true_diagrams_from_grids``) — when given, ``true`` may be None (the
    trainer's cross-epoch GT-diagram cache skips both the target-side
    persistence and the target-grid device fetch).
    row_mask: optional (N,) 0/1 — rows with 0 are bucket padding whose
    loss contribution is zeroed by channel_mask anyway; skipping them here
    skips their pred-side persistence and matching (exact, cheaper).
    """
    p_birth, p_death, matched, target, const_term = _host_pairs_and_matching(
        pred, true, feat_d=feat_d, q=q, max_bars=max_bars,
        true_diagrams=true_diagrams, row_mask=row_mask,
    )
    return {
        "p_birth": p_birth,
        "p_death": p_death,
        "matched": matched,
        "target": target,
        "const_term": const_term,
    }


def _host_pairs_and_matching(pred, true, feat_d, q, max_bars,
                             true_diagrams=None, row_mask=None):
    """Host callback: pairing for pred & true + optimal matching.

    pred: (N, H, W) float32; true: same, or None with ``true_diagrams``.
    Returns fixed-size numpy arrays:
      p_birth, p_death: (N, K) int32 flat pixel indices, -1 pad
      matched:         (N, K) int8 — 1 if pred bar matched to a true bar
      target:          (N, K, 2) f32 — matched true (birth, death) values
      const_term:      (N,) f32 — Σ diag-costs^q of unmatched TRUE bars
    """
    pred = np.asarray(pred, np.float32)
    n, h, w = pred.shape
    k = max_bars
    dim = int(feat_d)

    if row_mask is not None:
        active = np.nonzero(np.asarray(row_mask).reshape(-1) > 0)[0]
    else:
        active = np.arange(n)

    if true_diagrams is None:
        if row_mask is None:
            true_diagrams = true_diagrams_from_grids(true, dim, k)
        else:
            # target-side persistence only for active rows; inactive rows'
            # pairing entries stay -1/0 and their loss is zeroed anyway
            empty = np.zeros((0, 2), np.float32)
            true_diagrams = [empty] * n
            if len(active):
                diags = true_diagrams_from_grids(
                    np.asarray(true, np.float32)[active], dim, k
                )
                for j, i in enumerate(active):
                    true_diagrams[i] = diags[j]

    p_birth = np.full((n, k), -1, np.int32)
    p_death = np.full((n, k), -1, np.int32)
    matched = np.zeros((n, k), np.int8)
    target = np.zeros((n, k, 2), np.float32)
    const_term = np.zeros((n,), np.float32)
    if len(active) == 0:
        return p_birth, p_death, matched, target, const_term

    pp = cubical_pairs_batch(pred[active], k)

    bkey, dkey = f"h{dim}_birth", f"h{dim}_death"
    if dim in (0, 1):
        pb_a, pd_a = pp[bkey], pp[dkey]
        counts_a = np.ascontiguousarray(pp["counts"][:, dim])
    else:  # no 2-dimensional features on a 2D grid
        pb_a = np.full((len(active), k), -1, np.int32)
        pd_a = np.full((len(active), k), -1, np.int32)
        counts_a = np.zeros((len(active),), np.int32)

    # Fast path: one native call for the whole batch's matching (C++ JV
    # assignment; same reduced formulation as wasserstein_match — measured
    # identical in tests/test_topology_native.py). The Python loop below is
    # the no-native fallback.
    native = wasserstein_match_batch(
        pred[active], pb_a, pd_a, counts_a,
        [true_diagrams[i] for i in active], q, k,
    )
    if native is not None:
        m_a, t_a, c_a = native
        p_birth[active] = pb_a
        p_death[active] = pd_a
        matched[active] = m_a
        target[active] = t_a
        const_term[active] = c_a
        return p_birth, p_death, matched, target, const_term

    for j, i in enumerate(active):
        if dim in (0, 1):
            cnt_p = int(pp["counts"][j, dim])
            pb = pp[bkey][j, :cnt_p]
            pd = pp[dkey][j, :cnt_p]
        else:  # dim 2: no 2-dimensional features on a 2D grid
            cnt_p = 0
            pb = pd = np.zeros(0, np.int32)
        pflat = pred[i].reshape(-1)
        d1 = np.stack([pflat[pb], pflat[pd]], 1) if cnt_p else np.zeros((0, 2))
        d2 = np.asarray(true_diagrams[i], np.float32).reshape(-1, 2)
        m, un1, un2 = wasserstein_match(d1, d2, q)
        p_birth[i, :cnt_p] = pb
        p_death[i, :cnt_p] = pd
        for r, c in m:
            matched[i, r] = 1
            target[i, r, 0] = d2[c, 0]
            target[i, r, 1] = d2[c, 1]
        if len(un2):
            const_term[i] = np.sum(
                (np.abs(d2[un2, 1] - d2[un2, 0]) / 2.0) ** q
            )
    return p_birth, p_death, matched, target, const_term


def _wasserstein_per_diagram(grids, p_birth, p_death, matched, target,
                             const_term, q):
    """Differentiable per-diagram W_q from host-computed pairing/matching.

    grids: (N, H, W) — gradients flow through these values only."""
    n = grids.shape[0]
    flat = grids.reshape(n, -1)
    valid = p_birth >= 0
    b_idx = jnp.clip(p_birth, 0)
    d_idx = jnp.clip(p_death, 0)
    b = jnp.take_along_axis(flat, b_idx, axis=1)
    d = jnp.take_along_axis(flat, d_idx, axis=1)
    m = matched.astype(bool)
    cost_matched = jnp.maximum(
        jnp.abs(b - target[..., 0]), jnp.abs(d - target[..., 1])
    ) ** q
    cost_diag = (jnp.abs(d - b) / 2.0) ** q
    cost = jnp.where(m, cost_matched, cost_diag)
    total = jnp.sum(jnp.where(valid, cost, 0.0), axis=1) + const_term
    return jnp.power(jnp.maximum(total, 1e-12), 1.0 / q)


def downsample_grid(x, interp: int):
    """The reference's align-corners downsample (topological_loss.py:33-46)
    for one tensor."""
    x = x.astype(jnp.float32)
    return resize_align_corners(x, (interp, interp)) if interp else x


def downsample_for_topo(pred_obj, true_obj, interp: int):
    """Downsample both sides; shared by both execution paths."""
    return downsample_grid(pred_obj, interp), downsample_grid(true_obj, interp)


def topo_loss_from_pairing(
    pred_obj,
    pairing: dict,
    lamda: float,
    interp: int = 0,
    loss_q: int = 2,
    loss_r: bool = False,
    channel_mask=None,
):
    """Differentiable loss given a host-computed ``host_pairing`` result —
    the two-phase path for runtimes without pure_callback (axon TPU).
    pred_obj: (B, C, H, W) sigmoid probabilities (pre-downsample)."""
    b, c = pred_obj.shape[:2]
    pred = pred_obj.astype(jnp.float32)
    if interp:
        pred = resize_align_corners(pred, (interp, interp))
    pred_g = pred.reshape(b * c, pred.shape[-2], pred.shape[-1])
    w_per = _wasserstein_per_diagram(
        pred_g,
        pairing["p_birth"], pairing["p_death"], pairing["matched"],
        pairing["target"], pairing["const_term"], float(loss_q),
    ).reshape(b, c)
    return _reduce_topo(
        w_per, pred_g, pairing, lamda, loss_q, loss_r, channel_mask, b, c
    )


def _reduce_topo(w_per, pred_g, pairing, lamda, loss_q, loss_r,
                 channel_mask, b, c):
    if channel_mask is not None:
        cm = channel_mask.astype(jnp.float32)
        w_per = w_per * cm
        row_valid = (jnp.sum(cm, axis=1) > 0).astype(jnp.float32)
        per_sample = jnp.sum(w_per, axis=1)
        loss = jnp.sum(per_sample * row_valid) / jnp.maximum(
            jnp.sum(row_valid), 1.0
        )
    else:
        loss = jnp.mean(jnp.sum(w_per, axis=1))
    if loss_r:
        # total_persistence regularizer (topological_loss.py:88-94); the
        # same masked reduction as the main term — bucket-padding channels
        # must not contribute bars nor dilute the batch mean
        flat = pred_g.reshape(b * c, -1)
        valid = pairing["p_birth"] >= 0
        bvals = jnp.take_along_axis(
            flat, jnp.clip(pairing["p_birth"], 0), axis=1)
        dvals = jnp.take_along_axis(
            flat, jnp.clip(pairing["p_death"], 0), axis=1)
        pers = jnp.where(valid, jnp.abs(dvals - bvals) ** float(loss_q), 0.0)
        pers_row = jnp.sum(pers, axis=1).reshape(b, c)
        if channel_mask is not None:
            pers_row = pers_row * cm
            loss = loss + jnp.sum(
                jnp.sum(pers_row, axis=1) * row_valid
            ) / jnp.maximum(jnp.sum(row_valid), 1.0)
        else:
            loss = loss + jnp.mean(jnp.sum(pers_row, axis=1))
    return lamda * loss


def topo_loss(
    pred_obj,
    true_obj,
    lamda: float,
    interp: int = 0,
    feat_d: int = 2,
    loss_q: int = 2,
    loss_r: bool = False,
    channel_mask=None,
    max_bars: int = MAX_BARS,
):
    """Topological regularizer; signature mirrors the reference
    (topological_loss.py:11-12). pred_obj/true_obj: (B, C, H, W).

    channel_mask (B, C): restricts to the channels the reference's ragged
    batch would contain (bucket padding exactness; see data/sampling.py).
    """
    if lamda == 0.0:
        return 0.0
    b, c = pred_obj.shape[:2]
    pred = pred_obj.astype(jnp.float32)
    true = true_obj.astype(jnp.float32)
    if interp:
        pred = resize_align_corners(pred, (interp, interp))
        true = resize_align_corners(true, (interp, interp))
    h, w = pred.shape[-2], pred.shape[-1]
    n = b * c
    pred_g = pred.reshape(n, h, w)
    true_g = true.reshape(n, h, w)

    k = max_bars
    result_shapes = (
        jax.ShapeDtypeStruct((n, k), jnp.int32),   # p_birth
        jax.ShapeDtypeStruct((n, k), jnp.int32),   # p_death
        jax.ShapeDtypeStruct((n, k), jnp.int8),    # matched
        jax.ShapeDtypeStruct((n, k, 2), jnp.float32),  # target
        jax.ShapeDtypeStruct((n,), jnp.float32),   # const_term
    )
    cb = functools.partial(
        _host_pairs_and_matching, feat_d=feat_d, q=float(loss_q),
        max_bars=k,
    )
    if channel_mask is not None:
        # bucket-padding rows are zeroed by channel_mask downstream, so
        # skip their host-side persistence + matching entirely (row_mask
        # marks them; the host leaves their pairing rows at -1/0)
        p_birth, p_death, matched, target, const_term = jax.pure_callback(
            lambda p, t, m: cb(p, t, row_mask=m),
            result_shapes,
            jax.lax.stop_gradient(pred_g),
            jax.lax.stop_gradient(true_g),
            jax.lax.stop_gradient(
                channel_mask.reshape(-1).astype(jnp.float32)
            ),
        )
    else:
        p_birth, p_death, matched, target, const_term = jax.pure_callback(
            cb,
            result_shapes,
            jax.lax.stop_gradient(pred_g),
            jax.lax.stop_gradient(true_g),
        )

    w_per = _wasserstein_per_diagram(
        pred_g, p_birth, p_death, matched, target, const_term, float(loss_q)
    ).reshape(b, c)
    pairing = {"p_birth": p_birth, "p_death": p_death}
    return _reduce_topo(
        w_per, pred_g, pairing, lamda, loss_q, loss_r, channel_mask, b, c
    )
