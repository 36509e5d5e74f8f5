"""On-device cubical persistence + Wasserstein matching (SURVEY §7 step 4b).

The reference computes the topological regularizer's combinatorics on the
host CPU inside every train step (octsam/models/topological_loss.py:55-82:
gudhi cubical pairing + Hungarian matching per sample). Rounds 1-3 moved
that to a batched C++ host path (native/persistence.cc) behind a two-phase
/ pipelined protocol — correct and fast, but host-bound: every topological
step paid a device→host grid fetch, the pipelined mode needed one-step-stale
pairings, and multihost was impossible (the pairing host must address every
grid). This module removes the host from the loop entirely: the SAME
pairing (bit-identical bar multisets, validated against persistence.cc and
the boundary-matrix-reduction oracle in tests/test_topology_device.py) and
the SAME reduced-assignment Wasserstein matching run inside the jitted
step as XLA programs.

TPU-native design — the union-find is restructured for a vector machine:

1. **Total order** (vectorized): stable argsort of pixel values; ties by
   index — the exact order persistence.cc's radix argsort produces.
2. **Steepest-descent basins** (vectorized): every pixel points at its
   lowest-ranked lower neighbor; fixpoint label propagation (Jacobi over
   8/4 static spatial shifts, early-exit ``while_loop``) labels each pixel
   with its basin minimum. No general gathers — only static shifts.
3. **Saddle edges** (vectorized): adjacent pixels in different basins form
   a candidate merge edge weighted by the higher pixel's rank; two
   ``lax.sort`` passes keep the minimal edge per basin pair, sorted by
   weight. Per-pair minima suffice: a non-minimal edge can never merge two
   components Kruskal hasn't already united through the minimal one.
4. **Kruskal over basins** (the only sequential part): a lane-vectorized
   ``while_loop`` over the deduped edge list — 64 grids advance in
   lockstep, one edge per grid per iteration, early exit when every lane
   exhausts its edges. Union-find state is a fully-path-compressed root
   array updated by a masked relabel pass; roots are packed
   ``(rank+1) << 16 | id`` so the elder rule is one integer compare. Trip
   count = max deduped-edge count over the batch: a handful for the
   near-binary grids of real training, ~1.5k for 50² sigmoid noise —
   orders of magnitude below the 2500-per-grid sequential pixel loop a
   literal union-find port would cost.
5. **H1 by Alexander duality** exactly as the host path: the superlevel
   (negated, 4-connected) pass with a virtual outside node attached to
   border pixels; bars swapped.
6. **Matching**: a lane-lockstep Jonker-Volgenant shortest-augmenting-path
   assignment on the reduced Wasserstein formulation (rows = the tiny
   ground-truth diagram, columns = pred bars ∪ per-row diagonal slots) —
   the same cost matrix persistence.cc's ``min_cost_assign`` solves, with
   its exact column tie-break. f32 throughout (the C++ solver accumulates
   duals in f64; equal-cost matchings may differ in degenerate ties — the
   optimal cost, and hence the loss, is identical; pinned in tests).

Gradients: all combinatorial outputs are integer indices / stop-gradient
values; the loss gathers birth/death pixel values differentiably through
``ops.topology._wasserstein_per_diagram`` — the exact gradient path of the
host mode and of torch_topological.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .topology import (
    MAX_BARS,
    _reduce_topo,
    resize_align_corners,
)

# root packing: (rank + 1) << _SHIFT | id. OUT gets rank+1 == 0 (elder to
# every pixel). Supports grids up to 2**_SHIFT - 2 cells.
_SHIFT = 16
_MAXCELLS = (1 << _SHIFT) - 2
# edges processed per Kruskal while-loop iteration (see kr_body)
_KR_UNROLL = 4

_NEIGH8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1),
           (0, 1), (1, -1), (1, 0), (1, 1))
_NEIGH4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
# forward directions enumerate each undirected adjacency exactly once
_FWD8 = ((0, 1), (1, -1), (1, 0), (1, 1))
_FWD4 = ((0, 1), (1, 0))


def _shift(a, dy, dx, fill):
    """a (N, H, W) → b with b[:, y, x] = a[:, y+dy, x+dx] (fill outside)."""
    h, w = a.shape[-2], a.shape[-1]
    pad = jnp.pad(a, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
    return pad[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def _gather_rows(arr, idx):
    """Per-lane element pick: arr (N, M), idx (N,) → arr[n, idx[n]] (N,).

    One-hot compare + masked reduce: predictable VPU cost on TPU inside
    ``while_loop`` bodies (general gathers of one element per row lower
    poorly there)."""
    m = arr.shape[1]
    oh = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) == idx[:, None]
    zero = jnp.zeros((), arr.dtype)
    return jnp.sum(jnp.where(oh, arr, zero), axis=1)


def _pairing_pass(values, *, eight: bool, outside: bool, max_bars: int):
    """Sublevel union-find pairing of ``values`` (N, H, W) f32 — the device
    twin of persistence.cc::sublevel_h0 (same elder rule, same
    zero-persistence drop, same lowest-persistence-first capping).

    Returns (birth (N, max_bars) i32 flat pixel idx, death, count (N,)).
    """
    n, h, w = values.shape
    hw = h * w
    if hw > _MAXCELLS:
        raise ValueError(f"grid {h}x{w} exceeds device pairing capacity "
                         f"({_MAXCELLS} cells)")
    out_id = hw  # virtual outside node (superlevel/H1 pass)
    big = jnp.int32(hw)  # rank sentinel: beyond any real rank

    flat = values.reshape(n, hw).astype(jnp.float32)
    order = jnp.argsort(flat, axis=1, stable=True)
    rank = jnp.argsort(order, axis=1, stable=True).astype(jnp.int32)
    rank2d = rank.reshape(n, h, w)
    val2d = flat.reshape(n, h, w)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)

    # ---- steepest-descent pointers ------------------------------------
    neigh = _NEIGH8 if eight else _NEIGH4
    nb_ranks = [ _shift(rank2d, dy, dx, big) for dy, dx in neigh ]
    min_nb = nb_ranks[0]
    kmin = jnp.zeros_like(min_nb)
    for k in range(1, len(neigh)):
        better = nb_ranks[k] < min_nb
        min_nb = jnp.where(better, nb_ranks[k], min_nb)
        kmin = jnp.where(better, jnp.int32(k), kmin)
    is_min = min_nb >= rank2d  # no strictly-lower neighbor (ranks unique)

    # ---- basin labels: fixpoint propagation along descent pointers ----
    def propagate(lab):
        sel = lab  # value for is_min lanes overwritten below
        acc = jnp.zeros_like(lab)
        for k, (dy, dx) in enumerate(neigh):
            acc = jnp.where(kmin == k, _shift(lab, dy, dx, 0), acc)
        sel = jnp.where(is_min, p_idx, acc)
        return sel

    def prop_cond(st):
        _, changed, it = st
        return changed & (it < hw)

    def prop_body(st):
        lab, _, it = st
        nxt = propagate(lab)
        return nxt, jnp.any(nxt != lab), it + 1

    basin2d, _, _ = jax.lax.while_loop(
        prop_cond, prop_body, (p_idx, jnp.bool_(True), jnp.int32(0))
    )

    # ---- candidate saddle edges ----------------------------------------
    fwd = _FWD8 if eight else _FWD4
    keys, wts, eas, ebs, sads, svs = [], [], [], [], [], []

    def add_edges(a, b_, wt, sad, sv, valid):
        lo = jnp.minimum(a, b_)
        hi = jnp.maximum(a, b_)
        key = lo * jnp.int32(hw + 1) + hi
        keys.append(jnp.where(valid, key, jnp.int32((hw + 1) * (hw + 1))))
        wts.append(wt)
        eas.append(a)
        ebs.append(b_)
        sads.append(sad)
        svs.append(sv)

    for dy, dx in fwd:
        rq = _shift(rank2d, dy, dx, big)
        in_b = rq != big
        lq = _shift(basin2d, dy, dx, 0)
        vq = _shift(val2d, dy, dx, 0.0)
        q_idx = p_idx + jnp.int32(dy * w + dx)
        p_hi = rank2d > rq
        a = jnp.where(p_hi, basin2d, lq)
        b_ = jnp.where(p_hi, lq, basin2d)
        wt = jnp.maximum(rank2d, jnp.where(in_b, rq, -1))
        sad = jnp.where(p_hi, p_idx, q_idx)
        sv = jnp.where(p_hi, val2d, vq)
        valid = in_b & (basin2d != lq)
        add_edges(a.reshape(n, hw), b_.reshape(n, hw), wt.reshape(n, hw),
                  sad.reshape(n, hw), sv.reshape(n, hw),
                  valid.reshape(n, hw))
    if outside:
        yy = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
        border = (yy == 0) | (xx == 0) | (yy == h - 1) | (xx == w - 1)
        add_edges(basin2d.reshape(n, hw),
                  jnp.full((n, hw), out_id, jnp.int32),
                  rank2d.reshape(n, hw), p_idx.reshape(n, hw),
                  val2d.reshape(n, hw), border.reshape(n, hw))

    key = jnp.concatenate(keys, 1)
    wt = jnp.concatenate(wts, 1)
    ea = jnp.concatenate(eas, 1)
    eb = jnp.concatenate(ebs, 1)
    sad = jnp.concatenate(sads, 1)
    sv = jnp.concatenate(svs, 1)
    e_total = key.shape[1]

    # sort 1: (pair key asc, weight asc) → minimal edge first per pair
    key, wt, ea, eb, sad, sv = jax.lax.sort(
        (key, wt, ea, eb, sad, sv), dimension=1, num_keys=2
    )
    inf_key = jnp.int32((hw + 1) * (hw + 1))
    prev = jnp.concatenate(
        [jnp.full((n, 1), -1, key.dtype), key[:, :-1]], axis=1)
    valid = (key != prev) & (key != inf_key)
    # sort 2: survivors first, by weight
    key2 = jnp.where(valid, wt, jnp.int32(hw + 1))
    key2, ea, eb, sad, sv = jax.lax.sort(
        (key2, ea, eb, sad, sv), dimension=1, num_keys=1
    )
    n_edges = jnp.sum(valid.astype(jnp.int32), axis=1)

    # (E, N) layout: the loop reads one contiguous row per iteration
    ea_t, eb_t = ea.T, eb.T
    sad_t, sv_t = sad.T, sv.T

    # ---- Kruskal over basin-pair edges (lane-lockstep) ------------------
    # emissions per grid ≤ #basins ≤ #local minima + outside ≤ HW//2 + 2
    # (4-conn minima form an independent set; 8-conn is sparser still).
    # The emission buffer must hold EVERY possible bar: capping to
    # max_bars happens by persistence below, but emission order is edge
    # weight order — truncating here would drop arbitrary bars, not the
    # least persistent ones.
    bar_cap = hw // 2 + 2
    rank_ext = jnp.concatenate(
        [rank, jnp.full((n, 1), -1, jnp.int32)], axis=1)  # OUT rank −1
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, hw + 1), 1)
    r_init = ((rank_ext + 1) << _SHIFT) | ids
    val_ext = jnp.concatenate([flat, jnp.zeros((n, 1), jnp.float32)], axis=1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (1, bar_cap), 1)

    def kr_cond(st):
        i = st[0]
        return (i < e_total) & jnp.any(i < n_edges)

    def kr_body(st):
        # _KR_UNROLL edges per while iteration, sequentially — bit-equal
        # to one-at-a-time (each sub-step is fully masked by its own
        # ``active``; dynamic_index clamps past e_total and those steps
        # are no-ops). Amortizes the loop's cross-lane cond reduce +
        # per-iteration dispatch, which xplane put at ~1.1 ms of the
        # 4.5 ms loop (round 5).
        for _ in range(_KR_UNROLL):
            st = _kr_edge(st)
        return st

    def _kr_edge(st):
        i, roots, cnt, births, deaths, pers = st
        ea_i = jax.lax.dynamic_index_in_dim(ea_t, i, 0, keepdims=False)
        eb_i = jax.lax.dynamic_index_in_dim(eb_t, i, 0, keepdims=False)
        sad_i = jax.lax.dynamic_index_in_dim(sad_t, i, 0, keepdims=False)
        sv_i = jax.lax.dynamic_index_in_dim(sv_t, i, 0, keepdims=False)
        active = i < n_edges
        pa = _gather_rows(roots, ea_i)
        pb = _gather_rows(roots, eb_i)
        merge = active & (pa != pb)
        elder = jnp.minimum(pa, pb)   # smaller packed rank = elder
        younger = jnp.maximum(pa, pb)
        y_id = younger & jnp.int32((1 << _SHIFT) - 1)
        roots = jnp.where(
            merge[:, None] & (roots == younger[:, None]),
            elder[:, None], roots,
        )
        y_val = _gather_rows(val_ext, y_id)
        emit = merge & (y_val != sv_i)
        slot = (iota_cap == cnt[:, None]) & emit[:, None]
        births = jnp.where(slot, y_id[:, None], births)
        deaths = jnp.where(slot, sad_i[:, None], deaths)
        pers = jnp.where(slot, jnp.abs(sv_i - y_val)[:, None], pers)
        cnt = cnt + emit.astype(jnp.int32)
        return i + 1, roots, cnt, births, deaths, pers

    _, _, cnt, births, deaths, pers = jax.lax.while_loop(
        kr_cond, kr_body,
        (
            jnp.int32(0), r_init, jnp.zeros((n,), jnp.int32),
            jnp.full((n, bar_cap), -1, jnp.int32),
            jnp.full((n, bar_cap), -1, jnp.int32),
            jnp.full((n, bar_cap), -1.0, jnp.float32),
        ),
    )

    # cap: keep the max_bars most persistent (persistence.cc's partial_sort
    # semantics; emitted persistences are > 0, invalid slots are −1 so the
    # negated key pushes them last)
    _, births, deaths = jax.lax.sort(
        (-pers, births, deaths), dimension=1, num_keys=1
    )
    births = births[:, :max_bars]
    deaths = deaths[:, :max_bars]
    count = jnp.minimum(cnt, max_bars)
    return births, deaths, count


def device_cubical_pairs(grids, feat_d: int, max_bars: int = MAX_BARS):
    """Persistence pairing of homology dimension ``feat_d`` for a batch of
    grids (N, H, W) — diagrams multiset-identical to
    ``ops.native.cubical_pairs_batch`` (H0: sublevel 8-connected; H1 by
    Alexander duality: superlevel 4-connected + outside node, bars
    swapped; matches gudhi T-construction semantics).

    Returns (birth, death, count): (N, max_bars) i32 flat pixel indices
    (−1 padded) + (N,) counts. feat_d ∉ {0, 1} → empty (no 2-dimensional
    features on a 2-D grid)."""
    n = grids.shape[0]
    if feat_d == 0:
        return _pairing_pass(grids, eight=True, outside=False,
                             max_bars=max_bars)
    if feat_d == 1:
        b, d, c = _pairing_pass(-grids, eight=False, outside=True,
                                max_bars=max_bars)
        # superlevel bar (q_max_birth, p_saddle_death) → H1 bar (p, q)
        return d, b, c
    empty = jnp.full((n, max_bars), -1, jnp.int32)
    return empty, empty, jnp.zeros((n,), jnp.int32)


# ---------------------------------------------------------------------------
# Wasserstein matching (lane-lockstep Jonker-Volgenant)
# ---------------------------------------------------------------------------


def device_wasserstein_match(flat_pred, p_birth, p_death, t_b, t_d, t_cnt,
                             q: float, bval=None, dval=None):
    """Reduced-assignment optimal partial matching on device.

    flat_pred: (N, HW) f32; p_birth/p_death: (N, K) i32 (−1 pad);
    t_b/t_d: (N, T) f32 true-bar birth/death values; t_cnt: (N,) i32.
    bval/dval: optional precomputed pred bar values (callers that also
    need them differentiably gather once and pass stop_gradient here —
    the (N, 512)-from-(N, HW) gathers lower poorly on TPU, ~0.33 ms
    each, xplane round 5).

    Returns (matched (N, K) bool, target (N, K, 2) f32, const_term (N,)):
    the exact outputs of native/persistence.cc::wasserstein_match_batch
    (rows = true bars, columns = pred bars ∪ per-row diagonal slots, the
    C++ argmin tie-break) — equal-cost matchings may differ only in
    degenerate f32 ties."""
    n, k = p_birth.shape
    t = t_b.shape[1]
    c = k + t
    qf = jnp.float32(q)
    inf = jnp.float32(np.inf)

    valid_p = p_birth >= 0
    if bval is None:
        bval = jnp.take_along_axis(flat_pred, jnp.clip(p_birth, 0), axis=1)
        dval = jnp.take_along_axis(flat_pred, jnp.clip(p_death, 0), axis=1)
    diag_p = jnp.where(
        valid_p, jnp.power(jnp.abs(dval - bval) / 2.0, qf), 0.0)
    row_iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    valid_t = row_iota_t < t_cnt[:, None]
    diag_t = jnp.power(jnp.abs(t_d - t_b) / 2.0, qf)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)

    def cost_row(i_cur):
        """(N, C) reduced cost row for per-lane true-bar row i_cur."""
        tb0 = _gather_rows(t_b, i_cur)[:, None]
        tb1 = _gather_rows(t_d, i_cur)[:, None]
        dgt = _gather_rows(diag_t, i_cur)[:, None]
        pair = jnp.power(
            jnp.maximum(jnp.abs(tb0 - bval), jnp.abs(tb1 - dval)), qf)
        ci_pred = jnp.where(valid_p, pair - diag_p, inf)
        ci_diag = jnp.where(col_iota[:, k:] - k == i_cur[:, None], dgt, inf)
        return jnp.concatenate([ci_pred, ci_diag], axis=1)

    def phase_cond(st):
        r = st[0]
        return jnp.any(r < t_cnt)

    def phase_body(st):
        r, u, v, row4col, col4row = st
        lane = r < t_cnt

        # --- Dijkstra for one augmenting path (lockstep, masked) -------
        def dj_cond(dst):
            done = dst[0]
            return jnp.any(~done)

        def dj_body(dst):
            (done, i_cur, min_val, dist, path, sc_col, sc_row, sink) = dst
            live = ~done
            sc_row = sc_row | (
                (row_iota_t == i_cur[:, None]) & live[:, None])
            ci = cost_row(i_cur)
            ui = _gather_rows(u, i_cur)
            rc = min_val[:, None] + ci - ui[:, None] - v
            upd = live[:, None] & (~sc_col) & (rc < dist)
            dist = jnp.where(upd, rc, dist)
            path = jnp.where(upd, i_cur[:, None], path)
            dm = jnp.where(sc_col, inf, dist)
            lowest = jnp.min(dm, axis=1)
            cand = (~sc_col) & (dist == lowest[:, None])
            unass = cand & (row4col < 0)
            has_un = jnp.any(unass, axis=1)
            pick = jnp.where(has_un[:, None], unass, cand)
            argmin = jnp.argmax(pick, axis=1).astype(jnp.int32)
            min_val = jnp.where(live, lowest, min_val)
            sc_col = sc_col | (
                (col_iota == argmin[:, None]) & live[:, None])
            rj = _gather_rows(row4col, argmin)
            found = rj < 0
            sink = jnp.where(live & found, argmin, sink)
            i_cur = jnp.where(live & ~found, rj, i_cur)
            done = done | found
            return (done, i_cur, min_val, dist, path, sc_col, sc_row, sink)

        dj0 = (
            ~lane, jnp.broadcast_to(r, (n,)).astype(jnp.int32),
            jnp.zeros((n,)),
            jnp.full((n, c), inf), jnp.full((n, c), -1, jnp.int32),
            jnp.zeros((n, c), bool), jnp.zeros((n, t), bool),
            jnp.full((n,), -1, jnp.int32),
        )
        (_, _, min_val, dist, path, sc_col, sc_row, sink) = \
            jax.lax.while_loop(dj_cond, dj_body, dj0)

        # --- dual update (vectorized; C++ lines 226-232) ----------------
        d_at = jnp.take_along_axis(dist, jnp.clip(col4row, 0), axis=1)
        is_cur = row_iota_t == r
        upd_rows = sc_row & (~is_cur) & (col4row >= 0)
        u = u + jnp.where(lane[:, None] & is_cur, min_val[:, None], 0.0) \
            + jnp.where(lane[:, None] & upd_rows,
                        min_val[:, None] - d_at, 0.0)
        v = v - jnp.where(lane[:, None] & sc_col,
                          min_val[:, None] - dist, 0.0)

        # --- augment along the alternating path -------------------------
        def aug_cond(ast):
            return jnp.any(~ast[0])

        def aug_body(ast):
            done_a, j, row4col, col4row = ast
            live = ~done_a
            rw = _gather_rows(path, j)
            prev = _gather_rows(col4row, rw)
            row4col = jnp.where(
                live[:, None] & (col_iota == j[:, None]),
                rw[:, None], row4col)
            col4row = jnp.where(
                live[:, None] & (row_iota_t == rw[:, None]),
                j[:, None], col4row)
            fin = rw == r
            done_a = done_a | fin
            j = jnp.where(done_a, j, prev)
            return done_a, j, row4col, col4row

        _, _, row4col, col4row = jax.lax.while_loop(
            aug_cond, aug_body, (~lane, sink, row4col, col4row))

        return r + 1, u, v, row4col, col4row

    st0 = (
        jnp.int32(0), jnp.zeros((n, t)), jnp.zeros((n, c)),
        jnp.full((n, c), -1, jnp.int32), jnp.full((n, t), -1, jnp.int32),
    )
    _, _, _, row4col, col4row = jax.lax.while_loop(
        phase_cond, phase_body, st0)

    assigned = row4col[:, :k]
    matched = (assigned >= 0) & valid_p
    t0 = jnp.take_along_axis(t_b, jnp.clip(assigned, 0), axis=1)
    t1 = jnp.take_along_axis(t_d, jnp.clip(assigned, 0), axis=1)
    target = jnp.stack(
        [jnp.where(matched, t0, 0.0), jnp.where(matched, t1, 0.0)], axis=-1)
    to_diag = valid_t & (col4row >= k)
    const_term = jnp.sum(jnp.where(to_diag, diag_t, 0.0), axis=1)
    return matched, target, const_term


# ---------------------------------------------------------------------------
# Full loss
# ---------------------------------------------------------------------------


def device_pairing(pred_g, true_g, feat_d: int, q: float,
                   max_bars: int = MAX_BARS, pred_diff=None):
    """All-combinatorial structure for (N, h, w) downsampled grids, fully
    on device — same dict contract as ops.topology.host_pairing.

    pred_diff: optional DIFFERENTIABLE (N, h, w) grid to gather the pred
    bar values from (identical to pred_g on every non-padding row — the
    pairing indices come from pred_g either way). When given, the dict
    additionally carries differentiable ``p_b_val``/``p_d_val`` and the
    matcher reuses their stop_gradient instead of re-gathering (saves two
    of the slow (N,512)-from-(N,HW) TPU gathers per step)."""
    sp = jax.lax.stop_gradient(pred_g.astype(jnp.float32))
    st = jax.lax.stop_gradient(true_g.astype(jnp.float32))
    n = sp.shape[0]
    pb, pd, _ = device_cubical_pairs(sp, feat_d, max_bars)
    tb_i, td_i, t_cnt = device_cubical_pairs(st, feat_d, max_bars)
    t_flat = st.reshape(n, -1)
    t_b = jnp.take_along_axis(t_flat, jnp.clip(tb_i, 0), axis=1)
    t_d = jnp.take_along_axis(t_flat, jnp.clip(td_i, 0), axis=1)
    out = {"p_birth": pb, "p_death": pd}
    bval = dval = None
    if pred_diff is not None:
        flat_diff = pred_diff.astype(jnp.float32).reshape(n, -1)
        out["p_b_val"] = jnp.take_along_axis(
            flat_diff, jnp.clip(pb, 0), axis=1)
        out["p_d_val"] = jnp.take_along_axis(
            flat_diff, jnp.clip(pd, 0), axis=1)
        bval = jax.lax.stop_gradient(out["p_b_val"])
        dval = jax.lax.stop_gradient(out["p_d_val"])
    matched, target, const_term = device_wasserstein_match(
        sp.reshape(n, -1), pb, pd, t_b, t_d, t_cnt, q,
        bval=bval, dval=dval)
    out.update(
        matched=matched.astype(jnp.int8), target=target,
        const_term=const_term,
    )
    return out


def topo_loss_device(
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
    """Fully on-device topological loss — signature mirrors
    ops.topology.topo_loss (reference: topological_loss.py:11-96) but runs
    pairing + matching inside the jitted graph: no host callback, no
    two-phase protocol, no pipelining staleness, multihost-safe."""
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
    if channel_mask is not None:
        # zero out bucket-padding rows BEFORE pairing: a constant grid has
        # an empty diagram, so the skipped rows cost (almost) nothing in
        # the edge loop and their loss term is zeroed by channel_mask
        # downstream exactly as in the host path
        rows = channel_mask.reshape(n).astype(bool)
        pred_pair_g = jnp.where(rows[:, None, None], pred_g, 0.0)
        true_g = jnp.where(rows[:, None, None], true_g, 0.0)
    else:
        pred_pair_g = pred_g
    pairing = device_pairing(pred_pair_g, true_g, feat_d, float(loss_q),
                             max_bars, pred_diff=pred_g)
    # same math as ops.topology._wasserstein_per_diagram, but from the
    # bar values already gathered (differentiably) inside device_pairing
    valid = pairing["p_birth"] >= 0
    bv, dv = pairing["p_b_val"], pairing["p_d_val"]
    m = pairing["matched"].astype(bool)
    target = pairing["target"]
    qf = float(loss_q)
    cost_matched = jnp.maximum(
        jnp.abs(bv - target[..., 0]), jnp.abs(dv - target[..., 1])
    ) ** qf
    cost_diag = (jnp.abs(dv - bv) / 2.0) ** qf
    cost = jnp.where(m, cost_matched, cost_diag)
    total = (jnp.sum(jnp.where(valid, cost, 0.0), axis=1)
             + pairing["const_term"])
    w_per = jnp.power(jnp.maximum(total, 1e-12), 1.0 / qf).reshape(b, c)
    return _reduce_topo(
        w_per, pred_g, pairing, lamda, loss_q, loss_r, channel_mask, b, c
    )
