"""Pallas TPU flash attention with fused decomposed rel-pos bias.

The SAM ViT encoder's global-attention layers score (B·heads, 4096, 4096)
logits plus an equally-sized additive relative-position bias at 1024² input
— materialized naively (as HF does, modeling_sam.py:818-827) that is
~800 MB per image per layer in f32 and caps batch size at ~1 on a v5e.

This kernel computes attention in the streaming (online-softmax) style with
the MViTv2-style decomposed bias reconstructed on the fly from its factors:

    bias[q, k] = rel_h[q, kh(k)] + rel_w[q, kw(k)]

where rel_h: (BH, N, H) and rel_w: (BH, N, W) are the small precomputed
einsum factors (N·H + N·W ≈ 2·N·64 floats — same order as Q itself). Peak
memory is O(N·d + TQ·TK) instead of O(N²), so batched encoding fits easily.

Forward-only by design: the encoder is frozen in every reference training
configuration (octsam/models/training_utils.py:277-279), so the backward
pass never runs through it; the XLA path (models/sam.py) remains available
for encoder fine-tuning experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                  *, tk: int, w: int, scale: float):
    """One (bh, q-block) program: stream over k blocks.

    Block shapes (leading bh dim collapsed by BlockSpec):
      q_ref:  (TQ, d)     rh_ref: (TQ, H)     rw_ref: (TQ, W)
      k_ref:  (N, d)      v_ref:  (N, d)      o_ref:  (TQ, d)
    tk must be a multiple of w so each k-block covers whole grid rows.
    """
    _, tq, d = q_ref.shape
    n = k_ref.shape[1]
    h_dim = rh_ref.shape[2]
    rows_per_blk = tk // w
    n_blocks = n // tk

    # Keep matmul INPUTS in the native (bf16) dtype with f32 accumulation —
    # upcasting operands to f32 would force slow f32 MXU passes. The qk
    # scale is applied to the f32 accumulator afterwards.
    q = q_ref[0]
    rh = rh_ref[0]  # (TQ, H)
    rw = rw_ref[0]  # (TQ, W)

    # Decomposed bias expanded via one-hot matmuls (MXU-friendly; Mosaic
    # allows no unaligned lane slices or in-register lane reshapes):
    #   bias[q, t] = rh[q, kh(t)] + rw[q, kw(t)],  kh = j*rows + t//w,
    #   kw = t % w.  The kw pattern is identical for every k block, so the
    #   rw expansion hoists out of the streaming loop.
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (w, tk), 1)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (w, tk), 0)
    sel_w = (t_idx % w == c_idx).astype(rw.dtype)  # (W, TK)
    rw_bias = jax.lax.dot_general(
        rw, sel_w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, TK)

    th_idx = jax.lax.broadcasted_iota(jnp.int32, (h_dim, tk), 1)
    hh_idx = jax.lax.broadcasted_iota(jnp.int32, (h_dim, tk), 0)

    def body(j, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(j * tk, tk), :]
        v_blk = v_ref[0, pl.ds(j * tk, tk), :]
        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (TQ, TK) f32
        sel_h = (hh_idx == j * rows_per_blk + th_idx // w).astype(rh.dtype)
        rh_bias = jax.lax.dot_general(
            rh, sel_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, TK)
        s = s + rh_bias + rw_bias

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("hw", "tq", "tk", "interpret")
)
def flash_attention_relpos(
    q, k, v, rel_h, rel_w, *, hw, tq: int = 512, tk: int = 512,
    interpret: bool = False,
):
    """Streaming attention with decomposed rel-pos bias.

    q/k/v:  (BH, N, d) with N == hw[0]*hw[1]
    rel_h:  (BH, N, hw[0]) — bias factor over key rows
    rel_w:  (BH, N, hw[1]) — bias factor over key cols
    Returns (BH, N, d), softmax in f32. Matches the XLA reference path to
    ~1e-5 (tests/test_attention.py).
    """
    bh, n, d = q.shape
    h, w = hw
    assert n == h * w, (n, hw)
    tq = min(tq, n)
    tk = min(tk, n)
    assert n % tq == 0 and n % tk == 0 and tk % w == 0, (n, tq, tk, w)
    scale = d ** -0.5

    grid = (bh, n // tq)
    kernel = functools.partial(_flash_kernel, tk=tk, w=w, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, h), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            # qk + rel-pos one-hot expansion + pv per (q, k) tile pair
            flops=3 * 2 * bh * n * n * d,
            bytes_accessed=bh * n * (3 * d + h + w) * q.dtype.itemsize * 2,
            transcendentals=bh * n * n,  # exp per score
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


def _packed_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, *refs,
                   w: int, scale: float, n_kblocks: int,
                   return_lse: bool = False, k_sub: int = 1):
    """One (b, head-pair, q-block, k-block) program over NATURAL-layout qkv.

    Two d=64 heads are packed side-by-side into one 128-lane block (the
    smallest Mosaic-legal lane tile), so the kernel reads the fused qkv
    projection output directly — zero (B, heads, N, d) layout copies, which
    cost 26% of encoder device time in round 1 (docs/ROADMAP.md).

    The k dimension is the innermost GRID axis (not an in-kernel loop): k/v
    arrive as (1, TK, 128) blocks that Pallas double-buffers, keeping VMEM
    at a few MB even in f32 (a full-N k block OOMed the 16 MB VMEM budget).
    Online-softmax state (m, l, acc) lives in scratch across k steps.

    Per-head scores come from lane-masked 128-deep dots: masking the OTHER
    head's 64 query lanes to zero makes the full-width contraction equal the
    per-head 64-deep contraction, at identical MXU cost (a d=64 dot pads to
    the 128-wide systolic array anyway). Both heads stack row-wise so each
    k block costs ONE score dot and ONE pv dot; the pv accumulator carries
    garbage in the other head's lanes, discarded by the final lane-select.
    """
    if return_lse:
        o_ref, lse_ref, m_ref, l_ref, acc_ref, qcat_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref, qcat_ref = refs
        lse_ref = None
    tq = q_ref.shape[-2]
    tk = k_ref.shape[-2]
    h_dim = rh_ref.shape[3]
    rows_per_blk = tk // w
    j = pl.program_id(3)

    def qkv_block(ref):
        return ref[0]  # (T, 128)

    # NOTE (negative result, round 2): tile sweep — (tq=256, tk=1024)
    # 8.88 ms and (tq=256, tk=2048) 8.96 ms vs (512, 1024) 8.34 ms per
    # global layer (in-context xplane); (512|1024, ≥2048) fail to compile
    # (VMEM). The default (512, 1024) is the optimum.
    # NOTE (negative result, round 2): feeding the kernel pair-contiguous
    # (B, 3P, N, 128) inputs via one XLA transpose left the kernel time
    # IDENTICAL (8.32 vs 8.34 ms/global layer) and cost +13 ms for the
    # producer transpose — the strided 128-lane HBM fetches are fully
    # hidden behind compute. The kernel is VPU-bound (exp + f32 score
    # traffic); don't revisit input layouts.

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    is_a = lane < 64
    # Pad each head's row block to a multiple of 8 so the final row split
    # lands on a Mosaic-legal sublane offset (windowed layers have TQ=196).
    # Padded zero rows see all-zero scores -> uniform softmax, discarded.
    tq_pad = -(-tq // 8) * 8
    pad_rows = tq_pad - tq

    def build_q_cat():
        """Augmented query: [q_a*sc | rh_a | rw_a] over [q_b*sc | rh_b |
        rw_b], heads stacked row-wise — (2·TQ_pad, 128 + H + W).

        Both masks via jnp.where: Mosaic gives where() outputs a
        dot-friendly register layout; feeding the raw (or arithmetically
        derived) q block into the NT dot hits a ~1000x scalar-fallback
        cliff (measured). The softmax scale (1/sqrt(64) = 2^-3, a power of
        two) folds into the bf16 q mask exactly (mantissa untouched), so
        no post-dot rescale pass. Folding the decomposed rel-pos bias INTO
        the score matmul ([q*sc | rh | rw] · [k | sel_h | sel_w]^T) lets
        one MXU dot replace (qk dot + rh one-hot dot + two VPU adds over
        the (TQ, TK) f32 scores).
        """
        q = qkv_block(q_ref)  # (TQ, 128) = heads (2g, 2g+1) side by side
        zeros = jnp.zeros_like(q)
        sc = jnp.asarray(scale, q.dtype)
        q_a = jnp.where(is_a, q * sc, zeros)
        q_b = jnp.where(is_a, zeros, q * sc)
        rh_a, rh_b = rh_ref[0, 0], rh_ref[0, 1]  # (TQ, H)
        rw_a, rw_b = rw_ref[0, 0], rw_ref[0, 1]  # (TQ, W)

        def head_rows(q_m, rh_fac, rw_fac):
            cat = jnp.concatenate([q_m, rh_fac, rw_fac], axis=1)
            if pad_rows:
                cat = jnp.pad(cat, ((0, pad_rows), (0, 0)))
            return cat

        return jnp.concatenate(
            [head_rows(q_a, rh_a, rw_a), head_rows(q_b, rh_b, rw_b)], axis=0
        )

    if n_kblocks == 1 and k_sub == 1:
        # Single k step (windowed layers): no online state to carry; skip
        # the scratch roundtrips entirely.
        q_cat = build_q_cat()
    else:
        @pl.when(j == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            # Build the augmented query once per (b, g, i); later k steps
            # reuse the scratch copy.
            qcat_ref[...] = build_q_cat()

        q_cat = qcat_ref[...]

    # One-hot selectors: bias[q, t] = rh[q, kh(t)] + rw[q, kw(t)] with
    # kh = j*rows_per_blk + t//w, kw = t % w (no unaligned lane slicing on
    # Mosaic — expansions must be matmuls). With k_sub > 1 the fetched
    # (TK, 128) block is split into k_sub sub-blocks whose score dots are
    # issued before any of their softmax chains, letting the compiler
    # overlap sub-block u's VPU (max/exp/sum) work with sub-block u+1's
    # MXU dot, and halving the carry (alpha-rescale) passes per key.
    tk_s = tk // k_sub
    rows_per_sub = tk_s // w

    def sub_score(u):
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (tk_s, w), 0)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (tk_s, w), 1)
        sel_w = (t_idx % w == c_idx).astype(q_cat.dtype)  # (TK_S, W)
        th_idx = jax.lax.broadcasted_iota(jnp.int32, (tk_s, h_dim), 0)
        hh_idx = jax.lax.broadcasted_iota(jnp.int32, (tk_s, h_dim), 1)
        sel_h = (
            hh_idx == (j * k_sub + u) * rows_per_sub + th_idx // w
        ).astype(q_cat.dtype)
        k_blk = (qkv_block(k_ref) if k_sub == 1
                 else k_ref[0, pl.ds(u * tk_s, tk_s), :])
        k_cat = jnp.concatenate([k_blk, sel_h, sel_w], axis=1)
        return jax.lax.dot_general(
            q_cat, k_cat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2·TQ_pad, TK_S) f32, scale and bias included

    s_parts = [sub_score(u) for u in range(k_sub)]

    def pv(p, u=0):
        v_blk = (qkv_block(v_ref) if k_sub == 1
                 else v_ref[0, pl.ds(u * tk_s, tk_s), :])
        return jax.lax.dot_general(
            p.astype(k_ref.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def select_out(out):
        # head a rows [0, TQ), head b rows [TQ_pad, TQ_pad + TQ)
        return jnp.where(
            is_a, out[:tq], out[tq_pad:tq_pad + tq]
        ).astype(o_ref.dtype)

    def write_lse(m, l):
        # logsumexp per row, packed (TQ, 2): lane 0 head a, lane 1 head b
        lse = m + jnp.log(l)  # (2·TQ_pad, 1) f32
        lse_ref[0, 0] = jnp.concatenate(
            [lse[:tq], lse[tq_pad:tq_pad + tq]], axis=1
        )

    if n_kblocks == 1 and k_sub == 1:
        s = s_parts[0]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o_ref[0] = select_out(pv(p) / l)
        if return_lse:
            write_lse(m, l)
    else:
        # Per-sub-block SEQUENTIAL online-softmax updates with every
        # sub-score dot issued up front; k_sub == 1 degenerates to the
        # classic single-block update (same jaxpr). Rationale for the
        # k_sub > 1 structure: the round-2 "no gain" k_sub experiment
        # combined the running max over ALL sub-blocks before any exp —
        # that ordering makes every VPU op depend on every dot, so nothing
        # could overlap and the negative result said nothing about MXU/VPU
        # pipelining. Here sub-block u's max/exp/sum chain depends only on
        # dot u; if the MXU drained asynchronously, u's VPU chain could
        # overlap dot u+1 — measured 50% SLOWER on v5e (ROADMAP negative
        # results), so k_sub stays 1 in production.
        m = m_ref[...]
        l = l_ref[...]
        acc = acc_ref[...]
        for u, s in enumerate(s_parts):
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + p.sum(axis=1, keepdims=True)
            acc = acc * alpha + pv(p, u)
            m = m_new
        m_ref[...] = m
        l_ref[...] = l
        acc_ref[...] = acc

        @pl.when(j == n_kblocks - 1)
        def _finish():
            o_ref[0] = select_out(acc_ref[...] / l_ref[...])
            if return_lse:
                write_lse(m_ref[...], l_ref[...])


def _windowed_group_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, *refs,
                           w: int, scale: float, n_win: int,
                           return_lse: bool = False):
    """One (window-group, head-pair) program: n_win whole windows, each a
    single k block (N == TK == TQ), unrolled in-kernel.

    Math and op order are identical to _packed_kernel's n_kblocks==1
    branch. Rationale: the windowed layers ran as B·nW·pairs tiny
    programs (1200 at ViT-B bs 8) whose ~1 µs launch + small-DMA overhead
    dominated — xplane showed 1.30 ms/layer against a ~0.13 ms MXU
    roofline (docs/ROADMAP.md "windowed flash layers ~10x off roofline").
    Grouping n_win windows per program amortizes the launch, shares the
    one-hot selector construction, and turns 50 KB DMAs into n_win-times
    larger ones. The dots stay per-window (same MXU shapes): batching
    window pairs row-wise against concatenated keys would double the
    score area for the same useful FLOPs (break-even, noted in ROADMAP).
    """
    if return_lse:
        o_ref, lse_ref = refs
    else:
        (o_ref,) = refs
        lse_ref = None
    tq = q_ref.shape[-2]
    tk = k_ref.shape[-2]
    h_dim = rh_ref.shape[-1]
    dtype = q_ref.dtype

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    is_a = lane < 64
    tq_pad = -(-tq // 8) * 8
    pad_rows = tq_pad - tq
    sc = jnp.asarray(scale, dtype)

    # selectors identical for every window (single k block ⇒ j == 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, w), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, w), 1)
    sel_w = (t_idx % w == c_idx).astype(dtype)  # (TK, W)
    th_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, h_dim), 0)
    hh_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, h_dim), 1)
    sel_h = (hh_idx == th_idx // w).astype(dtype)  # (TK, H)

    # Everything below is vectorized over the window axis (leading dim):
    # per-window small-op islands left ~1.0 ms/layer on the table even with
    # grouped programs — batched dots + one wide softmax instead.
    q = q_ref[...]  # (G, TQ, 128)
    zeros = jnp.zeros_like(q)
    q_a = jnp.where(is_a, q * sc, zeros)
    q_b = jnp.where(is_a, zeros, q * sc)

    def head_rows(q_m, rh_fac, rw_fac):
        cat = jnp.concatenate([q_m, rh_fac, rw_fac], axis=2)
        if pad_rows:
            cat = jnp.pad(cat, ((0, 0), (0, pad_rows), (0, 0)))
        return cat

    q_cat = jnp.concatenate(
        [head_rows(q_a, rh_ref[:, 0], rw_ref[:, 0]),
         head_rows(q_b, rh_ref[:, 1], rw_ref[:, 1])], axis=1
    )  # (G, 2·TQ_pad, 128+H+W)
    sel = jnp.broadcast_to(
        jnp.concatenate([sel_h, sel_w], axis=1)[None],
        (n_win, tk, h_dim + w),
    )
    k_cat = jnp.concatenate([k_ref[...], sel], axis=2)
    s = jax.lax.dot_general(
        q_cat, k_cat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, 2·TQ_pad, TK) f32
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    out = jax.lax.dot_general(
        (p / l).astype(dtype), v_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, 2·TQ_pad, 128)
    o_ref[...] = jnp.where(
        is_a, out[:, :tq], out[:, tq_pad:tq_pad + tq]
    ).astype(o_ref.dtype)
    if return_lse:
        lse = m + jnp.log(l)  # (G, 2·TQ_pad, 1)
        lse_ref[...] = jnp.concatenate(
            [lse[:, :tq], lse[:, tq_pad:tq_pad + tq]], axis=2
        )[:, None]


_WIN_SLOT = 16  # spread-layout slot width: bf16 sublane tile (16) so every
# in-kernel window slice/merge lands on a register-tile boundary; also a
# multiple of the f32 tile (8).


def _windowed_image_kernel(q_ref, k_ref, v_ref, rel_ref, bias_ref,
                           o_ref, *, ws: int, hgt: int, wdt: int,
                           scale: float, pairs: int):
    """One (batch, window-row-band, head-pair) program over SPREAD-layout qkv.

    Round-5 full-step push, v2. The window partition/unpartition machinery
    around the windowed layers (pad -> 6-D transpose copy -> reshape in;
    copy -> transpose -> slice out, plus the (200,196,.) qkv/proj
    relayouts) cost ~1.3 ms/layer at ViT-B bs 8 - more than the 0.73 ms
    attention itself (xplane, docs/ROADMAP.md). v1 of this kernel read the
    compact (B, H, W, 3C) image layout and extracted the ws=14-wide
    windows in-kernel: every slice/merge was sublane-UNALIGNED for the
    (16, 128) bf16 register tile, and the Mosaic relayouts made the layer
    3.79 ms - worse than what it replaced. v2 fixes that by construction:
    the caller pre-SPREADS the W axis so window wx occupies a 16-column
    slot [16*wx, 16*wx+16) with its 14 real columns at the slot start
    (one cheap XLA pad-reshape, no transpose). In-kernel, window
    extraction is a slice at a 16-multiple of the sublane axis and the
    (ws, slot, 128) -> (ws*slot, 128) token merge has inner dim == the
    sublane tile: both relayout-free.

    Token accounting per window (TK = ws*slot = 224):
      - real tokens: intra-slot col j < ws and image row/col in range;
      - reference-pad tokens (HF SAM window_partition zero-pads H and W up
        to ws multiples; those tokens ATTEND and are attended): rows >= H
        in the tail band and j < ws cols mapping past W. Zero LN input
        through the qkv linear makes their qkv exactly the BIAS row, which
        the kernel reconstructs (bit-equal: 0 @ W + b == b);
      - phantom slot cols (j >= ws): not in the reference at all - masked
        out of every softmax with -1e30 and dropped on the way out.
    Per-window math (head packing, folded rel-pos selector columns, f32
    softmax) is otherwise IDENTICAL to _windowed_group_kernel, so real
    outputs are bit-equal to the partitioned route (pinned in
    tests/test_attention.py::test_fused_windowed_image_matches_partitioned).

    Block shapes (W_s = n_wx * 16 spread width):
      q/k/v: (1, ws, W_s, 128)     - one head-pair lane slice of the band
      rh/rw: (1, 2, ws, W_s, ws)   - rel factors, spread layout
      bias:  (3*pairs, 128)        - full qkv bias, rows = role*pairs+pair
      out:   (1, ws, W_s, 128)     - spread layout; caller compacts
    Forward-only (frozen-encoder paths); encoder training (remat) keeps
    the partitioned custom-VJP route.
    """
    g = pl.program_id(2)
    band_i = pl.program_id(1)
    slot = _WIN_SLOT
    w_s = q_ref.shape[2]
    n_wx = w_s // slot
    tq = ws * slot  # per-window tokens incl. masked phantom slot cols
    dtype = q_ref.dtype

    row0 = band_i * ws
    rr = jax.lax.broadcasted_iota(jnp.int32, (ws, w_s, 128), 0) + row0
    cc = jax.lax.broadcasted_iota(jnp.int32, (ws, w_s, 128), 1)
    jj = cc % slot                    # intra-slot col
    refcol = (cc // slot) * ws + jj   # image col this slot position maps to
    # reference-pad (and tail-band garbage) positions take the bias row;
    # phantom slot cols (jj >= ws) also get it but are masked in the scores.
    valid = (rr < hgt) & (refcol < wdt) & (jj < ws)

    def fix(ref, brow):
        return jnp.where(valid, ref[0], brow[None, None, :])

    bias = bias_ref[...]  # (3*pairs, 128)

    def bias_row(role):
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (3 * pairs, 128), 0) == role * pairs + g
        return jnp.sum(jnp.where(sel, bias, 0.0), axis=0).astype(dtype)

    qb = fix(q_ref, bias_row(0))
    kb = fix(k_ref, bias_row(1))
    vb = fix(v_ref, bias_row(2))
    relb = rel_ref[0]  # (2, ws, W_s, 2ws) - rh and rw packed on the lane dim
    # (one operand instead of two: the q_cat factor columns and the k_cat
    # selector columns share the [rh | rw] order, so no in-kernel split)

    def win(arr, wx):  # (ws, W_s, 128) -> (ws*slot, 128), tile-aligned
        return arr[:, wx * slot:(wx + 1) * slot, :].reshape(tq, -1)

    def win_rel(arr, wx):  # (2, ws, W_s, 2ws) -> (2, ws*slot, 2ws)
        return arr[:, :, wx * slot:(wx + 1) * slot, :].reshape(2, tq, 2 * ws)

    q = jnp.stack([win(qb, x) for x in range(n_wx)])      # (n_wx, TK, 128)
    k = jnp.stack([win(kb, x) for x in range(n_wx)])
    v = jnp.stack([win(vb, x) for x in range(n_wx)])
    rel = jnp.stack([win_rel(relb, x) for x in range(n_wx)])  # (n_wx,2,TK,2ws)

    # ---- identical math to _windowed_group_kernel ----------------------
    # (token order within a window: t = slot*wr + wc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    is_a = lane < 64
    tq_pad = -(-tq // 8) * 8  # == tq (slot is a multiple of 8)
    pad_rows = tq_pad - tq
    sc = jnp.asarray(scale, dtype)

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, ws), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, ws), 1)
    sel_w = (t_idx % slot == c_idx).astype(dtype)   # (TK, ws)
    sel_h = (c_idx == t_idx // slot).astype(dtype)  # (TK, ws)
    # phantom slot cols (wc >= ws) are not reference tokens — mask them out
    # of every softmax row THROUGH the score dot: one extra folded column
    # (q side constant 1, k side 0 / -1e30) rides the same MXU pass as the
    # selector columns.
    # (arithmetic, not a bool select: Mosaic cannot relayout width-1 i1
    # vectors; (t % slot) // ws is 0 for real cols, 1 for phantom)
    km_i = jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    kmask = ((km_i % slot) // ws).astype(dtype) * jnp.asarray(-1e30, dtype)

    zeros = jnp.zeros_like(q)
    q_a = jnp.where(is_a, q * sc, zeros)
    q_b = jnp.where(is_a, zeros, q * sc)

    ones_col = jnp.ones((tq, 1), dtype)

    def head_rows(q_m, rel_fac):
        cat = jnp.concatenate(
            [q_m, rel_fac,
             jnp.broadcast_to(ones_col[None], (n_wx, tq, 1))], axis=2)
        if pad_rows:
            cat = jnp.pad(cat, ((0, 0), (0, pad_rows), (0, 0)))
        return cat

    q_cat = jnp.concatenate(
        [head_rows(q_a, rel[:, 0]), head_rows(q_b, rel[:, 1])], axis=1
    )  # (n_wx, 2*TQ_pad, 128+2ws+1)
    sel = jnp.broadcast_to(
        jnp.concatenate([sel_h, sel_w, kmask], axis=1)[None],
        (n_wx, tq, 2 * ws + 1),
    )
    k_cat = jnp.concatenate([k, sel], axis=2)
    s = jax.lax.dot_general(
        q_cat, k_cat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (n_wx, 2*TQ_pad, TK) f32; phantom cols already at -1e30 via kmask
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    out = jax.lax.dot_general(
        (p / l).astype(dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (n_wx, 2*TQ_pad, 128)
    out = jnp.where(
        is_a, out[:, :tq], out[:, tq_pad:tq_pad + tq]
    ).astype(o_ref.dtype)  # (n_wx, TK, 128)

    # ---- reassemble the band in spread layout (aligned concat) ---------
    o_ref[0] = jnp.concatenate(
        [out[x].reshape(ws, slot, 128) for x in range(n_wx)], axis=1)


def flash_attention_windowed_image(qkv_s, rel, qkv_bias, *,
                                   ws: int, wdt: int, num_heads: int,
                                   interpret: bool = False):
    """Windowed attention over SPREAD-layout fused qkv - no window
    partition/unpartition transposes in HBM (see _windowed_image_kernel).

    qkv_s:    (B, H, W_s, 3C) - qkv linear output (bias included), W axis
              spread so window wx's ws real columns sit at the start of a
              16-column slot (W_s = n_wx*16); the pad positions may hold
              anything (the kernel reconstructs/masks them).
    rel:      (B, heads, H, W_s, 2ws) - per-token bias factors over key
              rows (lanes [:ws], row-tiled table) and key cols (lanes
              [ws:], col-tiled table), spread layout, lane-packed so the
              rel path is ONE tensor through einsum/gather/DMA.
    qkv_bias: (3C,) - the qkv linear bias (reference-pad token values).
    wdt:      true (unspread) image width; cols in [wdt, n_wx*ws) are
              reference-pad tokens.
    Returns (B, H, W_s, C) in the same spread layout. Forward-only.
    """
    b, hgt, w_s, c3 = qkv_s.shape
    c = c3 // 3
    d = c // num_heads
    assert d == 64 and num_heads % 2 == 0, (d, num_heads)
    assert w_s % _WIN_SLOT == 0, (w_s,)
    pairs = num_heads // 2
    n_bands = -(-hgt // ws)
    n_wx = w_s // _WIN_SLOT
    assert n_wx == -(-wdt // ws), (w_s, wdt, ws)
    scale = d ** -0.5

    bias = qkv_bias.reshape(3 * pairs, 128).astype(qkv_s.dtype)
    grid = (b, n_bands, pairs)
    kernel = functools.partial(
        _windowed_image_kernel, ws=ws, hgt=hgt, wdt=wdt,
        scale=scale, pairs=pairs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, w_s, 128), lambda bb, i, g: (bb, i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, w_s, 128),
                         lambda bb, i, g: (bb, i, 0, pairs + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, w_s, 128),
                         lambda bb, i, g: (bb, i, 0, 2 * pairs + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, ws, w_s, 2 * ws),
                         lambda bb, i, g: (bb, g, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias, full
        ],
        out_specs=pl.BlockSpec((1, ws, w_s, 128),
                               lambda bb, i, g: (bb, i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hgt, w_s, c), qkv_s.dtype),
        compiler_params=_parallel3_dim_semantics(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * 2 * b * pairs * hgt * w_s * ws * _WIN_SLOT * 128,
            bytes_accessed=(
                b * hgt * w_s * (3 * c + num_heads * 2 * ws)
                * qkv_s.dtype.itemsize * 2
            ),
            transcendentals=b * num_heads * hgt * w_s * ws * _WIN_SLOT,
        ),
        interpret=interpret,
    )(qkv_s, qkv_s, qkv_s, rel, bias)


def _window_group(b: int) -> int:
    """Windows per program: SAM's 64/14 grid gives 25 windows per image, so
    b (= batch·25) is divisible by 5. Capped at 5: the unrolled loop's
    per-window temporaries are stack-allocated and G=25 blew the 16 MB
    scoped-VMEM limit (19.5 MB) on v5e."""
    for g in (5, 4, 2):
        if b % g == 0:
            return g
    return 1


def _dim_semantics():
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        )
    except AttributeError:  # older pallas API name
        return pltpu.TPUCompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        )


def _group_dim_semantics():
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        )
    except AttributeError:  # older pallas API name
        return pltpu.TPUCompilerParams(
            dimension_semantics=("parallel", "parallel"),
        )


def _parallel3_dim_semantics():
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        )
    except AttributeError:  # older pallas API name
        return pltpu.TPUCompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        )


@functools.partial(
    jax.jit,
    static_argnames=("hw", "num_heads", "tq", "tk", "interpret",
                     "return_lse", "k_sub"),
)
def flash_attention_packed(qkv, rel_h, rel_w, *, hw, num_heads: int,
                           tq: int = 512, tk: int = 1024,
                           interpret: bool = False,
                           return_lse: bool = False, k_sub: int = 1):
    """Transpose-free streaming attention over the fused qkv projection.

    qkv:   (B, N, 3C) — the qkv linear's raw output, untouched. Feature
           order (3, heads, 64) means head pair g's queries live at lanes
           [128g, 128g+128), keys at C + 128g, values at 2C + 128g — all
           128-aligned, so BlockSpec index maps slice them for free.
    rel_h: (B, heads, N, hw[0]) — bias factor over key rows
    rel_w: (B, heads, N, hw[1]) — bias factor over key cols
    Returns (B, N, C) in natural token order (head outputs re-interleaved by
    the final lane-select), ready for the output projection with no copies.

    Requires head_dim == 64 (every SAM variant) and even num_heads.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert d == 64, f"packed kernel requires head_dim 64, got {d}"
    assert num_heads % 2 == 0, num_heads
    pairs = num_heads // 2
    h, w = hw
    assert n == h * w, (n, hw)
    tq = min(tq, n)
    tk = min(tk, n)
    assert n % tq == 0 and n % tk == 0 and tk % w == 0, (n, tq, tk, w)
    scale = d ** -0.5
    tq_pad = -(-tq // 8) * 8
    n_kblocks = n // tk

    if n_kblocks == 1 and n == tq and _window_group(b) > 1:
        # windowed layers: whole windows per program, grouped (see
        # _windowed_group_kernel)
        g = _window_group(b)
        grid = (b // g, pairs)
        kernel = functools.partial(_windowed_group_kernel, w=w, scale=scale,
                                   n_win=g, return_lse=return_lse)
        out_specs = pl.BlockSpec((g, tq, 128), lambda bb, gg: (bb, 0, gg),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, n, c), qkv.dtype)
        if return_lse:
            out_specs = [
                out_specs,
                pl.BlockSpec((g, 1, tq, 2), lambda bb, gg: (bb, gg, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [
                out_shape,
                jax.ShapeDtypeStruct((b, pairs, n, 2), jnp.float32),
            ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((g, tq, 128), lambda bb, gg: (bb, 0, gg),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, tk, 128),
                             lambda bb, gg: (bb, 0, pairs + gg),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, tk, 128),
                             lambda bb, gg: (bb, 0, 2 * pairs + gg),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 2, tq, h), lambda bb, gg: (bb, gg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 2, tq, w), lambda bb, gg: (bb, gg, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_group_dim_semantics(),
            cost_estimate=pl.CostEstimate(
                flops=2 * 3 * 2 * b * pairs * n * n * 128,
                bytes_accessed=(
                    b * n * (3 * c + num_heads * (h + w))
                    * qkv.dtype.itemsize * 2
                ),
                transcendentals=b * num_heads * n * n,
            ),
            interpret=interpret,
        )(qkv, qkv, qkv, rel_h, rel_w)

    assert tk % (k_sub * w) == 0, (tk, k_sub, w)
    grid = (b, pairs, n // tq, n_kblocks)
    kernel = functools.partial(_packed_kernel, w=w, scale=scale,
                               n_kblocks=n_kblocks, return_lse=return_lse,
                               k_sub=k_sub)
    out_specs = pl.BlockSpec((1, tq, 128), lambda bb, g, i, j: (bb, i, g),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n, c), qkv.dtype)
    if return_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, tq, 2), lambda bb, g, i, j: (bb, g, i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b, pairs, n, 2), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # q / k / v: 128-lane slices of the same natural qkv array
            pl.BlockSpec((1, tq, 128), lambda bb, g, i, j: (bb, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 128), lambda bb, g, i, j: (bb, j, pairs + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 128),
                         lambda bb, g, i, j: (bb, j, 2 * pairs + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq, h), lambda bb, g, i, j: (bb, g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq, w), lambda bb, g, i, j: (bb, g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2 * tq_pad, 1), jnp.float32),    # running max
            pltpu.VMEM((2 * tq_pad, 1), jnp.float32),    # running denom
            pltpu.VMEM((2 * tq_pad, 128), jnp.float32),  # output accumulator
            pltpu.VMEM((2 * tq_pad, 128 + h + w), qkv.dtype),  # augmented q
        ],
        compiler_params=_dim_semantics(),
        cost_estimate=pl.CostEstimate(
            # qk + rel-pos one-hot expansion + pv per (q, k) tile pair,
            # for both packed heads
            flops=2 * 3 * 2 * b * pairs * n * n * 128,
            bytes_accessed=(
                b * n * (3 * c + num_heads * (h + w)) * qkv.dtype.itemsize * 2
            ),
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w)


# ---------------------------------------------------------------------------
# Backward pass (custom VJP) — enables trainable='all' encoder fine-tuning
# without the materialized (N, N) bias (round-1 VERDICT item 7).
#
# Standard flash backward with the packed-pair layout tricks reused:
#   p  = exp(s - L)            (L = logsumexp rows, saved by the forward)
#   dp = dO · Vᵀ               ds = p ∘ (dp - D),  D = rowsum(dO ∘ O)
#   dq = scale · ds · K        dk = scale · dsᵀ · Q = dsᵀ · (Q·scale)
#   dv = pᵀ · dO               drel = dsᵀ-sums through the one-hot selectors
# Head stacking makes dsᵀ @ q_cat produce BOTH heads' dk in the right lanes
# (head-a q rows are zero in head-b lanes and vice versa) with no select.
# ---------------------------------------------------------------------------


def _bwd_prep(q_ref, rh_ref, rw_ref, g_ref, lse_ref, dvec_ref,
              *, w, scale, tq, tq_pad, is_a):
    """Shared per-(q-block) backward prep: augmented q, masked stacked dO,
    per-row L and D columns ((2·TQ_pad, 1) f32)."""
    pad_rows = tq_pad - tq
    q = q_ref[0]
    zeros = jnp.zeros_like(q)
    sc = jnp.asarray(scale, q.dtype)
    q_a = jnp.where(is_a, q * sc, zeros)
    q_b = jnp.where(is_a, zeros, q * sc)
    rh_a, rh_b = rh_ref[0, 0], rh_ref[0, 1]
    rw_a, rw_b = rw_ref[0, 0], rw_ref[0, 1]

    def head_rows(rows):
        if pad_rows:
            rows = jnp.pad(rows, ((0, pad_rows), (0, 0)))
        return rows

    q_cat = jnp.concatenate([
        head_rows(jnp.concatenate([q_a, rh_a, rw_a], axis=1)),
        head_rows(jnp.concatenate([q_b, rh_b, rw_b], axis=1)),
    ], axis=0)

    g = g_ref[0]
    g_a = jnp.where(is_a, g, jnp.zeros_like(g))
    g_b = jnp.where(is_a, jnp.zeros_like(g), g)
    g_stack = jnp.concatenate([head_rows(g_a), head_rows(g_b)], axis=0)

    def rows_from_lane2(ref, pad_value):
        blk = ref[0, 0]  # (TQ, 2) f32: lane 0 = head a, lane 1 = head b
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (tq, 2), 1)
        col_a = jnp.sum(jnp.where(lane2 == 0, blk, 0.0), axis=1,
                        keepdims=True)
        col_b = jnp.sum(jnp.where(lane2 == 1, blk, 0.0), axis=1,
                        keepdims=True)

        def pad_col(c):
            if pad_rows:
                c = jnp.pad(c, ((0, pad_rows), (0, 0)),
                            constant_values=pad_value)
            return c

        return jnp.concatenate([pad_col(col_a), pad_col(col_b)], axis=0)

    # padded L rows get +1e30 so p = exp(s - L) = 0 exactly on junk rows
    lrow = rows_from_lane2(lse_ref, 1e30)
    drow = rows_from_lane2(dvec_ref, 0.0)
    return q_cat, g_stack, lrow, drow


def _bwd_selectors(tk, w, h_dim, kblock, dtype):
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, w), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, w), 1)
    sel_w = (t_idx % w == c_idx).astype(dtype)
    th_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, h_dim), 0)
    hh_idx = jax.lax.broadcasted_iota(jnp.int32, (tk, h_dim), 1)
    sel_h = (hh_idx == kblock * (tk // w) + th_idx // w).astype(dtype)
    return sel_h, sel_w


def _nt_dot(a, b):
    """a (M, K) · b (N, K)ᵀ → (M, N), f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _nn_dot(a, b):
    """a (M, K) · b (K, N) → (M, N), f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tn_dot(a, b):
    """aᵀ (K, M) · b (K, N) → (M, N), f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _packed_bwd_dq_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, g_ref,
                          lse_ref, dvec_ref,
                          dq_ref, drh_ref, drw_ref,
                          qcat_ref, gstk_ref, lrow_ref, drow_ref,
                          dq_acc, drh_acc, drw_acc,
                          *, w: int, scale: float, n_kblocks: int):
    """dq + drel_h + drel_w: grid (b, pair, q-block, k-block), k innermost."""
    tq = q_ref.shape[-2]
    tk = k_ref.shape[-2]
    h_dim = rh_ref.shape[3]
    tq_pad = -(-tq // 8) * 8
    j = pl.program_id(3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    is_a = lane < 64

    @pl.when(j == 0)
    def _init():
        q_cat, g_stack, lrow, drow = _bwd_prep(
            q_ref, rh_ref, rw_ref, g_ref, lse_ref, dvec_ref,
            w=w, scale=scale, tq=tq, tq_pad=tq_pad, is_a=is_a)
        qcat_ref[...] = q_cat
        gstk_ref[...] = g_stack
        lrow_ref[...] = lrow
        drow_ref[...] = drow
        dq_acc[...] = jnp.zeros_like(dq_acc)
        drh_acc[...] = jnp.zeros_like(drh_acc)
        drw_acc[...] = jnp.zeros_like(drw_acc)

    sel_h, sel_w = _bwd_selectors(tk, w, h_dim, j, qcat_ref.dtype)
    k_blk = k_ref[0]
    k_cat = jnp.concatenate([k_blk, sel_h, sel_w], axis=1)
    s = _nt_dot(qcat_ref[...], k_cat)          # (2·TQ_pad, TK)
    p = jnp.exp(s - lrow_ref[...])
    dp = _nt_dot(gstk_ref[...], v_ref[0])       # (2·TQ_pad, TK)
    ds = (p * (dp - drow_ref[...])).astype(k_blk.dtype)
    dq_acc[...] += _nn_dot(ds, k_blk)
    drh_acc[...] += _nn_dot(ds, sel_h)
    drw_acc[...] += _nn_dot(ds, sel_w)

    @pl.when(j == n_kblocks - 1)
    def _finish():
        acc = dq_acc[...]
        dq = jnp.where(is_a, acc[:tq], acc[tq_pad:tq_pad + tq])
        dq_ref[0] = (dq * scale).astype(dq_ref.dtype)
        drh_ref[0, 0] = drh_acc[:tq].astype(drh_ref.dtype)
        drh_ref[0, 1] = drh_acc[tq_pad:tq_pad + tq].astype(drh_ref.dtype)
        drw_ref[0, 0] = drw_acc[:tq].astype(drw_ref.dtype)
        drw_ref[0, 1] = drw_acc[tq_pad:tq_pad + tq].astype(drw_ref.dtype)


def _packed_bwd_dkv_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, g_ref,
                           lse_ref, dvec_ref,
                           dk_ref, dv_ref,
                           dk_acc, dv_acc,
                           *, w: int, scale: float, n_qblocks: int):
    """dk + dv: grid (b, pair, k-block, q-block), q innermost.

    dk arrives via ONE dot dsᵀ @ q_cat — head-a q rows are zero in head-b
    lanes (and vice versa), so both heads land in their own lanes of the
    first 128 columns; the rel-selector columns are sliced off (the slice
    offset 0 / length 128 is Mosaic-aligned).
    """
    tq = q_ref.shape[-2]
    tk = k_ref.shape[-2]
    h_dim = rh_ref.shape[3]
    tq_pad = -(-tq // 8) * 8
    jq = pl.program_id(3)
    jk = pl.program_id(2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    is_a = lane < 64

    @pl.when(jq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_cat, g_stack, lrow, drow = _bwd_prep(
        q_ref, rh_ref, rw_ref, g_ref, lse_ref, dvec_ref,
        w=w, scale=scale, tq=tq, tq_pad=tq_pad, is_a=is_a)
    sel_h, sel_w = _bwd_selectors(tk, w, h_dim, jk, q_cat.dtype)
    k_blk = k_ref[0]
    k_cat = jnp.concatenate([k_blk, sel_h, sel_w], axis=1)
    s = _nt_dot(q_cat, k_cat)
    p = jnp.exp(s - lrow).astype(k_blk.dtype)   # (2·TQ_pad, TK)
    dp = _nt_dot(g_stack, v_ref[0])
    ds = (p.astype(jnp.float32) * (dp - drow)).astype(k_blk.dtype)
    dv_acc[...] += _tn_dot(p, g_stack)           # (TK, 128)
    dk_acc[...] += _tn_dot(ds, q_cat)            # (TK, 128 + H + W)

    @pl.when(jq == n_qblocks - 1)
    def _finish():
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)
        # q_cat lanes 0:128 hold q·scale, so this is already scale·dsᵀ·q
        dk_ref[0] = dk_acc[:, :128].astype(dk_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("hw", "num_heads", "tq", "tk", "interpret")
)
def _flash_packed_bwd(qkv, rel_h, rel_w, g_out, lse, dvec, *, hw,
                      num_heads: int, tq: int = 512, tk: int = 1024,
                      interpret: bool = False):
    """Backward wrappers: returns (dqkv, drel_h, drel_w).

    The backward holds THREE (2·TQ_pad, TK) f32 intermediates (s, p, dp)
    live at once, so its k tile is capped at 512 regardless of the
    forward's — tk=1024 blew the 16 MB VMEM budget by ~0.8 MB."""
    tk = min(tk, 512)
    b, n, c3 = qkv.shape
    c = c3 // 3
    pairs = num_heads // 2
    h, w = hw
    tq = min(tq, n)
    tk = min(tk, n)
    assert n % tq == 0 and n % tk == 0 and tk % w == 0, (n, tq, tk, w)
    scale = 64 ** -0.5
    tq_pad = -(-tq // 8) * 8
    n_kblocks = n // tk
    n_qblocks = n // tq

    in_specs = [
        pl.BlockSpec((1, tq, 128), lambda bb, g, i, j: (bb, i, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, 128), lambda bb, g, i, j: (bb, j, pairs + g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, 128),
                     lambda bb, g, i, j: (bb, j, 2 * pairs + g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, tq, h), lambda bb, g, i, j: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, tq, w), lambda bb, g, i, j: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, 128), lambda bb, g, i, j: (bb, i, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, 2), lambda bb, g, i, j: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, 2), lambda bb, g, i, j: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
    ]

    dq, drh, drw = pl.pallas_call(
        functools.partial(_packed_bwd_dq_kernel, w=w, scale=scale,
                          n_kblocks=n_kblocks),
        grid=(b, pairs, n_qblocks, n_kblocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tq, 128), lambda bb, g, i, j: (bb, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq, h), lambda bb, g, i, j: (bb, g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq, w), lambda bb, g, i, j: (bb, g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, num_heads, n, h), rel_h.dtype),
            jax.ShapeDtypeStruct((b, num_heads, n, w), rel_w.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * tq_pad, 128 + h + w), qkv.dtype),   # q_cat
            pltpu.VMEM((2 * tq_pad, 128), qkv.dtype),           # dO stack
            pltpu.VMEM((2 * tq_pad, 1), jnp.float32),           # L rows
            pltpu.VMEM((2 * tq_pad, 1), jnp.float32),           # D rows
            pltpu.VMEM((2 * tq_pad, 128), jnp.float32),         # dq acc
            pltpu.VMEM((2 * tq_pad, h), jnp.float32),           # drh acc
            pltpu.VMEM((2 * tq_pad, w), jnp.float32),           # drw acc
        ],
        compiler_params=_dim_semantics(),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w, g_out, lse, dvec)

    # dk/dv: same inputs, k-block outer / q-block inner.
    dkv_in_specs = [
        pl.BlockSpec((1, tq, 128), lambda bb, g, j, i: (bb, i, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, 128), lambda bb, g, j, i: (bb, j, pairs + g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, 128),
                     lambda bb, g, j, i: (bb, j, 2 * pairs + g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, tq, h), lambda bb, g, j, i: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, tq, w), lambda bb, g, j, i: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, 128), lambda bb, g, j, i: (bb, i, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, 2), lambda bb, g, j, i: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, 2), lambda bb, g, j, i: (bb, g, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_dkv_kernel, w=w, scale=scale,
                          n_qblocks=n_qblocks),
        grid=(b, pairs, n_kblocks, n_qblocks),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, tk, 128), lambda bb, g, j, i: (bb, j, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 128), lambda bb, g, j, i: (bb, j, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, 128 + h + w), jnp.float32),  # dk acc
            pltpu.VMEM((tk, 128), jnp.float32),          # dv acc
        ],
        compiler_params=_dim_semantics(),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w, g_out, lse, dvec)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, drh, drw


# Global-layer tile/unroll config, overridable for in-context experiments
# (tools/profile_device.py --tiles); defaults are the measured optimum.
PACKED_TILES = {"tq": 512, "tk": 1024, "k_sub": 1}


def set_packed_tiles(tq: int = 512, tk: int = 1024, k_sub: int = 1):
    PACKED_TILES.update(tq=tq, tk=tk, k_sub=k_sub)


_PACKED_VJP_CACHE: dict = {}


def packed_attention_vjp(*, hw, num_heads: int, tq: int | None = None,
                         tk: int | None = None, interpret: bool = False,
                         k_sub: int | None = None):
    """Differentiable packed flash attention (custom VJP), cached per
    static config. Forward emits logsumexp rows; backward recomputes
    scores blockwise (flash-style, O(N·d) memory)."""
    tq = PACKED_TILES["tq"] if tq is None else tq
    tk = PACKED_TILES["tk"] if tk is None else tk
    k_sub = PACKED_TILES["k_sub"] if k_sub is None else k_sub
    key = (hw, num_heads, tq, tk, interpret, k_sub)
    if key in _PACKED_VJP_CACHE:
        return _PACKED_VJP_CACHE[key]

    kw = dict(hw=hw, num_heads=num_heads, tq=tq, tk=tk, interpret=interpret)
    pairs = num_heads // 2

    @jax.custom_vjp
    def f(qkv, rel_h, rel_w):
        return flash_attention_packed(qkv, rel_h, rel_w, k_sub=k_sub, **kw)

    def f_fwd(qkv, rel_h, rel_w):
        out, lse = flash_attention_packed(
            qkv, rel_h, rel_w, return_lse=True, k_sub=k_sub, **kw)
        return out, (qkv, rel_h, rel_w, out, lse)

    def f_bwd(res, g_out):
        qkv, rel_h, rel_w, out, lse = res
        b, n, _ = qkv.shape
        # D = rowsum(dO ∘ O) per head, packed like lse: (B, pairs, N, 2)
        d_tok = (g_out.astype(jnp.float32) * out.astype(jnp.float32))
        d_tok = d_tok.reshape(b, n, num_heads, 64).sum(-1)  # (B, N, heads)
        dvec = d_tok.reshape(b, n, pairs, 2).transpose(0, 2, 1, 3)
        dqkv, drh, drw = _flash_packed_bwd(
            qkv, rel_h, rel_w, g_out.astype(qkv.dtype), lse, dvec, **kw)
        return dqkv, drh.astype(rel_h.dtype), drw.astype(rel_w.dtype)

    f.defvjp(f_fwd, f_bwd)
    _PACKED_VJP_CACHE[key] = f
    return f


def attention_reference(q, k, v, rel_h, rel_w, *, hw):
    """XLA reference implementation (same math, materialized bias)."""
    d = q.shape[-1]
    h, w = hw
    logits = jnp.einsum(
        "bqd,bkd->bqk", q.astype(jnp.float32) * d**-0.5,
        k.astype(jnp.float32),
    )
    n = q.shape[1]
    bias = (
        rel_h.astype(jnp.float32).reshape(-1, n, h, 1)
        + rel_w.astype(jnp.float32).reshape(-1, n, 1, w)
    ).reshape(-1, n, n)
    attn = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v)
