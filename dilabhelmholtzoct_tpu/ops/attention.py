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


def flash_attention_qkv(qkv, rel_h, rel_w, *, hw, tq: int = 512,
                        tk: int = 512, interpret: bool = False):
    """Flash attention reading q/k/v and writing output in the ViT's natural
    layouts — no (B, heads, N, d) transposes (the XLA layout copies those
    force cost ~26% of encoder time at B=8).

    qkv:   (B, N, 3, heads, d) — a free reshape of the qkv projection
    rel_h: (B, N, heads, H)    — bias factors in natural order
    rel_w: (B, N, heads, W)
    Returns (B, N, heads, d), reshapeable to (B, H, W, C) for free.
    """
    b, n, three, n_heads, d = qkv.shape
    assert three == 3
    h, w = hw
    assert n == h * w
    tq = min(tq, n)
    tk = min(tk, n)
    assert n % tq == 0 and n % tk == 0 and tk % w == 0
    scale = d ** -0.5

    def kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref):
        # q_ref: (1, TQ, 1, 1, d); k_ref/v_ref: (1, N, 1, 1, d)
        # rh_ref: (1, TQ, 1, H); rw_ref: (1, TQ, 1, W); o_ref: (1, TQ, 1, d)
        tq_, d_ = q_ref.shape[1], q_ref.shape[4]
        n_ = k_ref.shape[1]
        rows_per_blk = tk // w
        n_blocks = n_ // tk
        q = q_ref[0, :, 0, 0, :]
        rh = rh_ref[0, :, 0, :]
        rw = rw_ref[0, :, 0, :]

        t_idx = jax.lax.broadcasted_iota(jnp.int32, (w, tk), 1)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (w, tk), 0)
        sel_w = (t_idx % w == c_idx).astype(rw.dtype)
        rw_bias = jax.lax.dot_general(
            rw, sel_w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h_dim = rh.shape[1]
        th_idx = jax.lax.broadcasted_iota(jnp.int32, (h_dim, tk), 1)
        hh_idx = jax.lax.broadcasted_iota(jnp.int32, (h_dim, tk), 0)

        def body(j, carry):
            m, l, acc = carry
            k_blk = k_ref[0, pl.ds(j * tk, tk), 0, 0, :]
            v_blk = v_ref[0, pl.ds(j * tk, tk), 0, 0, :]
            s = jax.lax.dot_general(
                q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            sel_h = (hh_idx == j * rows_per_blk + th_idx // w).astype(rh.dtype)
            rh_bias = jax.lax.dot_general(
                rh, sel_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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

        m0 = jnp.full((tq_, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((tq_, 1), jnp.float32)
        acc0 = jnp.zeros((tq_, d_), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[0, :, 0, :] = (acc / l).astype(o_ref.dtype)

    grid = (b, n_heads, n // tq)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, 1, 1, d), lambda bb, hh, i: (bb, i, 0, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1, 1, d), lambda bb, hh, i: (bb, 0, 1, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1, 1, d), lambda bb, hh, i: (bb, 0, 2, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1, h), lambda bb, hh, i: (bb, i, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1, w), lambda bb, hh, i: (bb, i, hh, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, 1, d), lambda bb, hh, i: (bb, i, hh, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, n_heads, d), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w)


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
